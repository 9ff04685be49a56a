"""Structured Streaming tests: stream/batch parity via availableNow.

Each streaming operator is drained with trigger(availableNow=True)
into a memory sink and compared against the equivalent batch
DataFrame computation over the same events fixture.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dso_import_spark.sources.registry import load_table
from dso_import_spark.streaming.events import (
    drain_to_memory,
    read_events_stream,
    running_user_totals,
    session_counts,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def batch_events(spark, sf_dir):
    # unpersist on teardown: a leaked cache makes every later plan over
    # the same parquet resolve to the InMemoryRelation, silently hiding
    # parquet pushdown from plan-assertion tests in other modules
    df = load_table(spark, sf_dir, "events").cache()
    yield df
    df.unpersist()


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def test_tumbling_counts_parity(spark, sf_dir, batch_events):
    stream = tumbling_counts(read_events_stream(spark, sf_dir))
    got = drain_to_memory(stream, "t_tumbling", "complete")
    expect = (
        batch_events.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    assert _rows(got, "window_start", "event_type") == _rows(
        expect, "window_start", "event_type"
    )


def test_session_counts_parity(spark, sf_dir, batch_events):
    stream = session_counts(read_events_stream(spark, sf_dir))
    got = drain_to_memory(stream, "t_sessions", "complete")
    expect = (
        batch_events.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )
    assert _rows(got, "session_start", "user_id") == _rows(
        expect, "session_start", "user_id"
    )


def test_running_user_totals_stateful(spark, sf_dir, batch_events):
    stream = running_user_totals(read_events_stream(spark, sf_dir))
    got = drain_to_memory(stream, "t_totals", "update")
    # update-mode sink: keep the LAST emitted row per user (final state)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = got.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    expect = batch_events.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    assert _rows(final, "user_id") == _rows(expect, "user_id")


def test_watermark_in_plan(spark, sf_dir):
    stream = tumbling_counts(read_events_stream(spark, sf_dir))
    assert stream.isStreaming
    assert "EventTimeWatermark" in stream._jdf.queryExecution().analyzed().toString()


def test_stream_upsert_latest_incremental(spark, sf_dir, batch_events, tmp_path):
    """Three micro-batches of thirds of the events table, upserted into
    a parquet target, must converge to the global latest-per-user state
    — and must actually process incrementally (3 batches)."""
    from dso_import_spark.streaming.events import (
        latest_per_user,
        stream_upsert_latest,
    )

    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    ev = batch_events.select(*cols)
    landing = str(tmp_path / "landing")
    # land in reverse slice order so arrival order != event-time order
    for k in (2, 1, 0):
        ev.filter(F.col("event_id") % 3 == k).coalesce(1).write.mode(
            "append"
        ).parquet(landing)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    target = str(tmp_path / "user_state")
    stream_upsert_latest(stream, target, str(tmp_path / "ckpt"))

    got = _rows(spark.read.parquet(target).select(*cols), "user_id")
    want = _rows(latest_per_user(ev).select(*cols), "user_id")
    assert got == want
    # incremental evidence: the checkpoint committed 3 micro-batches
    import os

    commits = [
        f
        for f in os.listdir(str(tmp_path / "ckpt" / "commits"))
        if not f.startswith(".")
    ]
    assert len(commits) == 3


def test_full_outer_interval_join_emits_both_orphan_sides(spark, sf_dir):
    # the FULL OUTER completion: null-padded rows appear on BOTH
    # sides, and the matched core equals the left-outer variant's
    from dso_import_spark.queries import REGISTRY

    rows = REGISTRY["stream_interval_full_outer"].spark(spark, sf_dir).collect()
    assert rows
    orphan_views = [r for r in rows if r.purchase_id is None]
    orphan_purchases = [r for r in rows if r.view_id is None]
    matched = [r for r in rows if r.view_id is not None and r.purchase_id is not None]
    assert orphan_views and orphan_purchases and matched
    # every row carries a user_id (coalesced from whichever side exists)
    assert all(r.user_id is not None for r in rows)
