"""Streaming operators exposed to the differential harness.

Each query builds a real Structured Streaming DAG (readStream file
source → watermarked stateful transform), drains it with
``trigger(availableNow=True)`` into a memory sink, and returns the
sink as a batch DataFrame — so the streaming engine's results are
hash-compared against DuckDB oracles exactly like batch queries.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dso_import_spark.queries import query
from dso_import_spark.ship import ensure_shipped
from dso_import_spark.streaming.events import (
    dedup_within_watermark,
    drain_to_memory,
    interval_join_view_purchase,
    read_events_stream,
    running_user_totals,
    session_counts,
    tumbling_counts,
)

# NOTE: new streaming queries register in queries_pkg/extras.py, not
# here — this module sits inside the driver's front-50 verification
# block and appending to it would shift the tail out of the gate
# (see the registry-order comment in dso_import_spark/queries.py).


def _stream(spark, sf_dir):
    from dso_import_spark.queries_pkg.util import tune_session

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    tune_session(spark)  # stateful streaming can't AQE-coalesce 200 state tasks
    ensure_shipped(spark)
    return read_events_stream(spark, sf_dir)


@query(
    "stream_tumbling_hour",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS bucket,
           event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    doc="Structured Streaming watermarked tumbling window (complete "
    "mode, availableNow replay) — same result as the batch "
    "tumbling_hour_window formulation.",
)
def stream_tumbling_hour(spark, sf_dir):
    out = drain_to_memory(
        tumbling_counts(_stream(spark, sf_dir)), "q_stream_tumbling", "complete"
    )
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:00").alias("bucket"),
        "event_type",
        "n_events",
        "sum_value",
    )


@query(
    "stream_session_windows",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged)
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM sessions GROUP BY user_id, session_id
    """,
    doc="Structured Streaming session_window (30-minute gap) — the "
    "gaps-and-islands batch SQL is the oracle.",
)
def stream_session_windows(spark, sf_dir):
    out = drain_to_memory(
        session_counts(_stream(spark, sf_dir)), "q_stream_sessions", "complete"
    )
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        "n_events",
        "sum_value",
    )


@query(
    "stream_dedup_delivery",
    oracle="""
    SELECT DISTINCT user_id, event_type,
           strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M') AS minute
    FROM events
    """,
    doc="Streaming exact dedup via dropDuplicatesWithinWatermark: "
    "collapse at-least-once re-deliveries keyed by (user, type, "
    "minute); dedup state is watermark-bounded. Surviving key set "
    "equals batch DISTINCT.",
)
def stream_dedup_delivery(spark, sf_dir):
    ev = _stream(spark, sf_dir).withColumn(
        "minute", F.date_trunc("minute", F.col("ts"))
    )
    deduped = dedup_within_watermark(ev, ["user_id", "event_type", "minute"])
    out = drain_to_memory(deduped, "q_stream_dedup", "append")
    return out.select(
        "user_id",
        "event_type",
        F.date_format("minute", "yyyy-MM-dd HH:mm").alias("minute"),
    )


@query(
    "stream_user_totals",
    oracle="""
    SELECT user_id, strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
           count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events GROUP BY user_id
    """,
    doc="Custom stateful streaming operator (applyInPandasWithState "
    "keyed running totals, update mode); final state per user equals "
    "the batch aggregate.",
)
def stream_user_totals(spark, sf_dir):
    out = drain_to_memory(
        running_user_totals(_stream(spark, sf_dir)), "q_stream_totals", "update"
    )
    # update-mode sink holds one row per (user, trigger); keep the final
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            "user_id",
            F.date_format("last_ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
            "n_events",
            "total_value",
        )
    )


@query(
    "stream_interval_join",
    oracle="""
    SELECT a.user_id,
           a.event_id AS view_id,
           b.event_id AS purchase_id,
           strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
           strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           round(b.value, 6) AS purchase_value
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
    WHERE a.event_type = 'view' AND b.event_type = 'purchase'
    """,
    doc="Watermarked stream-stream interval self-join (view -> purchase "
    "attribution within 30 minutes per user). Watermarks on both sides "
    "plus the time-range join condition bound the join state store; "
    "availableNow replay makes the append-mode result equal the batch "
    "interval join.",
)
def stream_interval_join(spark, sf_dir):
    out = drain_to_memory(
        interval_join_view_purchase(_stream(spark, sf_dir)),
        "q_stream_interval_join",
        "append",
    )
    return out.select(
        "user_id",
        "view_id",
        "purchase_id",
        F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.round("purchase_value", 6).alias("purchase_value"),
    )


@query(
    "stream_upsert_state",
    oracle="""
    SELECT user_id,
           event_id AS last_event_id,
           event_type AS last_event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
           round(value, 6) AS last_value
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
    doc="Streaming upsert sink (foreachBatch + two-phase-swap parquet "
    "target): replay the events stream with availableNow, maintain "
    "latest-event-per-user state in the target table, return the final "
    "state. Order-independent merge (max (ts, event_id) across sides), "
    "so the result equals the batch latest-per-user regardless of "
    "micro-batch boundaries.",
)
def stream_upsert_state(spark, sf_dir):
    import tempfile

    from dso_import_spark.streaming.events import stream_upsert_latest

    d = tempfile.mkdtemp(prefix="dso-upsert-")
    target = f"{d}/state"
    stream_upsert_latest(
        _stream(spark, sf_dir).select(
            "event_id", "ts", "user_id", "event_type", "value"
        ),
        target,
        f"{d}/ckpt",
    )
    out = spark.read.parquet(target)
    return out.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_ts"),
        F.round("value", 6).alias("last_value"),
    )


@query(
    "stream_interval_left_outer",
    oracle="""
    SELECT a.user_id,
           a.event_id AS view_id,
           strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
           b.event_id AS purchase_id,
           round(b.value, 6) AS purchase_value
    FROM (SELECT * FROM events
          WHERE event_type = 'view'
            AND ts < TIMESTAMP '2024-01-28') a
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
    """,
    doc="Watermarked stream-stream LEFT OUTER interval join: every "
    "view emits — matches as their window closes, unmatched views "
    "NULL-padded only once the watermark proves no purchase can "
    "still arrive (the 'which impressions never converted' question "
    "an inner join cannot answer on an unbounded stream). State is "
    "evicted at watermark > view_ts + gap. The view side is cut two "
    "days before stream end so every retained window provably closes "
    "under the final availableNow watermark, making the append-mode "
    "result equal the batch LEFT JOIN the oracle runs. Runs under "
    "multipleWatermarkPolicy=max (restored after): the view side is "
    "artificially ENDED by its cutoff filter, so under the default "
    "min policy the global watermark stalls at the dead stream's max "
    "and withholds the final gap+delay sliver of unmatched views "
    "forever — max policy lets the live purchase stream close every "
    "view window. (For genuinely independent sources min is the "
    "completeness-safe default; max is exactly for a side that stops "
    "progressing.)",
)
def stream_interval_left_outer(spark, sf_dir):
    from dso_import_spark.streaming.events import interval_join_left_outer

    policy_key = "spark.sql.streaming.multipleWatermarkPolicy"
    prev = spark.conf.get(policy_key, "min")
    spark.conf.set(policy_key, "max")
    try:
        out = drain_to_memory(
            interval_join_left_outer(
                _stream(spark, sf_dir), safe_before="2024-01-28"
            ),
            "q_stream_interval_left_outer",
            "append",
        )
    finally:
        spark.conf.set(policy_key, prev)
    return out.select(
        "user_id",
        "view_id",
        F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        "purchase_id",
        F.round("purchase_value", 6).alias("purchase_value"),
    )


@query(
    "stream_interval_full_outer",
    oracle="""
    SELECT coalesce(a.user_id, b.user_id) AS user_id,
           a.event_id AS view_id,
           strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
           b.event_id AS purchase_id,
           strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           round(b.value, 6) AS purchase_value
    FROM (SELECT * FROM events
          WHERE event_type = 'view'
            AND ts < TIMESTAMP '2024-01-28') a
    FULL JOIN (SELECT * FROM events
               WHERE event_type = 'purchase'
                 AND ts < TIMESTAMP '2024-01-28') b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
    """,
    doc="Watermarked stream-stream FULL OUTER interval join — the "
    "completion of the outer-join matrix: matched pairs as windows "
    "close, unmatched views null-padded when no purchase can still "
    "arrive, and unmatched purchases null-padded when no view can "
    "still arrive (conversions with no preceding impression — the "
    "attribution-gap half neither inner nor left-outer emission can "
    "surface). Both sides are cut before stream end so every "
    "retained window provably closes under the final availableNow "
    "watermark, making append-mode output equal the batch FULL "
    "JOIN; runs under multipleWatermarkPolicy=max (restored after) "
    "because both sides are artificially ended by their cutoffs.",
)
def stream_interval_full_outer(spark, sf_dir):
    from dso_import_spark.streaming.events import interval_join_full_outer

    policy_key = "spark.sql.streaming.multipleWatermarkPolicy"
    prev = spark.conf.get(policy_key, "min")
    spark.conf.set(policy_key, "max")
    try:
        out = drain_to_memory(
            interval_join_full_outer(
                _stream(spark, sf_dir), safe_before="2024-01-28"
            ),
            "q_stream_interval_full_outer",
            "append",
        )
    finally:
        spark.conf.set(policy_key, prev)
    return out.select(
        "user_id",
        "view_id",
        F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        "purchase_id",
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.round("purchase_value", 6).alias("purchase_value"),
    )
