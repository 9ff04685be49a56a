"""Structured Streaming operators over the ``events`` stream.

The reference is batch-only (SURVEY.md §2.10: no streaming surface);
this is the north-star extension expressed the Spark-native way:
``readStream`` source → watermarked event-time transformations →
``writeStream`` sink. Every operator here is the streaming twin of a
batch registry query (tumbling_hour_window, sessionize_events,
running_sum), and tests assert stream/batch parity by draining the
stream with ``trigger(availableNow=True)`` — the replay-a-table mode
that also backfills historical data on a real cluster.

Scale notes:
- watermarks bound state: an unbounded ``groupBy(window(...))`` would
  otherwise accumulate state forever at 100 TB/day rates;
- ``applyInPandasWithState`` keys state by user and processes Arrow
  batches — per-group state lives on executors, never the driver;
- file sources use ``maxFilesPerTrigger`` for ingest back-pressure.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

# events.parquet stores ts as timestamp[us] with no zone → read it as
# TIMESTAMP_NTZ; the stream casts to TIMESTAMP (session tz is pinned
# UTC, so the cast is value-preserving) because watermarks/windows
# require an instant type. A TIMESTAMP(NANOS) regeneration of the
# fixture is handled defensively like the batch reader
# (sources/registry.py): probe the footer, read nanos as long, and
# truncate to microseconds.
def _events_schema(ts_type) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


EVENTS_RAW_SCHEMA = _events_schema(TimestampNTZType())


def _as_stream_dir(path: str) -> str:
    """The file stream source requires a *directory* (new files land
    there over time). The fixture is a single read-only parquet file,
    so stage a directory of symlinks next to it in tmp."""
    import hashlib
    import os
    import tempfile

    if os.path.isdir(path):
        return path
    # a stable digest, NOT hash(): str hashing is salted per process,
    # so a checkpointed query restarted in a new process would see a
    # different source directory and re-ingest everything
    digest = hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:10]
    d = os.path.join(tempfile.gettempdir(), f"dso-stream-{digest}")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, os.path.basename(path))
    # lexists, not exists: a DANGLING symlink (fixture regenerated at a
    # new inode, old target deleted) reads as absent to exists() and
    # the re-symlink would crash with FileExistsError forever after —
    # replace it; and tolerate a concurrent creator (round-8 review)
    if os.path.lexists(link) and not os.path.exists(link):
        os.unlink(link)
    if not os.path.lexists(link):
        try:
            os.symlink(os.path.abspath(path), link)
        except FileExistsError:
            pass  # raced by a parallel worker creating the same link
    return d


def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """events parquet as an unbounded stream (file source).

    On a real deployment the path is a landing directory that new
    files arrive into; ``availableNow`` replays what exists today.
    """
    # footer probe (no scan): under nanosAsLong a TIMESTAMP(NANOS) ts
    # reads as bigint; otherwise as TIMESTAMP_NTZ — declare the stream
    # schema to match and convert accordingly (batch parity:
    # sources/registry.py load_table). The legacy conf is restored when
    # the file is NOT nanos (the common case) so it cannot leak into
    # unrelated parquet reads (the registry.py round-8 fix, applied to
    # the streaming path too); in the nanos case it must STAY set —
    # the streaming source re-reads footers at every micro-batch, so
    # scoping it tighter would break the running query.
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probed = dict(spark.read.parquet(f"{sf_dir}/events.parquet").dtypes)
    nanos = probed.get("ts") == "bigint"
    if not nanos:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    reader = spark.readStream.schema(
        _events_schema(LongType() if nanos else TimestampNTZType())
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(_as_stream_dir(f"{sf_dir}/events.parquet"))
    if nanos:
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling event-time aggregation.

    Streaming twin of the ``tumbling_hour_window`` batch query: the
    watermark lets Spark finalize+evict window state once event time
    passes window_end + watermark — bounded state at any scale.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
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


def hopping_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked hopping (sliding) event-time aggregation.

    Streaming twin of the ``hopping_window_counts`` batch query: each
    event lands in window/slide overlapping windows; the watermark
    finalizes+evicts a window's state once event time passes
    window_end + watermark, so state is bounded by (windows in flight ×
    keys), not by stream length.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), "event_type")
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


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked session-window aggregation (session_window gap
    semantics identical to the batch ``sessionize_events`` query)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
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


def session_counts_dynamic(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Session windows with a PER-EVENT gap (dynamic gap duration):
    conversion-grade events (purchase/signup) hold a session open for
    12 hours, ambient events for 6 — the shape real engagement
    analytics needs, because one inactivity threshold misfits both
    kinds of activity. ``session_window`` accepts a gap Column; each
    event contributes [ts, ts+gap(event)) and overlapping intervals
    merge, so a long-gap event extends the session even when later
    short-gap events would not. State is watermark-evicted exactly as
    with a fixed gap."""
    gap = F.when(
        F.col("event_type").isin("purchase", "signup"), F.lit("12 hours")
    ).otherwise(F.lit("6 hours"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
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


RUNNING_TOTAL_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("last_ts", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running totals across
    micro-batches via ``applyInPandasWithState``.

    State (count, sum) is keyed by user and partitioned across
    executors; each trigger emits one updated row per user seen in the
    batch. This is the Spark-native form of a keyed accumulator that a
    hand-rolled engine would implement as a stateful operator.
    """

    def update(
        key: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        last_ts = None
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = pdf["ts"].max()
            last_ts = mx if last_ts is None else max(last_ts, mx)
        state.update((n, float(total)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "last_ts": [last_ts],
                "n_events": [n],
                "total_value": [round(total, 2)],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTAL_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same logical
    event (at-least-once sources re-send) keyed by ``keys``.

    ``dropDuplicatesWithinWatermark`` keeps dedup state only until the
    watermark passes each key's event time — bounded state, unlike a
    plain ``dropDuplicates`` whose key set grows forever on an
    unbounded stream. Emits only the key columns so the result is
    deterministic (which duplicate row survives is arrival-order
    dependent; the surviving *key set* is not).
    """
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys)
        .select(*[k for k in keys if k != "ts"])
    )


def interval_join_view_purchase(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream self-join: each ``view`` event joined
    to the same user's ``purchase`` events within ``gap_minutes``.

    Stream-stream joins need BOTH a watermark on each side and a
    time-range join condition; together they let the state store evict
    buffered rows once the watermark passes ``view_ts + gap`` — bounded
    state on an unbounded stream. Without the range bound Spark would
    have to buffer every view forever (any future purchase could still
    match). Append-mode only: a joined row is emitted once its match
    window is closed by the watermark (availableNow replay emits all).
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            "user_id",
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {gap_minutes} MINUTES")
        )
    )
    return views.join(purchases, cond, "inner").select(
        "user_id", "view_id", "purchase_id", "view_ts", "purchase_ts",
        "purchase_value",
    )


def interval_join_left_outer(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    safe_before: str | None = None,
) -> DataFrame:
    """LEFT OUTER watermarked stream-stream interval join: every view
    emits — matched views as they close, UNMATCHED views NULL-padded
    only once the watermark proves no purchase can still arrive.

    This is the semantics inner stream-stream joins cannot give you:
    "which impressions never converted" on an unbounded stream. The
    state store holds a view until watermark > view_ts + gap; at that
    point it either emitted matches or emits the NULL-padded row —
    bounded state, eventually-complete output.

    ``safe_before``: optional event-time cutoff applied to the VIEW
    side. Rows whose match window closes within the watermark delay of
    the stream's end are withheld by the final watermark (availableNow
    replay ends with watermark = max_ts - delay); filtering views to
    well before that line makes the append-mode result equal the batch
    LEFT JOIN exactly — the same determinism discipline as the
    tumbling-window queries, applied to outer-join emission.
    """
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
    )
    # watermark BEFORE the cutoff filter (same fix as the full-outer
    # variant): filtering first makes the view side's own watermark
    # stall at cutoff - delay under the default min policy, withholding
    # the final delay+gap sliver of NULL-padded rows forever
    views = views.withWatermark("view_ts", watermark)
    if safe_before is not None:
        views = views.filter(F.col("view_ts") < F.lit(safe_before))
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {gap_minutes} MINUTES")
        )
    )
    return views.join(purchases, cond, "left_outer").select(
        "user_id", "view_id", "view_ts", "purchase_id", "purchase_value",
    )


def interval_join_full_outer(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    safe_before: str | None = None,
) -> DataFrame:
    """FULL OUTER watermarked stream-stream interval join — completes
    the outer-join matrix: matched pairs as their windows close,
    unmatched VIEWS null-padded when no purchase can still arrive,
    and unmatched PURCHASES null-padded when no view can still arrive
    (a purchase matches views in [purchase_ts - gap, purchase_ts], so
    its side closes once the view watermark passes purchase_ts).

    State is bounded on both sides: a view evicts at watermark >
    view_ts + gap, a purchase at watermark > purchase_ts. The
    "orphaned purchases" half answers the attribution-gap question —
    conversions with no preceding impression — which neither inner
    nor left-outer emission can surface on an unbounded stream.

    ``safe_before`` applies the closure cutoff to BOTH sides (unlike
    the left-outer variant, both sides emit null-padded rows, so both
    must provably close under the final availableNow watermark for
    the append-mode result to equal the batch FULL JOIN). Crucially
    the watermark is assigned BEFORE the cutoff filter: a filtered
    side's own watermark otherwise stalls at cutoff − delay and can
    never close its own tail (cut rows stop arriving, so nothing
    advances event time past them) — tracking the full stream while
    joining only the cut rows lets the watermark sweep past both
    cutoffs and close every retained window.
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            "user_id",
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    if safe_before is not None:
        views = views.filter(F.col("view_ts") < F.lit(safe_before))
        purchases = purchases.filter(F.col("purchase_ts") < F.lit(safe_before))
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {gap_minutes} MINUTES")
        )
    )
    return views.join(purchases, cond, "full_outer").select(
        # user_id comes from whichever side matched (NULL on the other)
        F.coalesce(F.col("user_id"), F.col("p_user_id")).alias("user_id"),
        "view_id",
        "view_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


def latest_per_user(events: DataFrame) -> DataFrame:
    """Deterministic latest-event-per-user reduction: max (ts, event_id)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def stream_upsert_latest(
    events: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
) -> None:
    """Streaming upsert sink: maintain latest-event-per-user state in a
    parquet table via ``foreachBatch`` + the two-phase-swap write.

    Each micro-batch is reduced to its latest row per user, unioned
    with the current target, and re-reduced — so the target always
    holds the global max-(ts, event_id) row per user. Taking the max
    across sides (rather than blindly preferring the incoming batch,
    as the reference's update-changed J6 would) makes the sink safe
    under out-of-order and replayed batches: the result is independent
    of arrival order, hence exactly-once-equivalent under
    at-least-once delivery.

    Scale notes: state lives in the target table (partitioned by
    user-id range at 100 TB), not in the driver or stream state store;
    each micro-batch costs one shuffle on user_id. The tmp-then-swap
    write keeps the target readable and consistent at all times
    (same discipline as plans/bagh_job.py's Warehouse.write).
    """
    import os
    import shutil

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        tmp = target_dir.rstrip("/") + ".tmp"
        old = target_dir.rstrip("/") + ".old"
        # recovery preamble: a crash between the two swap renames
        # leaves the state at .old with the target missing — roll it
        # back rather than silently rebuilding from one micro-batch
        # (which would discard every earlier user's state)
        if os.path.isdir(old) and not os.path.isdir(target_dir):
            os.rename(old, target_dir)
        if os.path.isdir(old):
            shutil.rmtree(old)
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)  # incomplete write from a dead run
        staged = latest_per_user(batch_df)
        spark = batch_df.sparkSession
        # gate on DATA FILES, not the _SUCCESS marker (the round-8
        # Warehouse.read fix, applied here too): a populated target
        # restored without its marker would read as empty and the swap
        # below would permanently discard every earlier user's state
        has_data = os.path.isdir(target_dir) and any(
            not fn.startswith(("_", ".")) for fn in os.listdir(target_dir)
        )
        if has_data:
            existing = spark.read.parquet(target_dir)
            staged = latest_per_user(existing.unionByName(staged))
        staged.write.mode("overwrite").parquet(tmp)  # materialize BEFORE swap
        if os.path.exists(target_dir):
            os.rename(target_dir, old)
        os.rename(tmp, target_dir)
        if os.path.isdir(old):
            shutil.rmtree(old)

    q = (
        events.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def drain_to_memory(
    stream: DataFrame, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Run a streaming DF to completion with availableNow → memory sink.

    Test/backfill harness: processes everything currently in the
    source, then stops. Returns a batch DF over the sink table.
    """
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream.sparkSession.table(name)


def enrich_with_dimension(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join + per-nation aggregate.

    The canonical Structured Streaming enrichment shape: the static
    dimension is broadcast to every micro-batch (stateless join — no
    watermark or join state needed, unlike stream-stream joins), then
    a stateful aggregation groups the enriched rows. At scale the
    dimension is the small side by definition; if it outgrows the
    broadcast threshold the join degrades to shuffle per micro-batch,
    at which point pre-bucketing the dimension on the join key is the
    fix.
    """
    enriched = events.join(
        F.broadcast(dim.select("c_custkey", "c_nationkey")),
        events["user_id"] == F.col("c_custkey"),
    )
    return enriched.groupBy("c_nationkey").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
