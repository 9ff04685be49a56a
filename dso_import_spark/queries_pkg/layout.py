"""Storage-layout queries: SCD2 point-in-time reads and
hive-partitioned layout with partition pruning.

The reference's warehouse is a valid-time SCD2 store (natural key +
``volgnummer`` versions with ``begin_geldigheid``/``eind_geldigheid``
intervals, ``src/dso_import/bagh/batch.py:154-173``); its consumers'
canonical read is "the state as of date D". ``scd2_point_in_time``
re-expresses that read over the fixture star schema: derive versioned
intervals per natural key with a window ``lead``, then select the one
version whose interval covers the snapshot date. One shuffle (the
window partition-by), no self-join.

``partitioned_events_scan`` is the sink-side scale posture the
reference's Postgres tables cannot express: write a fact table
hive-partitioned by day, then read it back with a date predicate and
let Catalyst prune to the matching directories. At 100 TB the
difference between scanning 30 days and scanning 7 is the whole game;
``tests/test_layout.py`` asserts the pruning actually happens
(``PartitionFilters`` on the scan node, pruned partition count).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

from dso_import_spark.queries import query
from dso_import_spark.queries_pkg.util import tables

SNAPSHOT = "1997-06-15"


@query(
    "scd2_point_in_time",
    oracle=f"""
    WITH v AS (
      SELECT o_custkey, o_orderkey, o_orderpriority, o_totalprice,
             CAST(o_orderdate AS DATE) AS begin_d,
             lead(CAST(o_orderdate AS DATE)) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS eind_d
      FROM orders
    )
    SELECT o_orderpriority,
           count(*)::BIGINT AS n_customers,
           round(sum(o_totalprice), 2) AS revenue,
           min(o_orderkey) AS min_orderkey
    FROM v
    WHERE begin_d <= DATE '{SNAPSHOT}'
      AND (eind_d IS NULL OR eind_d > DATE '{SNAPSHOT}')
    GROUP BY o_orderpriority
    """,
    doc="SCD2 point-in-time snapshot (the reference warehouse's "
    "canonical read): version orders per customer into validity "
    "intervals via window lead, keep the version covering the snapshot "
    "date. Window formulation = one hash shuffle on the natural key; "
    "the equivalent self-join would shuffle the table twice.",
)
def scd2_point_in_time(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    begin = F.col("o_orderdate").cast("date")
    w = Window.partitionBy("o_custkey").orderBy(begin.asc(), F.col("o_orderkey").asc())
    v = orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        begin.alias("begin_d"),
        F.lead(begin).over(w).alias("eind_d"),
    )
    d = F.lit(SNAPSHOT).cast("date")
    return (
        v.filter(
            (F.col("begin_d") <= d)
            & (F.col("eind_d").isNull() | (F.col("eind_d") > d))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.min("o_orderkey").alias("min_orderkey"),
        )
    )


D1 = "1996-01-01"
D2 = SNAPSHOT  # 1997-06-15


@query(
    "scd2_change_feed",
    oracle=f"""
    WITH v AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(o_orderdate AS DATE) AS begin_d,
             lead(CAST(o_orderdate AS DATE)) OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS eind_d
      FROM orders
    ),
    per_key AS (
      SELECT o_custkey,
        max(CASE WHEN begin_d <= DATE '{D1}'
                  AND (eind_d IS NULL OR eind_d > DATE '{D1}')
             THEN o_orderkey END) AS k1,
        max(CASE WHEN begin_d <= DATE '{D2}'
                  AND (eind_d IS NULL OR eind_d > DATE '{D2}')
             THEN o_orderkey END) AS k2,
        max(CASE WHEN begin_d <= DATE '{D1}'
                  AND (eind_d IS NULL OR eind_d > DATE '{D1}')
             THEN o_totalprice END) AS p1,
        max(CASE WHEN begin_d <= DATE '{D2}'
                  AND (eind_d IS NULL OR eind_d > DATE '{D2}')
             THEN o_totalprice END) AS p2
      FROM v
      GROUP BY o_custkey
    )
    SELECT CASE WHEN k1 IS NULL THEN 'insert'
                WHEN k1 = k2 THEN 'unchanged'
                ELSE 'update' END AS change_type,
           count(*)::BIGINT AS n_keys,
           round(sum(coalesce(p2, 0) - coalesce(p1, 0)), 2) AS price_delta
    FROM per_key
    WHERE k1 IS NOT NULL OR k2 IS NOT NULL
    GROUP BY 1
    """,
    doc="SCD2 change-data-feed: classify every natural key as "
    "insert/update/unchanged between two snapshot dates in ONE keyed "
    "pass — window lead derives validity intervals, then conditional "
    "aggregation picks the version covering each date. The window and "
    "the groupBy share the o_custkey hash partitioning, so the whole "
    "diff costs a single shuffle; the naive formulation (two "
    "point-in-time snapshots full-outer-joined on key) shuffles the "
    "table three times. This is how a 100 TB SCD2 warehouse emits a "
    "downstream CDC stream without rereading itself twice.",
)
def scd2_change_feed(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    begin = F.col("o_orderdate").cast("date")
    w = Window.partitionBy("o_custkey").orderBy(begin.asc(), F.col("o_orderkey").asc())
    v = orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        begin.alias("begin_d"),
        F.lead(begin).over(w).alias("eind_d"),
    )

    def covers(d: str):
        lit = F.lit(d).cast("date")
        return (F.col("begin_d") <= lit) & (
            F.col("eind_d").isNull() | (F.col("eind_d") > lit)
        )

    per_key = v.groupBy("o_custkey").agg(
        F.max(F.when(covers(D1), F.col("o_orderkey"))).alias("k1"),
        F.max(F.when(covers(D2), F.col("o_orderkey"))).alias("k2"),
        F.max(F.when(covers(D1), F.col("o_totalprice"))).alias("p1"),
        F.max(F.when(covers(D2), F.col("o_totalprice"))).alias("p2"),
    )
    change = F.when(F.col("k1").isNull(), F.lit("insert")).otherwise(
        F.when(F.col("k1") == F.col("k2"), F.lit("unchanged")).otherwise(
            F.lit("update")
        )
    )
    return (
        per_key.filter(F.col("k1").isNotNull() | F.col("k2").isNotNull())
        .groupBy(change.alias("change_type"))
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.round(
                F.sum(
                    F.coalesce(F.col("p2"), F.lit(0.0))
                    - F.coalesce(F.col("p1"), F.lit(0.0))
                ),
                2,
            ).alias("price_delta"),
        )
    )


def stamped_cache_path(sf_dir: str, src_table: str, *leaf: str) -> str:
    """Deterministic local cache path for a fixture-derived artifact,
    keyed by the source parquet's (mtime, size) so a regenerated
    fixture invalidates the cache instead of silently serving stale
    data. Shared by every write-once layout/scan fixture in the repo
    (day-partitioned events, schema-evolution generations, the
    partition-overwrite table, and the WKT files in wkt_scan.py)."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    src = os.path.join(sf_dir, f"{src_table}.parquet")
    try:
        st = os.stat(src)
        stamp = f"{int(st.st_mtime)}_{st.st_size}"
    except OSError:
        stamp = "nosrc"
    return os.path.join(
        tempfile.gettempdir(),
        "dso_import_spark_layout",
        f"{tag}-{stamp}",
        *leaf,
    )


def partitioned_events_path(sf_dir: str) -> str:
    """Day-partitioned events copy (see stamped_cache_path)."""
    return stamped_cache_path(sf_dir, "events", "events_by_day")


def partitioned_events(spark, sf_dir):
    """Write (once) and read back events hive-partitioned by day.

    The partition column ``dt`` becomes a directory key
    (``dt=2024-01-08/…``); a predicate on it prunes at planning time —
    no file of a non-matching day is even listed. This is the layout
    the BAGH sink (``plans/bagh_job.py``) would use for fact tables at
    scale.
    """
    out = partitioned_events_path(sf_dir)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (events,) = tables(spark, sf_dir, "events")
        (
            events.withColumn("dt", F.to_date("ts"))
            .repartition("dt")  # one file per day, not one per task
            .write.mode("overwrite")
            .partitionBy("dt")
            .parquet(out)
        )
    return spark.read.parquet(out)


@query(
    "partitioned_events_scan",
    oracle="""
    SELECT event_type,
           count(*)::BIGINT AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
    GROUP BY event_type
    """,
    doc="Day-partitioned parquet layout + partition-pruned scan: the "
    "week filter resolves against directory names, so 23 of 30 day "
    "partitions are never read. Differential vs. an unpartitioned "
    "full-scan filter proves layout does not change results.",
)
def partitioned_events_scan(spark, sf_dir):
    part = partitioned_events(spark, sf_dir)
    return (
        part.filter(F.col("dt").between("2024-01-08", "2024-01-14"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def schema_evolution_path(sf_dir: str) -> str:
    """Two-generation documents copy (see stamped_cache_path)."""
    return stamped_cache_path(sf_dir, "documents", "documents_versions")


def _versioned_documents(spark, sf_dir):
    """Write (once) documents as two schema versions under one root:
    v=1 files carry only (doc_id, text, lang) — the schema an early
    ingest produced; v=2 files add (source, n_chars). Reading the root
    with mergeSchema=true unions the file schemas, NULL-filling the
    columns absent from old files — the drift situation every
    long-lived lake table hits."""
    out = schema_evolution_path(sf_dir)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (docs,) = tables(spark, sf_dir, "documents")
        (
            docs.filter(F.col("doc_id") % 2 == 0)
            .select("doc_id", "text", "lang")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(out, "v=1"))
        )
        (
            docs.filter(F.col("doc_id") % 2 == 1)
            .select("doc_id", "text", "lang", "source", "n_chars")
            .coalesce(1)
            .write.mode("overwrite")  # append would duplicate v=2 if a
            # crash between this write and the _SUCCESS marker reran us
            .parquet(os.path.join(out, "v=2"))
        )
        # root-level marker for the write-once gate
        with open(os.path.join(out, "_SUCCESS"), "w"):
            pass
    return (
        spark.read.option("mergeSchema", "true")
        .option("basePath", out)
        .parquet(os.path.join(out, "v=1"), os.path.join(out, "v=2"))
    )


@query(
    "schema_evolution_scan",
    oracle="""
    SELECT 1 AS v,
           count(*)::BIGINT AS n_docs,
           count(*)::BIGINT AS n_null_source,
           count(*)::BIGINT AS n_null_nchars
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT 2,
           count(*)::BIGINT,
           0::BIGINT,
           0::BIGINT
    FROM documents WHERE doc_id % 2 = 1
    ORDER BY v
    """,
    doc="Schema-evolution read: two parquet file generations under one "
    "table root — v=1 files predate the (source, n_chars) columns, "
    "v=2 files carry them — read with mergeSchema=true + a basePath "
    "partition column, then a per-version audit of NULL-filled "
    "columns. This is the lake-table drift case (old files never "
    "rewritten when the schema grows); the oracle recomputes the "
    "expected per-version null counts from the original table. "
    "mergeSchema's footer union costs one planning-time pass over "
    "file footers — at 100 TB pin the merged schema in a catalog "
    "and pass it explicitly instead (same read path, no footer "
    "sweep); the NULL-fill itself is free columnar metadata.",
)
def schema_evolution_scan(spark, sf_dir):
    merged = _versioned_documents(spark, sf_dir)
    return (
        merged.groupBy("v")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("source").isNull(), 1).otherwise(0)
            ).alias("n_null_source"),
            F.sum(
                F.when(F.col("n_chars").isNull(), 1).otherwise(0)
            ).alias("n_null_nchars"),
        )
        .orderBy("v")
    )


def dpo_events_path(sf_dir: str) -> str:
    """Partition-overwrite demo table (see stamped_cache_path)."""
    return stamped_cache_path(sf_dir, "events", "events_dpo")


_DPO_CUTOFF = "2024-01-24"


@query(
    "partition_overwrite_merge",
    oracle=f"""
    WITH merged AS (
      SELECT event_type,
             CASE WHEN CAST(ts AS DATE) >= DATE '{_DPO_CUTOFF}'
                  THEN value * 2 ELSE value END AS value
      FROM events)
    SELECT event_type,
           count(*)::BIGINT AS n_events,
           round(sum(value), 2) AS sum_value
    FROM merged GROUP BY event_type ORDER BY event_type
    """,
    doc="Dynamic partition overwrite — the incremental-rewrite merge "
    "for partitioned fact tables: a corrected delta covering only "
    "the last week is written with "
    "partitionOverwriteMode=dynamic, which replaces exactly the day "
    "partitions present in the delta and leaves every older "
    "partition's files untouched (verified by the per-type totals: "
    "old days keep original values, overwritten days carry the "
    "corrected ones). This is how a 100 TB table absorbs late "
    "restatements without a full rewrite — cost scales with the "
    "restated days, not table size. Overwriting the same partitions "
    "with the same deterministic delta makes the op idempotent "
    "across calls. Oracle computes the expected post-merge state "
    "from the source table.",
)
def partition_overwrite_merge(spark, sf_dir):
    out = dpo_events_path(sf_dir)
    (events,) = tables(spark, sf_dir, "events")
    base = events.withColumn("dt", F.to_date("ts"))
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            base.repartition("dt")
            .write.mode("overwrite")
            .partitionBy("dt")
            .parquet(out)
        )
    delta = (
        base.filter(F.col("dt") >= _DPO_CUTOFF)
        .withColumn("value", F.col("value") * 2)
        .repartition("dt")
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        delta.write.mode("overwrite").partitionBy("dt").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("event_type")
    )


@query(
    "cdc_apply_changes",
    oracle="""
    WITH feed AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
      FROM events),
    latest AS (SELECT * FROM (
        SELECT user_id, event_id, ts, value, op,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM feed) WHERE rn = 1)
    SELECT user_id,
           event_id AS last_event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
           round(value, 6) AS last_value
    FROM latest WHERE op <> 'D' ORDER BY user_id
    """,
    doc="CDC change-feed apply with delete semantics: a keyed feed of "
    "op-coded records (U/D, here derived deterministically from "
    "event_type) collapses to final table state — last op per key by "
    "(ts, event_id) wins, a terminal D removes the key. The plan is "
    "ONE map-side-combinable arg-max aggregate (max_by over a "
    "(ts, event_id) struct), not a per-key window sort: partial "
    "arg-max states merge associatively, so out-of-order and "
    "cross-partition arrival need no global ordering pass, and at "
    "100 TB the shuffle carries one candidate row per key per map "
    "task instead of the full feed. Deletes filter AFTER the "
    "aggregate (a delete must beat earlier upserts, not hide them). "
    "Oracle uses the equivalent window formulation.",
)
def cdc_apply_changes(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    feed = events.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
    )
    latest = feed.groupBy("user_id").agg(
        F.max_by(
            F.struct("event_id", "ts", "value", "op"),
            F.struct("ts", "event_id"),
        ).alias("r")
    )
    return (
        latest.filter(F.col("r.op") != "D")
        .select(
            "user_id",
            F.col("r.event_id").alias("last_event_id"),
            F.date_format("r.ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "last_ts"
            ),
            F.round("r.value", 6).alias("last_value"),
        )
        .orderBy("user_id")
    )
