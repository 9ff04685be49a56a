"""Window / sessionization / as-of / time-bucket queries (SURVEY.md §2.10).

All single-shuffle window formulations: partition by the entity key,
sort by event time with full deterministic tie-breaks. The as-of join
uses the union+last_value(IGNORE NULLS) pattern — the formulation that
scales (one shuffle, no per-key loops, no range cross product).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dso_import_spark.queries import query
from dso_import_spark.queries_pkg.util import tables


def _ts_micros(col="ts"):
    """Microsecond epoch of an event-time column.

    Parquet fixtures store ``ts`` as timestamp[us] without a zone, which
    Spark reads as TIMESTAMP_NTZ; ``F.unix_micros`` only accepts
    TIMESTAMP, so cast first. The session timezone is pinned to UTC in
    session.py, making the NTZ->TIMESTAMP cast value-preserving.
    """
    return F.unix_micros(F.col(col).cast("timestamp"))


@query(
    "window_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3 AND o_custkey % 10 = 0
    """,
    doc="Top-k per group via row_number (deterministic tie-break).",
)
def window_topk_per_group(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= 3) & (F.col("o_custkey") % 10 == 0))
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "running_sum",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(sum(l_extendedprice) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev
    FROM lineitem WHERE l_suppkey % 25 = 0
    """,
    doc="Cumulative sum per supplier ordered by ship date.",
)
def running_sum(spark, sf_dir):
    (li,) = tables(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        li.filter(F.col("l_suppkey") % 25 == 0)
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.round(F.sum("l_extendedprice").over(w), 2).alias("running_rev"),
        )
    )


@query(
    "lag_lead_delta",
    oracle="""
    SELECT user_id,
           count(*) AS n_gaps,
           round(avg(gap_us / 1000000.0), 2) AS avg_gap_sec,
           max(gap_us) AS max_gap_us
    FROM (SELECT user_id,
                 epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
          FROM events)
    WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
    doc="lag/lead inter-event deltas per user (microsecond epochs).",
)
def lag_lead_delta(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = _ts_micros() - F.lag(_ts_micros()).over(w)
    return (
        events.select("user_id", gap.alias("gap_us"))
        .filter(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.avg(F.col("gap_us") / 1000000.0), 2).alias("avg_gap_sec"),
            F.max("gap_us").alias("max_gap_us"),
        )
    )


@query(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id,
           sum(new_session)::BIGINT AS n_sessions,
           count(*) AS n_events,
           round(count(*) / sum(new_session)::DOUBLE, 4) AS avg_events_per_session
    FROM flagged GROUP BY user_id
    """,
    doc="Sessionization with a 30-minute inactivity gap — the batch "
    "formulation of session_window (streaming variant in streaming/).",
)
def sessionize_events(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(_ts_micros()).over(w)
    new_session = F.when(
        prev_us.isNull() | (_ts_micros() - prev_us > 1_800_000_000), 1
    ).otherwise(0)
    return (
        events.select("user_id", "event_id", new_session.alias("new_session"))
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.count(F.lit(1)) / F.sum("new_session").cast("double"), 4
            ).alias("avg_events_per_session"),
        )
    )


@query(
    "tumbling_hour_window",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS bucket,
           event_type, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    doc="Tumbling 1-hour event-time windows (batch; streaming twin in "
    "streaming_tumbling_hour).",
)
def tumbling_hour_window(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    bucket = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00")
    return events.groupBy(bucket.alias("bucket"), F.col("event_type")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@query(
    "asof_join_last_signup",
    oracle="""
    SELECT event_id AS error_id, user_id, asof_signup_id
    FROM (SELECT event_id, user_id, event_type,
                 last_value(CASE WHEN event_type = 'signup' THEN event_id END
                            IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_signup_id
          FROM events)
    WHERE event_type = 'error'
    """,
    doc="As-of join (error → most recent prior signup per user) via the "
    "single-shuffle last_value(IGNORE NULLS) pattern.",
)
def asof_join_last_signup(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    asof = F.last(
        F.when(F.col("event_type") == "signup", F.col("event_id")), ignorenulls=True
    ).over(w)
    return (
        events.withColumn("asof_signup_id", asof)
        .filter(F.col("event_type") == "error")
        .select(F.col("event_id").alias("error_id"), "user_id", "asof_signup_id")
    )


@query(
    "ntile_rank_analytics",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM orders
    WHERE o_custkey % 50 = 0
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Distribution analytics (ntile/percent_rank/cume_dist) per "
    "priority class. Partitioned window — each priority sorts "
    "independently, so the sort parallelizes across keys instead of "
    "collapsing to the single-partition global-ORDER BY plan.",
)
def ntile_rank_analytics(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return (
        orders.filter(F.col("o_custkey") % 50 == 0)
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
    )


@query(
    "rolling_hour_stats",
    oracle="""
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           n_1h,
           round(avg_1h, 4) AS avg_1h
    FROM (SELECT event_id, user_id, ts,
                 count(*) OVER w AS n_1h,
                 avg(value) OVER w AS avg_1h
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                       RANGE BETWEEN 3600000000 PRECEDING
                             AND CURRENT ROW))
    WHERE user_id % 10 = 0
    """,
    doc="Rolling time-RANGE window: per event, count and mean of the "
    "same user's events in the trailing hour. A RANGE frame over "
    "MICROSECOND epoch on BOTH engines — truncated integer seconds "
    "on one side vs fractional epoch() on the other would disagree "
    "on frame membership exactly at hour boundaries and make all "
    "same-second events frame peers. One shuffle on user_id; frame "
    "evaluation is a sliding pointer over the sorted partition (no "
    "self-join, no per-row rescan). The streaming twin would be a "
    "sliding window; this is the batch/backfill formulation.",
)
def rolling_hour_stats(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(_ts_micros())
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        events.select(
            "event_id",
            "user_id",
            "ts",
            F.count(F.lit(1)).over(w).alias("n_1h"),
            F.round(F.avg("value").over(w), 4).alias("avg_1h"),
        )
        .filter(F.col("user_id") % 10 == 0)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "n_1h",
            "avg_1h",
        )
    )


@query(
    "group_exact_percentiles",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n,
           round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
           round(min(o_totalprice), 4) AS min_price,
           round(max(o_totalprice), 4) AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Exact interpolated percentiles per group (Spark `percentile` "
    "== DuckDB `quantile_cont`, both linear interpolation). Exact "
    "percentile is a full-sort-per-group aggregate — correct but "
    "memory-heavy; percentile_quantity holds the approx_percentile "
    "sketch variant that is the 100 TB path.",
)
def group_exact_percentiles(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias(
            "median_price"
        ),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
        F.round(F.min("o_totalprice"), 4).alias("min_price"),
        F.round(F.max("o_totalprice"), 4).alias("max_price"),
    )


@query(
    "revenue_share_window",
    oracle="""
    WITH nr AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             round(sum(o.o_totalprice), 2) AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2)
    SELECT region, nation, revenue,
           round(revenue / sum(revenue) OVER (PARTITION BY region), 6)
             AS share_in_region,
           rank() OVER (PARTITION BY region ORDER BY revenue DESC, nation)
             AS rnk
    FROM nr
    """,
    doc="Ratio-to-report: each nation's share of its region's revenue "
    "via an unbounded window sum over the aggregated (not raw) rows — "
    "the window input is 25 nations, so the share step is free no "
    "matter how large the fact table; dims broadcast.",
)
def revenue_share_window(spark, sf_dir):
    (orders, customer, nation, region) = tables(
        spark, sf_dir, "orders", "customer", "nation", "region"
    )
    nr = (
        orders.join(
            customer, orders.o_custkey == customer.c_custkey
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy("region")
    rnk_w = Window.partitionBy("region").orderBy(
        F.col("revenue").desc(), F.col("nation")
    )
    return nr.select(
        "region",
        "nation",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(w), 6).alias(
            "share_in_region"
        ),
        F.rank().over(rnk_w).alias("rnk"),
    )


@query(
    "asof_tolerance_cogroup",
    oracle="""
    WITH purchases AS (
      SELECT event_id AS left_id, user_id, ts
      FROM events WHERE event_type = 'purchase'),
    clicks AS (
      SELECT user_id, ts AS rts, max(event_id) AS right_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
    m AS (
      SELECT p.left_id, p.user_id, p.ts, c.right_id, c.rts
      FROM purchases p ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.ts >= c.rts)
    SELECT left_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s,
           CASE WHEN rts IS NOT NULL AND ts - rts <= INTERVAL 1800 SECOND
                THEN right_id END AS right_id,
           CASE WHEN rts IS NOT NULL AND ts - rts <= INTERVAL 1800 SECOND
                THEN (epoch_us(ts) - epoch_us(rts)) // 1000000 END AS secs_since
    FROM m
    """,
    doc="As-of join with 30-min staleness tolerance via "
    "cogroup().applyInPandas + pandas.merge_asof (operators/asof.py): "
    "attribute each purchase to the latest prior click only while the "
    "click is fresh. Oracle = DuckDB native ASOF LEFT JOIN + tolerance "
    "filter — two independent as-of implementations must agree. The "
    "event time is rendered server-side (session tz pinned UTC) so the "
    "comparison is caller-timezone-independent.",
)
def asof_tolerance_cogroup(spark, sf_dir):
    from dso_import_spark.operators.asof import asof_tolerance_join

    (events,) = tables(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase")
    clicks = events.filter(F.col("event_type") == "click")
    out = asof_tolerance_join(
        purchases, clicks, key="user_id", ts_col="ts",
        id_col="event_id", tolerance_secs=1800,
    )
    return out.select(
        "left_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        "right_id",
        "secs_since",
    )
