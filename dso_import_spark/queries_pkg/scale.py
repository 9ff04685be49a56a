"""Scale-posture queries: skew salting, sketches, SQL grouping sets.

Salted variants are differentially tested against the plain formulation
— the whole point of salting is that results are identical while the
hot key's work spreads over n_salts tasks. Sketch queries encode their
accuracy contract in the oracle (the estimate itself is
engine-specific, its error bound is not).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dso_import_spark.operators.skew import salted_agg, salted_join
from dso_import_spark.queries import query
from dso_import_spark.queries_pkg.util import tables


@query(
    "salted_heavy_hitters",
    oracle="""
    SELECT event_type, count(*)::BIGINT AS n_events,
           round(sum(value), 2) AS sum_value,
           round(max(value), 6) AS max_value
    FROM events GROUP BY event_type
    """,
    doc="Two-phase salted aggregation over the skewed event_type key "
    "(salted_agg operator): partial agg on (key, salt), final combine "
    "on key — identical result to a direct groupBy, hot key spread "
    "over 16 tasks.",
)
def salted_heavy_hitters(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    out = salted_agg(
        events,
        ["event_type"],
        {
            "n_events": ("count", "*"),
            "sum_value_raw": ("sum", "value"),
            "max_value_raw": ("max", "value"),
        },
    )
    return out.select(
        "event_type",
        "n_events",
        F.round("sum_value_raw", 2).alias("sum_value"),
        F.round("max_value_raw", 6).alias("max_value"),
    )


@query(
    "salted_join_revenue",
    oracle="""
    SELECT c.c_mktsegment, count(*)::BIGINT AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Skew-safe equi-join (salted_join operator): big side salted "
    "deterministically, small side replicated 16x, join on (key, salt) "
    "— same rows as the plain join.",
)
def salted_join_revenue(spark, sf_dir):
    cust, orders = tables(spark, sf_dir, "customer", "orders")
    joined = salted_join(
        orders.withColumnRenamed("o_custkey", "custkey"),
        cust.withColumnRenamed("c_custkey", "custkey"),
        on="custkey",
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@query(
    "approx_distinct_sketch",
    oracle="""
    SELECT count(DISTINCT user_id)::BIGINT AS n_exact,
           TRUE AS within_3sigma
    FROM events
    """,
    doc="HyperLogLog approx_count_distinct with its accuracy contract "
    "as the differential check: the estimate is engine-specific, the "
    "error bound is not. rsd=0.05 is a ONE-standard-deviation "
    "relative error, not a hard bound — asserting <=1 sigma would "
    "spuriously red ~1/3 of datasets — so the contract is the "
    "3-sigma envelope (15%), which a correct sketch satisfies with "
    "~99.7% probability and a broken one does not. At 100 TB the "
    "sketch is mergeable partial state — no shuffle of distinct "
    "values.",
)
def approx_distinct_sketch(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    return events.agg(
        F.countDistinct("user_id").cast("long").alias("n_exact"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("__approx"),
    ).select(
        "n_exact",
        (
            F.abs(F.col("__approx") - F.col("n_exact"))
            <= 0.15 * F.col("n_exact")
        ).alias("within_3sigma"),
    )


@query(
    "approx_quantile_sketch",
    oracle="""
    SELECT round(quantile_cont(o_totalprice, 0.5), 2) AS p50_exact,
           TRUE AS p50_within_1pct
    FROM orders
    """,
    doc="percentile_approx (KLL-style mergeable quantile sketch) with "
    "its error contract differentially checked against the exact "
    "continuous quantile.",
)
def approx_quantile_sketch(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    return orders.agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("p50_exact"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("__approx"),
    ).select(
        "p50_exact",
        (
            F.abs(F.col("__approx") - F.col("p50_exact"))
            <= 0.01 * F.col("p50_exact")
        ).alias("p50_within_1pct"),
    )


@query(
    "grouping_sets_revenue",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           round(sum(l_extendedprice), 2) AS revenue,
           count(*)::BIGINT AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    doc="SQL GROUPING SETS through the spark.sql entry point (no "
    "DataFrame-API equivalent short of unioned aggs).",
)
def grouping_sets_revenue(spark, sf_dir):
    (li,) = tables(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("gs_lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               round(sum(l_extendedprice), 2) AS revenue,
               count(*) AS n_rows
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )
