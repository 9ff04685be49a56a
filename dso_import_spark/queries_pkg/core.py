"""Core relational operator queries (SURVEY.md §2.10 native-Spark surface).

Scans, aggregations, joins (inner/semi/anti), set ops, rollup/cube,
pivot, percentile, range join, JSON extraction — the query surface the
reference lacks but our engine provides natively via Catalyst.

Scale notes: every query here is pure DataFrame/SQL — filters and
projections push to the parquet scan; small sides (region, nation,
supplier, band literals) broadcast; aggregations get map-side partial
aggregation. No Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dso_import_spark.queries import query
from dso_import_spark.queries_pkg.util import tables


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: scan → filter → hash agg.",
)
def q01_pricing_summary(spark, sf_dir):
    (li,) = tables(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q03_top_revenue_orders",
    oracle="""
    SELECT o_orderkey, revenue, o_orderdate
    FROM (
      SELECT o.o_orderkey,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
             CAST(o.o_orderdate AS DATE)                           AS o_orderdate,
             row_number() OVER (
               ORDER BY round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) DESC,
                        o.o_orderkey
             ) AS rn
      FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
      GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
    ) WHERE rn <= 10
    """,
    doc="TPC-H Q3-style: 3-way join → agg → deterministic top-10.",
)
def q03_top_revenue_orders(spark, sf_dir):
    cust, orders, li = tables(spark, sf_dir, "customer", "orders", "lineitem")
    agg = (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("o_orderdate"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    # global top-k via TakeOrderedAndProject (per-partition heaps +
    # driver merge of k rows) — never a single-partition Window
    return (
        agg.orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "revenue", "o_orderdate")
    )


@query(
    "q05_nation_revenue",
    oracle="""
    SELECT r.r_name, n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    doc="TPC-H Q5-style 6-table join; nation/region/supplier broadcast.",
)
def q05_nation_revenue(spark, sf_dir):
    cust, orders, li, supp, nation, region = tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            supp,
            (supp.s_suppkey == li.l_suppkey) & (supp.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nation), nation.n_nationkey == cust.c_nationkey)
        .join(F.broadcast(region), region.r_regionkey == nation.n_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "q06_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 10
    """,
    doc="TPC-H Q6-style: scan with pushed predicate → scalar agg.",
)
def q06_forecast_revenue(spark, sf_dir):
    (li,) = tables(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 10)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "conditional_agg_pivot",
    oracle="""
    SELECT o_orderpriority,
           count(*)                                              AS n_orders,
           sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS n_f,
           sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS n_o,
           sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS n_p,
           round(avg(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 4) AS avg_f_price
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Conditional aggregation (manual pivot) over order status.",
)
def conditional_agg_pivot(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    flag = lambda s: F.sum(F.when(F.col("o_orderstatus") == s, 1).otherwise(0)).cast(
        "long"
    )
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        flag("F").alias("n_f"),
        flag("O").alias("n_o"),
        flag("P").alias("n_p"),
        F.round(
            F.avg(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))), 4
        ).alias("avg_f_price"),
    )


@query(
    "distinct_agg",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Multiple count-distinct in one aggregation (expand-based plan).",
)
def distinct_agg(spark, sf_dir):
    (li,) = tables(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@query(
    "semi_join_big_spenders",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n_custs
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    GROUP BY c.c_mktsegment
    """,
    doc="EXISTS → left_semi join (J1 shape on TPC-H data).",
)
def semi_join_big_spenders(spark, sf_dir):
    cust, orders = tables(spark, sf_dir, "customer", "orders")
    big = orders.filter(F.col("o_totalprice") > 300000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_custs"))
    )


@query(
    "anti_join_no_orders",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n_custs
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= DATE '1998-01-01')
    GROUP BY c.c_mktsegment
    """,
    doc="NOT EXISTS → left_anti join (J4/J5 shape). The anti side is "
    "bounded to recent orders: against the full table every fixture "
    "customer has an order and the result is empty — a zero-row "
    "differential check certifies nothing, so the date bound keeps "
    "real rows flowing through the anti join (8 lapsed customers at "
    "sf0.01).",
)
def anti_join_no_orders(spark, sf_dir):
    cust, orders = tables(spark, sf_dir, "customer", "orders")
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("date")
    )
    return (
        cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_custs"))
    )


@query(
    "set_ops_nations",
    oracle="""
    SELECT 'cust_only' AS which, n_nationkey
    FROM (SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
          EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'both' AS which, n_nationkey
    FROM (SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
          INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
    """,
    doc="EXCEPT / INTERSECT / UNION ALL set operations.",
)
def set_ops_nations(spark, sf_dir):
    cust, supp = tables(spark, sf_dir, "customer", "supplier")
    c = cust.select(F.col("c_nationkey").alias("n_nationkey")).distinct()
    s = supp.select(F.col("s_nationkey").alias("n_nationkey")).distinct()
    # subtract = distinct EXCEPT, matching the oracle exactly;
    # exceptAll only coincided because c is built with .distinct()
    cust_only = c.subtract(s).withColumn("which", F.lit("cust_only"))
    both = c.intersect(s).withColumn("which", F.lit("both"))
    return cust_only.unionByName(both).select("which", "n_nationkey")


@query(
    "rollup_lineitem",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag)::INT * 2 + grouping(l_linestatus)::INT AS gid,
           count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP with grouping id disambiguating the NULL subtotal rows.",
)
def rollup_lineitem(spark, sf_dir):
    (li,) = tables(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@query(
    "cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           grouping(o_orderstatus)::INT * 2 + grouping(o_orderpriority)::INT AS gid,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over two dimensions with grouping id.",
)
def cube_orders(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@query(
    "pivot_returnflag",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Pivot on linestatus (explicit value list → no extra pass).",
)
def pivot_returnflag(spark, sf_dir):
    (li,) = tables(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return piv.select("l_returnflag", F.col("F"), F.col("O"))


@query(
    "percentile_quantity",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4) AS p50,
           round(quantile_cont(l_quantity, 0.9), 4) AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS price_p99
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact interpolated percentiles (matches quantile_cont).",
)
def percentile_quantity(spark, sf_dir):
    (li,) = tables(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("price_p99"),
    )


@query(
    "range_join_price_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('budget', 0.0, 500.0), ('mid', 500.0, 1200.0),
             ('high', 1200.0, 1700.0), ('lux', 1700.0, 100000.0)
    )
    SELECT b.band, count(*) AS n_parts, round(avg(p.p_retailprice), 4) AS avg_price
    FROM part p JOIN bands b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band
    """,
    doc="Range (non-equi) join against a broadcast literal band table.",
)
def range_join_price_bands(spark, sf_dir):
    (part,) = tables(spark, sf_dir, "part")
    # single-slice parallelize: default createDataFrame splits 4 rows
    # into defaultParallelism pickled partitions and the broadcast
    # build pays one Python-worker round-trip per partition (round 13)
    bands = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [
                ("budget", 0.0, 500.0),
                ("mid", 500.0, 1200.0),
                ("high", 1200.0, 1700.0),
                ("lux", 1700.0, 100000.0),
            ],
            1,
        ),
        "band string, lo double, hi double",
    )
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
    )


@query(
    "json_extract_events",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
    FROM events GROUP BY event_type
    """,
    doc="JSON scalar extraction from the events.props string column.",
)
def json_extract_events(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
    )


@query(
    "string_math_funcs",
    oracle="""
    SELECT p_partkey,
           upper(substr(p_name, 1, 8))            AS name8,
           length(p_name)                         AS name_len,
           round(sqrt(p_retailprice), 6)          AS price_sqrt,
           round(ln(p_retailprice + 1), 6)        AS price_ln,
           p_partkey % 7                          AS key_mod,
           abs(p_size - 25)::BIGINT               AS size_dev,
           concat(p_brand, '#', p_type)           AS brand_type
    FROM part WHERE p_partkey % 10 = 0
    """,
    doc="Scalar string/math function surface in one projection.",
)
def string_math_funcs(spark, sf_dir):
    (part,) = tables(spark, sf_dir, "part")
    return part.filter(F.col("p_partkey") % 10 == 0).select(
        "p_partkey",
        F.upper(F.substring("p_name", 1, 8)).alias("name8"),
        F.length("p_name").cast("long").alias("name_len"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("p_retailprice") + 1), 6).alias("price_ln"),
        (F.col("p_partkey") % 7).alias("key_mod"),
        F.abs(F.col("p_size") - 25).cast("long").alias("size_dev"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
    )


@query(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4-style: EXISTS decorrelated to a left-semi join with a "
    "non-equi residual predicate.",
)
def q04_order_priority(spark, sf_dir):
    orders, li = tables(spark, sf_dir, "orders", "lineitem")
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_limit
          FROM lineitem GROUP BY l_partkey) t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < t.qty_limit
    """,
    doc="TPC-H Q17-style: correlated scalar subquery decorrelated to a "
    "per-part aggregate joined back (broadcast both small sides).",
)
def q17_small_quantity_revenue(spark, sf_dir):
    li, part = tables(spark, sf_dir, "lineitem", "part")
    brand = part.filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    # restrict lineitem to the brand's parts BEFORE the per-part avg:
    # the per-partkey limit is unchanged (avg is per part), but the
    # aggregate shrinks from |part| to |brand parts| rows. No forced
    # broadcast on limits — its cardinality grows with the part table,
    # so the size estimate (AQE) must pick the strategy at scale.
    li_brand = li.join(brand, li.l_partkey == brand.p_partkey)
    limits = li_brand.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("qty_limit")
    )
    return (
        li_brand.join(limits, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c.c_name, o.o_orderkey, round(o.o_totalprice, 2) AS o_totalprice,
           round(t.sum_qty, 2) AS sum_qty
    FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300) t
    JOIN orders o   ON o.o_orderkey = t.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    doc="TPC-H Q18-style: group-having as the build side of the join "
    "(aggregate before join shrinks the shuffle).",
)
def q18_large_orders(spark, sf_dir):
    cust, orders, li = tables(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty_raw"))
        .filter(F.col("sum_qty_raw") > 300)
    )
    return (
        big.join(orders, orders.o_orderkey == big.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("sum_qty_raw", 2).alias("sum_qty"),
        )
    )


@query(
    "decimal_money_totals",
    oracle="""
    SELECT o_orderpriority,
           count(*)::BIGINT AS n_orders,
           sum(CAST(o_totalprice AS DECIMAL(18, 2))) AS total_price,
           max(CAST(o_totalprice AS DECIMAL(18, 2))) AS max_price
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="Exact DECIMAL money aggregation: order totals cast to "
    "DECIMAL(18,2) before summing, so the result is EXACT and "
    "independent of partitioning/summation order — the correctness "
    "property double aggregation cannot give (cross-engine double "
    "sums differ in the last ulp and can flip a rounded cent; see "
    "the rfm_segmentation integer-cent workaround). Spark sums "
    "decimals in a widened unscaled long/int128 accumulator with "
    "map-side partials — same plan shape as a double sum, exact "
    "semantics; this query needs NO round() on either side, which "
    "is itself the point.",
)
def decimal_money_totals(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    money = F.col("o_totalprice").cast("decimal(18,2)")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(money).alias("total_price"),
            F.max(money).alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )
