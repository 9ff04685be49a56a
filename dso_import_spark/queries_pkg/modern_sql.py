"""Spark-4-native SQL surface: VARIANT semi-structured extraction, SQL
pipe syntax, width_bucket histograms, linear-regression aggregates, and
collation-aware grouping.

These extend the engine beyond the reference surface (SURVEY §2.10 —
the reference pushes raw SQL to Postgres, `bagh/batch.py:97-130`, and
has no JSON/stats/histogram functions at all) with the operations a
100 TB analytics engine is expected to expose natively:

- ``variant_json_events``: VARIANT is Spark 4's binary semi-structured
  type — ``parse_json`` once, ``variant_get`` many times. At scale this
  beats repeated ``get_json_object`` (which re-parses the string per
  extraction) because the parse cost is paid once per row and paths are
  evaluated over the binary encoding. The JSON document is synthesized
  identically in both engines so the differential check covers nested
  object and array-index path extraction exactly.
- ``sql_pipe_syntax``: the |> pipe dialect (Spark 4 / GoogleSQL) over
  the shared SQL entry point — scan → filter → join → aggregate → sort
  as a linear pipeline; proves the SQL front end accepts the modern
  dialect while Catalyst plans it identically to nested SELECTs.
- ``histogram_width_bucket``: equi-width bucketing entirely JVM-side;
  at 100 TB a histogram is one map (+bucket id) and one shuffle of
  n_buckets rows — the oracle hand-codes the same bucket arithmetic.
- ``regression_stats``: regr_slope/intercept/r2, corr, covar_samp,
  stddev_samp — single-pass partial-aggregatable moments (map-side
  combine shrinks 100 TB to a few doubles per group before shuffle).
- ``collated_dedup_groups``: UTF8_LCASE collation makes
  case-insensitive grouping a property of the comparison, not a
  rewrite; the oracle lowers explicitly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dso_import_spark.queries import query
from dso_import_spark.queries_pkg.util import tables

# ---------------------------------------------------------------------------
# VARIANT
# ---------------------------------------------------------------------------

# Build one JSON doc per event with nested object + array, using plain
# string concat so Spark and DuckDB synthesize byte-identical input.
_JSON_SYNTH_SQL = """
    '{"ids":[' || CAST(user_id AS VARCHAR) || ',' || CAST(event_id AS VARCHAR)
    || '],"meta":{"t":"' || event_type || '"},"k":'
    || CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS VARCHAR) || '}'
"""


@query(
    "variant_json_events",
    oracle=f"""
    WITH docs AS (
      SELECT event_id, {_JSON_SYNTH_SQL} AS js
      FROM events WHERE event_id % 13 = 0
    )
    SELECT event_id,
           CAST(json_extract(js, '$.ids[1]') AS BIGINT)  AS second_id,
           json_extract_string(js, '$.meta.t')           AS meta_type,
           CAST(json_extract(js, '$.k') AS BIGINT)       AS k_val,
           CAST(json_array_length(json_extract(js, '$.ids')) AS INT) AS n_ids
    FROM docs
    """,
    doc="Spark 4 VARIANT: parse_json once, variant_get nested-object and "
    "array-index paths from the binary encoding (vs the reference's "
    "string-typed props it never parses; extends core.json_extract_events).",
)
def variant_json_events(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    js = F.concat(
        F.lit('{"ids":['),
        F.col("user_id").cast("string"),
        F.lit(","),
        F.col("event_id").cast("string"),
        F.lit('],"meta":{"t":"'),
        F.col("event_type"),
        F.lit('"},"k":'),
        F.get_json_object("props", "$.k").cast("long").cast("string"),
        F.lit("}"),
    )
    v = F.parse_json(js)
    return (
        events.filter(F.col("event_id") % 13 == 0)
        .select(F.col("event_id"), v.alias("v"))
        .select(
            "event_id",
            F.variant_get("v", "$.ids[1]", "bigint").alias("second_id"),
            F.variant_get("v", "$.meta.t", "string").alias("meta_type"),
            F.variant_get("v", "$.k", "bigint").alias("k_val"),
            F.array_size(F.variant_get("v", "$.ids", "array<bigint>")).alias("n_ids"),
        )
    )


# ---------------------------------------------------------------------------
# SQL pipe syntax
# ---------------------------------------------------------------------------


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           count(*)                         AS n_orders,
           round(sum(o.o_totalprice), 2)    AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus = 'F'
    GROUP BY o.o_orderpriority
    """,
    doc="Spark 4 SQL pipe dialect (|>): linear scan→join→filter→aggregate "
    "pipeline; Catalyst plans it identically to the nested-SELECT form "
    "the oracle uses.",
)
def sql_pipe_syntax(spark, sf_dir):
    orders, customer = tables(spark, sf_dir, "orders", "customer")
    orders.createOrReplaceTempView("pipe_orders")
    customer.createOrReplaceTempView("pipe_customer")
    return spark.sql(
        """
        FROM pipe_orders AS o
        |> JOIN pipe_customer AS c ON o.o_custkey = c.c_custkey
        |> WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus = 'F'
        |> AGGREGATE count(*) AS n_orders,
                     round(sum(o.o_totalprice), 2) AS revenue
           GROUP BY o.o_orderpriority AS priority
        """
    )


# ---------------------------------------------------------------------------
# width_bucket histogram
# ---------------------------------------------------------------------------

_HIST_MIN, _HIST_MAX, _HIST_N = 0.0, 500000.0, 20


@query(
    "histogram_width_bucket",
    oracle=f"""
    SELECT CASE WHEN o_totalprice < {_HIST_MIN} THEN 0
                WHEN o_totalprice >= {_HIST_MAX} THEN {_HIST_N} + 1
                ELSE CAST(floor((o_totalprice - {_HIST_MIN})
                     / (({_HIST_MAX} - {_HIST_MIN}) / {_HIST_N})) AS BIGINT) + 1
           END                              AS bucket,
           count(*)                         AS n,
           round(sum(o_totalprice), 2)      AS total,
           round(min(o_totalprice), 2)      AS lo,
           round(max(o_totalprice), 2)      AS hi
    FROM orders GROUP BY 1
    """,
    doc="Equi-width histogram via width_bucket: one narrow map plus an "
    "n_buckets-row shuffle regardless of input size (100 TB-safe); the "
    "oracle hand-codes identical bucket arithmetic.",
)
def histogram_width_bucket(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    return (
        orders.select(
            F.width_bucket(
                "o_totalprice", F.lit(_HIST_MIN), F.lit(_HIST_MAX), F.lit(_HIST_N)
            ).alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# regression / correlation aggregates
# ---------------------------------------------------------------------------


@query(
    "regression_stats",
    oracle="""
    SELECT l_returnflag,
           count(*)                                               AS n,
           round(regr_slope(l_extendedprice, l_quantity), 4)      AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4)  AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6)         AS r2,
           round(corr(l_extendedprice, l_quantity), 6)            AS price_qty_corr,
           round(covar_samp(l_extendedprice, l_discount), 6)      AS price_disc_covar,
           round(stddev_samp(l_quantity), 6)                      AS qty_stddev
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Single-pass linear-regression/correlation moments per group: "
    "partial-aggregatable (map-side combine reduces 100 TB to a handful "
    "of doubles per group before the shuffle).",
)
def regression_stats(spark, sf_dir):
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("price_qty_corr"),
        F.round(F.covar_samp("l_extendedprice", "l_discount"), 6).alias(
            "price_disc_covar"
        ),
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
    )


# ---------------------------------------------------------------------------
# collation-aware grouping
# ---------------------------------------------------------------------------


@query(
    "collated_dedup_groups",
    oracle="""
    WITH mangled AS (
      SELECT p_partkey,
             CASE WHEN p_partkey % 2 = 0 THEN upper(p_brand)
                  ELSE lower(p_brand) END AS brand_mixed
      FROM part
    )
    SELECT min(brand_mixed) AS brand_rep,
           count(*)         AS n,
           count(DISTINCT brand_mixed) AS n_variants
    FROM mangled GROUP BY lower(brand_mixed)
    """,
    doc="Spark 4 collations: UTF8_LCASE makes case-insensitive grouping a "
    "property of the comparison (no lower() rewrite, sort keys stay "
    "binary-comparable); oracle lowers explicitly.",
)
def collated_dedup_groups(spark, sf_dir):
    (part,) = tables(spark, sf_dir, "part")
    mixed = F.when(
        F.col("p_partkey") % 2 == 0, F.upper("p_brand")
    ).otherwise(F.lower("p_brand"))
    mangled = part.select("p_partkey", mixed.alias("brand_mixed"))
    return mangled.groupBy(
        F.collate(F.col("brand_mixed"), "UTF8_LCASE").alias("_key")
    ).agg(
        F.min(F.col("brand_mixed").cast("string")).alias("brand_rep"),
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col("brand_mixed").cast("string")).alias("n_variants"),
    ).drop("_key")


@query(
    "recursive_cte_chain",
    oracle="""
    WITH RECURSIVE chain AS (
      SELECT c_custkey, c_acctbal, 0 AS depth
      FROM customer WHERE c_custkey % 10 = 1
      UNION ALL
      SELECT c.c_custkey, c.c_acctbal, ch.depth + 1
      FROM customer c JOIN chain ch ON c.c_custkey = ch.c_custkey + 1
      WHERE c.c_custkey % 10 <> 1
    )
    SELECT depth,
           count(*)::BIGINT         AS n,
           round(sum(c_acctbal), 2) AS total_bal,
           min(c_custkey)           AS min_key
    FROM chain GROUP BY depth ORDER BY depth
    """,
    doc="Spark 4 recursive CTE (WITH RECURSIVE): iterative traversal "
    "of a parent chain (custkey k hangs under k-1 except at the "
    "mod-10 roots) entirely inside SQL — depth labeling per node, "
    "aggregated per level. Each recursion step is one join of the "
    "frontier against the base relation; the frontier relation is "
    "what shuffles, never the accumulated result, and the recursion "
    "depth (10 here) bounds the plan. Before Spark 4 this took a "
    "driver-side loop (the components operator's shape); the CTE "
    "form keeps the whole iteration in Catalyst. Oracle is the "
    "identical recursive SQL in DuckDB.",
)
def recursive_cte_chain(spark, sf_dir):
    (customer,) = tables(spark, sf_dir, "customer")
    customer.createOrReplaceTempView("__rc_customer")
    return spark.sql("""
    WITH RECURSIVE chain AS (
      SELECT c_custkey, c_acctbal, 0 AS depth
      FROM __rc_customer WHERE c_custkey % 10 = 1
      UNION ALL
      SELECT c.c_custkey, c.c_acctbal, ch.depth + 1
      FROM __rc_customer c JOIN chain ch ON c.c_custkey = ch.c_custkey + 1
      WHERE c.c_custkey % 10 <> 1
    )
    SELECT depth,
           count(*)          AS n,
           round(sum(c_acctbal), 2) AS total_bal,
           min(c_custkey)    AS min_key
    FROM chain GROUP BY depth ORDER BY depth
    """)


@query(
    "listagg_order_sequences",
    oracle="""
    SELECT o_custkey,
           string_agg(substr(o_orderpriority, 1, 1), ''
                      ORDER BY o_orderdate, o_orderkey) AS priority_seq,
           count(*)::BIGINT AS n_orders
    FROM orders
    WHERE o_custkey % 100 = 0
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
    doc="Spark 4 listagg (SQL:2016 string aggregation): each sampled "
    "customer's order-priority initials concatenated in "
    "(orderdate, orderkey) order — the behavioral-sequence feature "
    "(clickstream-style) an ML pipeline derives before tokenization. "
    "WITHIN GROUP (ORDER BY ...) makes the concatenation "
    "deterministic across partitions: Spark sorts within each group "
    "during the final aggregate, so the one shuffle is the group-by "
    "itself. DuckDB's string_agg with ORDER BY is the oracle.",
)
def listagg_order_sequences(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    orders.where(F.col("o_custkey") % 100 == 0).createOrReplaceTempView(
        "__la_orders"
    )
    return spark.sql("""
    SELECT o_custkey,
           listagg(substr(o_orderpriority, 1, 1), '')
             WITHIN GROUP (ORDER BY o_orderdate, o_orderkey) AS priority_seq,
           count(*) AS n_orders
    FROM __la_orders
    GROUP BY o_custkey
    ORDER BY o_custkey
    """)
