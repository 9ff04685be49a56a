"""Advanced scale operators: Bloom-join pruning, market-basket
affinity, fuzzy record linkage, PageRank, incremental aggregate
maintenance, feature scaling, and NOT IN null semantics.

None of these exist in the reference (a Postgres loader has no reason
to own them) — they are the operations a 100 TB lakehouse adds on top
of the reference's relational surface, each expressed so Catalyst
keeps the hot path JVM-side and the shuffles bounded. Every query
carries a DuckDB oracle; where the operator is approximate or
iterative, the oracle reproduces the exact same arithmetic (the
ivf_kmeans_train precedent) or checks the exactness guarantee (the
bloom no-false-negative contract).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from dso_import_spark.operators.bloom import bloom_pruned_join
from dso_import_spark.operators.maintenance import merge_agg_partials
from dso_import_spark.queries import query
from dso_import_spark.queries_pkg.util import tables


# --------------------------------------------------------------------
# Bloom-filter join pruning
# --------------------------------------------------------------------

@query(
    "bloom_join_prune",
    oracle="""
    SELECT c.c_nationkey                      AS nation,
           count(*)::BIGINT                   AS n_events,
           round(sum(e.value), 2)             AS total_value
    FROM events e
    JOIN (SELECT * FROM customer
          WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 5000) c
      ON e.user_id = c.c_custkey
    GROUP BY c.c_nationkey
    """,
    doc="Bloom-filter join pruning (operators/bloom.py): the build "
    "side's keys are folded into an m-bit bitmap (m/64 longs — "
    "broadcast state bounded by filter geometry, NOT build "
    "cardinality), the probe side drops non-matching rows map-side "
    "via pure bit arithmetic BEFORE any exchange, then the exact join "
    "runs on survivors. No false negatives, so the result is "
    "row-identical to the plain join the oracle runs — the pruning is "
    "plan-level only, which is exactly the differential contract. At "
    "100 TB this is the explicit form of Spark's runtime bloom "
    "filters: shuffle only might-match probe rows.",
)
def bloom_join_prune(spark, sf_dir):
    events, customer = tables(spark, sf_dir, "events", "customer")
    build = customer.where(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 5000)
    )
    joined = bloom_pruned_join(events, build, "user_id", "c_custkey")
    return joined.groupBy(F.col("c_nationkey").alias("nation")).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


# --------------------------------------------------------------------
# Market-basket pair affinity (co-occurrence mining)
# --------------------------------------------------------------------

def _copurchase_pairs(li):
    """Distinct (order, part) items self-joined on the basket key with
    part_a < part_b — the within-basket pair relation shared by
    basket_pair_affinity and triangle_count_parts (a basket-size cap,
    the production skew guard, would go here once for both)."""
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("part_a"),
        F.col("b.l_partkey").alias("part_b"),
    )



@query(
    "basket_pair_affinity",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT part_a, part_b, count(*)::BIGINT AS n_orders
    FROM pairs
    GROUP BY part_a, part_b
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 20
    """,
    doc="Market-basket pair co-occurrence (the A-priori candidate "
    "step): distinct (order, part) items self-join on the order key "
    "so parts only ever pair WITHIN a basket — the pair space is "
    "sum-over-orders of C(basket_size, 2), bounded by basket width "
    "(max 13 items in the fixture), never |parts|^2. One shuffle on "
    "the order key, one count agg, TakeOrdered top-20 with full "
    "deterministic tie-break. At 100 TB a runaway basket (one order "
    "with 10^5 items) is the skew risk — production caps basket size "
    "before pairing, same discipline as the dedup tiers' block caps.",
)
def basket_pair_affinity(spark, sf_dir):
    (li,) = tables(spark, sf_dir, "lineitem")
    pairs = _copurchase_pairs(li)
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(20)
    )


# --------------------------------------------------------------------
# Fuzzy record linkage: blocking + edit distance
# --------------------------------------------------------------------

@query(
    "record_linkage_fuzzy",
    oracle="""
    WITH blocked AS (
      SELECT p_partkey, p_name,
             split_part(p_name, ' ', 1) || '|' || p_size AS blk
      FROM part
    ),
    cand AS (
      SELECT a.blk,
             levenshtein(a.p_name, b.p_name) AS d
      FROM blocked a JOIN blocked b
        ON a.blk = b.blk AND a.p_partkey < b.p_partkey
    )
    SELECT split_part(blk, '|', 1) AS word_block,
           count(*)::BIGINT                       AS n_candidates,
           sum(CASE WHEN d <= 3 THEN 1 ELSE 0 END)::BIGINT AS n_matches,
           round(avg(d), 4)                       AS avg_distance
    FROM cand
    GROUP BY 1
    ORDER BY 1
    """,
    doc="Fuzzy record linkage with COMPOSITE blocking: candidate "
    "pairs form only inside a (first name token, size) block, then "
    "Levenshtein edit distance scores each candidate — the classic "
    "entity-resolution shape where blocking turns O(n^2) comparisons "
    "into sum-over-blocks of C(block,2), and a second blocking "
    "attribute is THE lever when one key leaves hot blocks (the "
    "single-token blocks here are 12.5% of the table each; adding "
    "the size attribute cuts candidate volume ~50x, and the same "
    "move re-splits any hot block at 100 TB). Spark's levenshtein "
    "and DuckDB's are the same textbook DP, so per-pair distances "
    "match exactly. One shuffle on the composite block key.",
)
def record_linkage_fuzzy(spark, sf_dir):
    (part,) = tables(spark, sf_dir, "part")
    blocked = part.select(
        "p_partkey",
        "p_name",
        F.concat(
            F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)),
            F.lit("|"),
            F.col("p_size").cast("string"),
        ).alias("blk"),
    )
    a = blocked.alias("a")
    b = blocked.alias("b")
    cand = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey")),
    ).select(
        F.col("a.blk").alias("blk"),
        F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("d"),
    )
    return (
        cand.groupBy(
            F.split_part(F.col("blk"), F.lit("|"), F.lit(1)).alias("word_block")
        )
        .agg(
            F.count("*").alias("n_candidates"),
            F.sum(F.when(F.col("d") <= 3, 1).otherwise(0)).alias("n_matches"),
            F.round(F.avg("d"), 4).alias("avg_distance"),
        )
        .orderBy("word_block")
    )


# --------------------------------------------------------------------
# PageRank over the supplier -> customer shipment graph
# --------------------------------------------------------------------

_PR_D = 0.85
_PR_ITERS = 3


def _pagerank_oracle() -> str:
    """Unrolled 3-iteration PageRank CTE (the ivf_kmeans_train
    precedent: fixed iteration count unrolls to plain SQL)."""
    header = f"""
    WITH edges AS (
      SELECT DISTINCT 's' || l_suppkey AS src, 'c' || o_custkey AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ),
    n AS (SELECT count(*)::DOUBLE AS n FROM nodes),
    outdeg AS (
      SELECT src, count(*)::DOUBLE AS deg FROM edges GROUP BY src
    ),
    r0 AS (SELECT node, 1.0 / n.n AS rank FROM nodes, n)
    """
    body = ""
    for i in range(1, _PR_ITERS + 1):
        prev = f"r{i - 1}"
        body += f""",
    inc{i} AS (
      SELECT e.dst AS node, sum(p.rank / d.deg) AS mass
      FROM edges e
      JOIN {prev} p ON p.node = e.src
      JOIN outdeg d ON d.src = e.src
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT nd.node,
             (1 - {_PR_D}) / (SELECT n FROM n)
             + {_PR_D} * COALESCE(inc{i}.mass, 0) AS rank
      FROM nodes nd LEFT JOIN inc{i} ON nd.node = inc{i}.node
    )"""
    tail = f"""
    SELECT node, round(rank, 9) AS rank
    FROM r{_PR_ITERS}
    ORDER BY rank DESC, node
    LIMIT 20
    """
    return header + body + tail


@query(
    "pagerank_shipments",
    oracle=_pagerank_oracle(),
    doc="PageRank (damping 0.85, 3 fixed iterations, dangling mass "
    "dropped) over the supplier->customer shipment graph derived from "
    "lineitem x orders. Each iteration is the standard distributed "
    "formulation: edges join current ranks on src (rank relation is "
    "node-cardinality — the small side), contributions aggregate on "
    "dst, one shuffle pair per iteration with lineage bounded by the "
    "fixed iteration count (the components loop's localCheckpoint "
    "discipline applies beyond ~10 iters). The oracle unrolls all "
    "three iterations as CTEs with identical init and dangling "
    "handling; ranks rounded to 9 decimals on both engines.",
)
def pagerank_shipments(spark, sf_dir):
    li, orders = tables(spark, sf_dir, "lineitem", "orders")
    # localCheckpoint truncates lineage once up front: without it every
    # iteration's DAG re-derives edges from the raw join (measured 44
    # re-scans of lineitem/orders for 3 iterations) — the same
    # discipline as operators/dedup.py:connected_components.
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = edges.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
    n_nodes = nodes.agg(F.count("*").cast("double").alias("n"))

    # rank and outdeg scale WITH the node set, so no forced broadcast:
    # at fixture scale AQE broadcasts them anyway (runtime stats), and
    # at 1e9-node scale the rank<->edge join must become a shuffle join
    # co-partitioned on src — the standard distributed-PageRank shape —
    # instead of OOMing on a hinted build side.
    ranks = nodes.crossJoin(broadcast(n_nodes)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    edges_deg = edges.join(outdeg, "src").localCheckpoint(
        eager=True
    )
    for _ in range(_PR_ITERS):
        inc = (
            edges_deg.join(
                ranks.withColumnRenamed("node", "src"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("mass"))
        )
        ranks = (
            nodes.join(inc, "node", "left")
            .crossJoin(broadcast(n_nodes))
            .select(
                "node",
                (
                    (1 - _PR_D) / F.col("n")
                    + _PR_D * F.coalesce(F.col("mass"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)  # flat plan per iteration
        )
    return (
        ranks.select("node", F.round("rank", 9).alias("rank"))
        .orderBy(F.desc("rank"), "node")
        .limit(20)
    )


# --------------------------------------------------------------------
# Incremental aggregate maintenance (materialized-view refresh)
# --------------------------------------------------------------------

@query(
    "incremental_agg_refresh",
    oracle="""
    SELECT event_type,
           count(*)::BIGINT        AS n_events,
           round(sum(value), 4)    AS total_value,
           round(min(value), 4)    AS min_value,
           round(max(value), 4)    AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Incremental aggregate maintenance (operators/maintenance.py:"
    "merge_agg_partials): history (event_id % 7 != 0) is pre-"
    "aggregated into a key-cardinality-sized base table; the delta "
    "batch (event_id % 7 = 0) is aggregated alone and FOLDED into the "
    "base by combining algebraic partials (sum+=sum, count+=count, "
    "min/max=min/max) — refresh cost scales with |delta| + |keys|, "
    "never |history|. The oracle aggregates the full table directly: "
    "partial-combine must equal recompute exactly (floats rounded "
    "after the final combine only). The batch form of the streaming "
    "path's keyed state, and the nightly materialized-view loop at "
    "100 TB.",
)
def incremental_agg_refresh(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    metrics = {
        # count_star == the oracle's count(*): rows, not non-null values
        "n_events": ("value", "count_star"),
        "total_value": ("value", "sum"),
        "min_value": ("value", "min"),
        "max_value": ("value", "max"),
    }
    history = events.where(F.col("event_id") % 7 != 0)
    delta = events.where(F.col("event_id") % 7 == 0)
    base = history.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    refreshed = merge_agg_partials(base, delta, ["event_type"], metrics)
    return refreshed.select(
        "event_type",
        "n_events",
        F.round("total_value", 4).alias("total_value"),
        F.round("min_value", 4).alias("min_value"),
        F.round("max_value", 4).alias("max_value"),
    ).orderBy("event_type")


# --------------------------------------------------------------------
# Feature scaling (per-group standardization for training prep)
# --------------------------------------------------------------------

@query(
    "feature_scale_normalize",
    oracle="""
    WITH stats AS (
      SELECT lang,
             avg(n_chars)                AS mu,
             stddev_samp(n_chars)        AS sigma,
             min(n_chars)                AS lo,
             max(n_chars)                AS hi
      FROM documents GROUP BY lang
    )
    SELECT d.doc_id,
           d.lang,
           round((d.n_chars - s.mu) / s.sigma, 6)                  AS zscore,
           round((d.n_chars - s.lo) / (s.hi - s.lo)::DOUBLE, 6)    AS minmax
    FROM documents d JOIN stats s ON d.lang = s.lang
    WHERE d.doc_id % 37 = 0
    ORDER BY d.doc_id
    """,
    doc="Per-group feature scaling for training prep: z-score and "
    "min-max normalization of document length within each language. "
    "Group statistics are ONE map-side-combined aggregation reduced "
    "to |groups| rows, broadcast back onto the full table — the "
    "normalize step is a narrow map, so the whole transform costs one "
    "tiny shuffle regardless of corpus size. The sampled output "
    "(doc_id % 37) keeps the differential row set small while every "
    "statistic still aggregates over the full table.",
)
def feature_scale_normalize(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    stats = docs.groupBy("lang").agg(
        F.avg("n_chars").alias("mu"),
        F.stddev_samp("n_chars").alias("sigma"),
        F.min("n_chars").alias("lo"),
        F.max("n_chars").alias("hi"),
    )
    return (
        docs.join(broadcast(stats), "lang")
        .where(F.col("doc_id") % 37 == 0)
        .select(
            "doc_id",
            "lang",
            # try_divide: a single-doc (or constant-length) stratum has
            # sigma = 0 / hi == lo; ANSI Spark would throw on /0 where
            # the oracle yields NULL — try_divide matches the oracle
            F.round(
                F.try_divide(F.col("n_chars") - F.col("mu"), F.col("sigma")), 6
            ).alias("zscore"),
            F.round(
                F.try_divide(
                    (F.col("n_chars") - F.col("lo")).cast("double"),
                    (F.col("hi") - F.col("lo")).cast("double"),
                ),
                6,
            ).alias("minmax"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------
# NOT IN vs NOT EXISTS null semantics
# --------------------------------------------------------------------

@query(
    "notin_null_semantics",
    oracle="""
    WITH sub AS (
      SELECT CASE WHEN c_custkey % 50 = 0 THEN NULL ELSE c_custkey END AS k
      FROM customer WHERE c_custkey <= 200
    )
    SELECT
      (SELECT count(*) FROM events WHERE user_id IN (SELECT k FROM sub))::BIGINT
        AS n_in,
      (SELECT count(*) FROM events WHERE user_id NOT IN (SELECT k FROM sub))::BIGINT
        AS n_not_in,
      (SELECT count(*) FROM events e
        WHERE NOT EXISTS (SELECT 1 FROM sub WHERE sub.k = e.user_id))::BIGINT
        AS n_not_exists
    """,
    doc="Three-valued-logic contract of NOT IN vs NOT EXISTS when the "
    "subquery contains a NULL: NOT IN compares via UNKNOWN and keeps "
    "ZERO rows, NOT EXISTS ignores the NULL and keeps the true "
    "complement — the classic silent-wrong-answer trap in dedup/"
    "exclusion pipelines. Spark plans the NOT IN as a null-aware anti "
    "join (BroadcastNestedLoopJoin — exactly why production pipelines "
    "prefer NOT EXISTS at scale, which stays a hash anti join); both "
    "engines must agree on all three counts.",
)
def notin_null_semantics(spark, sf_dir):
    events, customer = tables(spark, sf_dir, "events", "customer")
    events.createOrReplaceTempView("__nn_events")
    customer.createOrReplaceTempView("__nn_customer")
    return events.sparkSession.sql(
        """
        WITH sub AS (
          SELECT CASE WHEN c_custkey % 50 = 0 THEN NULL ELSE c_custkey END AS k
          FROM __nn_customer WHERE c_custkey <= 200
        )
        SELECT
          (SELECT count(*) FROM __nn_events WHERE user_id IN (SELECT k FROM sub))
            AS n_in,
          (SELECT count(*) FROM __nn_events WHERE user_id NOT IN (SELECT k FROM sub))
            AS n_not_in,
          (SELECT count(*) FROM __nn_events e
            WHERE NOT EXISTS (SELECT 1 FROM sub WHERE sub.k = e.user_id))
            AS n_not_exists
        """
    )


# --------------------------------------------------------------------
# EWMA via fixed-lag composition
# --------------------------------------------------------------------

_EWMA_ALPHA = 0.5
_EWMA_K = 5


@query(
    "ewma_fixed_lags",
    oracle=f"""
    WITH w AS (
      SELECT event_id, user_id, value,
             lag(value, 1) OVER win AS l1,
             lag(value, 2) OVER win AS l2,
             lag(value, 3) OVER win AS l3,
             lag(value, 4) OVER win AS l4
      FROM events
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id,
           round((0.5*value
                  + 0.25*COALESCE(l1, 0) + 0.125*COALESCE(l2, 0)
                  + 0.0625*COALESCE(l3, 0) + 0.03125*COALESCE(l4, 0))
                 / (0.5
                    + CASE WHEN l1 IS NULL THEN 0 ELSE 0.25 END
                    + CASE WHEN l2 IS NULL THEN 0 ELSE 0.125 END
                    + CASE WHEN l3 IS NULL THEN 0 ELSE 0.0625 END
                    + CASE WHEN l4 IS NULL THEN 0 ELSE 0.03125 END), 6)
             AS ewma
    FROM w
    WHERE event_id % 101 = 0
    ORDER BY event_id
    """,
    doc="Exponentially-weighted moving average over the trailing "
    "K=5 events per user (alpha=0.5), expressed as a FIXED-LAG "
    "composition: EWMA's recursive definition doesn't fit a plain "
    "window aggregate (weights depend on offset), but truncating to K "
    "lags turns it into K lag() columns with literal weights, "
    "renormalized over the lags that exist near series start — ONE "
    "window shuffle on the user key, pure codegen arithmetic after. "
    "The full-history recursive form needs applyInPandas per key; the "
    "truncated form loses under alpha*(1-alpha)^K = 1.6% of weight "
    "mass and scales as a plain window. Sampled output; the window "
    "runs over the full series.",
)
def ewma_fixed_lags(spark, sf_dir):
    from pyspark.sql import Window

    (events,) = tables(spark, sf_dir, "events")
    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    weights = [
        _EWMA_ALPHA * (1 - _EWMA_ALPHA) ** j for j in range(_EWMA_K)
    ]
    lag_cols = [F.lag("value", j).over(win) for j in range(1, _EWMA_K)]
    # the lag-0 term is NOT coalesced: a NULL current value must yield
    # a NULL ewma (as the oracle's 0.5*value propagates), while missing
    # *history* near series start renormalizes over the lags that exist
    num = F.col("value") * weights[0] + sum(
        (F.coalesce(c, F.lit(0.0)) * w for c, w in zip(lag_cols, weights[1:])),
        F.lit(0.0),
    )
    den = F.lit(weights[0]) + sum(
        (
            F.when(c.isNull(), 0.0).otherwise(w)
            for c, w in zip(lag_cols, weights[1:])
        ),
        F.lit(0.0),
    )
    return (
        events.select(
            "event_id", "user_id", F.round(num / den, 6).alias("ewma")
        )
        .where(F.col("event_id") % 101 == 0)
        .orderBy("event_id")
    )


# --------------------------------------------------------------------
# Distribution drift: population stability index between periods
# --------------------------------------------------------------------

_PSI_SPLIT = "2024-01-16"
_PSI_EPS = 1e-6


@query(
    "drift_psi_periods",
    oracle=f"""
    WITH bucketed AS (
      SELECT event_type,
             least(CAST(floor(value / 50) AS INT), 9) AS bucket,
             CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}' THEN 1 ELSE 0 END AS is_ref
      FROM events
    ),
    cell AS (
      SELECT event_type, bucket,
             sum(is_ref) AS n_ref, sum(1 - is_ref) AS n_cur
      FROM bucketed GROUP BY event_type, bucket
    ),
    tot AS (
      SELECT event_type, sum(n_ref) AS t_ref, sum(n_cur) AS t_cur
      FROM cell GROUP BY event_type
    )
    SELECT c.event_type,
           round(sum(
             ((c.n_ref / t.t_ref + {_PSI_EPS}) - (c.n_cur / t.t_cur + {_PSI_EPS}))
             * ln((c.n_ref / t.t_ref + {_PSI_EPS}) / (c.n_cur / t.t_cur + {_PSI_EPS}))
           ), 6) AS psi,
           sum(c.n_ref)::BIGINT AS n_ref,
           sum(c.n_cur)::BIGINT AS n_cur
    FROM cell c JOIN tot t ON c.event_type = t.event_type
    GROUP BY c.event_type
    ORDER BY c.event_type
    """,
    doc="Data-drift detection via the population stability index: "
    "fixed-edge value buckets (10 x width-50, the training-time bin "
    "spec), per-bucket shares in a reference period vs the current "
    "period, PSI = sum (p-q) ln(p/q) with epsilon smoothing. ONE pass "
    "over the events builds every (type, bucket, period) cell count "
    "map-side; the PSI combine runs over |types| x 10 cells — "
    "monitoring 100 TB costs one scan and a constant-size reduce, "
    "which is why PSI (not KS) is the production drift metric.",
)
def drift_psi_periods(spark, sf_dir):
    from pyspark.sql import Window

    (events,) = tables(spark, sf_dir, "events")
    cell = (
        events.select(
            "event_type",
            F.least(F.floor(F.col("value") / 50).cast("int"), F.lit(9)).alias("bucket"),
            F.when(
                F.col("ts") < F.lit(_PSI_SPLIT).cast("timestamp_ntz"), 1
            ).otherwise(0).alias("is_ref"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.sum("is_ref").alias("n_ref"),
            F.sum(1 - F.col("is_ref")).alias("n_cur"),
        )
    )
    # per-type totals as a window over the (type, bucket) cell relation
    # (<= |types| x 10 rows) instead of a second aggregation branch:
    # a re-aggregation would make Spark RESCAN the events table (no
    # common-subtree reuse across a DataFrame DAG without caching) —
    # this keeps the query a genuine single pass.
    w = Window.partitionBy("event_type")
    with_tot = cell.withColumn("t_ref", F.sum("n_ref").over(w)).withColumn(
        "t_cur", F.sum("n_cur").over(w)
    )
    # try_divide: an event_type with every row in one period (a NEW
    # type appearing after the split — the very case drift monitoring
    # exists for) has t_ref or t_cur = 0; ANSI Spark would abort the
    # whole readout where the oracle emits a NULL-psi row
    p = F.try_divide(F.col("n_ref"), F.col("t_ref")) + _PSI_EPS
    q = F.try_divide(F.col("n_cur"), F.col("t_cur")) + _PSI_EPS
    return (
        with_tot.groupBy("event_type")
        .agg(
            F.round(F.sum((p - q) * F.log(p / q)), 6).alias("psi"),
            F.sum("n_ref").alias("n_ref"),
            F.sum("n_cur").alias("n_cur"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------
# Benford first-digit audit
# --------------------------------------------------------------------

@query(
    "benford_first_digit",
    oracle="""
    WITH d AS (
      SELECT CAST(floor(o_totalprice / power(10, floor(log10(o_totalprice)))) AS INT)
             AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    obs AS (
      SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY digit
    ),
    tot AS (SELECT sum(n)::DOUBLE AS t FROM obs)
    SELECT digit,
           n,
           round(n / t, 6)                           AS observed_share,
           round(log10(1 + 1.0 / digit), 6)          AS benford_share,
           round(t * power(n / t - log10(1 + 1.0 / digit), 2)
                 / log10(1 + 1.0 / digit), 6)        AS chi2_term
    FROM obs, tot
    ORDER BY digit
    """,
    doc="Benford's-law first-digit audit of a monetary column — the "
    "classic anomaly/fraud screen on financial fact tables: observed "
    "first-significant-digit shares vs log10(1+1/d), with each "
    "digit's chi-square contribution. One map (digit extraction via "
    "log10/power — pure codegen) plus a 9-row aggregate; the scalar "
    "total broadcasts back. Cost at 100 TB: one scan of one column.",
)
def benford_first_digit(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    digit = F.floor(
        F.col("o_totalprice")
        / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
    ).cast("int")
    obs = (
        orders.where(F.col("o_totalprice") > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=True)  # 9 rows, feeds both total and output
    )
    tot = obs.agg(F.sum("n").cast("double").alias("t"))
    benford = F.log10(1 + 1.0 / F.col("digit"))
    return (
        obs.crossJoin(broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.col("t"), 6).alias("observed_share"),
            F.round(benford, 6).alias("benford_share"),
            F.round(
                F.col("t")
                * F.pow(F.col("n") / F.col("t") - benford, 2)
                / benford,
                6,
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


# --------------------------------------------------------------------
# Triangle counting on the co-purchase graph
# --------------------------------------------------------------------

@query(
    "triangle_count_parts",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1 JOIN e e2 ON e1.v = e2.u
                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    node_tri AS (
      SELECT node, count(*)::BIGINT AS n_triangles
      FROM (SELECT a AS node FROM tri UNION ALL
            SELECT b FROM tri UNION ALL SELECT c FROM tri)
      GROUP BY node
    )
    SELECT node, n_triangles FROM node_tri
    ORDER BY n_triangles DESC, node
    LIMIT 10
    """,
    doc="Triangle counting on the part co-purchase graph (edges = "
    "part pairs sharing >= 2 orders): the compact-forward algorithm — "
    "edges stored only as u<v, wedges enumerated by joining edge "
    "lists on the middle vertex, closed by a second join. Because "
    "every edge is oriented low->high, each triangle is found exactly "
    "once and the wedge count is bounded by sum deg_out^2 (degree "
    "orientation is THE trick that makes distributed triangle "
    "counting feasible — at 100 TB you orient by degree, not id). "
    "Two shuffle joins on vertex keys; per-node counts top-10.",
)
def triangle_count_parts(spark, sf_dir):
    (li,) = tables(spark, sf_dir, "lineitem")
    edges = (
        _copurchase_pairs(li)
        .groupBy(
            F.col("part_a").alias("u"), F.col("part_b").alias("v")
        )
        .agg(F.count("*").alias("w"))
        .where(F.col("w") >= 2)
        .select("u", "v")
        # three join consumers (e1/e2/e3) — checkpoint or each one
        # re-runs the basket self-join that builds the edge list
        .localCheckpoint(eager=True)
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    nodes = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return (
        nodes.groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), "node")
        .limit(10)
    )


# --------------------------------------------------------------------
# Set-similarity join via prefix filtering (PPJoin candidate bound)
# --------------------------------------------------------------------

_PF_T = 0.6


@query(
    "dedup_prefix_filter_pairs",
    oracle=f"""
    WITH sample_docs AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
    toks AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS t
      FROM sample_docs),
    words AS (
      SELECT doc_id, len(t)::BIGINT AS n, unnest(t) AS word FROM toks),
    df AS (
      SELECT word, count(*)::BIGINT AS dfc FROM words GROUP BY word),
    ranked AS (
      SELECT w.doc_id, w.n, w.word,
             row_number() OVER (PARTITION BY w.doc_id
                                ORDER BY d.dfc, w.word) AS rk
      FROM words w JOIN df d ON w.word = d.word),
    prefix AS (
      SELECT doc_id, word FROM ranked
      WHERE rk <= n - ceil({_PF_T} * n) + 1),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM prefix a JOIN prefix b
        ON a.word = b.word AND a.doc_id < b.doc_id),
    shared AS (
      SELECT c.id_a, c.id_b, a.n AS n_a, b.n AS n_b,
             count(*)::BIGINT AS n_shared
      FROM cand c
      JOIN words a ON a.doc_id = c.id_a
      JOIN words b ON b.doc_id = c.id_b AND b.word = a.word
      GROUP BY 1, 2, 3, 4)
    SELECT id_a, id_b,
           round(n_shared / (n_a + n_b - n_shared), 4) AS jaccard
    FROM shared
    WHERE n_shared / (n_a + n_b - n_shared) >= {_PF_T}
    ORDER BY id_a, id_b
    """,
    doc="Set-similarity self-join with PREFIX FILTERING (the PPJoin "
    "candidate bound, Xiao et al.): order every vocabulary token by "
    "(document frequency, token) and index each document only by its "
    "p = n - ceil(t*n) + 1 RAREST tokens — any pair with Jaccard >= t "
    "provably shares a token in both prefixes, so candidates form "
    "only through rare-token posting lists (the frequent tokens that "
    "make naive token-joins quadratic never generate candidates). "
    "Exact Jaccard verifies survivors. This is the exact-threshold "
    "alternative to MinHash banding: no probabilistic misses, "
    "candidate volume bounded by rare-posting sizes. Shuffles: words "
    "on token (df join), per-doc rank window, prefix self-join on "
    "token, pair-keyed verify — all on near-uniform keys.",
)
def dedup_prefix_filter_pairs(spark, sf_dir):
    from pyspark.sql import Window

    (docs,) = tables(spark, sf_dir, "documents")
    sample = docs.where(F.col("doc_id") % 10 == 0)
    # words has four consumers (sizes, df counts, rank join, verify
    # a/b) and is recomputed per consumer — deliberately NOT
    # checkpointed: it is a narrow explode over the scan (no shuffle),
    # and recomputing a narrow map is cheaper than materializing the
    # exploded relation at every scale (measured: checkpoint was 1.7x
    # slower at sf0.1). Contrast triangle_count_parts' edges, where
    # the reused relation embeds a shuffle agg and IS checkpointed.
    words = (
        sample.select(
            "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("word")
        )
    )
    n_t = words.groupBy("doc_id").agg(F.count("*").alias("n"))
    dfc = words.groupBy("word").agg(F.count("*").alias("dfc"))
    ranked = (
        words.join(dfc, "word")
        .join(n_t, "doc_id")  # corpus-sized: stats pick the strategy
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("dfc", "word")
            ),
        )
    )
    prefix = ranked.where(
        F.col("rk") <= F.col("n") - F.ceil(_PF_T * F.col("n")) + 1
    ).select("doc_id", "word")
    a = prefix.alias("a")
    b = prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.word") == F.col("b.word"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    wa = words.alias("wa")
    wb = words.alias("wb")
    shared = (
        cand.join(wa, F.col("wa.doc_id") == F.col("id_a"))
        .join(
            wb,
            (F.col("wb.doc_id") == F.col("id_b"))
            & (F.col("wb.word") == F.col("wa.word")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
    )
    na = n_t.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a"))
    nb = n_t.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b"))
    jac = F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
    return (
        shared.join(na, "id_a")
        .join(nb, "id_b")
        .where(jac >= _PF_T)
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


# --------------------------------------------------------------------
# Floor-capped running balance (non-associative recursion as windows)
# --------------------------------------------------------------------

@query(
    "capped_running_balance",
    oracle="""
    WITH deltas AS (
      SELECT user_id, event_id, ts,
             CASE WHEN event_type = 'purchase' THEN -value ELSE value END AS dx
      FROM events
    ),
    prefix AS (
      SELECT user_id, event_id, ts,
             sum(dx) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS s
      FROM deltas
    ),
    scans AS (
      SELECT user_id, event_id, s,
             min(s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS run_min
      FROM prefix
    )
    SELECT user_id, event_id,
           round(s - least(0, run_min), 4) AS balance
    FROM scans
    WHERE event_id % 101 = 0
    ORDER BY event_id
    """,
    doc="Floor-at-zero running balance (credit/inventory semantics): "
    "b_t = max(0, b_{t-1} + x_t) is a NON-ASSOCIATIVE recursion no "
    "window aggregate expresses directly — but the identity "
    "b_t = S_t - min(0, running_min(S_t)) re-expresses it as two "
    "stacked associative scans (prefix sum, then running min of the "
    "prefix sums) over the same one-shuffle window. The shape that "
    "turns 'needs applyInPandas per key' into pure codegen; same "
    "family as temporal_overlap's cummax re-expression. Sampled "
    "output; scans run over every row.",
)
def capped_running_balance(spark, sf_dir):
    from pyspark.sql import Window

    (events,) = tables(spark, sf_dir, "events")
    deltas = events.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "purchase", -F.col("value"))
        .otherwise(F.col("value"))
        .alias("dx"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scans = deltas.withColumn("s", F.sum("dx").over(w)).withColumn(
        "run_min", F.min("s").over(w)
    )
    return (
        scans.select(
            "user_id",
            "event_id",
            F.round(
                F.col("s") - F.least(F.lit(0.0), F.col("run_min")), 4
            ).alias("balance"),
        )
        .where(F.col("event_id") % 101 == 0)
        .orderBy("event_id")
    )


# --------------------------------------------------------------------
# Incremental distinct-count maintenance via mergeable HLL sketches
# --------------------------------------------------------------------

@query(
    "incremental_distinct_sketch",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id)::BIGINT AS exact_distinct,
           TRUE AS within_5pct
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Incremental DISTINCT maintenance — the non-algebraic "
    "counterpart merge_agg_partials cannot cover: per-key Datasketches "
    "HLL sketches built separately over history (event_id % 7 != 0) "
    "and the delta batch, merged with hll_union_agg, estimated once. "
    "Sketch state is mergeable and constant-size, so the nightly "
    "refresh again costs |delta| + |keys|, never |history| — this is "
    "how a 100 TB warehouse maintains distinct-users without "
    "re-scanning. The differential contract is the estimator's "
    "accuracy bound (like approx_distinct_sketch): the merged "
    "estimate must land within 5% of the exact distinct the oracle "
    "computes, and the exact count is emitted for the value hash.",
)
def incremental_distinct_sketch(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    events.createOrReplaceTempView("__ids_events")
    return events.sparkSession.sql(
        """
        WITH base AS (
          SELECT event_type, hll_sketch_agg(user_id) AS sk
          FROM __ids_events WHERE event_id % 7 != 0 GROUP BY event_type
        ),
        delta AS (
          SELECT event_type, hll_sketch_agg(user_id) AS sk
          FROM __ids_events WHERE event_id % 7 = 0 GROUP BY event_type
        ),
        merged AS (
          SELECT event_type, hll_sketch_estimate(hll_union_agg(sk)) AS est
          FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
          GROUP BY event_type
        ),
        exact AS (
          SELECT event_type, count(DISTINCT user_id) AS exact_distinct
          FROM __ids_events GROUP BY event_type
        )
        SELECT m.event_type,
               e.exact_distinct,
               abs(m.est - e.exact_distinct) <= 0.05 * e.exact_distinct
                 AS within_5pct
        FROM merged m JOIN exact e ON m.event_type = e.event_type
        ORDER BY m.event_type
        """
    )


# --------------------------------------------------------------------
# Multi-touch attribution (first / last touch)
# --------------------------------------------------------------------

@query(
    "attribution_first_last_touch",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id AS purchase_id, ts AS p_ts, value
      FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT p.purchase_id, p.value,
             e.event_type AS touch_type, e.ts AS t_ts, e.event_id
      FROM purchases p
      JOIN events e
        ON e.user_id = p.user_id
       AND e.event_type IN ('view', 'click')
       AND e.ts < p.p_ts
       AND e.ts >= p.p_ts - INTERVAL 1 DAY
    ),
    ranked AS (
      SELECT purchase_id, value, touch_type,
             row_number() OVER (PARTITION BY purchase_id
                                ORDER BY t_ts, event_id) AS rk_first,
             row_number() OVER (PARTITION BY purchase_id
                                ORDER BY t_ts DESC, event_id DESC) AS rk_last
      FROM touches
    )
    SELECT
      sum(CASE WHEN rk_first = 1 THEN 1 ELSE 0 END)
        FILTER (WHERE touch_type = 'view')::BIGINT   AS first_touch_views,
      sum(CASE WHEN rk_first = 1 THEN 1 ELSE 0 END)
        FILTER (WHERE touch_type = 'click')::BIGINT  AS first_touch_clicks,
      round(sum(CASE WHEN rk_last = 1 THEN value END)
        FILTER (WHERE touch_type = 'view'), 2)       AS last_touch_view_rev,
      round(sum(CASE WHEN rk_last = 1 THEN value END)
        FILTER (WHERE touch_type = 'click'), 2)      AS last_touch_click_rev
    FROM ranked
    """,
    doc="Multi-touch attribution: for every purchase, credit the "
    "FIRST and the LAST qualifying touch (view/click in the trailing "
    "24h) — the two canonical marketing attribution models, in one "
    "pass. The purchase-touch pairing is an interval join on the "
    "user key (state bounded by the lookback window, the same bound "
    "the streaming interval join uses); first/last selection is a "
    "pair of row_number windows over the purchase key with full "
    "deterministic tie-breaks. Position-based or time-decay models "
    "drop in by changing the credited-weight expression only.",
)
def attribution_first_last_touch(spark, sf_dir):
    from pyspark.sql import Window

    (events,) = tables(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    touches_src = events.where(
        F.col("event_type").isin("view", "click")
    ).select(
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("touch_type"),
        F.col("ts").alias("t_ts"),
        "event_id",
    )
    touches = purchases.join(
        touches_src,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 DAY")),
    )
    w_first = Window.partitionBy("purchase_id").orderBy("t_ts", "event_id")
    w_last = Window.partitionBy("purchase_id").orderBy(
        F.desc("t_ts"), F.desc("event_id")
    )
    ranked = touches.select(
        "purchase_id",
        "value",
        "touch_type",
        F.row_number().over(w_first).alias("rk_first"),
        F.row_number().over(w_last).alias("rk_last"),
    )
    is_view = F.col("touch_type") == "view"
    is_click = F.col("touch_type") == "click"
    # mirror the oracle's sum(CASE..) FILTER (WHERE type) exactly:
    # the FILTER makes the sum NULL when NO touch of that type exists
    # anywhere, so the when() must leave non-matching-type rows NULL
    # (an .otherwise(0) over all rows would return 0 instead)
    return ranked.agg(
        F.sum(
            F.when(is_view, F.when(F.col("rk_first") == 1, 1).otherwise(0))
        ).alias("first_touch_views"),
        F.sum(
            F.when(is_click, F.when(F.col("rk_first") == 1, 1).otherwise(0))
        ).alias("first_touch_clicks"),
        F.round(
            F.sum(F.when((F.col("rk_last") == 1) & is_view, F.col("value"))), 2
        ).alias("last_touch_view_rev"),
        F.round(
            F.sum(F.when((F.col("rk_last") == 1) & is_click, F.col("value"))), 2
        ).alias("last_touch_click_rev"),
    )


# --------------------------------------------------------------------
# Exact-quota stratified sampling (largest-remainder allocation)
# --------------------------------------------------------------------

_QUOTA_TOTAL = 100


@query(
    "exact_quota_sample",
    oracle=f"""
    WITH sizes AS (
      SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang
    ),
    tot AS (SELECT sum(n)::DOUBLE AS t FROM sizes),
    alloc AS (
      SELECT lang, n,
             CAST(floor(n / t * {_QUOTA_TOTAL}) AS BIGINT) AS base,
             n / t * {_QUOTA_TOTAL} - floor(n / t * {_QUOTA_TOTAL}) AS frac
      FROM sizes, tot
    ),
    give AS (
      SELECT lang, n, base,
             row_number() OVER (ORDER BY frac DESC, lang) AS frac_rank
      FROM alloc
    ),
    quota AS (
      SELECT lang, n,
             base + CASE WHEN frac_rank <=
               {_QUOTA_TOTAL} - (SELECT sum(base) FROM give)
               THEN 1 ELSE 0 END AS quota
      FROM give
    ),
    keyed AS (
      SELECT d.lang, d.doc_id, q.quota,
             row_number() OVER (
               PARTITION BY d.lang
               ORDER BY (d.doc_id * 1103515245 + 12345) % 2147483648,
                        d.doc_id) AS rk
      FROM documents d JOIN quota q ON d.lang = q.lang
    )
    SELECT lang,
           count(*)::BIGINT AS n_sampled,
           min(quota)       AS quota,
           min(doc_id)      AS min_doc_id
    FROM keyed WHERE rk <= quota
    GROUP BY lang ORDER BY lang
    """,
    doc="EXACT-size stratified sampling with largest-remainder quota "
    "allocation: proportional quotas floor-ed per stratum, the "
    "leftover seats granted to the largest fractional remainders "
    "(deterministic tie-break), then exactly quota_l rows kept per "
    "stratum by ranking on a portable LCG hash — total sample size "
    "is EXACTLY the requested total regardless of stratum "
    "skew, which Bernoulli sampling (stratified_sample_lang) cannot "
    "promise. The quota table is |strata| rows (broadcast); the "
    "per-stratum rank is one keyed window. The rank-vs-quota shape "
    "is how production pipelines cut exact train/eval slices.",
)
def exact_quota_sample(spark, sf_dir):
    from pyspark.sql import Window

    (docs,) = tables(spark, sf_dir, "documents")
    # |strata| rows reused by alloc/give/quota — checkpoint so the
    # seat-assignment arithmetic doesn't rescan the table per branch
    sizes = docs.groupBy("lang").agg(F.count("*").alias("n")).localCheckpoint(
        eager=True
    )
    tot = sizes.agg(F.sum("n").cast("double").alias("t"))
    alloc = sizes.crossJoin(broadcast(tot)).select(
        "lang",
        "n",
        F.floor(F.col("n") / F.col("t") * _QUOTA_TOTAL).alias("base"),
        (
            F.col("n") / F.col("t") * _QUOTA_TOTAL
            - F.floor(F.col("n") / F.col("t") * _QUOTA_TOTAL)
        ).alias("frac"),
    )
    w_frac = Window.orderBy(F.desc("frac"), "lang")
    give = alloc.withColumn("frac_rank", F.row_number().over(w_frac))
    base_sum = give.agg(F.sum("base").alias("bs"))
    quota = give.crossJoin(broadcast(base_sum)).select(
        "lang",
        (
            F.col("base")
            + F.when(
                F.col("frac_rank") <= _QUOTA_TOTAL - F.col("bs"), 1
            ).otherwise(0)
        ).alias("quota"),
    )
    lcg = (F.col("doc_id") * 1103515245 + 12345) % 2147483648
    w_rk = Window.partitionBy("lang").orderBy(lcg, "doc_id")
    keyed = (
        docs.join(broadcast(quota), "lang")
        .withColumn("rk", F.row_number().over(w_rk))
        .where(F.col("rk") <= F.col("quota"))
    )
    return (
        keyed.groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.min("quota").alias("quota"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------
# Time-weighted average (TWAP)
# --------------------------------------------------------------------

@query(
    "twap_time_weighted",
    oracle="""
    WITH seg AS (
      SELECT user_id, value, ts,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events
    )
    SELECT user_id,
           round(sum(value * (epoch_us(nxt) - epoch_us(ts)))
                 / sum(epoch_us(nxt) - epoch_us(ts)), 6) AS twap,
           count(*)::BIGINT AS n_segments
    FROM seg WHERE nxt IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Time-weighted average (TWAP — the finance/telemetry mean "
    "that sampling-rate changes can't bias): each observation is "
    "weighted by how long it was the current value (lead(ts) - ts), "
    "making irregular sensors and bursty tickers comparable. One "
    "keyed window for the lead, one agg — both on the same user key, "
    "so the second shuffle is free (partitioning reused). The plain "
    "avg() over the same data would double-count burst periods.",
)
def twap_time_weighted(spark, sf_dir):
    from pyspark.sql import Window

    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = events.select(
        "user_id",
        "value",
        F.col("ts").cast("timestamp").alias("ts"),
        F.lead(F.col("ts").cast("timestamp")).over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    # integer microseconds on both engines — unix_seconds truncates
    # while DuckDB's epoch() keeps fractional seconds
    dur = F.unix_micros("nxt") - F.unix_micros("ts")
    return (
        seg.groupBy("user_id")
        .agg(
            # try_divide: duplicate timestamps give zero-length
            # segments; a user whose every segment is zero-length has
            # sum(dur)=0 — NULL, not a crash, under ANSI
            F.round(
                F.try_divide(F.sum(F.col("value") * dur), F.sum(dur)), 6
            ).alias("twap"),
            F.count("*").alias("n_segments"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------
# OHLC bars (open/high/low/close aggregation)
# --------------------------------------------------------------------

@query(
    "ohlc_hourly_bars",
    oracle="""
    SELECT user_id,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS bar,
           round(arg_min(value, ts), 6)  AS open,
           round(max(value), 6)          AS high,
           round(min(value), 6)          AS low,
           round(arg_max(value, ts), 6)  AS close,
           count(*)::BIGINT              AS n_ticks
    FROM events
    WHERE user_id % 37 = 0
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="OHLC bars (the market-data/telemetry roll-up): open and "
    "close are argmin/argmax over the timestamp inside each (entity, "
    "hour) bucket — Spark's min_by/max_by and DuckDB's arg_min/"
    "arg_max are the same selector aggregate, so no window or "
    "self-join is needed: ONE map-side-combinable aggregation "
    "produces all five measures. The window formulation (first_value/"
    "last_value over a sorted partition) costs a full sort per key; "
    "the selector-aggregate formulation is the 100 TB shape. "
    "Timestamps are unique per user in the fixture, so the "
    "tie-breakless selectors are deterministic.",
)
def ohlc_hourly_bars(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    return (
        events.where(F.col("user_id") % 37 == 0)
        .groupBy(
            "user_id",
            F.date_format(
                F.date_trunc("hour", F.col("ts").cast("timestamp")),
                "yyyy-MM-dd HH:00",
            ).alias("bar"),
        )
        .agg(
            F.round(F.min_by("value", "ts"), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.max_by("value", "ts"), 6).alias("close"),
            F.count("*").alias("n_ticks"),
        )
        .orderBy("user_id", "bar")
    )


# --------------------------------------------------------------------
# Order-independent table content checksum (reconciliation)
# --------------------------------------------------------------------

@query(
    "table_content_checksum",
    oracle="""
    SELECT count(*)::BIGINT AS n_rows,
           sum(CAST(('0x' || substr(
                 md5(coalesce(o_orderkey::VARCHAR, chr(0)) || '|'
                     || coalesce(o_custkey::VARCHAR, chr(0)) || '|'
                     || coalesce(o_orderstatus, chr(0)) || '|'
                     || coalesce(round(o_totalprice, 2)::VARCHAR, chr(0))),
                 1, 8)) AS BIGINT))::BIGINT AS content_sum
    FROM orders
    """,
    doc="Order-independent table content checksum for cross-system "
    "reconciliation (replica verification, migration sign-off): each "
    "row folds to a canonical string, md5 (identical on every "
    "engine, unlike xxhash64), take 32 bits, SUM — commutative, so "
    "partition order, file order, and engine never change the "
    "checksum, and a single flipped row flips it with probability "
    "~1-2^-32. One narrow map + scalar agg: checksumming 100 TB "
    "costs exactly one scan, and the per-partition partial sums "
    "merge losslessly (the same algebraic-combine property "
    "merge_agg_partials exploits).",
)
def table_content_checksum(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    # coalesce each field to a chr(0) sentinel BEFORE concatenation:
    # concat_ws silently drops NULL fields (colliding (a,NULL,b) with
    # (a,b,NULL) and diverging from the oracle's NULL-propagating ||)
    # — reconciliation exists for dirty data, so NULLs must checksum
    # deterministically and distinctly
    nz = lambda c: F.coalesce(c.cast("string"), F.lit("\x00"))
    canon = F.concat_ws(
        "|",
        nz(F.col("o_orderkey")),
        nz(F.col("o_custkey")),
        nz(F.col("o_orderstatus")),
        nz(F.round("o_totalprice", 2)),
    )
    h32 = F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("long")
    return orders.agg(
        F.count("*").alias("n_rows"),
        F.sum(h32).alias("content_sum"),
    )


# --------------------------------------------------------------------
# Event-path trigrams (behavioral path mining)
# --------------------------------------------------------------------

@query(
    "event_path_trigrams",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || t2 || '>' || t3 AS path,
           count(*)::BIGINT AS n
    FROM seq WHERE t3 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path
    LIMIT 10
    """,
    doc="Behavioral path mining: the top 3-step event paths across "
    "all users — consecutive-event trigrams built with two lead() "
    "columns over the per-user time order (the event-sequence "
    "analog of text n-grams). One keyed window shuffle, one count "
    "agg, TakeOrdered top-10; no self-joins, so cost is linear in "
    "events regardless of path diversity. The product-analytics "
    "primitive behind 'what do users do before churning/buying'.",
)
def event_path_trigrams(spark, sf_dir):
    from pyspark.sql import Window

    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).where(F.col("t3").isNotNull())
    return (
        seq.groupBy(
            # concat (not concat_ws): the oracle's || NULL-propagates,
            # while concat_ws silently DROPS a NULL component, so a
            # NULL event_type would produce different path strings
            F.concat(
                F.col("event_type"), F.lit(">"), F.col("t2"),
                F.lit(">"), F.col("t3"),
            ).alias("path")
        )
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(10)
    )


# --------------------------------------------------------------------
# A/B test statistics (Welch's t)
# --------------------------------------------------------------------

@query(
    "ab_test_welch_t",
    oracle="""
    WITH assign AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
             value
      FROM events WHERE event_type = 'purchase'
    ),
    stats AS (
      SELECT variant, count(*)::BIGINT AS n,
             avg(value) AS mu, var_samp(value) AS s2
      FROM assign GROUP BY variant
    )
    SELECT a.n AS n_a, b.n AS n_b,
           round(a.mu, 6) AS mean_a, round(b.mu, 6) AS mean_b,
           round((a.mu - b.mu)
                 / sqrt(a.s2 / a.n + b.s2 / b.n), 6) AS welch_t,
           round(pow(a.s2 / a.n + b.s2 / b.n, 2)
                 / (pow(a.s2 / a.n, 2) / (a.n - 1)
                    + pow(b.s2 / b.n, 2) / (b.n - 1)), 2) AS welch_df
    FROM stats a JOIN stats b ON a.variant = 'A' AND b.variant = 'B'
    """,
    doc="A/B experiment readout: Welch's unequal-variance t statistic "
    "and Welch-Satterthwaite degrees of freedom between two variants "
    "(deterministic hash assignment stands in for the experiment "
    "flag). Everything reduces to per-variant (n, mean, variance) — "
    "one map-side-combined aggregation to TWO rows, then pure scalar "
    "arithmetic: the 100 TB experiment readout costs one scan, which "
    "is why every experimentation platform stores exactly these "
    "moments per variant.",
)
def ab_test_welch_t(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    stats = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("variant"),
            "value",
        )
        .groupBy("variant")
        .agg(
            F.count("*").alias("n"),
            F.avg("value").alias("mu"),
            F.var_samp("value").alias("s2"),
        )
        .localCheckpoint(eager=True)  # 2 rows, feeds both join sides
    )
    a = stats.where(F.col("variant") == "A").alias("a")
    b = stats.where(F.col("variant") == "B").alias("b")
    se2 = F.col("a.s2") / F.col("a.n") + F.col("b.s2") / F.col("b.n")
    # try_divide throughout: a variant with a single observation has
    # var_samp = NULL and (n - 1) = 0 — ANSI Spark checks the zero
    # divisor before the NULL numerator and would throw where the
    # oracle returns NULL (small/early experiments must degrade to
    # NULL stats, not crash the readout)
    return a.crossJoin(b).select(
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        F.round(F.col("a.mu"), 6).alias("mean_a"),
        F.round(F.col("b.mu"), 6).alias("mean_b"),
        F.round(
            F.try_divide(F.col("a.mu") - F.col("b.mu"), F.sqrt(se2)), 6
        ).alias("welch_t"),
        F.round(
            F.try_divide(
                F.pow(se2, 2),
                F.try_divide(
                    F.pow(F.col("a.s2") / F.col("a.n"), 2), F.col("a.n") - 1
                )
                + F.try_divide(
                    F.pow(F.col("b.s2") / F.col("b.n"), 2), F.col("b.n") - 1
                ),
            ),
            2,
        ).alias("welch_df"),
    )


# --------------------------------------------------------------------
# Gini coefficient (revenue concentration)
# --------------------------------------------------------------------

@query(
    "revenue_gini",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey, sum(o_totalprice) AS rev FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT rev,
             row_number() OVER (ORDER BY rev, o_custkey) AS i,
             count(*) OVER () AS n,
             sum(rev) OVER () AS total
      FROM per_cust
    )
    SELECT round((2.0 * sum(i * rev) / (max(n) * max(total)))
                 - (max(n) + 1.0) / max(n), 6) AS gini,
           max(n)::BIGINT AS n_customers
    FROM ranked
    """,
    doc="Gini coefficient of revenue concentration across customers "
    "(the inequality metric behind 'top 1% of customers drive X%'): "
    "G = 2*sum(i*rev_i)/(n*total) - (n+1)/n over revenue-ranked "
    "customers. The rank is a GLOBAL sort — the honest cost of an "
    "exact Gini — but it sorts the per-customer aggregate "
    "(|customers| rows), never raw orders, and at 100 TB the same "
    "formula runs on a quantile-bucketed approximation (percentile_"
    "approx gives the Lorenz curve points) when |customers| itself "
    "is huge. Deterministic tie-break on the customer key.",
)
def revenue_gini(spark, sf_dir):
    from pyspark.sql import Window

    (orders,) = tables(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("rev")
    )
    w = Window.orderBy("rev", "o_custkey")
    ranked = per_cust.select(
        "rev", F.row_number().over(w).alias("i")
    )
    return ranked.agg(
        F.round(
            F.try_divide(
                2.0 * F.sum(F.col("i") * F.col("rev")),
                F.count("*") * F.sum("rev"),
            )
            - F.try_divide(F.count("*") + 1.0, F.count("*")),
            6,
        ).alias("gini"),  # try_divide: empty input → NULL gini, not a crash
        F.count("*").alias("n_customers"),
    )


# --------------------------------------------------------------------
# Declarative data-quality expectations report
# --------------------------------------------------------------------

@query(
    "dq_expectations_report",
    oracle="""
    WITH e AS (
      SELECT
        count(*)                                            AS n_rows,
        sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)      AS null_value,
        sum(CASE WHEN event_type IN
              ('view','click','purchase','signup','error')
            THEN 0 ELSE 1 END)                              AS bad_type,
        sum(CASE WHEN value < 0 THEN 1 ELSE 0 END)          AS neg_value,
        count(DISTINCT event_id)                            AS distinct_ids
      FROM events
    ),
    fk AS (
      SELECT count(*) AS orphans
      FROM events ev LEFT JOIN customer c ON ev.user_id = c.c_custkey
      WHERE c.c_custkey IS NULL
    )
    SELECT * FROM (
      SELECT 'value_not_null' AS expectation,
             null_value::BIGINT AS violations,
             (null_value = 0) AS passed FROM e
      UNION ALL
      SELECT 'event_type_in_set', bad_type::BIGINT, bad_type = 0 FROM e
      UNION ALL
      SELECT 'value_non_negative', neg_value::BIGINT, neg_value = 0 FROM e
      UNION ALL
      SELECT 'event_id_unique',
             (n_rows - distinct_ids)::BIGINT,
             n_rows = distinct_ids FROM e
      UNION ALL
      SELECT 'user_id_references_customer', orphans::BIGINT, orphans = 0
      FROM fk
    ) ORDER BY expectation
    """,
    doc="Declarative data-quality expectations report (the "
    "Great-Expectations shape, and the generalization of the "
    "reference's Q1-Q7 gate suite in operators/quality.py): "
    "not-null, accepted-value-set, range, uniqueness, and "
    "referential-integrity expectations evaluated over ONE "
    "conditional-aggregation pass of the fact table plus one "
    "broadcast anti-join for the FK check — violations counted, "
    "pass/fail per expectation, rows never copied per check. The "
    "single-pass shape is what makes a 100-expectation suite cost "
    "the same scan as a 5-expectation one.",
)
def dq_expectations_report(spark, sf_dir):
    events, customer = tables(spark, sf_dir, "events", "customer")
    agg = events.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("null_value"),
        F.sum(
            F.when(
                F.col("event_type").isin(
                    "view", "click", "purchase", "signup", "error"
                ),
                0,
            ).otherwise(1)
        ).alias("bad_type"),
        F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).alias("neg_value"),
        F.count_distinct("event_id").alias("distinct_ids"),
    ).localCheckpoint(eager=True)  # 1 row, feeds four report rows
    orphans = (
        events.join(
            customer.select("c_custkey"),
            events.user_id == F.col("c_custkey"),
            "left_anti",
        ).agg(F.count("*").alias("orphans"))
    )
    def row(name, viol):
        return agg.select(
            F.lit(name).alias("expectation"),
            viol.alias("violations"),
            (viol == 0).alias("passed"),
        )
    report = (
        row("value_not_null", F.col("null_value"))
        .unionByName(row("event_type_in_set", F.col("bad_type")))
        .unionByName(row("value_non_negative", F.col("neg_value")))
        .unionByName(
            row("event_id_unique", F.col("n_rows") - F.col("distinct_ids"))
        )
        .unionByName(
            orphans.select(
                F.lit("user_id_references_customer").alias("expectation"),
                F.col("orphans").alias("violations"),
                (F.col("orphans") == 0).alias("passed"),
            )
        )
    )
    return report.orderBy("expectation")


@query(
    "hard_negative_mining",
    oracle="""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS ve FROM embeddings),
    q AS (SELECT vec_id AS query_id, label AS q_label, ve AS qv
          FROM v WHERE vec_id % 101 = 0),
    scored AS (
      SELECT q.query_id, c.vec_id AS negative_id, c.label AS neg_label,
             round(list_dot_product(q.qv, c.ve) /
                   (sqrt(list_dot_product(q.qv, q.qv)) *
                    sqrt(list_dot_product(c.ve, c.ve))), 6) AS cos_sim
      FROM q CROSS JOIN v c
      WHERE c.label <> q.q_label)
    SELECT query_id, rank, negative_id, neg_label, cos_sim
    FROM (SELECT query_id, negative_id, neg_label, cos_sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos_sim DESC, negative_id) AS rank
          FROM scored)
    WHERE rank <= 3
    """,
    doc="Hard-negative mining for contrastive training: for each "
    "sampled anchor, the top-3 most-similar vectors with a DIFFERENT "
    "label — the near-misses that make embedding models learn "
    "boundaries (random negatives are too easy to carry gradient). "
    "Runs on the IVF candidate path (operators/similarity."
    "hard_negative_topk): broadcast per-label centroids route each "
    "query to other-label cells, candidates come from a label "
    "equi-join (corpus hash-partitioned by cell — no query×corpus "
    "cartesian product), exact cosine reranks candidates only. "
    "n_probe bounds the probed-cell volume at scale; here it probes "
    "all 9 other cells, which is exact (cell == label), so the "
    "brute-force DuckDB oracle stays the falsifiable baseline.",
)
def hard_negative_mining(spark, sf_dir):
    from dso_import_spark.operators.similarity import hard_negative_topk

    (emb,) = tables(spark, sf_dir, "embeddings")
    return hard_negative_topk(
        emb.filter(F.col("vec_id") % 101 == 0), emb, k=3, n_probe=None
    )


# --------------------------------------------------------------------
# Exact two-sample Kolmogorov-Smirnov drift statistic
# --------------------------------------------------------------------

@query(
    "drift_ks_statistic",
    oracle=f"""
    WITH tagged AS (
      SELECT event_type, value,
             CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}' THEN 1 ELSE 0 END AS is_ref
      FROM events WHERE value IS NOT NULL
    ),
    tot AS (
      SELECT event_type,
             sum(is_ref)::DOUBLE AS n_ref,
             sum(1 - is_ref)::DOUBLE AS n_cur
      FROM tagged GROUP BY event_type
    ),
    pts AS (
      SELECT event_type, value,
             sum(is_ref) AS d_ref, sum(1 - is_ref) AS d_cur
      FROM tagged GROUP BY event_type, value
    ),
    ecdf AS (
      SELECT p.event_type,
             sum(p.d_ref) OVER w / t.n_ref AS f_ref,
             sum(p.d_cur) OVER w / t.n_cur AS f_cur
      FROM pts p JOIN tot t ON p.event_type = t.event_type
      WINDOW w AS (PARTITION BY p.event_type ORDER BY p.value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type,
           round(max(abs(f_ref - f_cur)), 6) AS ks_d
    FROM ecdf GROUP BY event_type ORDER BY event_type
    """,
    doc="Exact two-sample Kolmogorov-Smirnov statistic per event "
    "type between the reference and current periods — the "
    "distribution-shape drift test PSI's fixed bins can miss (a "
    "within-bin shift is invisible to PSI, never to KS). D = max "
    "|ECDF_ref - ECDF_cur| evaluated at every observed value: "
    "per-(type, value) counts aggregate map-side first, then BOTH "
    "ECDFs come from one cumulative window over the collapsed "
    "points, partitioned by type — each type sorts its own distinct "
    "values independently, so there is no global sort and the "
    "window input is |distinct values|, not |events|. "
    "Scale note: a high-cardinality metric first rounds/quantizes "
    "values (binned KS), trading exactness for bounded point sets — "
    "the PSI/KS pair covers both ends of that trade.",
)
def drift_ks_statistic(spark, sf_dir):
    from pyspark.sql import Window

    (events,) = tables(spark, sf_dir, "events")
    # NULL values are excluded on BOTH engines: an ECDF is defined
    # over observed values (missingness belongs to dq_expectations_
    # report), and Spark sorts NULLS FIRST where DuckDB sorts them
    # LAST — including them would silently diverge the cumulative sums
    tagged = events.where(F.col("value").isNotNull()).select(
        "event_type",
        "value",
        F.when(
            F.col("ts") < F.lit(_PSI_SPLIT).cast("timestamp_ntz"), 1
        ).otherwise(0).alias("is_ref"),
    )
    # one scan: the per-(type, value) point counts are the only pass
    # over events; totals re-aggregate the collapsed points (bounded
    # by |distinct values|), and the checkpoint keeps the two
    # consumers (totals + ECDF window) from re-running the scan
    pts = (
        tagged.groupBy("event_type", "value")
        .agg(
            F.sum("is_ref").alias("d_ref"),
            F.sum(1 - F.col("is_ref")).alias("d_cur"),
        )
        .localCheckpoint(eager=True)
    )
    tot = pts.groupBy("event_type").agg(
        F.sum("d_ref").cast("double").alias("n_ref"),
        F.sum("d_cur").cast("double").alias("n_cur"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # try_divide: a type with rows on only one side of the split has
    # n_ref or n_cur = 0 — under default-ANSI Spark plain / would throw
    # DIVIDE_BY_ZERO, where the oracle yields NULL (the same guard
    # drift_psi_periods documents for the identical scenario)
    ecdf = pts.join(broadcast(tot), "event_type").select(
        "event_type",
        F.try_divide(F.sum("d_ref").over(w), F.col("n_ref")).alias("f_ref"),
        F.try_divide(F.sum("d_cur").over(w), F.col("n_cur")).alias("f_cur"),
    )
    return (
        ecdf.groupBy("event_type")
        .agg(F.round(F.max(F.abs(F.col("f_ref") - F.col("f_cur"))), 6).alias("ks_d"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------
# CUPED variance reduction (experiment sensitivity)
# --------------------------------------------------------------------

@query(
    "cuped_variance_reduction",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
             sum(CASE WHEN ts <  TIMESTAMP '{_PSI_SPLIT}' THEN value END) AS x,
             sum(CASE WHEN ts >= TIMESTAMP '{_PSI_SPLIT}' THEN value END) AS y
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    clean AS (
      SELECT variant, x, y FROM per_user
      WHERE x IS NOT NULL AND y IS NOT NULL
    ),
    theta AS (
      SELECT covar_samp(x, y) / var_samp(x) AS th,
             avg(x) AS mx
      FROM clean
    )
    SELECT c.variant,
           count(*)::BIGINT AS n_users,
           round(avg(c.y), 6) AS mean_y,
           round(avg(c.y - t.th * (c.x - t.mx)), 6) AS mean_cuped,
           round(1 - var_samp(c.y - t.th * (c.x - t.mx)) / var_samp(c.y), 6)
             AS var_reduction
    FROM clean c, theta t
    GROUP BY c.variant, t.th, t.mx
    ORDER BY c.variant
    """,
    doc="CUPED variance reduction (Deng et al. 2013, the standard "
    "experimentation-platform sensitivity boost): adjust each user's "
    "experiment-period metric y by their PRE-period covariate x via "
    "theta = cov(x,y)/var(x); the adjusted metric has the same mean "
    "shift but (1 - rho^2) of the variance, so the same experiment "
    "detects smaller effects. Per-user (x, y) reduce map-side; theta "
    "is one scalar moment pass broadcast back; per-variant readout "
    "is a second bounded agg. Pre-period totals come from the same "
    "one scan as the experiment metric.",
)
def cuped_variance_reduction(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    split = F.lit(_PSI_SPLIT).cast("timestamp_ntz")
    per_user = (
        events.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < split, F.col("value"))).alias("x"),
            F.sum(F.when(F.col("ts") >= split, F.col("value"))).alias("y"),
        )
        .where(F.col("x").isNotNull() & F.col("y").isNotNull())
        .select(
            F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("variant"),
            "x",
            "y",
        )
        .localCheckpoint(eager=True)  # feeds theta AND the readout
    )
    # try_divide: all-identical pre-period sums make var_samp(x) = 0
    # — ANSI Spark would throw where the oracle yields NULL (same
    # degenerate-experiment discipline as ab_test_welch_t)
    theta = per_user.agg(
        F.try_divide(F.covar_samp("x", "y"), F.var_samp("x")).alias("th"),
        F.avg("x").alias("mx"),
    )
    adj = F.col("y") - F.col("th") * (F.col("x") - F.col("mx"))
    return (
        per_user.crossJoin(broadcast(theta))
        .groupBy("variant")
        .agg(
            F.count("*").alias("n_users"),
            F.round(F.avg("y"), 6).alias("mean_y"),
            F.round(F.avg(adj), 6).alias("mean_cuped"),
            F.round(
                1 - F.try_divide(F.var_samp(adj), F.var_samp("y")), 6
            ).alias("var_reduction"),
        )
        .orderBy("variant")
    )


# --------------------------------------------------------------------
# Difference-in-differences (the causal companion to CUPED/Welch)
# --------------------------------------------------------------------

@query(
    "did_difference_in_differences",
    oracle=f"""
    WITH cells AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
             CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}' THEN 'pre' ELSE 'post' END
               AS period,
             avg(value) AS mean_v,
             count(*)::BIGINT AS n
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    )
    SELECT round(a_post.mean_v - a_pre.mean_v, 6) AS delta_a,
           round(b_post.mean_v - b_pre.mean_v, 6) AS delta_b,
           round((a_post.mean_v - a_pre.mean_v)
                 - (b_post.mean_v - b_pre.mean_v), 6) AS did,
           a_pre.n + a_post.n + b_pre.n + b_post.n AS n_total
    FROM cells a_pre, cells a_post, cells b_pre, cells b_post
    WHERE a_pre.variant  = 'A' AND a_pre.period  = 'pre'
      AND a_post.variant = 'A' AND a_post.period = 'post'
      AND b_pre.variant  = 'B' AND b_pre.period  = 'pre'
      AND b_post.variant = 'B' AND b_post.period = 'post'
    """,
    doc="Difference-in-differences: the treated group's pre-to-post "
    "change minus the control group's — cancels any shared trend the "
    "periods carry (seasonality, launches), the causal-inference "
    "workhorse when randomization is imperfect. The whole estimator "
    "reduces to a 2x2 (variant, period) cell-mean table built in ONE "
    "map-side-combined pass; the arithmetic over four cells is free. "
    "Completes the experimentation suite next to ab_test_welch_t "
    "(sampling noise) and cuped_variance_reduction (sensitivity).",
)
def did_difference_in_differences(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    split = F.lit(_PSI_SPLIT).cast("timestamp_ntz")
    cells = (
        events.where(F.col("event_type") == "purchase")
        .groupBy(
            F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("variant"),
            F.when(F.col("ts") < split, "pre").otherwise("post").alias("period"),
        )
        .agg(F.avg("value").alias("mean_v"), F.count("*").alias("n"))
        .localCheckpoint(eager=True)  # 4 cells, four consumers
    )
    def cell(v, p, alias):
        return cells.where(
            (F.col("variant") == v) & (F.col("period") == p)
        ).select(
            F.col("mean_v").alias(f"m_{alias}"), F.col("n").alias(f"n_{alias}")
        )
    j = (
        cell("A", "pre", "ap").crossJoin(cell("A", "post", "aq"))
        .crossJoin(cell("B", "pre", "bp"))
        .crossJoin(cell("B", "post", "bq"))
    )
    return j.select(
        F.round(F.col("m_aq") - F.col("m_ap"), 6).alias("delta_a"),
        F.round(F.col("m_bq") - F.col("m_bp"), 6).alias("delta_b"),
        F.round(
            (F.col("m_aq") - F.col("m_ap")) - (F.col("m_bq") - F.col("m_bp")), 6
        ).alias("did"),
        (F.col("n_ap") + F.col("n_aq") + F.col("n_bp") + F.col("n_bq")).alias(
            "n_total"
        ),
    )


# --------------------------------------------------------------------
# Sample-ratio mismatch (the experiment sanity gate)
# --------------------------------------------------------------------

@query(
    "srm_sample_ratio_check",
    oracle="""
    WITH counts AS (
      SELECT sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::DOUBLE AS n_a,
             sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END)::DOUBLE AS n_b
      FROM (SELECT DISTINCT user_id FROM events)
    )
    SELECT n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
           round(pow(n_a - (n_a + n_b) / 2, 2) / ((n_a + n_b) / 2)
                 + pow(n_b - (n_a + n_b) / 2, 2) / ((n_a + n_b) / 2), 6)
             AS chi2,
           (pow(n_a - (n_a + n_b) / 2, 2) / ((n_a + n_b) / 2)
            + pow(n_b - (n_a + n_b) / 2, 2) / ((n_a + n_b) / 2)) > 3.841
             AS srm_detected
    FROM counts
    """,
    doc="Sample-ratio-mismatch check — the sanity gate every "
    "experiment readout runs FIRST: chi-square of observed variant "
    "user counts against the designed 50/50 split (3.841 = the 5% "
    "critical value at 1 df); a triggered SRM means assignment or "
    "logging is broken and every downstream metric is untrustworthy. "
    "One distinct-user pass reduced to two counters; the test is "
    "scalar arithmetic. Runs before ab_test_welch_t / cuped / did in "
    "the suite this completes.",
)
def srm_sample_ratio_check(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    counts = (
        events.select("user_id")
        .distinct()
        .agg(
            F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
            .cast("double")
            .alias("n_a"),
            F.sum(F.when(F.col("user_id") % 2 == 0, 0).otherwise(1))
            .cast("double")
            .alias("n_b"),
        )
    )
    exp = (F.col("n_a") + F.col("n_b")) / 2
    chi2 = F.pow(F.col("n_a") - exp, 2) / exp + F.pow(F.col("n_b") - exp, 2) / exp
    return counts.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 > 3.841).alias("srm_detected"),
    )


# --------------------------------------------------------------------
# Winsorized means (robust experiment metric)
# --------------------------------------------------------------------

@query(
    "winsorized_variant_means",
    oracle="""
    WITH assign AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant, value
      FROM events WHERE event_type = 'purchase'
    ),
    caps AS (
      SELECT variant, quantile_cont(value, 0.95) AS p95
      FROM assign GROUP BY variant
    )
    SELECT a.variant,
           count(*)::BIGINT AS n,
           round(avg(a.value), 6) AS raw_mean,
           round(avg(least(a.value, c.p95)), 6) AS winsorized_mean,
           round(c.p95, 6) AS cap_p95
    FROM assign a JOIN caps c ON a.variant = c.variant
    GROUP BY a.variant, c.p95
    ORDER BY a.variant
    """,
    doc="Winsorized variant means: cap each observation at its "
    "variant's exact 95th percentile before averaging — the robust "
    "metric experimentation platforms report alongside the raw mean "
    "because a single whale user can flip a t-test. The cap is one "
    "exact-percentile aggregate per variant (2 rows, broadcast "
    "back); the winsorize itself is a narrow least(). Interpolated "
    "percentile matches quantile_cont exactly (the "
    "percentile_quantity precedent).",
)
def winsorized_variant_means(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    assign = events.where(F.col("event_type") == "purchase").select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("variant"),
        "value",
    )
    caps = assign.groupBy("variant").agg(
        F.percentile("value", F.lit(0.95)).alias("p95")
    )
    return (
        assign.join(broadcast(caps), "variant")
        .groupBy("variant", "p95")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 6).alias("raw_mean"),
            F.round(F.avg(F.least(F.col("value"), F.col("p95"))), 6).alias(
                "winsorized_mean"
            ),
        )
        .select(
            "variant",
            "n",
            "raw_mean",
            "winsorized_mean",
            F.round("p95", 6).alias("cap_p95"),
        )
        .orderBy("variant")
    )


# --------------------------------------------------------------------
# Grid-blocked spatial KNN (radius-bounded)
# --------------------------------------------------------------------

@query(
    "spatial_knn_radius",
    oracle="""
    WITH points AS (
      SELECT c_custkey AS point_id,
             1000 + (c_custkey * 7919) % 10000 AS px,
             1000 + (c_custkey * 104729) % 10000 AS py
      FROM customer),
    q AS (SELECT point_id AS query_id, px AS qx, py AS qy
          FROM points WHERE point_id % 101 = 0),
    pairs AS (
      SELECT q.query_id, p.point_id,
             (q.qx - p.px) * (q.qx - p.px)
             + (q.qy - p.py) * (q.qy - p.py) AS dist_sq
      FROM q CROSS JOIN points p
      WHERE q.query_id <> p.point_id)
    SELECT query_id, rank, point_id, dist_sq::BIGINT AS dist_sq
    FROM (SELECT query_id, point_id, dist_sq,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY dist_sq, point_id) AS rank
          FROM pairs WHERE dist_sq <= 500 * 500)
    WHERE rank <= 3
    """,
    doc="Radius-bounded spatial k-nearest-neighbors via grid blocking "
    "(operators/spatial.py:grid_knn_within_radius): cell edge = "
    "search radius makes the 3x3 neighborhood provably complete, so "
    "the distance join becomes an equi-join on the cell key — the "
    "query side replicates x9 (bounded, small side only), the corpus "
    "hashes to one cell, distances compare as exact squared "
    "integers. The oracle is the naive cross join with the same "
    "radius cut, proving the blocked plan finds the identical "
    "neighbor set. Unbounded KNN needs iterative ring expansion; "
    "'nearest within R' is the honest one-pass contract.",
)
def spatial_knn_radius(spark, sf_dir):
    from dso_import_spark.operators.spatial import grid_knn_within_radius

    (customer,) = tables(spark, sf_dir, "customer")
    points = customer.select(
        F.col("c_custkey").alias("point_id"),
        (1000 + (F.col("c_custkey") * 7919) % 10000).alias("px"),
        (1000 + (F.col("c_custkey") * 104729) % 10000).alias("py"),
    )
    queries = points.where(F.col("point_id") % 101 == 0).select(
        F.col("point_id").alias("query_id"), "px", "py"
    )
    return grid_knn_within_radius(queries, points, radius=500.0, k=3)


# --------------------------------------------------------------------
# Period-over-period growth rates
# --------------------------------------------------------------------

@query(
    "weekly_growth_rates",
    oracle="""
    WITH weekly AS (
      SELECT event_type,
             date_trunc('week', ts) AS wk,
             count(*)::BIGINT AS n,
             round(sum(value), 2) AS total
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           strftime(wk, '%Y-%m-%d') AS week_start,
           n,
           round((n - lag(n) OVER w) / lag(n) OVER w::DOUBLE, 6) AS n_growth,
           round((total - lag(total) OVER w) / lag(total) OVER w, 6)
             AS value_growth
    FROM weekly
    WINDOW w AS (PARTITION BY event_type ORDER BY wk)
    ORDER BY event_type, week_start
    """,
    doc="Week-over-week growth rates per event type — the KPI delta "
    "every dashboard leads with: weekly aggregate (map-side "
    "combined), then lag() over the tiny per-type week series. The "
    "window input is |types| x |weeks| rows, so the growth step is "
    "free no matter how many raw events; the first week's growth is "
    "NULL by definition on both engines.",
)
def weekly_growth_rates(spark, sf_dir):
    from pyspark.sql import Window

    (events,) = tables(spark, sf_dir, "events")
    weekly = events.groupBy(
        "event_type",
        F.date_trunc("week", F.col("ts").cast("timestamp")).alias("wk"),
    ).agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total")
    )
    w = Window.partitionBy("event_type").orderBy("wk")
    return (
        weekly.select(
            "event_type",
            F.date_format("wk", "yyyy-MM-dd").alias("week_start"),
            "n",
            F.round(
                (F.col("n") - F.lag("n").over(w))
                / F.lag("n").over(w).cast("double"),
                6,
            ).alias("n_growth"),
            F.round(
                (F.col("total") - F.lag("total").over(w)) / F.lag("total").over(w),
                6,
            ).alias("value_growth"),
        )
        .orderBy("event_type", "week_start")
    )


# --------------------------------------------------------------------
# Data-arrival anomaly detection (pipeline observability)
# --------------------------------------------------------------------

@query(
    "arrival_anomaly_days",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, count(*)::BIGINT AS n
      FROM events GROUP BY 1
    ),
    trailed AS (
      SELECT d, n,
             avg(n) OVER (ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
               AS trail_avg,
             row_number() OVER (ORDER BY d) AS day_no
      FROM daily
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           n,
           round(trail_avg, 2) AS trail_avg,
           round(n / trail_avg, 4) AS arrival_ratio,
           (n < 0.5 * trail_avg) AS under_delivered
    FROM trailed
    WHERE day_no > 7
    ORDER BY day
    """,
    doc="Data-arrival anomaly monitor — the pipeline-observability "
    "check that catches a broken upstream BEFORE quality gates see "
    "bad rows: per-day row counts vs the trailing 7-day average "
    "(excluding today), flagging days under 50 percent of trend. Daily "
    "counts reduce map-side to |days| rows; the trailing window runs "
    "over that bounded series. The first 7 days have no full trail "
    "and are excluded on both engines. A partitioned warehouse runs "
    "this from partition row counts without scanning data at all.",
)
def arrival_anomaly_days(spark, sf_dir):
    from pyspark.sql import Window

    (events,) = tables(spark, sf_dir, "events")
    daily = events.groupBy(
        F.col("ts").cast("timestamp").cast("date").alias("d")
    ).agg(F.count("*").alias("n"))
    w = Window.orderBy("d").rowsBetween(-7, -1)
    wn = Window.orderBy("d")
    trailed = daily.select(
        "d",
        "n",
        F.avg("n").over(w).alias("trail_avg"),
        F.row_number().over(wn).alias("day_no"),
    ).where(F.col("day_no") > 7)
    return trailed.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n",
        F.round("trail_avg", 2).alias("trail_avg"),
        F.round(F.col("n") / F.col("trail_avg"), 4).alias("arrival_ratio"),
        (F.col("n") < 0.5 * F.col("trail_avg")).alias("under_delivered"),
    ).orderBy("day")


# --------------------------------------------------------------------
# Funnel time-to-convert percentiles
# --------------------------------------------------------------------

@query(
    "funnel_time_to_convert",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id
    ),
    conv AS (
      SELECT epoch_us(first_purchase) - epoch_us(first_view) AS us
      FROM firsts
      WHERE first_view IS NOT NULL AND first_purchase > first_view
    )
    SELECT count(*)::BIGINT AS n_converted,
           round(quantile_cont(us / 3600e6, 0.50), 4) AS p50_hours,
           round(quantile_cont(us / 3600e6, 0.90), 4) AS p90_hours
    FROM conv
    """,
    doc="Funnel latency: exact p50/p90 hours from first view to first "
    "purchase per converting user — the 'how long does conversion "
    "take' readout that funnel_conversion's depth counts don't give. "
    "Per-user firsts are one keyed min-agg (map-side combined); the "
    "percentile runs over |converted users| deltas in integer "
    "microseconds (engine-exact before the single float division).",
)
def funnel_time_to_convert(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    firsts = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", ts)).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", ts)).alias(
            "first_purchase"
        ),
    )
    conv = firsts.where(
        F.col("first_view").isNotNull()
        & (F.col("first_purchase") > F.col("first_view"))
    ).select(
        (
            (F.unix_micros("first_purchase") - F.unix_micros("first_view"))
            / 3600e6
        ).alias("hours")
    )
    return conv.agg(
        F.count("*").alias("n_converted"),
        F.round(F.percentile("hours", F.lit(0.50)), 4).alias("p50_hours"),
        F.round(F.percentile("hours", F.lit(0.90)), 4).alias("p90_hours"),
    )


# --------------------------------------------------------------------
# ABC / Pareto revenue classification
# --------------------------------------------------------------------

@query(
    "abc_pareto_classes",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey, sum(o_totalprice) AS rev FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT rev,
             sum(rev) OVER (ORDER BY rev DESC, o_custkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               / sum(rev) OVER () AS cum_share
      FROM per_cust
    ),
    classed AS (
      SELECT rev,
             CASE WHEN cum_share <= 0.8 THEN 'A'
                  WHEN cum_share <= 0.95 THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked
    )
    SELECT abc,
           count(*)::BIGINT AS n_customers,
           round(sum(rev), 2) AS revenue
    FROM classed GROUP BY abc ORDER BY abc
    """,
    doc="ABC / Pareto classification: customers ranked by revenue, "
    "classed by cumulative share (A = first 80% of revenue, B = next "
    "15%, C = tail) — the 'top customers drive the business' "
    "segmentation next to revenue_gini's scalar. Like Gini, the "
    "global cumulative window runs over the per-customer AGGREGATE, "
    "never raw orders; the class agg after is bounded at 3 rows.",
)
def abc_pareto_classes(spark, sf_dir):
    from pyspark.sql import Window

    (orders,) = tables(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("rev")
    )
    w_cum = (
        Window.orderBy(F.desc("rev"), "o_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    ranked = per_cust.select(
        "rev",
        (F.sum("rev").over(w_cum) / F.sum("rev").over(w_all)).alias("cum_share"),
    )
    classed = ranked.select(
        "rev",
        F.when(F.col("cum_share") <= 0.8, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
        .alias("abc"),
    )
    return (
        classed.groupBy("abc")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("rev"), 2).alias("revenue"),
        )
        .orderBy("abc")
    )


# --------------------------------------------------------------------
# Event-type transition matrix (first-order Markov counts)
# --------------------------------------------------------------------

@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events
    ),
    cnt AS (
      SELECT from_type, to_type, count(*)::BIGINT AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           round(n / sum(n) OVER (PARTITION BY from_type)::DOUBLE, 6) AS p
    FROM cnt
    ORDER BY from_type, to_type
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: P(next type | type) — the behavioral model behind "
    "next-action prediction and absorbing-state churn analysis (and "
    "the 1-gram cousin of event_path_trigrams). One keyed window for "
    "lead(), one count agg; the row-normalization window runs over "
    "the |types|^2 count matrix, not events.",
)
def event_transition_matrix(spark, sf_dir):
    from pyspark.sql import Window

    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    cnt = seq.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    w_row = Window.partitionBy("from_type")
    return (
        cnt.select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n") / F.sum("n").over(w_row).cast("double"), 6).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


# --------------------------------------------------------------------
# Rendezvous (highest-random-weight) sharding
# --------------------------------------------------------------------

_HRW_SHARDS = 4


@query(
    "rendezvous_sharding",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, s.shard,
             CAST(('0x' || substr(md5(doc_id || ':' || s.shard), 1, 8))
                  AS BIGINT) AS w
      FROM documents,
           (SELECT unnest(range(0, {_HRW_SHARDS})) AS shard) s
    ),
    assigned AS (
      SELECT doc_id, shard
      FROM (SELECT doc_id, shard,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY w DESC, shard) AS rn
            FROM scored)
      WHERE rn = 1
    )
    SELECT shard,
           count(*)::BIGINT AS n_docs,
           min(doc_id)      AS min_doc_id
    FROM assigned GROUP BY shard ORDER BY shard
    """,
    doc="Rendezvous / highest-random-weight sharding: each key goes "
    "to the shard maximizing hash(key, shard) — the assignment rule "
    "whose defining property is MINIMAL DISPLACEMENT: removing one "
    "shard remaps only that shard's keys (1/n of the data), where "
    "mod-N sharding remaps nearly everything. The per-key argmax is "
    "a bounded x|shards| explode + row_number over |shards| rows per "
    "key — a narrow map at any scale, no shuffle until the reporting "
    "agg. md5-derived weights make both engines assign identically. "
    "This is how a 100 TB pipeline pins work to workers across "
    "cluster resizes without a full reshuffle.",
)
def rendezvous_sharding(spark, sf_dir):
    from pyspark.sql import Window

    (docs,) = tables(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(_HRW_SHARDS - 1))
        ).alias("shard"),
    ).withColumn(
        "w",
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id"), F.lit(":"), F.col("shard"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
    )
    w_rank = Window.partitionBy("doc_id").orderBy(F.desc("w"), "shard")
    assigned = (
        scored.withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") == 1)
        .select("doc_id", "shard")
    )
    return (
        assigned.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("shard")
    )


# --------------------------------------------------------------------
# Session duration statistics
# --------------------------------------------------------------------

@query(
    "session_duration_stats",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800e6
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM tagged
    ),
    per_session AS (
      SELECT user_id, sid,
             count(*)::BIGINT AS n_events,
             (epoch_us(max(ts)) - epoch_us(min(ts))) / 60e6 AS minutes
      FROM sess GROUP BY user_id, sid
    )
    SELECT count(*)::BIGINT AS n_sessions,
           round(avg(n_events), 4) AS avg_events,
           round(quantile_cont(minutes, 0.5), 4) AS p50_minutes,
           round(quantile_cont(minutes, 0.9), 4) AS p90_minutes
    FROM per_session
    """,
    doc="Session-duration statistics: sessionize (30-minute gap, the "
    "same gaps-and-islands tagging sessionize_events pins) then "
    "reduce each session to (event count, duration) and summarize — "
    "the engagement readout product teams watch weekly. Two stacked "
    "windows on the user key share ONE shuffle (same partitioning "
    "and ordering, the capped_running_balance pattern); the "
    "percentile runs over |sessions| rows. Durations are integer "
    "microseconds until one final division.",
)
def session_duration_stats(spark, sf_dir):
    from pyspark.sql import Window

    (events,) = tables(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = F.lag(ts).over(w)
    tagged = events.select(
        "user_id",
        ts.alias("tss"),
        F.when(
            prev.isNull()
            | ((F.unix_micros(ts) - F.unix_micros(prev)) > 1800e6),
            1,
        ).otherwise(0).alias("new_session"),
    )
    sess = tagged.withColumn(
        "sid",
        F.sum("new_session").over(
            Window.partitionBy("user_id")
            .orderBy("tss")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_session = sess.groupBy("user_id", "sid").agg(
        F.count("*").alias("n_events"),
        (
            (F.unix_micros(F.max("tss")) - F.unix_micros(F.min("tss"))) / 60e6
        ).alias("minutes"),
    )
    return per_session.agg(
        F.count("*").alias("n_sessions"),
        F.round(F.avg("n_events"), 4).alias("avg_events"),
        F.round(F.percentile("minutes", F.lit(0.5)), 4).alias("p50_minutes"),
        F.round(F.percentile("minutes", F.lit(0.9)), 4).alias("p90_minutes"),
    )


# --------------------------------------------------------------------
# Daily retention (D1 / D7)
# --------------------------------------------------------------------

@query(
    "daily_retention_d1_d7",
    oracle="""
    WITH user_days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    firsts AS (
      SELECT user_id, min(d) AS d0 FROM user_days GROUP BY user_id
    )
    SELECT count(*)::BIGINT AS n_users,
           sum(CASE WHEN EXISTS (SELECT 1 FROM user_days u
                                 WHERE u.user_id = f.user_id
                                   AND u.d = f.d0 + 1) THEN 1 ELSE 0 END)::BIGINT
             AS d1_retained,
           sum(CASE WHEN EXISTS (SELECT 1 FROM user_days u
                                 WHERE u.user_id = f.user_id
                                   AND u.d = f.d0 + 7) THEN 1 ELSE 0 END)::BIGINT
             AS d7_retained
    FROM firsts f
    """,
    doc="Classic D1/D7 retention: of all users, how many were active "
    "exactly one and exactly seven days after their FIRST activity — "
    "the mobile-analytics headline metric (cohort_retention gives "
    "the weekly matrix; this is the daily point estimate). Distinct "
    "(user, day) pairs reduce map-side; first-day per user is one "
    "keyed min-agg; the D1/D7 probes are two semi-joins on "
    "(user, exact date) — no window, no explode, three bounded "
    "shuffles on the user key.",
)
def daily_retention_d1_d7(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    user_days = events.select(
        "user_id", F.col("ts").cast("timestamp").cast("date").alias("d")
    ).distinct().localCheckpoint(eager=True)  # three consumers
    firsts = user_days.groupBy("user_id").agg(F.min("d").alias("d0"))
    d1 = user_days.select("user_id", F.col("d").alias("d1"))
    d7 = user_days.select("user_id", F.col("d").alias("d7"))
    probed = (
        firsts.join(
            d1,
            (firsts.user_id == d1.user_id)
            & (F.col("d1") == F.date_add(F.col("d0"), 1)),
            "left_semi",
        )
        .select(F.col("user_id").alias("u1"))
    )
    probed7 = (
        firsts.join(
            d7,
            (firsts.user_id == d7.user_id)
            & (F.col("d7") == F.date_add(F.col("d0"), 7)),
            "left_semi",
        )
        .select(F.col("user_id").alias("u7"))
    )
    return (
        firsts.join(
            probed.withColumn("r1", F.lit(1)),
            firsts.user_id == F.col("u1"),
            "left",
        )
        .join(
            probed7.withColumn("r7", F.lit(1)),
            firsts.user_id == F.col("u7"),
            "left",
        )
        .agg(
            F.count("*").alias("n_users"),
            F.sum(F.coalesce(F.col("r1"), F.lit(0))).alias("d1_retained"),
            F.sum(F.coalesce(F.col("r7"), F.lit(0))).alias("d7_retained"),
        )
    )
