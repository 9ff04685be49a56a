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
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("part_a"),
        F.col("b.l_partkey").alias("part_b"),
    )
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
      SELECT p_partkey, p_name, split_part(p_name, ' ', 1) AS blk
      FROM part
    ),
    cand AS (
      SELECT a.blk,
             levenshtein(a.p_name, b.p_name) AS d
      FROM blocked a JOIN blocked b
        ON a.blk = b.blk AND a.p_partkey < b.p_partkey
    )
    SELECT blk,
           count(*)::BIGINT                       AS n_candidates,
           sum(CASE WHEN d <= 3 THEN 1 ELSE 0 END)::BIGINT AS n_matches,
           round(avg(d), 4)                       AS avg_distance
    FROM cand
    GROUP BY blk
    ORDER BY blk
    """,
    doc="Fuzzy record linkage with blocking: candidate pairs form "
    "only inside a block (first name token), then Levenshtein edit "
    "distance scores each candidate — the classic dedupe/entity-"
    "resolution shape where blocking turns O(n^2) comparisons into "
    "sum-over-blocks of C(block,2). Spark's levenshtein and DuckDB's "
    "are the same textbook DP, so per-pair distances match exactly. "
    "One shuffle on the block key; at 100 TB the block-size "
    "distribution is the knob (composite blocking keys split hot "
    "blocks, exactly like dedup_ngram_jaccard's language blocks).",
)
def record_linkage_fuzzy(spark, sf_dir):
    (part,) = tables(spark, sf_dir, "part")
    blocked = part.select(
        "p_partkey", "p_name", F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("blk")
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
        cand.groupBy("blk")
        .agg(
            F.count("*").alias("n_candidates"),
            F.sum(F.when(F.col("d") <= 3, 1).otherwise(0)).alias("n_matches"),
            F.round(F.avg("d"), 4).alias("avg_distance"),
        )
        .orderBy("blk")
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
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"),
        )
        .distinct()
    )
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    outdeg = edges.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
    n_nodes = nodes.agg(F.count("*").cast("double").alias("n"))

    # rank ~ node-cardinality: broadcast it into the edge join so the
    # big edge relation never reshuffles across iterations.
    ranks = nodes.crossJoin(broadcast(n_nodes)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    edges_deg = edges.join(broadcast(outdeg), "src")
    for _ in range(_PR_ITERS):
        inc = (
            edges_deg.join(
                broadcast(ranks.withColumnRenamed("node", "src")), "src"
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
        "n_events": ("value", "count"),
        "total_value": ("value", "sum"),
        "min_value": ("value", "min"),
        "max_value": ("value", "max"),
    }
    history = events.where(F.col("event_id") % 7 != 0)
    delta = events.where(F.col("event_id") % 7 == 0)
    base = history.groupBy("event_type").agg(
        F.count("value").alias("n_events"),
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
            F.round((F.col("n_chars") - F.col("mu")) / F.col("sigma"), 6).alias("zscore"),
            F.round(
                (F.col("n_chars") - F.col("lo"))
                / (F.col("hi") - F.col("lo")).cast("double"),
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
