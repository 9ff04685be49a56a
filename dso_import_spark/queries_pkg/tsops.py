"""Round-8 batch 2: time-series autocorrelation, cross-table
reconciliation, and bounded-depth graph reachability.

Three operators rounding out families the registry already anchors:

- ``autocorrelation_lags``: ACF of the hourly event-count series at
  lags 1 and 24 per series — the seasonality detector that tells a
  pipeline whether seasonal_baseline_residuals' (day-of-week, hour)
  model is even warranted; one hourly aggregate + one lag window.
- ``order_lineitem_reconcile``: header-vs-detail money reconciliation
  (o_totalprice vs the recomputed lineitem extension) in exact
  integer centi-cents — the cross-table consistency audit the per-
  table quality gates (SURVEY §2.6) structurally cannot see.
- ``khop_reachability``: minimum-hop BFS reach counts from a seed set
  over the co-purchase graph, depth-bounded at 3 — iterative frontier
  joins with per-iteration localCheckpoint (the connected-components
  discipline) on the Spark side, a recursive CTE replay on the oracle
  side: the two formulations are independent, which is the point.

Determinism notes: per-term products are micro-quantized to BIGINT
before any cross-row sum (engine sum order differs); money flows as
exact centi-cent BIGINTs; degenerate denominators emit explicit 0.0
sentinels in both engines (the ADVICE r7 kappa/F1 discipline); BFS
hop assignment is min-hop by construction on both sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dso_import_spark.queries import query
from dso_import_spark.queries_pkg.util import tables

# ---------------------------------------------------------------------------
# Autocorrelation of the hourly count series at fixed lags
# ---------------------------------------------------------------------------


@query(
    "autocorrelation_lags",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             count(*)::BIGINT AS x
      FROM events WHERE event_type IS NOT NULL
      GROUP BY event_type, date_trunc('hour', ts)),
    stats AS (
      SELECT event_type, count(*)::BIGINT AS n,
             sum(x)::BIGINT AS sx
      FROM hourly GROUP BY event_type),
    lagged AS (
      SELECT h.event_type, h.x, s.n,
             s.sx * 1.0 / s.n AS xbar,
             l1.x AS x1, l24.x AS x24
      FROM hourly h
      JOIN stats s ON s.event_type = h.event_type
      LEFT JOIN hourly l1 ON l1.event_type = h.event_type
                         AND l1.h = h.h - INTERVAL 1 HOUR
      LEFT JOIN hourly l24 ON l24.event_type = h.event_type
                          AND l24.h = h.h - INTERVAL 24 HOUR),
    terms AS (
      SELECT event_type, n,
             CAST(round(1000000 * ((x - xbar) * (x - xbar))) AS BIGINT)
               AS den_micro,
             CASE WHEN x1 IS NOT NULL THEN
               CAST(round(1000000 * ((x - xbar) * (x1 - xbar))) AS BIGINT)
             ELSE 0 END AS num1_micro,
             CASE WHEN x24 IS NOT NULL THEN
               CAST(round(1000000 * ((x - xbar) * (x24 - xbar))) AS BIGINT)
             ELSE 0 END AS num24_micro
      FROM lagged)
    SELECT event_type, max(n) AS n_hours,
           CASE WHEN sum(den_micro) > 0
           THEN round(sum(num1_micro) * 1.0 / sum(den_micro), 6)
           ELSE 0.0 END AS acf_lag1,
           CASE WHEN sum(den_micro) > 0
           THEN round(sum(num24_micro) * 1.0 / sum(den_micro), 6)
           ELSE 0.0 END AS acf_lag24
    FROM terms GROUP BY event_type
    """,
    doc="Autocorrelation of the hourly event-count series at lags 1 "
    "and 24 per event type — the seasonality detector run before "
    "fitting any (day-of-week, hour) baseline: r_24 >> 0 says daily "
    "seasonality is real, r_1 measures short-range burstiness. "
    "r_k = Σ(x_t-x̄)(x_{t-k}-x̄)/Σ(x_t-x̄)² over the hourly counts. "
    "Lag alignment is CALENDAR-correct: x_{t-k} comes from a self-"
    "join on h - INTERVAL k HOUR, not a lag() over observed-row "
    "order — on a gappy series a row-lag silently pairs an hour with "
    "the 24th OBSERVED hour back (26+ calendar hours across a quiet "
    "night), measuring the wrong lag while both engines agree "
    "(round-8 code review); missing partner hours drop out of the "
    "numerator exactly as a NULL lag would. x̄ comes from exact "
    "BIGINT (count, sum) so both engines build the identical double, "
    "every cross-term is micro-quantized to BIGINT with the IDENTICAL "
    "association 1e6·((a)·(b)) BEFORE the cross-row sum (engine sum "
    "order differs, exact integer sums do not), and a zero "
    "denominator (constant series) emits the explicit 0.0 sentinel. "
    "Join input is |hours| per series (the drift_ks posture), never "
    "|events|.",
)
def autocorrelation_lags(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    hourly = (
        events.where(F.col("event_type").isNotNull())
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
        # three consumers (base + two calendar-offset sides): the
        # |hours|-bounded relation computes once
        .localCheckpoint(eager=True)
    )
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
    )
    l1 = hourly.select(
        F.col("event_type").alias("et1"),
        F.col("h").alias("h1"),
        F.col("x").alias("x1"),
    )
    l24 = hourly.select(
        F.col("event_type").alias("et24"),
        F.col("h").alias("h24"),
        F.col("x").alias("x24"),
    )
    base = hourly.join(F.broadcast(stats), "event_type")
    lagged = (
        base.join(
            l1,
            (F.col("et1") == F.col("event_type"))
            & (F.col("h1") == F.col("h") - F.expr("INTERVAL 1 HOUR")),
            "left",
        )
        .join(
            l24,
            (F.col("et24") == F.col("event_type"))
            & (F.col("h24") == F.col("h") - F.expr("INTERVAL 24 HOUR")),
            "left",
        )
    )
    xbar = F.col("sx") * 1.0 / F.col("n")

    def q(a, b):
        # identical association to the oracle: 1e6 * ((a) * (b))
        return F.round(F.lit(1000000) * ((a) * (b))).cast("long")

    d0 = F.col("x") - xbar
    terms = lagged.select(
        "event_type",
        "n",
        q(d0, d0).alias("den_micro"),
        F.when(F.col("x1").isNotNull(), q(d0, F.col("x1") - xbar))
        .otherwise(F.lit(0))
        .alias("num1_micro"),
        F.when(F.col("x24").isNotNull(), q(d0, F.col("x24") - xbar))
        .otherwise(F.lit(0))
        .alias("num24_micro"),
    )
    den = F.sum("den_micro")
    return terms.groupBy("event_type").agg(
        F.max("n").alias("n_hours"),
        F.when(den > 0, F.round(F.sum("num1_micro") * 1.0 / den, 6))
        .otherwise(F.lit(0.0))
        .alias("acf_lag1"),
        F.when(den > 0, F.round(F.sum("num24_micro") * 1.0 / den, 6))
        .otherwise(F.lit(0.0))
        .alias("acf_lag24"),
    )


# ---------------------------------------------------------------------------
# Header-vs-detail money reconciliation
# ---------------------------------------------------------------------------


@query(
    "order_lineitem_reconcile",
    oracle="""
    WITH detail AS (
      SELECT l_orderkey,
             sum(CAST(round(10000 * l_extendedprice * (1 - l_discount)
                            * (1 + l_tax)) AS BIGINT))::BIGINT AS detail_cc
      FROM lineitem GROUP BY l_orderkey),
    joined AS (
      SELECT coalesce(o.o_orderpriority, '_orphan_detail') AS priority,
             coalesce(d.detail_cc, 0)
               - coalesce(CAST(round(10000 * o.o_totalprice) AS BIGINT), 0)
               AS diff_cc
      FROM orders o FULL OUTER JOIN detail d
        ON d.l_orderkey = o.o_orderkey)
    SELECT priority, count(*)::BIGINT AS n_orders,
           sum((abs(diff_cc) > 100)::INT)::BIGINT AS n_mismatched,
           max(abs(diff_cc))::BIGINT AS max_abs_diff_cc
    FROM joined GROUP BY priority
    """,
    doc="Header-vs-detail reconciliation: o_totalprice recomputed from "
    "its lineitems as Σ extendedprice·(1-discount)·(1+tax), compared "
    "in exact CENTI-CENT BIGINTs (each line's extension is quantized "
    "to 1/10000 currency units BEFORE the per-order sum, so partition "
    "order cannot move a single bit on either engine). Reports per "
    "priority the order count, orders off by more than a cent, and "
    "the worst absolute discrepancy — the cross-TABLE consistency "
    "audit per-table quality gates (SURVEY §2.6) structurally cannot "
    "express, and the first thing a migration validates after loading "
    "a header/detail pair. Headerless details and detail-less headers "
    "BOTH surface: FULL OUTER join — orphan lineitems (the exact "
    "integrity breach a reconciliation exists to catch; a LEFT join "
    "from orders would silently drop them, round-8 code review) land "
    "in an explicit '_orphan_detail' bucket, detail-less orders "
    "mismatch against a zero recomputation. One shuffle per side on "
    "the order key.",
)
def order_lineitem_reconcile(spark, sf_dir):
    orders, li = tables(spark, sf_dir, "orders", "lineitem")
    line_cc = F.round(
        F.lit(10000)
        * F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
    ).cast("long")
    detail = li.groupBy("l_orderkey").agg(
        F.sum(line_cc).cast("long").alias("detail_cc")
    )
    joined = orders.join(
        detail, F.col("l_orderkey") == F.col("o_orderkey"), "full_outer"
    ).select(
        F.coalesce(F.col("o_orderpriority"), F.lit("_orphan_detail")).alias(
            "priority"
        ),
        (
            F.coalesce(F.col("detail_cc"), F.lit(0))
            - F.coalesce(
                F.round(F.lit(10000) * F.col("o_totalprice")).cast("long"),
                F.lit(0),
            )
        ).alias("diff_cc"),
    )
    return joined.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum((F.abs(F.col("diff_cc")) > 100).cast("int"))
        .cast("long")
        .alias("n_mismatched"),
        F.max(F.abs(F.col("diff_cc"))).cast("long").alias("max_abs_diff_cc"),
    )


# ---------------------------------------------------------------------------
# Bounded-depth BFS reachability over the co-purchase graph
# ---------------------------------------------------------------------------

_KHOP_SEEDS = 10
_KHOP_DEPTH = 3


def copurchase_edges(li):
    """One-directional distinct co-purchase edges (u < v): parts
    sharing an order. Basket-bounded (the basket_pair_affinity bound)
    — never |parts|²."""
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )


def copurchase_adj(li):
    """Symmetric adjacency: both directions of copurchase_edges.
    NOTE: a union of the edge subtree with its swap — consumers that
    execute it more than once (or even once, uncached: both union
    branches re-run the self-join) should localCheckpoint, as
    khop_reach_counts does."""
    edges = copurchase_edges(li)
    return edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


@query(
    "copurchase_degree_histogram",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    adj AS (SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges),
    deg AS (SELECT u, count(*)::BIGINT AS degree FROM adj GROUP BY u)
    SELECT degree, count(*)::BIGINT AS n_nodes
    FROM deg GROUP BY degree
    """,
    doc="Degree distribution of the co-purchase graph (distinct "
    "neighbors per part): the first diagnostic run before ANY graph "
    "algorithm — a heavy-tailed degree histogram predicts skewed "
    "frontier joins (khop), hub-dominated PageRank mass, and triangle "
    "blowup, and says whether hub-salting is needed. Reuses the "
    "khop adjacency builder (copurchase_adj). Integer counts only. "
    "Shape: basket-bounded edge build, two map-side-combinable "
    "count shuffles; output bounded by max degree.",
)
def copurchase_degree_histogram(spark, sf_dir):
    (li,) = tables(spark, sf_dir, "lineitem")
    # degree from the ONE-directional distinct edge relation by
    # exploding both endpoints: consuming copurchase_adj (a union of
    # the edge subtree with its swap) would execute the expensive
    # basket self-join + distinct twice, once per union branch
    # (round-9 review; khop avoids the same by checkpointing). Edges
    # are distinct (u < v), so each neighbor contributes exactly once.
    deg = (
        copurchase_edges(li)
        .select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )


def khop_reach_counts(
    li, n_seeds: int = _KHOP_SEEDS, depth: int = _KHOP_DEPTH
):
    """Min-hop BFS reach counts from the `n_seeds` smallest part keys
    over the co-purchase graph, depth-bounded at `depth` — the
    reusable operator (VERDICT r8 item #5: depth was a baked module
    constant; now an argument, with the registry query below pinning
    the differential fixture at depth=3). Returns (hop, n_reached).

    Scale shape: iterative frontier joins; each hop joins the frontier
    to the (basket-bounded, localCheckpoint-ed) adjacency list,
    anti-joins the visited set, and re-checkpoints visited so the plan
    stays flat across iterations. The frontier is re-read FROM the
    checkpointed visited relation — keeping `nxt`'s own lineage would
    re-execute every prior hop's join inside the next hop's plan,
    O(depth²) join work (round-8 code review / SCALING.md A/B: the
    no-checkpoint arm DNFs at ×100).
    """
    if depth < 0:
        raise ValueError(f"khop_reach_counts: depth must be >= 0, got {depth}")
    adj = copurchase_adj(li).localCheckpoint(eager=True)
    seeds = (
        li.select("l_partkey")
        .distinct()
        .orderBy("l_partkey")
        .limit(n_seeds)
        .select(F.col("l_partkey").alias("node"))
    )
    reached = seeds.withColumn("hop", F.lit(0)).localCheckpoint(eager=True)
    frontier = reached.select("node")
    for h in range(1, depth + 1):
        nxt = (
            frontier.join(adj, frontier["node"] == adj["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(reached.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(h))
        )
        reached = reached.union(nxt).localCheckpoint(eager=True)
        frontier = reached.where(F.col("hop") == h).select("node")
    return reached.groupBy("hop").agg(
        F.count(F.lit(1)).cast("long").alias("n_reached")
    )


@query(
    "khop_reachability",
    oracle=f"""
    WITH RECURSIVE
    items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    adj AS (SELECT u, v FROM edges UNION SELECT v AS u, u AS v FROM edges),
    seeds AS (
      SELECT l_partkey AS node
      FROM (SELECT DISTINCT l_partkey FROM lineitem
            ORDER BY l_partkey LIMIT {_KHOP_SEEDS})),
    bfs(node, hop) AS (
      SELECT node, 0 FROM seeds
      UNION
      SELECT a.v, b.hop + 1
      FROM bfs b JOIN adj a ON a.u = b.node
      WHERE b.hop < {_KHOP_DEPTH}),
    minhop AS (SELECT node, min(hop) AS hop FROM bfs GROUP BY node)
    SELECT hop, count(*)::BIGINT AS n_reached
    FROM minhop GROUP BY hop
    """,
    doc=f"Minimum-hop BFS reach counts from the {_KHOP_SEEDS} smallest "
    f"part keys over the co-purchase graph, depth-bounded at "
    f"{_KHOP_DEPTH} — the recall/blast-radius primitive behind "
    "'which parts are within k recommendation hops' and supply-chain "
    "impact analysis; completes the graph family (pagerank = "
    "importance, triangles = density, components = partition, BFS = "
    "reachability). Spark side: iterative frontier joins — each hop "
    "joins the frontier to the adjacency list, anti-joins the "
    "visited set, and localCheckpoints the (bounded, |nodes|-sized) "
    "visited relation so the plan stays flat across iterations (the "
    "connected-components discipline, dedup.py:connected_components). "
    "Oracle side: an independent WITH RECURSIVE replay with min-hop "
    "grouping. Per-hop counts are exact; min-hop is deterministic by "
    "construction on both sides. Edges are basket-bounded "
    "(the basket_pair_affinity bound), never |parts|².",
)
def khop_reachability(spark, sf_dir):
    (li,) = tables(spark, sf_dir, "lineitem")
    # differential fixture pins (n_seeds=10, depth=3) to match the
    # oracle literal above; the operator itself takes depth as an arg
    return khop_reach_counts(li, n_seeds=_KHOP_SEEDS, depth=_KHOP_DEPTH)


# ---------------------------------------------------------------------------
# MASE: seasonal-naive forecast error scaled by the naive baseline
# ---------------------------------------------------------------------------


@query(
    "mase_seasonal_naive",
    oracle="""
    WITH hourly AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS h,
             count(*)::BIGINT AS y
      FROM events GROUP BY event_type, epoch_us(ts) // 3600000000),
    j AS (
      SELECT c.event_type,
             abs(c.y - s.y)::BIGINT AS e_seasonal,
             abs(c.y - n.y)::BIGINT AS e_naive
      FROM hourly c
      JOIN hourly s ON s.event_type = c.event_type AND s.h = c.h - 24
      JOIN hourly n ON n.event_type = c.event_type AND n.h = c.h - 1)
    SELECT event_type, count(*)::BIGINT AS n_hours,
           round(sum(e_seasonal) / count(*)::DOUBLE, 4) AS mae_seasonal,
           round(sum(e_naive) / count(*)::DOUBLE, 4) AS mae_naive,
           CASE WHEN sum(e_naive) = 0 THEN 0.0
                ELSE round(sum(e_seasonal) / sum(e_naive)::DOUBLE, 6) END
             AS mase
    FROM j GROUP BY event_type
    """,
    doc="MASE readout of the seasonal-naive forecaster (predict this "
    "hour = same hour yesterday) against the naive baseline (= last "
    "hour) on the hourly count series per event type: MASE < 1 means "
    "daily seasonality carries real signal beyond short-term "
    "persistence — the go/no-go check run before building any "
    "fancier forecaster, and the scale-free error unit forecast "
    "evaluations standardize on. Hours are epoch-hour integers, so "
    "the lag joins are exact equi-joins (no window over a dense "
    "spine needed; hours missing either lag drop identically on both "
    "engines). Integer counts, exact BIGINT error sums, one final "
    "guarded division (all-zero naive error hits the 0.0 sentinel). "
    "Shape: one hourly count agg (map-side combinable), two "
    "self-equi-joins on the |types|x|hours|-bounded series relation, "
    "|types|-bounded combine.",
)
def mase_seasonal_naive(spark, sf_dir):
    (ev,) = tables(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000
        ).alias("h"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    c, s, n = hourly.alias("c"), hourly.alias("s"), hourly.alias("n")
    j = (
        c.join(
            s,
            (F.col("s.event_type") == F.col("c.event_type"))
            & (F.col("s.h") == F.col("c.h") - 24),
        )
        .join(
            n,
            (F.col("n.event_type") == F.col("c.event_type"))
            & (F.col("n.h") == F.col("c.h") - 1),
        )
        .select(
            F.col("c.event_type").alias("event_type"),
            F.abs(F.col("c.y") - F.col("s.y")).cast("long").alias("e_seasonal"),
            F.abs(F.col("c.y") - F.col("n.y")).cast("long").alias("e_naive"),
        )
    )
    cnt = F.count(F.lit(1))
    return j.groupBy("event_type").agg(
        cnt.cast("long").alias("n_hours"),
        F.round(F.sum("e_seasonal") / cnt.cast("double"), 4).alias(
            "mae_seasonal"
        ),
        F.round(F.sum("e_naive") / cnt.cast("double"), 4).alias("mae_naive"),
        F.when(F.sum("e_naive") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.sum("e_seasonal") / F.sum("e_naive").cast("double"), 6
            )
        )
        .alias("mase"),
    )
