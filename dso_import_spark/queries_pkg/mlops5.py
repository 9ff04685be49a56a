"""Fifth stats/eval batch: survival analysis, rank correlation,
permutation inference, LM evaluation, projection certification, power
analysis, paired-classifier testing, and species-richness estimation.

Round-9 additions extending the model-eval/experimentation family
(mlops.py..mlops4.py) — each a standard readout a training-data or
experimentation pipeline runs, re-expressed as Spark aggregates with
engine-replayable arithmetic:

- ``kaplan_meier_interarrival``: Kaplan–Meier survival curve over
  per-user inter-event gaps with each user's open final gap
  right-censored at the horizon — THE estimator for time-to-next-event
  when the newest gaps haven't closed yet (a naive mean gap is biased
  short). (First drafted over user lifetimes; the synthetic fixture
  keeps every user active to the horizon, so that form was vacuous —
  zero churn events at every SF — and was redefined at birth.)
- ``spearman_rank_correlation``: Spearman's ρ between order value and
  basket size via distributed average-ranking — monotone association
  robust to the heavy right tail that makes Pearson on raw money
  meaningless. The ranking is the scale shape: bucket-offset prefix
  sums + within-bucket windows, never a global single-partition sort.
- ``permutation_test_signflip``: exact-arithmetic permutation test for
  the between-arm difference of per-user means under B=128
  deterministic label reassignments — the nonparametric answer when
  the t-test's normality assumption is the thing in question.
- ``unigram_perplexity_heldout``: add-one-smoothed unigram LM fit on a
  hash-split train corpus, perplexity evaluated per language on the
  held-out split — the classic data-quality readout (rising perplexity
  on held-out data = train/eval distribution drift or contamination).
- ``jl_projection_distortion_cert``: Johnson–Lindenstrauss ±1 random
  projection d→16 with a pairwise-distance distortion certificate —
  "measure before you trust the sketch" (minhash_recall_cert,
  ann_recall_report) applied to dimensionality reduction.
- ``ab_minimum_detectable_effect``: per-metric absolute MDE at
  α=0.05 / power 0.8 from the observed per-arm variance of per-user
  totals — the power analysis every experiment design starts with.
- ``mcnemar_paired_test``: continuity-corrected McNemar χ² over the
  disagreement counts of two paired classifiers on the same documents
  — the correct test for "is classifier B better than A on the same
  data" (a two-proportion z-test ignores the pairing).
- ``vocab_chao1_richness``: bias-corrected Chao1 estimate of the total
  vocabulary per language from singleton/doubleton counts — estimates
  how much of the long tail the crawl hasn't seen yet.

Batch 2 (same round):

- ``logrank_two_arm``: log-rank test between two arms' survival
  curves — the inferential companion to kaplan_meier_interarrival.
- ``rrf_rank_fusion``: reciprocal-rank fusion of two top-N rankings —
  the zero-tuning combiner for heterogeneous retrieval signals.
- ``weighted_median_groups``: distributed weighted median per group
  via the bucket-offset cumulative-weight shape.

Determinism (house rules): all cross-row sums are exact (BIGINT or
DECIMAL(38,0)/HUGEINT over pre-quantized integers); libm results (ln,
exp, sqrt) are micro-quantized before any cross-row use; divisions of
exact integers evaluate to bit-identical doubles on both engines; data
edges (empty arms, zero variance, b+c=0) hit explicit CASE sentinels
replicated in both engines. Everything is JVM-side Column arithmetic
except the JL projection, which is a deliberate Arrow-batched int64
numpy matmul (exact integers — see its docstring for the measured
11→5.7 s ×100 win over the interpreted higher-order-function form).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from dso_import_spark.queries import query
from dso_import_spark.queries_pkg.util import tables

# ---------------------------------------------------------------------------
# Kaplan–Meier survival over inter-event gaps (renewal process)
# ---------------------------------------------------------------------------


@query(
    "kaplan_meier_interarrival",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS tu FROM events),
    h AS (SELECT max(tu) AS hu FROM e),
    gaps AS (
      SELECT CASE WHEN nxt IS NULL
                  THEN ((SELECT hu FROM h) - tu) // 3600000000
                  ELSE (nxt - tu) // 3600000000 END AS gap_hours,
             CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS observed
      FROM (SELECT user_id, tu,
                   lead(tu) OVER (PARTITION BY user_id ORDER BY tu) AS nxt
            FROM e)),
    g AS (
      SELECT gap_hours, sum(observed)::BIGINT AS n_events,
             count(*)::BIGINT AS n_total
      FROM gaps GROUP BY gap_hours),
    w AS (
      SELECT gap_hours, n_events,
             sum(n_total) OVER (ORDER BY gap_hours DESC)::BIGINT AS at_risk
      FROM g),
    steps AS (
      SELECT gap_hours, n_events, at_risk,
             round(ln(1.0 - n_events / at_risk::DOUBLE) * 1000000)::BIGINT
               AS t_micro
      FROM w WHERE n_events > 0 AND n_events < at_risk)
    SELECT gap_hours, n_events, at_risk,
           round(exp(sum(t_micro) OVER (ORDER BY gap_hours) / 1000000.0), 6)
             AS survival
    FROM steps
    """,
    doc="Kaplan–Meier survival of the time-to-next-event: per user, "
    "gaps between consecutive events (hours) are observed durations; "
    "the open gap from each user's LAST event to the horizon is "
    "right-censored (the next event hadn't happened when observation "
    "stopped) — the estimator that reads inter-arrival behavior "
    "without the bias of dropping the unfinished gaps (a naive mean "
    "gap is biased short). Survival multiplies (1 - d_i/r_i) over gap "
    "steps — exp of an exact BIGINT sum of micro-quantized log terms, "
    "partition-order-proof. Terminal all-event steps (d_i = r_i, ln 0) "
    "are excluded identically on both engines. Tie order inside a "
    "user's equal timestamps cannot change the gap multiset "
    "(consecutive differences of a sorted multiset). Shape: one "
    "user-PARTITIONED lead window, one gap-histogram agg; the KM "
    "windows run over the |distinct gap values| relation — "
    "horizon-bounded state, never data.",
)
def kaplan_meier_interarrival(spark, sf_dir):
    (ev,) = tables(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tu"),
    )
    h = e.agg(F.max("tu").alias("hu"))
    w_user = Window.partitionBy("user_id").orderBy("tu")
    gaps = (
        e.withColumn("nxt", F.lead("tu").over(w_user))
        .crossJoin(F.broadcast(h))
        .select(
            F.when(
                F.col("nxt").isNull(),
                F.floor((F.col("hu") - F.col("tu")) / 3_600_000_000),
            )
            .otherwise(F.floor((F.col("nxt") - F.col("tu")) / 3_600_000_000))
            .alias("gap_hours"),
            F.when(F.col("nxt").isNull(), 0).otherwise(1).alias("observed"),
        )
    )
    g = gaps.groupBy("gap_hours").agg(
        F.sum("observed").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_total"),
    )
    w_desc = Window.orderBy(F.col("gap_hours").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w = g.select(
        "gap_hours",
        "n_events",
        F.sum("n_total").over(w_desc).cast("long").alias("at_risk"),
    )
    steps = w.filter(
        (F.col("n_events") > 0) & (F.col("n_events") < F.col("at_risk"))
    ).withColumn(
        "t_micro",
        F.round(
            F.log(F.lit(1.0) - F.col("n_events") / F.col("at_risk")) * 1e6
        ).cast("long"),
    )
    w_asc = Window.orderBy("gap_hours").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return steps.select(
        "gap_hours",
        "n_events",
        "at_risk",
        F.round(F.exp(F.sum("t_micro").over(w_asc) / 1e6), 6).alias(
            "survival"
        ),
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation via distributed average-ranking
# ---------------------------------------------------------------------------

_SPEAR_BUCKET_CENTS = 5_000_000  # $50k value buckets for the rank offsets


@query(
    "spearman_rank_correlation",
    oracle=f"""
    WITH icnt AS (
      SELECT l_orderkey, count(*)::BIGINT AS n_items
      FROM lineitem GROUP BY l_orderkey),
    cont AS (
      SELECT round(o.o_totalprice * 100)::BIGINT AS cents, n_items,
             count(*)::BIGINT AS cnt
      FROM orders o JOIN icnt ON icnt.l_orderkey = o.o_orderkey
      GROUP BY round(o.o_totalprice * 100)::BIGINT, n_items),
    xv AS (SELECT cents, sum(cnt)::BIGINT AS cnt,
                  cents // {_SPEAR_BUCKET_CENTS} AS bkt
           FROM cont GROUP BY cents),
    boff AS (
      SELECT bkt, coalesce(sum(btot) OVER (ORDER BY bkt
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
               AS off
      FROM (SELECT bkt, sum(cnt)::BIGINT AS btot FROM xv GROUP BY bkt)),
    xr AS (
      SELECT cents,
             2 * (boff.off + coalesce(sum(cnt) OVER (PARTITION BY xv.bkt
                    ORDER BY cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
               + cnt + 1 AS rank2x
      FROM xv JOIN boff ON boff.bkt = xv.bkt),
    yv AS (SELECT n_items, sum(cnt)::BIGINT AS cnt FROM cont
           GROUP BY n_items),
    yr AS (
      SELECT n_items,
             2 * coalesce(sum(cnt) OVER (ORDER BY n_items
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + cnt + 1 AS rank2y
      FROM yv),
    rk AS (
      SELECT cnt::HUGEINT AS w, rank2x::HUGEINT AS rx, rank2y::HUGEINT AS ry
      FROM cont JOIN xr USING (cents) JOIN yr USING (n_items)),
    s AS (
      SELECT sum(w) AS n, sum(w * rx) AS sx, sum(w * ry) AS sy,
             sum(w * rx * ry) AS sxy, sum(w * rx * rx) AS sxx,
             sum(w * ry * ry) AS syy
      FROM rk)
    SELECT n::BIGINT AS n_orders,
           CASE WHEN (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                   * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE) > 0
           THEN round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                  * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 6)
           END AS rho_spearman
    FROM s
    """,
    doc="Spearman's rho between order value and basket size: Pearson "
    "over average ranks (ties get the midrank), ranks kept as exact "
    "integers by doubling (2*cnt_less + cnt_eq + 1), moment sums exact "
    "in DECIMAL(38,0)/HUGEINT, so the final rho is a deterministic "
    "double of exact integers. Two scale shapes: (1) all rank "
    "arithmetic and moment sums ride the (cents, n_items) CONTINGENCY "
    "relation — per-order rows never survive past one map-side-"
    "combinable aggregate (the first form joined ranks back to the "
    "per-order relation and measured 64.8 s at x100; this form 12.7 s "
    "— SCALING.md round 9); (2) ranks come from $50k-bucket offsets "
    "(a bounded bucket relation carries the prefix sums) plus "
    "PARTITIONed within-bucket windows, never a global sort-window "
    "funneling O(n) distinct values through one partition.",
)
def spearman_rank_correlation(spark, sf_dir):
    orders, li = tables(spark, sf_dir, "orders", "lineitem")
    icnt = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_items")
    )
    cont = (
        orders.select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .join(icnt, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("cents", "n_items")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    xv = cont.groupBy("cents").agg(
        F.sum("cnt").cast("long").alias("cnt")
    ).withColumn(
        # F.floor to match the oracle's `//` (floor division): a plain
        # divide-then-cast truncates toward zero, which diverges on
        # negative cents (round-9 advice; latent on positive fixtures)
        "bkt", F.floor(F.col("cents") / _SPEAR_BUCKET_CENTS).cast("long")
    )
    w_bkt = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    boff = (
        xv.groupBy("bkt")
        .agg(F.sum("cnt").alias("btot"))
        .select(
            "bkt",
            F.coalesce(F.sum("btot").over(w_bkt), F.lit(0)).cast("long").alias("off"),
        )
    )
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    xr = xv.join(F.broadcast(boff), "bkt").select(
        "cents",
        (
            2 * (F.col("off") + F.coalesce(F.sum("cnt").over(w_in), F.lit(0)))
            + F.col("cnt")
            + 1
        ).alias("rank2x"),
    )
    yv = cont.groupBy("n_items").agg(F.sum("cnt").cast("long").alias("cnt"))
    w_y = Window.orderBy("n_items").rowsBetween(Window.unboundedPreceding, -1)
    yr = yv.select(
        "n_items",
        (
            2 * F.coalesce(F.sum("cnt").over(w_y), F.lit(0))
            + F.col("cnt")
            + 1
        ).alias("rank2y"),
    )
    dec = "decimal(38,0)"
    rk = cont.join(xr, "cents").join(F.broadcast(yr), "n_items").select(
        F.col("cnt").cast(dec).alias("w"),
        F.col("rank2x").cast(dec).alias("rx"),
        F.col("rank2y").cast(dec).alias("ry"),
    )
    s = rk.agg(
        F.sum("w").alias("n"),
        F.sum(F.col("w") * F.col("rx")).alias("sx"),
        F.sum(F.col("w") * F.col("ry")).alias("sy"),
        F.sum(F.col("w") * F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("w") * F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("w") * F.col("ry") * F.col("ry")).alias("syy"),
    )
    n, sx, sy = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    sxy, sxx, syy = (F.col(c).cast("double") for c in ("sxy", "sxx", "syy"))
    den = (n * sxx - sx * sx) * (n * syy - sy * sy)
    # constant x or y: rho undefined -> NULL on BOTH engines (ANSI
    # Spark throws DIVIDE_BY_ZERO while DuckDB returns IEEE inf — a
    # cross-engine divergence found by the hypothesis brute-force
    # property test on an all-identical-rows example)
    return s.select(
        F.col("n").cast("long").alias("n_orders"),
        F.when(
            den > 0,
            F.round((n * sxy - sx * sy) / F.sqrt(den), 6),
        ).alias("rho_spearman"),
    )


# ---------------------------------------------------------------------------
# Deterministic permutation test (sign-flip relabeling of users)
# ---------------------------------------------------------------------------

_PERM_B = 128


@query(
    "permutation_test_signflip",
    oracle=f"""
    WITH ux AS (
      SELECT user_id, sum(round(value * 1000000)::BIGINT) AS xm
      FROM events WHERE value IS NOT NULL GROUP BY user_id),
    obs AS (
      -- arm 1 is `% 2 != 0`, NOT `= 1`: the Spark side uses ~(% 2 == 0),
      -- and a negative odd user_id gives % 2 = -1 on both engines —
      -- `= 1` would drop it from the oracle's arm 1 only (r9 advice)
      SELECT sum(xm) FILTER (WHERE user_id % 2 = 0)::DOUBLE
               / count(*) FILTER (WHERE user_id % 2 = 0)
           - sum(xm) FILTER (WHERE user_id % 2 != 0)::DOUBLE
               / count(*) FILTER (WHERE user_id % 2 != 0) AS d_obs
      FROM ux),
    perms AS (
      SELECT b,
             sum(xm) FILTER (WHERE flip)::DOUBLE / count(*) FILTER (WHERE flip)
           - sum(xm) FILTER (WHERE NOT flip)::DOUBLE
               / count(*) FILTER (WHERE NOT flip) AS d_b
      FROM (SELECT xm, b,
                   ((user_id * 1103515245 + b * 12345) & 255) < 128 AS flip
            FROM ux CROSS JOIN generate_series(0, {_PERM_B - 1}) AS t(b))
      GROUP BY b)
    SELECT round((SELECT d_obs FROM obs) / 1000000.0, 6) AS diff_obs,
           round((1 + count(*) FILTER (WHERE abs(d_b) >= abs((SELECT d_obs
                    FROM obs))))::DOUBLE / {_PERM_B + 1}, 6) AS p_value
    FROM perms
    """,
    doc="Permutation test for the between-arm difference of per-user "
    "mean event value: B=128 deterministic relabelings (an LCG-hash "
    "bit of (user_id, b) flips each user's arm), p = (1 + #{|d_b| >= "
    "|d_obs|}) / (B+1) — the nonparametric inference that stays valid "
    "when per-user totals are skewed. Users (not events) are the "
    "randomization unit (the ratio_metric_delta_ci discipline). Every "
    "d_b is a difference of divisions of exact BIGINT micro sums, so "
    "both engines compare bit-identical doubles — no rounding is "
    "needed before the >= comparison. Shape: one per-user agg, a "
    "x128 explode of the (bounded) per-user relation collapsing "
    "map-side into 128 groups, 1-row combine.",
)
def permutation_test_signflip(spark, sf_dir):
    (ev,) = tables(spark, sf_dir, "events")
    ux = (
        ev.filter(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(F.sum(F.round(F.col("value") * 1e6).cast("long")).alias("xm"))
    )
    even = F.col("user_id") % 2 == 0
    obs = ux.agg(
        (
            F.sum(F.when(even, F.col("xm"))).cast("double")
            / F.count(F.when(even, 1))
            - F.sum(F.when(~even, F.col("xm"))).cast("double")
            / F.count(F.when(~even, 1))
        ).alias("d_obs")
    )
    flips = ux.select(
        "user_id",
        "xm",
        F.explode(F.sequence(F.lit(0), F.lit(_PERM_B - 1))).alias("b"),
    ).withColumn(
        "flip",
        (F.col("user_id") * 1103515245 + F.col("b") * 12345)
        .bitwiseAND(F.lit(255))
        < 128,
    )
    perms = flips.groupBy("b").agg(
        (
            F.sum(F.when(F.col("flip"), F.col("xm"))).cast("double")
            / F.count(F.when(F.col("flip"), 1))
            - F.sum(F.when(~F.col("flip"), F.col("xm"))).cast("double")
            / F.count(F.when(~F.col("flip"), 1))
        ).alias("d_b")
    )
    return perms.crossJoin(F.broadcast(obs)).agg(
        F.round(F.first("d_obs") / 1e6, 6).alias("diff_obs"),
        F.round(
            (
                1
                + F.count(
                    F.when(F.abs(F.col("d_b")) >= F.abs(F.col("d_obs")), 1)
                )
            ).cast("double")
            / (_PERM_B + 1),
            6,
        ).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# Held-out unigram perplexity per language
# ---------------------------------------------------------------------------


@query(
    "unigram_perplexity_heldout",
    oracle="""
    WITH words AS (
      SELECT doc_id, lang, (doc_id % 10) < 8 AS is_train,
             unnest(string_split(text, ' ')) AS w
      FROM documents),
    vocab AS (
      SELECT w, count(*)::BIGINT AS c FROM words WHERE is_train GROUP BY w),
    nv AS (
      SELECT sum(c)::BIGINT AS n, count(*)::BIGINT AS v FROM vocab),
    lp AS (
      SELECT w, round(ln((c + 1) / ((SELECT n + v FROM nv))::DOUBLE)
                      * 1000000)::BIGINT AS lp_micro
      FROM vocab),
    perdoc AS (
      SELECT doc_id, lang, count(*)::BIGINT AS n_tok,
             sum(coalesce(lp.lp_micro,
                 round(ln(1.0 / ((SELECT n + v FROM nv)))
                       * 1000000)::BIGINT))::BIGINT AS s_micro
      FROM words LEFT JOIN lp USING (w)
      WHERE NOT is_train
      GROUP BY doc_id, lang)
    SELECT lang, count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS n_tokens,
           round(exp(-(sum(s_micro) / 1000000.0) / sum(n_tok)), 4)
             AS perplexity
    FROM perdoc GROUP BY lang
    """,
    doc="Held-out unigram perplexity per language: add-one-smoothed "
    "unigram LM fit on the hash-split train 80% (p(w) = (c+1)/(N+V), "
    "unseen = 1/(N+V)), cross-entropy scored on the held-out 20% — "
    "rising held-out perplexity is the drift/contamination smoke "
    "alarm run before any training job. Per-token log-probs are "
    "micro-quantized once per vocab entry (BIGINT), so all cross-row "
    "sums are exact. Shape: one train word-count shuffle (the vocab "
    "relation, data-scale — joined to held-out tokens on the shuffle "
    "path, NOT broadcast), one per-doc agg, |langs|-bounded output.",
)
def unigram_perplexity_heldout(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        "lang",
        (F.col("doc_id") % 10 < 8).alias("is_train"),
        F.explode(F.split(F.col("text"), " ")).alias("w"),
    )
    vocab = (
        words.filter("is_train")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    nv = vocab.agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    lp = vocab.crossJoin(F.broadcast(nv)).select(
        "w",
        F.round(
            F.log((F.col("c") + 1) / (F.col("n") + F.col("v")).cast("double"))
            * 1e6
        )
        .cast("long")
        .alias("lp_micro"),
    )
    heldout = words.filter(~F.col("is_train"))
    perdoc = (
        heldout.join(lp, "w", "left")
        .crossJoin(F.broadcast(nv))
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.sum(
                F.coalesce(
                    F.col("lp_micro"),
                    F.round(
                        F.log(
                            F.lit(1.0)
                            / (F.col("n") + F.col("v")).cast("double")
                        )
                        * 1e6
                    ).cast("long"),
                )
            )
            .cast("long")
            .alias("s_micro"),
        )
    )
    return perdoc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.round(
            F.exp(-(F.sum("s_micro") / 1e6) / F.sum("n_tok")), 4
        ).alias("perplexity"),
    )


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss projection + distortion certificate
# ---------------------------------------------------------------------------

_JL_M = 16


def _jl_sign(i, j):  # noqa: ANN001 - Column-in, Column-out
    """Deterministic ±1 from bit 7 of an LCG mix of (dim i, proj j) —
    bit 0 would be parity(i+j) (both multipliers odd), a rank-1
    checkerboard, so a middle bit is used."""
    h = F.shiftright(
        i.cast("long") * 1103515245 + F.lit(j) * 12345 + 98765, 7
    )
    return 1 - 2 * h.bitwiseAND(F.lit(1))


def _jl_sign_matrix(d: int, m: int):
    """The same sign hash as _jl_sign, as a (d, m) int64 numpy matrix
    (1-based i, j) — tests/test_mlops5.py pins the two in lockstep."""
    import numpy as np

    i = np.arange(1, d + 1, dtype=np.int64)[:, None]
    j = np.arange(1, m + 1, dtype=np.int64)[None, :]
    return 1 - 2 * (((i * 1103515245 + j * 12345 + 98765) >> 7) & 1)


def _jl_project_udf():
    """Arrow-vectorized ±1 projection: micro-quantized embedding →
    m=16 int64 projections via ONE numpy integer matmul per batch.
    The pure-Column form (16 nested aggregate/zip_with folds per row)
    is interpreted, not codegen'd — it measured 33.0 s at ×100 vs
    5.7 s for this matmul (SCALING.md round 9). Integer arithmetic end to
    end: bit-identical to the oracle's list-comprehension replay."""
    from pyspark.sql.functions import pandas_udf

    m = _JL_M

    def project(em: pd.Series) -> pd.Series:
        # SELF-CONTAINED closure: referencing a module-level helper
        # here would make cloudpickle serialize it by reference, and
        # the executor's re-import of this queries_pkg module
        # deadlocks on the queries.py circular import (worker crash,
        # found at birth). The sign matrix is therefore inlined — its
        # formula is pinned to _jl_sign by tests/test_mlops5.py and
        # to the oracle's replay by the differential.
        import numpy as np
        import pandas as p

        def sign_matrix(d):
            i = np.arange(1, d + 1, dtype=np.int64)[:, None]
            j = np.arange(1, m + 1, dtype=np.int64)[None, :]
            return 1 - 2 * (((i * 1103515245 + j * 12345 + 98765) >> 7) & 1)

        if em.empty:
            return p.Series([], dtype=object)
        vals = em.to_numpy()
        has_null = any(v is None for v in vals)
        lens = {len(v) for v in vals if v is not None}
        if not has_null and len(lens) == 1:
            arr = np.stack(vals).astype(np.int64)
            return p.Series(list(arr @ sign_matrix(arr.shape[1])))
        # slow path for schema-legal edges a batched stack would crash
        # on (NULL embedding -> np.stack object array; ragged lengths
        # -> ValueError): NULL rows project to NULL (the oracle's
        # NULL-propagation — the pair then drops at the do2 > 0
        # filter), other rows get a per-length matmul (round-9 review)
        mats = {d: sign_matrix(d) for d in lens}
        return p.Series(
            [
                None
                if v is None
                else list(np.asarray(v, dtype=np.int64) @ mats[len(v)])
                for v in vals
            ]
        )

    return pandas_udf(project, "array<long>")


@query(
    "jl_projection_distortion_cert",
    oracle=f"""
    -- x::DOUBLE before the micro-quantization is load-bearing:
    -- FLOAT * INTEGER stays FLOAT32 in DuckDB while Spark casts to
    -- double, and 565/128000 fixture elements round differently in
    -- float32 (round-9 review, verified empirically — the 1-row cert
    -- matched only by 6-dp rounding luck)
    WITH e AS (
      SELECT vec_id,
             [round(x::DOUBLE * 1000000)::BIGINT FOR x IN embedding] AS em
      FROM embeddings),
    proj AS (
      SELECT vec_id, em,
             [list_sum([em[i] * (1 - 2 * ((((i * 1103515245 + j * 12345
                        + 98765) // 128) & 1)))
                        FOR i IN range(1, len(em) + 1)])
              FOR j IN range(1, {_JL_M} + 1)] AS y
      FROM e),
    pairs AS (
      SELECT a.em AS ea, b.em AS eb, a.y AS ya, b.y AS yb
      FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1
      WHERE a.vec_id % 2 = 0),
    d AS (
      SELECT list_sum([(ea[i] - eb[i]) * (ea[i] - eb[i])
                       FOR i IN range(1, len(ea) + 1)]) AS do2,
             list_sum([(ya[j] - yb[j]) * (ya[j] - yb[j])
                       FOR j IN range(1, {_JL_M} + 1)]) AS dp2
      FROM pairs),
    r AS (
      SELECT round((dp2 / {_JL_M}.0) / do2 * 1000000)::BIGINT AS ratio_micro
      FROM d WHERE do2 > 0)
    SELECT count(*)::BIGINT AS n_pairs,
           round(sum(ratio_micro) / count(*) / 1000000.0, 6) AS mean_ratio,
           round(min(ratio_micro) / 1000000.0, 6) AS min_ratio,
           round(max(ratio_micro) / 1000000.0, 6) AS max_ratio,
           round(count(*) FILTER (WHERE ratio_micro BETWEEN 800000
                 AND 1200000)::DOUBLE / count(*), 4) AS frac_within_20pct
    FROM r
    """,
    doc="Johnson–Lindenstrauss ±1 projection of the embedding column "
    "d→16 with a distance-distortion certificate: for adjacent-id "
    "pairs, ratio = ||proj(a)-proj(b)||² / (m·||a-b||²) (expectation "
    "exactly 1 for a ±1 sign matrix), reported as mean/min/max and "
    "the within-±20% mass — measure the sketch before trusting it "
    "(the minhash_recall_cert discipline, applied to the projection "
    "every LSH/ANN stage would consume). Embedding elements are "
    "micro-quantized once, so projections, squared distances, and "
    "ratios are exact-integer-derived — bit-identical cross-engine. "
    "Shape: Arrow-batched int64 matmul projection (one numpy GEMM per "
    "batch — the pure-Column 16-fold form is interpreted, not "
    "codegen'd, and measured 11× slower at ×100), each pair side "
    "projected once, one adjacent-id equi-join (no cartesian), 1-row "
    "certificate.",
)
def jl_projection_distortion_cert(spark, sf_dir):
    (emb,) = tables(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: F.round(x.cast("double") * 1e6).cast("long")
        ).alias("em"),
    )
    project = _jl_project_udf()
    # each join side filters to its pair role BEFORE projecting, so
    # every vector is projected exactly once (projecting a shared
    # relation and self-joining would evaluate the projection subtree
    # twice — once per join side)
    a = e.filter(F.col("vec_id") % 2 == 0).select(
        "vec_id", "em", project("em").alias("y")
    )
    b = e.filter(F.col("vec_id") % 2 == 1).select(
        "vec_id", "em", project("em").alias("y")
    )
    pairs = a.alias("a").join(
        b.alias("b"),
        F.col("b.vec_id") == F.col("a.vec_id") + 1,
    ).select(
        F.col("a.em").alias("ea"),
        F.col("b.em").alias("eb"),
        F.col("a.y").alias("ya"),
        F.col("b.y").alias("yb"),
    )
    sqsum = lambda u, v: F.aggregate(  # noqa: E731
        F.zip_with(u, v, lambda x, w: (x - w) * (x - w)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    d = pairs.select(
        sqsum("ea", "eb").alias("do2"), sqsum("ya", "yb").alias("dp2")
    )
    r = d.filter(F.col("do2") > 0).select(
        F.round((F.col("dp2") / _JL_M) / F.col("do2") * 1e6)
        .cast("long")
        .alias("ratio_micro")
    )
    n = F.count(F.lit(1))
    return r.agg(
        n.cast("long").alias("n_pairs"),
        F.round(F.sum("ratio_micro") / n / 1e6, 6).alias("mean_ratio"),
        F.round(F.min("ratio_micro") / 1e6, 6).alias("min_ratio"),
        F.round(F.max("ratio_micro") / 1e6, 6).alias("max_ratio"),
        F.round(
            F.count(
                F.when(F.col("ratio_micro").between(800000, 1200000), 1)
            ).cast("double")
            / n,
            4,
        ).alias("frac_within_20pct"),
    )


# ---------------------------------------------------------------------------
# Minimum detectable effect per metric (power analysis)
# ---------------------------------------------------------------------------

_Z_ALPHA = 1.959964  # two-sided alpha = 0.05
_Z_BETA = 0.841621  # power = 0.8


@query(
    "ab_minimum_detectable_effect",
    oracle=f"""
    WITH ux AS (
      SELECT event_type, user_id, user_id % 2 AS arm,
             sum(round(value * 1000)::BIGINT) AS xk
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, user_id),
    m AS (
      SELECT event_type, arm, count(*)::BIGINT AS n,
             sum(xk)::HUGEINT AS sx, sum(xk::HUGEINT * xk) AS sxx
      FROM ux GROUP BY event_type, arm),
    v AS (
      SELECT event_type, arm, n,
             (sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n) / (n - 1) AS var_k
      FROM m WHERE n > 1),
    p AS (
      SELECT event_type,
             max(n) FILTER (WHERE arm = 0) AS n0,
             max(n) FILTER (WHERE arm = 1) AS n1,
             max(var_k) FILTER (WHERE arm = 0) AS v0,
             max(var_k) FILTER (WHERE arm = 1) AS v1
      FROM v GROUP BY event_type)
    SELECT event_type, n0, n1,
           round(({_Z_ALPHA} + {_Z_BETA}) * sqrt(v0 / n0 + v1 / n1)
                 / 1000.0, 6) AS mde_abs
    FROM p WHERE n0 IS NOT NULL AND n1 IS NOT NULL
    """,
    doc="Per-metric absolute minimum detectable effect at alpha=0.05 / "
    "power=0.8 from the observed per-arm variance of per-user totals: "
    "mde = (z_a + z_b) * sqrt(s0²/n0 + s1²/n1) — the power analysis "
    "that decides whether an experiment is worth running BEFORE it "
    "runs (an MDE above the plausible effect size = don't bother). "
    "Per-user totals are milli-quantized BIGINTs; the squared-sum "
    "moment rides DECIMAL(38,0)/HUGEINT so the cross-row sum is exact "
    "and the variance a deterministic double. Arms with n<=1 drop "
    "identically on both engines. Shape: per-(metric,user) agg, "
    "|metrics|x2 moment combine — bounded state, never data.",
)
def ab_minimum_detectable_effect(spark, sf_dir):
    (ev,) = tables(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    ux = (
        ev.filter(F.col("value").isNotNull())
        .groupBy("event_type", "user_id")
        .agg(F.sum(F.round(F.col("value") * 1e3).cast("long")).alias("xk"))
        .withColumn("arm", F.col("user_id") % 2)
    )
    m = ux.groupBy("event_type", "arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("xk").cast(dec)).alias("sx"),
        F.sum(F.col("xk").cast(dec) * F.col("xk")).alias("sxx"),
    )
    v = m.filter(F.col("n") > 1).select(
        "event_type",
        "arm",
        "n",
        (
            (
                F.col("sxx").cast("double")
                - F.col("sx").cast("double")
                * F.col("sx").cast("double")
                / F.col("n")
            )
            / (F.col("n") - 1)
        ).alias("var_k"),
    )
    p = v.groupBy("event_type").agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 0, F.col("var_k"))).alias("v0"),
        F.max(F.when(F.col("arm") == 1, F.col("var_k"))).alias("v1"),
    )
    return p.filter(
        F.col("n0").isNotNull() & F.col("n1").isNotNull()
    ).select(
        "event_type",
        "n0",
        "n1",
        F.round(
            (_Z_ALPHA + _Z_BETA)
            * F.sqrt(F.col("v0") / F.col("n0") + F.col("v1") / F.col("n1"))
            / 1e3,
            6,
        ).alias("mde_abs"),
    )


# ---------------------------------------------------------------------------
# McNemar paired-classifier test
# ---------------------------------------------------------------------------


@query(
    "mcnemar_paired_test",
    oracle="""
    WITH scored AS (
      SELECT (lang = 'en') AS truth,
             (n_chars > 600) AS pred_a,
             (len(string_split(text, ' ')) > 100) AS pred_b
      FROM documents),
    cc AS (
      SELECT count(*)::BIGINT AS n_docs,
             count(*) FILTER (WHERE (pred_a = truth)
                              AND (pred_b <> truth))::BIGINT AS b_only_a,
             count(*) FILTER (WHERE (pred_a <> truth)
                              AND (pred_b = truth))::BIGINT AS c_only_b
      FROM scored)
    SELECT n_docs, b_only_a, c_only_b,
           CASE WHEN b_only_a + c_only_b = 0 THEN 0.0
                ELSE round((abs(b_only_a - c_only_b) - 1)
                         * (abs(b_only_a - c_only_b) - 1)
                         / (b_only_a + c_only_b)::DOUBLE, 6) END
             AS mcnemar_chi2
    FROM cc
    """,
    doc="Continuity-corrected McNemar chi² comparing two paired "
    "document classifiers (a char-length gate vs a token-count gate, "
    "truth = English) on the SAME documents: only the disagreement "
    "counts b (A right, B wrong) and c (A wrong, B right) matter — "
    "the correct significance test for 'is the new quality classifier "
    "actually better', where a two-proportion z-test ignores the "
    "pairing and overstates variance. Integer counts, one final "
    "guarded division; b+c=0 hits the 0.0 sentinel on both engines. "
    "Shape: one narrow scan, 1-row confusion combine.",
)
def mcnemar_paired_test(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    scored = docs.select(
        (F.col("lang") == "en").alias("truth"),
        (F.col("n_chars") > 600).alias("pred_a"),
        (F.size(F.split(F.col("text"), " ")) > 100).alias("pred_b"),
    )
    cc = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count(
            F.when(
                (F.col("pred_a") == F.col("truth"))
                & (F.col("pred_b") != F.col("truth")),
                1,
            )
        )
        .cast("long")
        .alias("b_only_a"),
        F.count(
            F.when(
                (F.col("pred_a") != F.col("truth"))
                & (F.col("pred_b") == F.col("truth")),
                1,
            )
        )
        .cast("long")
        .alias("c_only_b"),
    )
    bc = F.col("b_only_a") + F.col("c_only_b")
    diff = F.abs(F.col("b_only_a") - F.col("c_only_b"))
    return cc.select(
        "n_docs",
        "b_only_a",
        "c_only_b",
        F.when(bc == 0, F.lit(0.0))
        .otherwise(
            F.round((diff - 1) * (diff - 1) / bc.cast("double"), 6)
        )
        .alias("mcnemar_chi2"),
    )


# ---------------------------------------------------------------------------
# Chao1 vocabulary richness per language
# ---------------------------------------------------------------------------


@query(
    "vocab_chao1_richness",
    oracle="""
    WITH words AS (
      SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
    counts AS (
      SELECT lang, w, count(*)::BIGINT AS c FROM words GROUP BY lang, w),
    s AS (
      SELECT lang, count(*)::BIGINT AS vocab_size,
             count(*) FILTER (WHERE c = 1)::BIGINT AS f1,
             count(*) FILTER (WHERE c = 2)::BIGINT AS f2
      FROM counts GROUP BY lang)
    SELECT lang, vocab_size, f1, f2,
           round(vocab_size + f1 * (f1 - 1) / (2.0 * (f2 + 1)), 2)
             AS chao1_est
    FROM s
    """,
    doc="Bias-corrected Chao1 estimator of total vocabulary size per "
    "language from singleton/doubleton type counts: chao1 = V + "
    "f1(f1-1)/(2(f2+1)) — estimates how many word types the crawl has "
    "NOT yet seen (a large chao1-V gap = the corpus undersamples the "
    "language's tail; mix more of it before vocab training). The +1 "
    "bias-corrected form needs no f2>0 guard. Integer type counts, "
    "one final division — deterministic. Shape: one (lang, word) "
    "count shuffle (map-side combinable), |langs|-bounded combine.",
)
def vocab_chao1_richness(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    words = docs.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    counts = words.groupBy("lang", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    s = counts.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.count(F.when(F.col("c") == 1, 1)).cast("long").alias("f1"),
        F.count(F.when(F.col("c") == 2, 1)).cast("long").alias("f2"),
    )
    return s.select(
        "lang",
        "vocab_size",
        "f1",
        "f2",
        F.round(
            F.col("vocab_size")
            + F.col("f1") * (F.col("f1") - 1) / (2.0 * (F.col("f2") + 1)),
            2,
        ).alias("chao1_est"),
    )


# ---------------------------------------------------------------------------
# Log-rank test: KM survival compared between two arms
# ---------------------------------------------------------------------------


@query(
    "logrank_two_arm",
    oracle="""
    WITH e AS (
      SELECT user_id, user_id % 2 AS arm, epoch_us(ts) AS tu FROM events),
    h AS (SELECT max(tu) AS hu FROM e),
    gaps AS (
      SELECT arm,
             CASE WHEN nxt IS NULL
                  THEN ((SELECT hu FROM h) - tu) // 3600000000
                  ELSE (nxt - tu) // 3600000000 END AS gap_hours,
             CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS observed
      FROM (SELECT arm, tu,
                   lead(tu) OVER (PARTITION BY user_id ORDER BY tu) AS nxt
            FROM e)),
    tot AS (
      SELECT arm, count(*)::BIGINT AS n_arm FROM gaps GROUP BY arm),
    pooled AS (SELECT DISTINCT gap_hours FROM gaps),
    cnt AS (
      SELECT p.gap_hours, a.arm,
             coalesce(sum(g.observed), 0)::BIGINT AS d,
             coalesce(count(g.observed), 0)::BIGINT AS c
      FROM pooled p CROSS JOIN (SELECT DISTINCT arm FROM gaps) a
      LEFT JOIN gaps g ON g.gap_hours = p.gap_hours AND g.arm = a.arm
      GROUP BY p.gap_hours, a.arm),
    risk AS (
      SELECT gap_hours, arm, d,
             (SELECT n_arm FROM tot WHERE tot.arm = cnt.arm)
               - coalesce(sum(c) OVER (PARTITION BY arm ORDER BY gap_hours
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_at
      FROM cnt),
    times AS (
      SELECT gap_hours,
             max(CASE WHEN arm = 0 THEN d END) AS d0,
             max(CASE WHEN arm = 1 THEN d END) AS d1,
             max(CASE WHEN arm = 0 THEN n_at END) AS n0,
             max(CASE WHEN arm = 1 THEN n_at END) AS n1
      FROM risk GROUP BY gap_hours),
    terms AS (
      SELECT d0, d0 + d1 AS dt, n0 + n1 AS nt, n0,
             round((d0 + d1) * n0 / (n0 + n1)::DOUBLE * 1000000)::BIGINT
               AS e0_micro,
             round((d0 + d1) * (n0 / (n0 + n1)::DOUBLE)
                   * (1 - n0 / (n0 + n1)::DOUBLE)
                   * (n0 + n1 - d0 - d1) / (n0 + n1 - 1)::DOUBLE
                   * 1000000)::BIGINT AS v_micro
      FROM times
      WHERE d0 + d1 > 0 AND n0 + n1 > d0 + d1 AND n0 + n1 > 1
        AND n0 > 0 AND n1 > 0)
    SELECT sum(d0)::BIGINT AS events_arm0,
           round(sum(e0_micro) / 1000000.0, 4) AS expected_arm0,
           CASE WHEN sum(v_micro) > 0
           THEN round(((sum(d0) - sum(e0_micro) / 1000000.0)
                  * (sum(d0) - sum(e0_micro) / 1000000.0))
                 / (sum(v_micro) / 1000000.0), 6) END AS logrank_chi2
    FROM terms
    """,
    doc="Log-rank test comparing the time-to-next-event survival "
    "curves of two user arms (the inferential companion to "
    "kaplan_meier_interarrival — 'is arm 1's inter-arrival behavior "
    "actually different?'): at each pooled event time, observed arm-0 "
    "events vs the hypergeometric expectation d_t*n0/n_t and variance, "
    "chi2 = (O-E)^2/V. Per-time E and V are micro-quantized BIGINTs "
    "before the cross-row sums (the libm/division house rule), so "
    "both engines sum identical integers. Times where either arm has "
    "an empty risk set, or all at-risk units fail, drop identically "
    "on both sides. Shape: per-user lead window, per-(time,arm) "
    "counts; everything after runs on the pooled |distinct gap "
    "values| x 2 relation — horizon-bounded state, never data.",
)
def logrank_two_arm(spark, sf_dir):
    (ev,) = tables(spark, sf_dir, "events")
    e = ev.select(
        (F.col("user_id") % 2).alias("arm"),
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tu"),
    )
    h = e.agg(F.max("tu").alias("hu"))
    w_user = Window.partitionBy("user_id").orderBy("tu")
    gaps = (
        e.withColumn("nxt", F.lead("tu").over(w_user))
        .crossJoin(F.broadcast(h))
        .select(
            "arm",
            F.when(
                F.col("nxt").isNull(),
                F.floor((F.col("hu") - F.col("tu")) / 3_600_000_000),
            )
            .otherwise(F.floor((F.col("nxt") - F.col("tu")) / 3_600_000_000))
            .alias("gap_hours"),
            F.when(F.col("nxt").isNull(), 0).otherwise(1).alias("observed"),
        )
    )
    # ONE consumer of the events-scan/lead-window subtree: cnt is the
    # |distinct gaps| x 2 relation, checkpointed, and tot/pooled/arms
    # all derive from it (four uncached consumers re-executed the
    # expensive per-user window once each — the copurchase_adj
    # duplicate-execution class, round-9 review pass 2)
    cnt = (
        gaps.groupBy("gap_hours", "arm")
        .agg(
            F.sum("observed").cast("long").alias("d"),
            F.count(F.lit(1)).cast("long").alias("c"),
        )
        .localCheckpoint(eager=True)
    )
    tot = cnt.groupBy("arm").agg(F.sum("c").cast("long").alias("n_arm"))
    pooled = cnt.select("gap_hours").distinct()
    arms = cnt.select("arm").distinct()
    dense = (
        pooled.crossJoin(F.broadcast(arms))
        .join(cnt, ["gap_hours", "arm"], "left")
        .select(
            "gap_hours",
            "arm",
            F.coalesce(F.col("d"), F.lit(0)).alias("d"),
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
    )
    w_arm = (
        Window.partitionBy("arm")
        .orderBy("gap_hours")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = dense.join(F.broadcast(tot), "arm").select(
        "gap_hours",
        "arm",
        "d",
        (
            F.col("n_arm") - F.coalesce(F.sum("c").over(w_arm), F.lit(0))
        ).alias("n_at"),
    )
    times = risk.groupBy("gap_hours").agg(
        F.max(F.when(F.col("arm") == 0, F.col("d"))).alias("d0"),
        F.max(F.when(F.col("arm") == 1, F.col("d"))).alias("d1"),
        F.max(F.when(F.col("arm") == 0, F.col("n_at"))).alias("n0"),
        F.max(F.when(F.col("arm") == 1, F.col("n_at"))).alias("n1"),
    )
    nt = (F.col("n0") + F.col("n1")).cast("double")
    dt = F.col("d0") + F.col("d1")
    p0 = F.col("n0") / nt
    terms = times.filter(
        (dt > 0)
        & (F.col("n0") + F.col("n1") > dt)
        & (F.col("n0") + F.col("n1") > 1)
        & (F.col("n0") > 0)
        & (F.col("n1") > 0)
    ).select(
        "d0",
        # association pinned to the oracle's ((d0+d1)*n0) / nt — the
        # exact BIGINT product divided once; dt*p0 (divide first, then
        # multiply) differs by 1 ulp on ~30/1M (dt,n0,n1) combos and
        # can flip the micro rounding (round-9 review pass 2, verified)
        F.round((dt * F.col("n0")) / nt * 1e6).cast("long").alias("e0_micro"),
        F.round(
            dt
            * p0
            * (1 - p0)
            * (F.col("n0") + F.col("n1") - dt)
            / (nt - 1)
            * 1e6
        )
        .cast("long")
        .alias("v_micro"),
    )
    o_minus_e = F.sum("d0") - F.sum("e0_micro") / 1e6
    # all-variance-quantized-to-zero (degenerate tiny strata): chi2
    # undefined -> NULL on both engines (ANSI Spark would throw
    # DIVIDE_BY_ZERO, DuckDB would return IEEE inf — the spearman
    # den<=0 class found by the hypothesis property test)
    return terms.agg(
        F.sum("d0").cast("long").alias("events_arm0"),
        F.round(F.sum("e0_micro") / 1e6, 4).alias("expected_arm0"),
        F.when(
            F.sum("v_micro") > 0,
            F.round((o_minus_e * o_minus_e) / (F.sum("v_micro") / 1e6), 6),
        ).alias("logrank_chi2"),
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion of two part rankings
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_TOPN = 100
_RRF_OUT = 20


@query(
    "rrf_rank_fusion",
    oracle=f"""
    WITH agg AS (
      SELECT l_partkey,
             round(sum(round(l_extendedprice * 100)::BIGINT
                       * (100 - round(l_discount * 100)::BIGINT)))::BIGINT
               AS rev_c,
             sum(round(l_quantity)::BIGINT)::BIGINT AS qty
      FROM lineitem GROUP BY l_partkey),
    r1 AS (
      SELECT l_partkey, row_number() OVER (ORDER BY rev_c DESC, l_partkey)
               AS rnk
      FROM agg ORDER BY rev_c DESC, l_partkey LIMIT {_RRF_TOPN}),
    r2 AS (
      SELECT l_partkey, row_number() OVER (ORDER BY qty DESC, l_partkey)
               AS rnk
      FROM agg ORDER BY qty DESC, l_partkey LIMIT {_RRF_TOPN}),
    fused AS (
      SELECT coalesce(r1.l_partkey, r2.l_partkey) AS l_partkey,
             r1.rnk AS rank_rev, r2.rnk AS rank_qty,
             coalesce(1.0 / ({_RRF_K} + r1.rnk), 0)
               + coalesce(1.0 / ({_RRF_K} + r2.rnk), 0) AS rrf
      FROM r1 FULL OUTER JOIN r2 ON r1.l_partkey = r2.l_partkey)
    SELECT l_partkey, rank_rev, rank_qty, round(rrf, 6) AS rrf_score
    FROM fused ORDER BY rrf DESC, l_partkey LIMIT {_RRF_OUT}
    """,
    doc="Reciprocal-rank fusion of two part rankings (by revenue and "
    "by quantity): rrf = sum over lists of 1/(60+rank), the standard "
    "zero-tuning way to combine heterogeneous retrieval signals "
    "(BM25 + dense ANN lists fuse exactly like this). Ranks come from "
    "TakeOrdered top-100 lists — never a global row_number over the "
    "full part relation — and the per-row score is a sum of at most "
    "two exact-integer-derived doubles (no cross-row float sums). "
    "Ties broken by part key in both rank and output order on both "
    "engines. Cents/centi-percent quantization keeps the revenue "
    "ordering metric integer-exact. Shape: one part agg (map-side "
    "combinable), two bounded top-N lists, a 100-row full outer join, "
    "bounded output.",
)
def rrf_rank_fusion(spark, sf_dir):
    (li,) = tables(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * (100 - F.round(F.col("l_discount") * 100).cast("long"))
        )
        .cast("long")
        .alias("rev_c"),
        F.sum(F.round(F.col("l_quantity")).cast("long"))
        .cast("long")
        .alias("qty"),
    )

    def topn(metric):
        w = Window.orderBy(F.col(metric).desc(), "l_partkey")
        return (
            agg.orderBy(F.col(metric).desc(), "l_partkey")
            .limit(_RRF_TOPN)
            .withColumn("rnk", F.row_number().over(w))
            .select("l_partkey", "rnk")
        )

    r1 = topn("rev_c").withColumnRenamed("rnk", "rank_rev")
    r2 = topn("qty").withColumnRenamed("rnk", "rank_qty")
    fused = r1.join(r2, "l_partkey", "full_outer").select(
        "l_partkey",
        "rank_rev",
        "rank_qty",
        (
            F.coalesce(1.0 / (_RRF_K + F.col("rank_rev")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_K + F.col("rank_qty")), F.lit(0.0))
        ).alias("rrf"),
    )
    return (
        fused.orderBy(F.col("rrf").desc(), "l_partkey")
        .limit(_RRF_OUT)
        .select(
            "l_partkey",
            "rank_rev",
            "rank_qty",
            F.round("rrf", 6).alias("rrf_score"),
        )
    )


# ---------------------------------------------------------------------------
# Distributed weighted median per group (bucket-offset, spearman's trick)
# ---------------------------------------------------------------------------

_WMED_BUCKET_CENTS = 1_000_000  # $10k price buckets


@query(
    "weighted_median_groups",
    oracle=f"""
    WITH w AS (
      SELECT l_returnflag AS flag,
             round(l_extendedprice * 100)::BIGINT AS cents,
             sum(round(l_quantity)::BIGINT)::BIGINT AS wt
      FROM lineitem GROUP BY l_returnflag, round(l_extendedprice * 100)),
    tot AS (SELECT flag, sum(wt)::BIGINT AS total FROM w GROUP BY flag),
    b AS (SELECT flag, cents, wt, cents // {_WMED_BUCKET_CENTS} AS bkt FROM w),
    boff AS (
      SELECT flag, bkt,
             coalesce(sum(btot) OVER (PARTITION BY flag ORDER BY bkt
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
               AS off
      FROM (SELECT flag, bkt, sum(wt)::BIGINT AS btot FROM b
            GROUP BY flag, bkt)),
    cum AS (
      SELECT b.flag, b.cents,
             boff.off + coalesce(sum(b.wt) OVER (PARTITION BY b.flag, b.bkt
               ORDER BY b.cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
               AS cw
      FROM b JOIN boff ON boff.flag = b.flag AND boff.bkt = b.bkt)
    SELECT cum.flag,
           (min(cents) FILTER (WHERE cw * 2 >= total) / 100.0)
             AS weighted_median_price,
           max(total)::BIGINT AS total_weight
    FROM cum JOIN tot ON tot.flag = cum.flag
    GROUP BY cum.flag
    """,
    doc="Quantity-weighted median price per return flag (lower "
    "weighted median: smallest price whose cumulative weight reaches "
    "half the total) — the robust 'typical traded price' a plain "
    "median (every row equal) and a mean (tail-dominated) both get "
    "wrong. The scale shape is the spearman bucket-offset trick "
    "applied to weighted quantiles: cumulative weights come from "
    "bounded per-($10k-bucket) totals plus PARTITIONed within-bucket "
    "running sums — never a per-group global sort-window over all "
    "distinct prices (data-scale within a 3-value group key). "
    "Weights and prices are integer-quantized, cumulative sums exact "
    "BIGINT, the median pick an integer comparison (cw*2 >= total — "
    "no halving division). Shape: one (flag, cents) weight agg "
    "(map-side combinable), bounded bucket relation, bounded output.",
)
def weighted_median_groups(spark, sf_dir):
    (li,) = tables(spark, sf_dir, "lineitem")
    w = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    ).agg(
        F.sum(F.round(F.col("l_quantity")).cast("long"))
        .cast("long")
        .alias("wt")
    )
    tot = w.groupBy("flag").agg(F.sum("wt").cast("long").alias("total"))
    # F.floor matches the oracle's `//` for negative cents (truncation
    # toward zero would shift bucket ids and break the offset cumsum)
    b = w.withColumn(
        "bkt", F.floor(F.col("cents") / _WMED_BUCKET_CENTS).cast("long")
    )
    w_bkt = (
        Window.partitionBy("flag")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boff = (
        b.groupBy("flag", "bkt")
        .agg(F.sum("wt").alias("btot"))
        .select(
            "flag",
            "bkt",
            F.coalesce(F.sum("btot").over(w_bkt), F.lit(0))
            .cast("long")
            .alias("off"),
        )
    )
    w_in = (
        Window.partitionBy("flag", "bkt")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = b.join(F.broadcast(boff), ["flag", "bkt"]).select(
        "flag",
        "cents",
        (F.col("off") + F.sum("wt").over(w_in)).alias("cw"),
    )
    return (
        cum.join(F.broadcast(tot), "flag")
        .groupBy("flag")
        .agg(
            (
                F.min(
                    F.when(F.col("cw") * 2 >= F.col("total"), F.col("cents"))
                )
                / 100.0
            ).alias("weighted_median_price"),
            F.max("total").cast("long").alias("total_weight"),
        )
    )
