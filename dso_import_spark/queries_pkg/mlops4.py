"""Fourth mlops/governance batch: multiple-testing control, shrinkage,
dependence, ratio-metric inference, budget allocation, local-DP
debiasing, quantile-loss eval, and error-tolerant JSONL ingestion.

Round-8 additions extending the model-eval/data-governance family
(mlops.py, mlops2.py, mlops3.py) — each a standard readout a
training-data or experimentation pipeline runs, re-expressed as Spark
aggregates with engine-replayable arithmetic:

- ``bh_fdr_correction``: Benjamini–Hochberg step-up over per-series
  drift p-values (one-term Kolmogorov tail of the exact KS D) — the
  multiple-testing gate every per-segment drift monitor needs before
  paging anyone (testing 1 000 segments at α=0.05 pages ~50 false
  alarms a day without it).
- ``eb_shrunken_rates``: empirical-Bayes beta-binomial shrinkage of
  per-stratum rates toward the corpus prior (method-of-moments α, β) —
  the small-sample-stratum stabilizer behind every per-domain quality
  dashboard.
- ``mutual_information_cols``: mutual information between two
  categorical columns from one contingency aggregate — the
  dependence-strength companion to chi_square_independence (which only
  tests, never measures).
- ``ratio_metric_delta_ci``: delta-method CI for a ratio-of-sums
  metric (value per event) over per-user aggregates — ratio metrics
  violate the iid assumption behind a naive t-interval because users,
  not events, are the randomization unit.
- ``budget_water_filling``: capped proportional token-budget
  allocation across languages (water-filling): budget shares
  proportional to weight until a language's capacity saturates, the
  remainder re-spread — the constrained version of
  temperature_mix_weights' unconstrained allocation.
- ``randomized_response_debias``: local-DP randomized response with
  deterministic flips + the unbiased debiasing estimator, certified
  against ground truth — the privacy mechanism whose calibration
  dp_sensitivity_audit only prepares for.
- ``pinball_loss_eval``: quantile-forecast evaluation (pinball loss)
  of reference-period per-series quantile predictors on the current
  period — the loss that makes quantile forecasts comparable.
- ``jsonl_rescue_scan``: PERMISSIVE JSONL ingestion with a corrupt-
  record audit over a deterministically corrupted fixture file — the
  error-tolerant ingestion posture (reference: error-tolerant row
  handling, SURVEY §2.2 P13) on the lake-native format.

Determinism notes (the registry's house rules): counts stay BIGINT;
libm-touching expressions (exp, ln, sqrt) are quantized micro/nano
far coarser than cross-engine ulps BEFORE any cross-row comparison or
sum; exact percentiles only at exact-binary fractions; divisions that
can hit zero on data edges are CASE-guarded to explicit sentinels in
BOTH engines (the ADVICE r7 kappa/F1 discipline). No UDFs; every
expression is JVM-side Column arithmetic.
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from dso_import_spark.queries import query
from dso_import_spark.queries_pkg.util import tables

# ---------------------------------------------------------------------------
# Benjamini–Hochberg FDR over per-series KS drift p-values
# ---------------------------------------------------------------------------

_BH_SPLIT = "2024-01-16"  # the drift_psi/ks reference/current split
_BH_Q_MICRO = 200000  # q = 0.20 in micros


@query(
    "bh_fdr_correction",
    oracle=f"""
    WITH tagged AS (
      SELECT event_type, value,
             CASE WHEN ts < TIMESTAMP '{_BH_SPLIT}' THEN 1 ELSE 0 END AS is_ref
      FROM events WHERE value IS NOT NULL),
    tot AS (
      SELECT event_type,
             sum(is_ref)::DOUBLE AS n_ref,
             sum(1 - is_ref)::DOUBLE AS n_cur
      FROM tagged GROUP BY event_type),
    pts AS (
      SELECT event_type, value,
             sum(is_ref) AS d_ref, sum(1 - is_ref) AS d_cur
      FROM tagged GROUP BY event_type, value),
    ecdf AS (
      SELECT p.event_type,
             sum(p.d_ref) OVER w / t.n_ref AS f_ref,
             sum(p.d_cur) OVER w / t.n_cur AS f_cur
      FROM pts p JOIN tot t ON p.event_type = t.event_type
      WINDOW w AS (PARTITION BY p.event_type ORDER BY p.value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    ks AS (
      SELECT event_type, round(max(abs(f_ref - f_cur)), 6) AS d
      FROM ecdf GROUP BY event_type),
    pvals AS (
      SELECT k.event_type,
             CAST(round(1000000 * least(1.0,
                 2 * exp(-2 * (t.n_ref * t.n_cur / (t.n_ref + t.n_cur))
                         * k.d * k.d))) AS BIGINT) AS p_micro
      FROM ks k JOIN tot t ON t.event_type = k.event_type
      WHERE t.n_ref > 0 AND t.n_cur > 0),
    ranked AS (
      SELECT event_type, p_micro,
             row_number() OVER (ORDER BY p_micro, event_type) AS rnk,
             count(*) OVER () AS m
      FROM pvals),
    cut AS (
      SELECT max(CASE WHEN p_micro * m <= rnk * {_BH_Q_MICRO}
                      THEN rnk ELSE 0 END) AS k_star
      FROM ranked)
    SELECT r.event_type, r.p_micro, r.rnk,
           (r.rnk <= c.k_star) AS flagged
    FROM ranked r CROSS JOIN cut c
    """,
    doc="Benjamini–Hochberg FDR step-up over per-event-type drift "
    "p-values: the exact two-sample KS D (the drift_ks_statistic "
    "pipeline, D rounded 6dp first) converted to a p-value via the "
    "one-term Kolmogorov tail p = min(1, 2·exp(-2·n_e·D²)) with "
    "n_e = n_ref·n_cur/(n_ref+n_cur) — exp is the lone libm call and "
    "p is micro-quantized immediately after it, so the BH comparisons "
    "run on exact BIGINTs (p_micro·m <= i·q_micro, q = 0.2). Step-up: "
    "flag every series ranked at or below the LARGEST i passing its "
    "threshold. The multiple-testing gate per-segment drift monitors "
    "need: at α=0.05 a 1000-segment scan pages ~50 false alarms "
    "without it. Rank/cut windows run over the |event types| relation "
    "(5 rows) — bounded contingency-size state, never row-proportional.",
)
def bh_fdr_correction(spark, sf_dir):
    from pyspark.sql.functions import broadcast

    (events,) = tables(spark, sf_dir, "events")
    tagged = events.where(F.col("value").isNotNull()).select(
        "event_type",
        "value",
        F.when(
            F.col("ts") < F.lit(_BH_SPLIT).cast("timestamp_ntz"), 1
        ).otherwise(0).alias("is_ref"),
    )
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
    ecdf = pts.join(broadcast(tot), "event_type").select(
        "event_type",
        F.try_divide(F.sum("d_ref").over(w), F.col("n_ref")).alias("f_ref"),
        F.try_divide(F.sum("d_cur").over(w), F.col("n_cur")).alias("f_cur"),
    )
    ks = ecdf.groupBy("event_type").agg(
        F.round(F.max(F.abs(F.col("f_ref") - F.col("f_cur"))), 6).alias("d")
    )
    # a series with an empty reference or current side has no testable
    # drift (its try_divide ECDF is all-NULL → NULL D → NULL p, and
    # NULL rank order differs between engines): drop it identically on
    # both sides BEFORE ranking (ADVICE r8) — the oracle carries the
    # same WHERE n_ref > 0 AND n_cur > 0
    en = F.col("n_ref") * F.col("n_cur") / (F.col("n_ref") + F.col("n_cur"))
    pvals = ks.join(broadcast(tot), "event_type").where(
        (F.col("n_ref") > 0) & (F.col("n_cur") > 0)
    ).select(
        "event_type",
        F.round(
            F.lit(1000000)
            * F.least(
                F.lit(1.0),
                F.lit(2.0) * F.exp(F.lit(-2.0) * en * F.col("d") * F.col("d")),
            )
        )
        .cast("long")
        .alias("p_micro"),
    )
    # rank + step-up over the |event types| relation (5 rows): the
    # global windows carry bounded contingency-size state, the same
    # posture as bootstrap_mean_ci's 32-row rank window
    ranked = pvals.select(
        "event_type",
        "p_micro",
        F.row_number()
        .over(Window.orderBy("p_micro", "event_type"))
        .alias("rnk"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .alias("m"),
    )
    k_star = F.max(
        F.when(
            F.col("p_micro") * F.col("m") <= F.col("rnk") * _BH_Q_MICRO,
            F.col("rnk"),
        ).otherwise(0)
    ).over(Window.partitionBy())
    return ranked.select(
        "event_type",
        "p_micro",
        "rnk",
        (F.col("rnk") <= k_star).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# Empirical-Bayes beta-binomial shrinkage of per-stratum rates
# ---------------------------------------------------------------------------

_EB_SHORT = 600  # "short document" cutoff in chars


@query(
    "eb_shrunken_rates",
    oracle=f"""
    WITH strata AS (
      SELECT lang, source, count(*)::BIGINT AS n,
             sum((n_chars < {_EB_SHORT})::INT)::BIGINT AS x
      FROM documents GROUP BY lang, source),
    rmicro AS (
      SELECT lang, source, n, x,
             CAST(round(x * 1000000.0 / n) AS BIGINT) AS r_micro
      FROM strata),
    mom AS (
      SELECT count(*)::BIGINT AS k,
             sum(r_micro)::BIGINT AS s1,
             sum(r_micro * r_micro)::BIGINT AS s2
      FROM rmicro),
    prior AS (
      SELECT k,
             s1 * 1.0 / k / 1000000 AS m,
             s2 * 1.0 / k / 1000000000000 - (s1 * 1.0 / k / 1000000)
               * (s1 * 1.0 / k / 1000000) AS v
      FROM mom)
    SELECT r.lang, r.source, r.n, r.x, r.r_micro,
           round(CASE WHEN p.v > 0 AND p.v < p.m * (1 - p.m)
                 THEN (r.x + p.m * (p.m * (1 - p.m) / p.v - 1))
                    / (r.n + (p.m * (1 - p.m) / p.v - 1))
                 ELSE p.m END, 6) AS shrunken
    FROM rmicro r CROSS JOIN prior p
    """,
    doc="Empirical-Bayes shrinkage of per-(lang, source) short-doc "
    "rates toward the corpus prior: beta-binomial method-of-moments — "
    "prior mean m and variance v come from the micro-quantized "
    "per-stratum rates (exact BIGINT S1/S2 sums, so the cross-stratum "
    "moments are bit-identical in both engines), α+β = m(1-m)/v - 1, "
    "and each stratum reports (x + α)/(n + α + β): small strata pull "
    "hard toward m, large strata barely move. The stabilizer behind "
    "every per-domain quality dashboard — a 3-doc domain at rate 1.0 "
    "must not outrank a 10k-doc domain at 0.4. Degenerate guard: "
    "v <= 0 (identical strata) or v >= m(1-m) (beta-binomial "
    "inapplicable) falls back to the explicit prior-mean sentinel in "
    "both engines. One stratum aggregate + a 1-row broadcast prior.",
)
def eb_shrunken_rates(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    strata = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("n_chars") < _EB_SHORT).cast("int"))
        .cast("long")
        .alias("x"),
    )
    rmicro = strata.withColumn(
        "r_micro",
        F.round(F.col("x") * 1000000.0 / F.col("n")).cast("long"),
    )
    mom = rmicro.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("r_micro").cast("long").alias("s1"),
        F.sum(F.col("r_micro") * F.col("r_micro")).cast("long").alias("s2"),
    )
    m = F.col("s1") * 1.0 / F.col("k") / 1000000
    v = F.col("s2") * 1.0 / F.col("k") / 1000000000000 - m * m
    prior = mom.select(m.alias("m"), v.alias("v"))
    # the oracle parenthesizes the denominator as n + (phi) to match
    # THIS association exactly — FP addition is non-associative and
    # ((n + m(1-m)/v) - 1) can differ by an ulp (round-8 code review)
    phi = F.col("m") * (1 - F.col("m")) / F.col("v") - 1
    shrunken = F.when(
        (F.col("v") > 0) & (F.col("v") < F.col("m") * (1 - F.col("m"))),
        (F.col("x") + F.col("m") * phi) / (F.col("n") + phi),
    ).otherwise(F.col("m"))
    return rmicro.crossJoin(F.broadcast(prior)).select(
        "lang",
        "source",
        "n",
        "x",
        "r_micro",
        F.round(shrunken, 6).alias("shrunken"),
    )


# ---------------------------------------------------------------------------
# Mutual information between two categorical columns
# ---------------------------------------------------------------------------


@query(
    "mutual_information_cols",
    oracle="""
    WITH cells AS (
      SELECT event_type, user_id % 2 AS arm, count(*)::BIGINT AS c
      FROM events
      WHERE event_type IS NOT NULL AND user_id IS NOT NULL
      GROUP BY event_type, user_id % 2),
    rows_ AS (SELECT event_type, sum(c)::BIGINT AS r FROM cells
              GROUP BY event_type),
    cols_ AS (SELECT arm, sum(c)::BIGINT AS s FROM cells GROUP BY arm),
    tot AS (SELECT sum(c)::BIGINT AS n FROM cells),
    q AS (
      SELECT CAST(round(1000000000 * (c.c * 1.0 / t.n)
                 * ln(c.c * 1.0 * t.n / (r.r * 1.0 * cl.s))) AS BIGINT)
               AS mi_cell_nano,
             c.c, t.n
      FROM cells c
      JOIN rows_ r ON r.event_type = c.event_type
      JOIN cols_ cl ON cl.arm = c.arm
      CROSS JOIN tot t),
    hr AS (
      SELECT sum(CAST(round(-1000000000 * (r * 1.0 / t.n)
                 * ln(r * 1.0 / t.n)) AS BIGINT))::BIGINT AS h_row_nano
      FROM rows_ CROSS JOIN tot t),
    hc AS (
      SELECT sum(CAST(round(-1000000000 * (s * 1.0 / t.n)
                 * ln(s * 1.0 / t.n)) AS BIGINT))::BIGINT AS h_col_nano
      FROM cols_ CROSS JOIN tot t)
    SELECT max(q.n) AS n, count(*)::BIGINT AS n_cells,
           sum(q.mi_cell_nano)::BIGINT AS mi_nano,
           max(hr.h_row_nano) AS h_row_nano,
           max(hc.h_col_nano) AS h_col_nano
    FROM q CROSS JOIN hr CROSS JOIN hc
    """,
    doc="Mutual information I(event_type; arm) in nats from ONE "
    "contingency aggregate (the chi_square_independence cells): "
    "per-cell contribution (c/N)·ln(cN/(rs)) nano-quantized "
    "immediately after the lone libm ln, so the cross-cell sum is an "
    "exact BIGINT; marginal entropies H(row), H(col) emitted the same "
    "way (MI/min(H) is then a normalized dependence strength the "
    "caller can form). chi_square tests independence; this MEASURES "
    "dependence in bits-like units — the feature-leakage readout "
    "before training on a column correlated with the label. NULL "
    "categories excluded on both engines (the chi2 discipline). "
    "Bounded contingency state: |types|×|arms| cells.",
)
def mutual_information_cols(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    cells = (
        events.where(
            F.col("event_type").isNotNull() & F.col("user_id").isNotNull()
        )
        .groupBy("event_type", (F.col("user_id") % 2).alias("arm"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    rows = cells.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("r")
    )
    cols = cells.groupBy("arm").agg(F.sum("c").cast("long").alias("s"))
    tot = cells.agg(F.sum("c").cast("long").alias("n"))
    q = (
        cells.join(rows, "event_type")
        .join(cols, "arm")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(
                F.lit(1000000000)
                * (F.col("c") * 1.0 / F.col("n"))
                * F.log(
                    F.col("c") * 1.0 * F.col("n")
                    / (F.col("r") * 1.0 * F.col("s"))
                )
            )
            .cast("long")
            .alias("mi_cell_nano"),
            "c",
            "n",
        )
    )
    hr = (
        rows.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.round(
                    F.lit(-1000000000)
                    * (F.col("r") * 1.0 / F.col("n"))
                    * F.log(F.col("r") * 1.0 / F.col("n"))
                ).cast("long")
            )
            .cast("long")
            .alias("h_row_nano")
        )
    )
    hc = (
        cols.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.round(
                    F.lit(-1000000000)
                    * (F.col("s") * 1.0 / F.col("n"))
                    * F.log(F.col("s") * 1.0 / F.col("n"))
                ).cast("long")
            )
            .cast("long")
            .alias("h_col_nano")
        )
    )
    return (
        q.crossJoin(F.broadcast(hr))
        .crossJoin(F.broadcast(hc))
        .agg(
            F.max("n").alias("n"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("mi_cell_nano").cast("long").alias("mi_nano"),
            F.max("h_row_nano").alias("h_row_nano"),
            F.max("h_col_nano").alias("h_col_nano"),
        )
    )


# ---------------------------------------------------------------------------
# Delta-method CI for a ratio-of-sums metric
# ---------------------------------------------------------------------------


@query(
    "ratio_metric_delta_ci",
    oracle="""
    WITH per_user AS (
      SELECT user_id % 2 AS arm,
             CAST(round(sum(value) * 1000000) AS BIGINT) AS x_mu,
             count(*)::BIGINT AS y
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL
      GROUP BY user_id),
    momi AS (
      SELECT arm, count(*)::BIGINT AS n,
             sum(x_mu)::BIGINT AS sx_mu, sum(y)::BIGINT AS sy,
             sum(x_mu::HUGEINT * x_mu) AS sxx_m2,
             sum(y * y)::BIGINT AS syy,
             sum(x_mu::HUGEINT * y) AS sxy_mu
      FROM per_user GROUP BY arm),
    mom AS (
      SELECT arm, n, sy, syy,
             CAST(sx_mu AS DOUBLE) / 1000000.0 AS sx,
             CAST(sxx_m2 AS DOUBLE) / 1000000000000.0 AS sxx,
             CAST(sxy_mu AS DOUBLE) / 1000000.0 AS sxy
      FROM momi)
    SELECT arm, n,
           round(sx / sy, 6) AS ratio,
           round(sx / sy - 1.96 * sqrt(greatest(0.0,
               ((sxx * 1.0 / n - (sx / n) * (sx / n))
                - 2 * (sx / sy) * (sxy * 1.0 / n - (sx / n) * (sy * 1.0 / n))
                + (sx / sy) * (sx / sy)
                  * (syy * 1.0 / n - (sy * 1.0 / n) * (sy * 1.0 / n)))
               / n) / (sy * 1.0 / n) / (sy * 1.0 / n)), 6) AS ci_lo,
           round(sx / sy + 1.96 * sqrt(greatest(0.0,
               ((sxx * 1.0 / n - (sx / n) * (sx / n))
                - 2 * (sx / sy) * (sxy * 1.0 / n - (sx / n) * (sy * 1.0 / n))
                + (sx / sy) * (sx / sy)
                  * (syy * 1.0 / n - (sy * 1.0 / n) * (sy * 1.0 / n)))
               / n) / (sy * 1.0 / n) / (sy * 1.0 / n)), 6) AS ci_hi
    FROM mom ORDER BY arm
    """,
    doc="Delta-method 95% CI for the ratio-of-sums metric value-per-"
    "event, per arm (user-id parity): users are the randomization "
    "unit, so R = Σx_u/Σy_u and Var(R) ≈ (var_x - 2R·cov + R²·var_y) "
    "/ (n·ȳ²) from ONE per-arm moments aggregate over the per-user "
    "(x, y) relation — the naive per-event t-interval is invalid "
    "because events within a user correlate (the cluster-robust "
    "folk theorem every experimentation platform relearns). Per-user "
    "x is micro-quantized to BIGINT before the moments (ADVICE r8: "
    "raw-double cross-row sums are partition-order-sensitive), so "
    "every cross-row sum — sx, sxx, sxy in micro/micro² units, held "
    "in DECIMAL(38,0)/HUGEINT — is exact-integer and converted to "
    "double exactly once, identically on both engines; CI bounds "
    "rounded 6dp after the lone sqrt; var is floored at 0 so "
    "degenerate single-user arms can't produce NaN. Two shuffles "
    "(user, then 2-row arm moments).",
)
def ratio_metric_delta_ci(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    per_user = (
        events.where(F.col("user_id").isNotNull() & F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.round(F.sum("value") * F.lit(1000000.0)).cast("long")
            .alias("x_mu"),
            F.count(F.lit(1)).cast("long").alias("y"),
        )
        .select((F.col("user_id") % 2).alias("arm"), "x_mu", "y")
    )
    # x_mu² reaches ~3e19 on the sf0.1 fixture — past BIGINT — so the
    # squared/cross moment sums ride DECIMAL(38,0) (Spark) / HUGEINT
    # (DuckDB oracle); both convert the same exact integer to double
    x_dec = F.col("x_mu").cast("decimal(19,0)")
    mom = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x_mu").cast("long").alias("sx_mu"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(x_dec * x_dec).alias("sxx_m2"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(x_dec * F.col("y").cast("decimal(19,0)")).alias("sxy_mu"),
    ).select(
        "arm",
        "n",
        "sy",
        "syy",
        (F.col("sx_mu").cast("double") / F.lit(1000000.0)).alias("sx"),
        (F.col("sxx_m2").cast("double") / F.lit(1000000000000.0))
        .alias("sxx"),
        (F.col("sxy_mu").cast("double") / F.lit(1000000.0)).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    ratio = sx / sy
    varx = F.col("sxx") * 1.0 / n - (sx / n) * (sx / n)
    vary = F.col("syy") * 1.0 / n - (sy * 1.0 / n) * (sy * 1.0 / n)
    cov = F.col("sxy") * 1.0 / n - (sx / n) * (sy * 1.0 / n)
    # the ȳ² division sits INSIDE the sqrt as the same expression tree
    # the oracle evaluates, so both engines compute the identical
    # double: se = sqrt(var_term/n / ȳ / ȳ)
    half = F.lit(1.96) * F.sqrt(
        F.greatest(
            F.lit(0.0),
            (varx - 2 * ratio * cov + ratio * ratio * vary) / n,
        )
        / (sy * 1.0 / n)
        / (sy * 1.0 / n)
    )
    return mom.select(
        "arm",
        "n",
        F.round(ratio, 6).alias("ratio"),
        F.round(ratio - half, 6).alias("ci_lo"),
        F.round(ratio + half, 6).alias("ci_hi"),
    ).orderBy("arm")


# ---------------------------------------------------------------------------
# Water-filling budget allocation under per-language capacity caps
# ---------------------------------------------------------------------------


@query(
    "budget_water_filling",
    oracle="""
    WITH caps AS (
      SELECT lang,
             sum(len(string_split(text, ' ')))::BIGINT AS cap_tokens,
             count(*)::BIGINT AS w
      FROM documents GROUP BY lang),
    tot AS (SELECT sum(cap_tokens)::BIGINT AS total_cap,
                   sum(w)::BIGINT AS total_w,
                   CAST(floor(sum(cap_tokens) / 2) AS BIGINT) AS budget
            FROM caps),
    ordered AS (
      SELECT c.lang, c.cap_tokens, c.w, t.budget, t.total_w,
             c.cap_tokens * 1.0 / c.w AS ratio,
             sum(c.cap_tokens) OVER win - c.cap_tokens AS prev_cap,
             sum(c.w) OVER win - c.w AS prev_w,
             row_number() OVER win AS pos
      FROM caps c CROSS JOIN tot t
      WINDOW win AS (ORDER BY c.cap_tokens * 1.0 / c.w, c.lang
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    cutc AS (
      SELECT min(CASE WHEN (budget - prev_cap) * 1.0 / (total_w - prev_w)
                        <= ratio
                      THEN pos END) AS cut_pos
      FROM ordered),
    lam AS (
      SELECT o.pos AS cut_pos,
             (o.budget - o.prev_cap) * 1.0 / (o.total_w - o.prev_w) AS lambda
      FROM ordered o JOIN cutc c ON o.pos = c.cut_pos)
    SELECT o.lang, o.cap_tokens, o.w,
           (o.pos < l.cut_pos) AS saturated,
           floor((CASE WHEN o.pos < l.cut_pos THEN o.cap_tokens * 1.0
                       ELSE l.lambda * o.w END) * 10000.0 + 0.5)
             / 10000.0 AS alloc_tokens
    FROM ordered o CROSS JOIN lam l
    """,
    doc="Water-filling token-budget allocation across languages: a "
    "budget of half the corpus' total token capacity is split "
    "proportionally to document-count weights, EXCEPT that no "
    "language can be allocated more than its capacity — saturated "
    "languages take their cap and the remainder re-spreads over the "
    "rest (the constrained completion of temperature_mix_weights). "
    "Closed-form threshold: order languages by capacity-per-weight "
    "ascending; the cut is the first position whose remaining-budget-"
    "per-remaining-weight λ no longer exceeds its ratio; everything "
    "before saturates, everything after gets λ·w. All comparisons run "
    "on doubles built from exact BIGINT capacities via identical "
    "expression trees (cumulative sums are integer — no float "
    "accumulation order issues), allocations displayed via the engine-"
    "mirrored floor(x*1e4+0.5)/1e4 half-up. Windows run "
    "over the |languages| relation (5 rows) — bounded state. Exactness "
    "invariant: Σalloc = budget and 0 <= alloc <= cap, asserted in "
    "tests/test_mlops4.py.",
)
def budget_water_filling(spark, sf_dir):
    from dso_import_spark.queries_pkg.util import spread_for_explode

    (docs,) = tables(spark, sf_dir, "documents")
    # tokenize-per-row compute amplification: spread the scan (the
    # round-8 pii/lang_id/bpe audit lesson) — x100: 2.06 s unspread
    # vs 0.7 s spread
    docs = spread_for_explode(docs, "doc_id", amplification=32)
    # |languages|-row relation with several downstream consumers; an
    # eager localCheckpoint was A/B-measured and REJECTED (x100 1.73 s
    # recompute vs 1.80 s checkpointed; sf0.1 0.75 vs 1.24 — the
    # blocking checkpoint job costs more than the exchange-reused
    # recompute, the shingle-prefix adjudication again)
    caps = docs.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("cap_tokens"),
        F.count(F.lit(1)).cast("long").alias("w"),
    )
    # explicit floor on both sides: Spark's long cast truncates where
    # DuckDB's ::BIGINT rounds half-even, so an odd total diverges by 1
    tot = caps.agg(
        F.sum("cap_tokens").cast("long").alias("total_cap"),
        F.sum("w").cast("long").alias("total_w"),
        F.floor(F.sum("cap_tokens") / 2).cast("long").alias("budget"),
    )
    # lang tiebreak NULLS LAST to match DuckDB's ASC default (Spark
    # sorts NULL first): a NULL-lang stratum tying on ratio would
    # shift the allocation algebra cross-engine (round-11 advisory)
    win = (
        Window.orderBy(
            F.col("cap_tokens") * 1.0 / F.col("w"),
            F.col("lang").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ordered = caps.crossJoin(F.broadcast(tot)).select(
        "lang",
        "cap_tokens",
        "w",
        "budget",
        "total_w",
        (F.col("cap_tokens") * 1.0 / F.col("w")).alias("ratio"),
        (F.sum("cap_tokens").over(win) - F.col("cap_tokens")).alias(
            "prev_cap"
        ),
        (F.sum("w").over(win) - F.col("w")).alias("prev_w"),
        F.row_number().over(win).alias("pos"),
    )
    lam_cand = (F.col("budget") - F.col("prev_cap")) * 1.0 / (
        F.col("total_w") - F.col("prev_w")
    )
    cut = ordered.agg(
        F.min(F.when(lam_cand <= F.col("ratio"), F.col("pos"))).alias(
            "cut_pos"
        )
    )
    lam = (
        ordered.join(
            F.broadcast(cut), F.col("pos") == F.col("cut_pos")
        ).select("cut_pos", lam_cand.alias("lambda"))
    )
    return ordered.crossJoin(F.broadcast(lam)).select(
        "lang",
        "cap_tokens",
        "w",
        (F.col("pos") < F.col("cut_pos")).alias("saturated"),
        # integer-scaled half-up instead of F.round (decimal HALF_UP)
        # vs DuckDB round (float half-away): floor(x*1e4 + 0.5) is the
        # identical double expression on both engines (round-11
        # advisory; alloc is non-negative)
        (
            F.floor(
                F.when(
                    F.col("pos") < F.col("cut_pos"),
                    F.col("cap_tokens") * 1.0,
                ).otherwise(F.col("lambda") * F.col("w"))
                * 10000.0
                + 0.5
            )
            / 10000.0
        ).alias("alloc_tokens"),
    )


# ---------------------------------------------------------------------------
# Randomized response (local DP) with debiasing cert
# ---------------------------------------------------------------------------

# flip with probability 0.25 from the house Knuth-mixed 20-bit uniform
_RR_FLIP_MICRO = 250000
_RR_U = "(((event_id % 2147483648) * 2654435761) >> 13) % 1000000"


@query(
    "randomized_response_debias",
    oracle=f"""
    WITH resp AS (
      SELECT (event_type = 'purchase')::INT AS b,
             ({_RR_U} < {_RR_FLIP_MICRO})::INT AS flip
      FROM events WHERE event_type IS NOT NULL),
    agg AS (
      SELECT count(*)::BIGINT AS n,
             sum(b)::BIGINT AS true_cnt,
             sum(CASE WHEN flip = 1 THEN 1 - b ELSE b END)::BIGINT AS obs_cnt
      FROM resp)
    SELECT n, true_cnt, obs_cnt,
           round((obs_cnt * 1.0 / n - 0.25) / 0.5, 6) AS debiased_rate,
           CAST(round(1000000 * abs((obs_cnt * 1.0 / n - 0.25) / 0.5
                                    - true_cnt * 1.0 / n)) AS BIGINT)
             AS abs_err_micro
    FROM agg
    """,
    doc="Randomized response (Warner 1965), the local-DP mechanism: "
    "each event reports its sensitive bit (is-purchase) FLIPPED with "
    "probability p = 0.25 (deterministic engine-replayable flips from "
    "the house Knuth-mixed 20-bit uniform — ε = ln(3) per report), "
    "then the collector debiases: rate = (observed - p)/(1 - 2p). "
    "This certifies the estimator against the ground truth the "
    "mechanism hides (abs_err_micro ≈ sampling noise, not bias) — the "
    "executable half of what dp_sensitivity_audit prepares for. Pure "
    "integer counts and one constant division: bit-identical engines, "
    "ONE map-side-combinable aggregate, no per-user state.",
)
def randomized_response_debias(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    b = (F.col("event_type") == "purchase").cast("int")
    u = (
        (F.col("event_id") % 2147483648) * F.lit(2654435761)
    ).cast("long")
    flip = (
        F.shiftright(u, 13) % 1000000 < _RR_FLIP_MICRO
    ).cast("int")
    resp = events.where(F.col("event_type").isNotNull()).select(
        b.alias("b"), flip.alias("flip")
    )
    agg = resp.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("b").cast("long").alias("true_cnt"),
        F.sum(
            F.when(F.col("flip") == 1, 1 - F.col("b")).otherwise(F.col("b"))
        )
        .cast("long")
        .alias("obs_cnt"),
    )
    debiased = (F.col("obs_cnt") * 1.0 / F.col("n") - 0.25) / 0.5
    return agg.select(
        "n",
        "true_cnt",
        "obs_cnt",
        F.round(debiased, 6).alias("debiased_rate"),
        F.round(
            F.lit(1000000)
            * F.abs(debiased - F.col("true_cnt") * 1.0 / F.col("n"))
        )
        .cast("long")
        .alias("abs_err_micro"),
    )


# ---------------------------------------------------------------------------
# Pinball (quantile) loss evaluation of reference-period predictors
# ---------------------------------------------------------------------------

_PB_SPLIT = "2024-01-16"
_PB_TAUS = [0.5, 0.75]  # exact binary fractions


@query(
    "pinball_loss_eval",
    oracle=f"""
    WITH ref AS (
      SELECT event_type,
             unnest(quantile_cont(value, {_PB_TAUS})) AS qhat,
             unnest(CAST({_PB_TAUS} AS DOUBLE[])) AS tau
      FROM events
      WHERE value IS NOT NULL AND ts < TIMESTAMP '{_PB_SPLIT}'
      GROUP BY event_type),
    cur AS (
      SELECT event_type, value FROM events
      WHERE value IS NOT NULL AND ts >= TIMESTAMP '{_PB_SPLIT}')
    SELECT c.event_type, r.tau, count(*)::BIGINT AS n_eval,
           round(sum(CAST(round(1000000 *
                 (CASE WHEN c.value >= r.qhat
                       THEN r.tau * (c.value - r.qhat)
                       ELSE (1 - r.tau) * (r.qhat - c.value) END))
                 AS BIGINT)) * 1.0 / count(*) / 1000000, 6)
             AS pinball_loss
    FROM cur c JOIN ref r ON r.event_type = c.event_type
    GROUP BY c.event_type, r.tau
    """,
    doc="Pinball (quantile) loss evaluation: per-event-type τ-quantile "
    "predictors fitted on the reference period (exact percentiles at "
    "the exact-binary fractions 0.5 and 0.75 — bit-identical "
    "interpolation in both engines) scored on the current period with "
    "the loss quantile forecasts are proper for: τ·(y-q̂)⁺ + "
    "(1-τ)·(q̂-y)⁺. The backtest readout for quantile regression / "
    "P90-latency forecasting — MSE rewards the mean, pinball rewards "
    "the claimed quantile. One tiny predictor relation (|types|×2 "
    "rows) broadcast onto one current-period scan; loss averaged "
    "from exact per-row arithmetic, rounded 6dp.",
)
def pinball_loss_eval(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    base = events.where(F.col("value").isNotNull())
    ref = (
        base.where(F.col("ts") < F.lit(_PB_SPLIT).cast("timestamp_ntz"))
        .groupBy("event_type")
        .agg(
            F.percentile(
                "value", F.array(*[F.lit(t) for t in _PB_TAUS])
            ).alias("qs")
        )
        .select(
            "event_type",
            F.explode(
                F.arrays_zip(
                    F.col("qs").alias("qhat"),
                    F.array(*[F.lit(t) for t in _PB_TAUS]).alias("tau"),
                )
            ).alias("z"),
        )
        .select("event_type", F.col("z.qhat").alias("qhat"), F.col("z.tau").alias("tau"))
    )
    cur = base.where(
        F.col("ts") >= F.lit(_PB_SPLIT).cast("timestamp_ntz")
    ).select("event_type", "value")
    loss = F.when(
        F.col("value") >= F.col("qhat"),
        F.col("tau") * (F.col("value") - F.col("qhat")),
    ).otherwise((1 - F.col("tau")) * (F.col("qhat") - F.col("value")))
    # per-row loss is micro-quantized to BIGINT BEFORE the cross-row
    # mean (round-8 code review): a raw double avg() is partition-
    # order dependent in Spark and scan-ordered in DuckDB, so a group
    # mean near a 0.5e-6 boundary could round differently — exact
    # integer sums cannot
    loss_micro = F.round(F.lit(1000000) * loss).cast("long")
    return (
        cur.join(F.broadcast(ref), "event_type")
        .groupBy("event_type", "tau")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval"),
            F.round(
                F.sum(loss_micro) * 1.0 / F.count(F.lit(1)) / 1000000, 6
            ).alias("pinball_loss"),
        )
    )


# ---------------------------------------------------------------------------
# Error-tolerant JSONL ingestion with corrupt-record audit
# ---------------------------------------------------------------------------


def _jsonl_fixture_path(sf_dir: str) -> str:
    from dso_import_spark.queries_pkg.layout import stamped_cache_path

    return stamped_cache_path(sf_dir, "events", "jsonl", "events.jsonl")


def _ensure_jsonl_file(spark, sf_dir: str) -> str:
    """Write the deterministically-corrupted JSONL fixture once per
    (sf_dir, events-parquet stamp): one line per event carrying an
    exact-integer amount = (event_id*7919) % 100000 (no floats — JSON
    round-trip stays exact), with every (event_id % 7 == 0) line
    truncated before its closing brace. Written DISTRIBUTED — lines
    are Column strings landed via write.text to a part-file directory
    (JSONL is splittable, line order irrelevant to the aggregate), so
    synthesis never collects the corpus to the driver (at ×100 events
    that would be a 10M-row collect — exactly the anti-pattern the
    registry bans on query paths)."""
    path = _jsonl_fixture_path(sf_dir)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    (events,) = tables(spark, sf_dir, "events")
    line = F.concat(
        F.lit('{"event_id": '),
        F.col("event_id").cast("string"),
        F.lit(', "event_type": "'),
        F.col("event_type"),
        F.lit('", "amount": '),
        ((F.col("event_id") * 7919) % 100000).cast("string"),
        # malformed variant: the closing brace is dropped
        F.when(F.col("event_id") % 7 == 0, F.lit("")).otherwise(F.lit("}")),
    )
    (
        events.where(F.col("event_type").isNotNull())
        .select(line.alias("value"))
        .write.mode("overwrite")
        .text(path)
    )
    return path


@query(
    "jsonl_rescue_scan",
    oracle="""
    WITH lines AS (
      SELECT CASE WHEN event_id % 7 = 0 THEN '_corrupt'
                  ELSE event_type END AS bucket,
             CASE WHEN event_id % 7 = 0 THEN NULL
                  ELSE (event_id * 7919) % 100000 END AS amount
      FROM events WHERE event_type IS NOT NULL)
    SELECT bucket, count(*)::BIGINT AS n,
           coalesce(sum(amount), 0)::BIGINT AS amount_sum
    FROM lines GROUP BY bucket
    """,
    doc="Error-tolerant JSONL ingestion: a deterministically corrupted "
    "line-delimited JSON fixture (every 7th record truncated before "
    "its closing brace) read with an explicit schema in PERMISSIVE "
    "mode + columnNameOfCorruptRecord — malformed lines land in the "
    "rescue column with every typed field NULL instead of failing the "
    "job, the lake-native analog of the reference's error-tolerant "
    "row handling (batch.py row-loop try/except; SURVEY §2.2 P13). "
    "Reports per-type parsed counts + the corrupt-line bucket and an "
    "exact-integer amount checksum (amounts are BIGINTs in the JSON, "
    "so the round-trip is exact — no float parsing ambiguity). The "
    "oracle replays the corruption rule from the events table rather "
    "than parsing JSON: the differential certifies that PERMISSIVE "
    "parsing rescues EXACTLY the malformed lines and parses everything "
    "else. Scan is splittable JSONL; the aggregate is one map-side "
    "combine.",
)
def jsonl_rescue_scan(spark, sf_dir):
    path = _ensure_jsonl_file(spark, sf_dir)
    schema = (
        "event_id long, event_type string, amount long, _corrupt string"
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    bucket = F.when(
        F.col("_corrupt").isNotNull(), F.lit("_corrupt")
    ).otherwise(F.col("event_type"))
    return raw.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum("amount"), F.lit(0)).cast("long").alias("amount_sum"),
    )
