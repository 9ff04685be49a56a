"""Semantic invariants for the third mlops batch (mlops3.py) — the
differential suite (test_queries_vs_duckdb) checks oracle equality;
these pin the statistics' defining properties on the real fixtures."""

from __future__ import annotations

from dso_import_spark.queries import REGISTRY


def test_mrr_bounds_and_group_universe(spark, sf_dir):
    (row,) = REGISTRY["mrr_at_k"].spark(spark, sf_dir).collect()
    assert row["n_groups"] == 50
    assert 0 <= row["n_hit"] <= row["n_groups"]
    assert 0.0 <= row["mrr"] <= 1.0
    # label=0 is 10% of vectors, so some groups hit within top-10
    assert row["n_hit"] > 0 and row["mrr"] > 0.0


def test_kappa_bounds_and_positive_by_construction(spark, sf_dir):
    (row,) = REGISTRY["cohens_kappa"].spark(spark, sf_dir).collect()
    assert row["n"] == row["n11"] + row["n10"] + row["n01"] + row["n00"]
    assert -1.0 <= row["kappa"] <= 1.0
    # rater B is rater A's value plus a bounded +-3 user-keyed shift:
    # heavily correlated, so agreement must be far above chance
    assert row["kappa"] > 0.5


def test_chi_square_nonnegative_with_expected_dof(spark, sf_dir):
    (row,) = (
        REGISTRY["chi_square_independence"].spark(spark, sf_dir).collect()
    )
    assert row["chi2"] >= 0.0
    assert row["dof"] == 4  # (5 event types - 1) * (2 arms - 1)
    # arms are user-id parity of a synthetic fixture: independent by
    # construction, so the statistic stays far below blow-up levels
    assert row["chi2"] < 50.0


def test_stump_partitions_the_table(spark, sf_dir):
    from dso_import_spark.queries_pkg.util import tables

    (row,) = REGISTRY["decision_stump_split"].spark(spark, sf_dir).collect()
    (events,) = tables(spark, sf_dir, "events")
    assert row["n_left"] + row["n_right"] == events.count()
    assert row["n_left"] > 0 and row["n_right"] > 0
    assert row["gain_milli"] >= 0  # information gain is non-negative


def test_quantile_normalization_lands_on_pooled_representatives(
    spark, sf_dir
):
    rows = (
        REGISTRY["quantile_normalize_sources"].spark(spark, sf_dir).collect()
    )
    assert len(rows) == 20  # every source normalized
    # after normalization every source spans (a subset of) the SAME 16
    # pooled representatives, so cross-source ranges must overlap hard:
    # max of the per-source minima <= min of the per-source maxima
    assert max(r["min_norm"] for r in rows) <= min(
        r["max_norm"] for r in rows
    )
    for r in rows:
        assert r["min_norm"] <= r["mean_norm"] <= r["max_norm"]


def test_mad_outliers_are_a_strict_minority(spark, sf_dir):
    rows = REGISTRY["robust_outlier_mad"].spark(spark, sf_dir).collect()
    assert {r["event_type"] for r in rows} and len(rows) == 5
    for r in rows:
        assert r["mad"] >= 0.0
        # |modified z| > 3.5 marks at most a small tail by construction
        # of the robust estimator (breakdown point 50%)
        assert 0 <= r["n_outliers"] < 0.5 * r["n"]


def test_t_closeness_flags_derive_from_quantized_tvd(spark, sf_dir):
    rows = REGISTRY["t_closeness_audit"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["tvd_milli"] <= 1000  # TVD is bounded in [0, 1]
        assert r["within_t"] == (r["tvd_milli"] <= 200)


def test_brier_decomposition_terms_are_consistent(spark, sf_dir):
    (row,) = REGISTRY["brier_decomposition"].spark(spark, sf_dir).collect()
    assert 0.0 <= row["brier"] <= 1.0
    assert row["reliability"] >= 0.0 and row["resolution"] >= 0.0
    assert 0.0 <= row["uncertainty"] <= 0.25  # p(1-p) max at 0.5
    # resolution can never exceed uncertainty (variance decomposition)
    assert row["resolution"] <= row["uncertainty"] + 1e-6
    # Murphy identity holds up to within-bin forecast variance
    assert abs(
        row["brier"]
        - (row["reliability"] - row["resolution"] + row["uncertainty"])
    ) < 0.05


def test_f1_sweep_is_monotone_in_the_right_places(spark, sf_dir):
    rows = sorted(
        REGISTRY["f1_threshold_sweep"].spark(spark, sf_dir).collect(),
        key=lambda r: r["threshold"],
    )
    assert len(rows) == 7
    # raising the threshold can only shrink the predicted-positive set:
    # tp and fp are non-increasing, fn non-decreasing
    for a, b in zip(rows, rows[1:]):
        assert b["tp"] <= a["tp"] and b["fp"] <= a["fp"]
        assert b["fn"] >= a["fn"]
    for r in rows:
        assert 0 <= r["f1_milli"] <= 1000


def test_stratified_ate_counts_two_armed_strata_only(spark, sf_dir):
    (row,) = REGISTRY["stratified_ate"].spark(spark, sf_dir).collect()
    assert 1 <= row["n_strata"] <= 24
    assert row["n"] > 0
    # parity arms of a synthetic fixture: ATE must be near zero
    # relative to the value scale (mean ~50)
    assert abs(row["ate"]) < 10.0


def test_mann_kendall_caps_pairs_and_flags_from_quantized_z(spark, sf_dir):
    rows = REGISTRY["mann_kendall_trend"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_used"] <= 40  # the pair cap
        max_s = r["n_used"] * (r["n_used"] - 1) // 2
        assert -max_s <= r["s_stat"] <= max_s
        assert r["trending"] == (abs(r["z_milli"]) > 1960)


def test_flesch_is_finite_and_language_complete(spark, sf_dir):
    rows = REGISTRY["flesch_readability"].spark(spark, sf_dir).collect()
    assert len(rows) == 5  # every language scored
    for r in rows:
        assert r["min_f_milli"] <= r["max_f_milli"]
        assert r["min_f_milli"] / 1000 <= r["avg_flesch"] <= (
            r["max_f_milli"] / 1000
        )


def test_bootstrap_ci_brackets_the_point_estimate(spark, sf_dir):
    (row,) = REGISTRY["bootstrap_mean_ci"].spark(spark, sf_dir).collect()
    assert row["ci_lo"] <= row["ci_hi"]
    # the rank-based CI must bracket the full-sample mean, and its
    # width must shrink with n (~1/sqrt(n) of the value sd ~50)
    assert row["ci_lo"] <= row["mean"] <= row["ci_hi"]
    import math

    assert (row["ci_hi"] - row["ci_lo"]) < 50.0 / math.sqrt(row["n"]) * 10


def test_kappa_degenerate_raters_emit_zero_sentinel_in_both_engines(spark):
    # ADVICE r7: pe = 1 (both raters constant) zeroes the kappa
    # denominator; the guard must emit the explicit 0.0 sentinel in
    # BOTH engines rather than an engine-divergent NaN/NULL. Replay
    # the registered expression trees on a degenerate confusion matrix
    # (all agreement in one cell).
    import duckdb
    from pyspark.sql import functions as F

    cm = spark.createDataFrame(
        [(100, 100, 0, 0, 0)], "n long, n11 long, n10 long, n01 long, n00 long"
    )
    n = F.col("n")
    po = (F.col("n11") + F.col("n00")) * F.lit(1.0) / n
    pe = ((F.col("n11") + F.col("n10")) * F.lit(1.0) / n) * (
        (F.col("n11") + F.col("n01")) * F.lit(1.0) / n
    ) + ((F.col("n01") + F.col("n00")) * F.lit(1.0) / n) * (
        (F.col("n10") + F.col("n00")) * F.lit(1.0) / n
    )
    (row,) = cm.select(
        F.when(pe < F.lit(1.0), F.round((po - pe) / (F.lit(1.0) - pe), 6))
        .otherwise(F.lit(0.0))
        .alias("kappa")
    ).collect()
    assert row["kappa"] == 0.0
    (dk,) = duckdb.sql(
        """
        WITH cm AS (SELECT 100::BIGINT n, 100::BIGINT n11, 0::BIGINT n10,
                           0::BIGINT n01, 0::BIGINT n00)
        SELECT CASE WHEN ((n11 + n10) * 1.0 / n) * ((n11 + n01) * 1.0 / n)
                       + ((n01 + n00) * 1.0 / n) * ((n10 + n00) * 1.0 / n)
                       < 1.0
               THEN round(((n11 + n00) * 1.0 / n
                      - ((n11 + n10) * 1.0 / n) * ((n11 + n01) * 1.0 / n)
                      - ((n01 + n00) * 1.0 / n) * ((n10 + n00) * 1.0 / n))
                     / (1.0
                      - ((n11 + n10) * 1.0 / n) * ((n11 + n01) * 1.0 / n)
                      - ((n01 + n00) * 1.0 / n) * ((n10 + n00) * 1.0 / n)),
                     6)
               ELSE 0.0 END FROM cm
        """
    ).fetchone()
    assert float(dk) == 0.0


def test_f1_degenerate_threshold_emits_zero_sentinel_in_both_engines(spark):
    # ADVICE r7: a threshold slice with zero positives on either side
    # (2tp+fp+fn = 0) zeroes the F1 denominator; both engines must
    # emit the explicit 0 sentinel.
    import duckdb
    from pyspark.sql import functions as F

    sweep = spark.createDataFrame([(0, 0, 0)], "tp long, fp long, fn long")
    denom = 2 * F.col("tp") + F.col("fp") + F.col("fn")
    (row,) = sweep.select(
        F.when(
            denom > 0,
            F.round(F.lit(1000) * F.lit(2.0) * F.col("tp") / denom).cast(
                "long"
            ),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("f1_milli")
    ).collect()
    assert row["f1_milli"] == 0
    (dv,) = duckdb.sql(
        """
        SELECT CASE WHEN 2 * 0 + 0 + 0 > 0
               THEN CAST(round(1000 * 2.0 * 0 / (2 * 0 + 0 + 0)) AS BIGINT)
               ELSE 0 END
        """
    ).fetchone()
    assert int(dv) == 0
