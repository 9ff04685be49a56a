"""Invariant tests for the round-9 mlops5 stats/eval batch (the
cross-engine value agreement itself is pinned by the DuckDB
differentials in test_queries_vs_duckdb.py — these tests check the
STATISTICS are right, not just engine-consistent)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dso_import_spark.queries import REGISTRY


def test_kaplan_meier_is_a_survival_curve(spark, sf_dir):
    rows = sorted(
        REGISTRY["kaplan_meier_interarrival"].spark(spark, sf_dir).collect(),
        key=lambda r: r.gap_hours,
    )
    assert rows, "no observed inter-event gaps in fixture?"
    surv = [r.survival for r in rows]
    assert all(0.0 < s <= 1.0 for s in surv)
    assert surv == sorted(surv, reverse=True), "survival must be monotone"
    risk = [r.at_risk for r in rows]
    assert risk == sorted(risk, reverse=True), "at-risk must shrink over time"


def test_spearman_perfect_monotone_is_exactly_one(spark, tmp_path):
    # engineered perfect monotone relation: order k has totalprice 100k
    # and exactly k lineitems -> every (x, y) pair is concordant, all
    # ranks tie-free: rho must be exactly 1.0 (the exact-integer rank
    # algebra leaves no room for 0.999999)
    orders = spark.createDataFrame(
        [(k, 100.0 * k) for k in range(1, 40)],
        "o_orderkey long, o_totalprice double",
    )
    li = spark.createDataFrame(
        [(k, i) for k in range(1, 40) for i in range(k)],
        "l_orderkey long, l_linenumber long",
    )
    orders.write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    li.write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    row = (
        REGISTRY["spearman_rank_correlation"]
        .spark(spark, str(tmp_path))
        .head()
    )
    assert row.n_orders == 39
    assert row.rho_spearman == 1.0


def test_spearman_fixture_range(spark, sf_dir):
    row = REGISTRY["spearman_rank_correlation"].spark(spark, sf_dir).head()
    # the synthetic fixture draws o_totalprice independently of the
    # lineitems, so only the mathematical range is pinned here (the
    # engineered-monotone test above pins the rank algebra)
    assert -1.0 <= row.rho_spearman <= 1.0


def test_permutation_p_value_bounds(spark, sf_dir):
    row = REGISTRY["permutation_test_signflip"].spark(spark, sf_dir).head()
    # p in (0, 1]: the +1 numerator term makes p=0 impossible
    assert 1.0 / 129 <= row.p_value <= 1.0


def test_unigram_perplexity_sane(spark, sf_dir):
    rows = (
        REGISTRY["unigram_perplexity_heldout"].spark(spark, sf_dir).collect()
    )
    assert rows
    for r in rows:
        # geometric-mean inverse probability: >= 1 by construction, and
        # far below vocab-size-uniform for any real text distribution
        assert r.perplexity >= 1.0
        assert r.n_docs > 0 and r.n_tokens > 0


def test_jl_distortion_concentrates_near_one(spark, sf_dir):
    row = (
        REGISTRY["jl_projection_distortion_cert"].spark(spark, sf_dir).head()
    )
    assert row.n_pairs > 0
    # E[ratio] = 1 exactly for a +-1 sign matrix; m=16 keeps the
    # projection cheap, so concentration is loose (sd ~ sqrt(2/m) =
    # 0.35) — the cert exists to MEASURE it, the test pins only the
    # physically sensible band
    assert 0.6 < row.mean_ratio < 1.4
    assert row.min_ratio > 0.0
    assert row.frac_within_20pct >= 0.1


def test_mde_positive_and_symmetric_arms(spark, sf_dir):
    rows = (
        REGISTRY["ab_minimum_detectable_effect"].spark(spark, sf_dir).collect()
    )
    assert rows
    for r in rows:
        assert r.mde_abs > 0.0
        assert r.n0 > 1 and r.n1 > 1


def test_mcnemar_chi2_nonnegative(spark, sf_dir):
    row = REGISTRY["mcnemar_paired_test"].spark(spark, sf_dir).head()
    assert row.mcnemar_chi2 >= 0.0
    assert row.b_only_a + row.c_only_b <= row.n_docs


def test_chao1_at_least_observed_vocab(spark, sf_dir):
    rows = REGISTRY["vocab_chao1_richness"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # the estimator only ADDS unseen mass to the observed count
        assert r.chao1_est >= r.vocab_size
        assert r.f1 + r.f2 <= r.vocab_size


def test_degree_histogram_accounts_every_node(spark, sf_dir):
    from pyspark.sql import functions as F

    from dso_import_spark.queries_pkg.tsops import copurchase_adj
    from dso_import_spark.queries_pkg.util import tables

    (li,) = tables(spark, sf_dir, "lineitem")
    hist = REGISTRY["copurchase_degree_histogram"].spark(spark, sf_dir)
    n_hist = hist.agg(F.sum(F.col("n_nodes"))).head()[0]
    n_nodes = copurchase_adj(li).select("u").distinct().count()
    assert n_hist == n_nodes
    assert all(r.degree > 0 for r in hist.collect())


def test_jl_sign_is_not_a_checkerboard(spark):
    # regression guard on the sign hash: bit 0 of (i*odd + j*odd) is
    # parity(i+j) — a rank-1 checkerboard that collapses the projection;
    # the middle-bit mix must produce signs that differ somewhere on
    # the same diagonal
    from pyspark.sql import functions as F

    from dso_import_spark.queries_pkg.mlops5 import _jl_sign

    df = spark.range(1).select(
        *[
            _jl_sign(F.lit(i), j).alias(f"s_{i}_{j}")
            for i in range(1, 9)
            for j in range(1, 9)
        ]
    )
    row = df.head()
    diag = [row[f"s_{i}_{(i % 8) + 1}"] for i in range(1, 9)]
    anti = [row[f"s_{i}_{8 - (i % 8)}"] for i in range(1, 9)]
    assert len(set(diag)) == 2 or len(set(anti)) == 2, (
        "JL signs look checkerboard-degenerate"
    )


@pytest.mark.parametrize(
    "name",
    [
        "kaplan_meier_interarrival",
        "spearman_rank_correlation",
        "permutation_test_signflip",
        "unigram_perplexity_heldout",
        "jl_projection_distortion_cert",
        "ab_minimum_detectable_effect",
        "mcnemar_paired_test",
        "vocab_chao1_richness",
        "copurchase_degree_histogram",
    ],
)
def test_mlops5_idempotent_second_call(spark, sf_dir, name):
    # same callable twice in one session must not mutate shared state
    a = REGISTRY[name].spark(spark, sf_dir).collect()
    b = REGISTRY[name].spark(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_jl_sign_matrix_matches_column_hash(spark):
    # the numpy matrix (the shipped matmul path) and the Column hash
    # (the documented definition) must stay in lockstep bit for bit
    import numpy as np
    from pyspark.sql import functions as F

    from dso_import_spark.queries_pkg.mlops5 import _jl_sign, _jl_sign_matrix

    d, m = 12, 16
    mat = _jl_sign_matrix(d, m)
    cols = spark.range(1).select(
        *[
            _jl_sign(F.lit(i), j).alias(f"s_{i}_{j}")
            for i in range(1, d + 1)
            for j in range(1, m + 1)
        ]
    ).head()
    col_mat = np.array(
        [[cols[f"s_{i}_{j}"] for j in range(1, m + 1)] for i in range(1, d + 1)]
    )
    assert (mat == col_mat).all()


def test_jl_cert_survives_null_and_ragged_embeddings(spark, tmp_path):
    # schema-legal edges the batched matmul would crash on: a NULL
    # embedding and a ragged (different-length) one. NULL projects to
    # NULL and its pair drops at the do2 > 0 filter — same as the
    # oracle's NULL propagation; the ragged row gets its own sign
    # matrix. (round-9 review: np.stack crashed the executor on both)
    rows = [(i, [float(i % 7) / 7, 0.25, -0.5, 1.0]) for i in range(10)]
    rows[3] = (3, None)
    rows[6] = (6, [0.1, 0.2])  # ragged
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    emb.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    row = (
        REGISTRY["jl_projection_distortion_cert"]
        .spark(spark, str(tmp_path))
        .head()
    )
    # pairs (2,3) and (6,7) drop: NULL projection / NULL ragged dist;
    # pair (4,5) may drop only on do2=0 — identical vectors do have
    # do2=0 here since embedding depends on i%7: (0,1),(4,5),(8,9) stay
    assert row.n_pairs >= 2
    assert row.min_ratio > 0.0


def test_logrank_identical_arms_is_small(spark, tmp_path):
    # both arms drawn from the SAME deterministic gap process -> the
    # statistic must be tiny (exactly 0 when arms mirror perfectly)
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(20):  # consecutive (even, odd) pairs share a gap
        for k in range(30):  # pattern, so the two arms are exact mirrors
            rows.append(
                (eid, base + dt.timedelta(hours=k * (1 + (u // 2) % 3)), u,
                 "view", 1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    ev.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    row = REGISTRY["logrank_two_arm"].spark(spark, str(tmp_path)).head()
    # observed equals expected at every pooled time point
    assert row.logrank_chi2 < 0.01
    assert abs(row.events_arm0 - row.expected_arm0) < 0.01


def test_rrf_fusion_ranks_and_bounds(spark, sf_dir):
    rows = REGISTRY["rrf_rank_fusion"].spark(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r.rank_rev is not None or r.rank_qty is not None
        # max possible score: rank 1 in both lists
        assert 0 < r.rrf_score <= 2 / 61
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_weighted_median_between_min_and_max(spark, sf_dir):
    from pyspark.sql import functions as F

    from dso_import_spark.queries_pkg.util import tables

    (li,) = tables(spark, sf_dir, "lineitem")
    bounds = {
        r.flag: (r.lo, r.hi)
        for r in li.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .collect()
    }
    for r in REGISTRY["weighted_median_groups"].spark(spark, sf_dir).collect():
        lo, hi = bounds[r.flag]
        assert lo <= r.weighted_median_price <= hi
        assert r.total_weight > 0


def test_weighted_median_exact_on_engineered_weights(spark, tmp_path):
    # weights concentrate mass on one price: the weighted median must
    # be that price even though it is the largest value (an unweighted
    # median would pick 2.0)
    li = spark.createDataFrame(
        [("A", 1.0, 1.0), ("A", 2.0, 1.0), ("A", 3.0, 10.0)],
        "l_returnflag string, l_extendedprice double, l_quantity double",
    )
    li.write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    row = REGISTRY["weighted_median_groups"].spark(spark, str(tmp_path)).head()
    assert row.weighted_median_price == 3.0
    assert row.total_weight == 12


def test_mase_seasonal_on_perfectly_seasonal_series(spark, tmp_path):
    # y(h) depends only on h % 24 -> seasonal-naive error is exactly 0
    # while the naive lag-1 error is not: mase must be exactly 0.0
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(24 * 5):
        for _ in range(1 + (h % 24) % 5):  # count pattern with period 24
            rows.append((eid, base + dt.timedelta(hours=h, minutes=1), 1,
                         "view", 1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    ev.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    row = REGISTRY["mase_seasonal_naive"].spark(spark, str(tmp_path)).head()
    assert row.mase == 0.0
    assert row.mae_seasonal == 0.0
    assert row.mae_naive > 0


def test_negative_domain_cross_engine_agreement(spark, tmp_path):
    # r9 advice: the bucket ids were (cents / K).cast('long') — trunc
    # toward zero — while the oracles use `//` floor division, and the
    # permutation oracle said `% 2 = 1` where Spark says ~(% 2 == 0).
    # Both divergences are invisible on the all-positive fixtures, so
    # pin the cross-engine agreement on a hostile NEGATIVE-key/price
    # mini-fixture (prices straddling -K..K, odd negative user ids).
    import duckdb

    orders = spark.createDataFrame(
        [(-5, -123.45), (-4, -60000.00), (-3, -0.01), (-2, -49999.99),
         (2, 55555.55), (3, -99999.99), (7, 42.0), (11, 120000.0)],
        "o_orderkey long, o_totalprice double",
    )
    li = spark.createDataFrame(
        [(k, i, float(1 + i), p)
         for k, p in [(-5, -5.0), (-4, -15000.0), (-3, 2.5), (-2, -25000.0),
                      (2, 30000.0), (3, -9999.99), (7, 7.0), (11, 11.0)]
         for i in range((abs(k) % 3) + 1)],
        "l_orderkey long, l_linenumber long, l_quantity double, "
        "l_extendedprice double",
    ).withColumn("l_returnflag", F.when(F.col("l_orderkey") % 2 == 0,
                                        "A").otherwise("R"))
    import datetime as dt
    ev = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1, i % 24), u, "view", v, "{}")
         for i, (u, v) in enumerate(
             [(-7, -1.25), (-6, 3.5), (-3, -0.75), (-1, 10.0),
              (1, -2.0), (2, 0.5), (5, 4.25), (8, -6.5)] * 4)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orders.write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    li.write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    ev.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    con = duckdb.connect()
    for t in ("orders", "lineitem", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet/*.parquet')"
        )
    for name in ("spearman_rank_correlation", "weighted_median_groups",
                 "permutation_test_signflip"):
        spec = REGISTRY[name]
        srows = sorted(
            tuple(str(x) for x in r)
            for r in spec.spark(spark, str(tmp_path)).collect()
        )
        drows = sorted(
            tuple(str(x) for x in r) for r in con.sql(spec.oracle).fetchall()
        )
        assert srows == drows, (name, srows, drows)
