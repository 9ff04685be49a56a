"""Invariant tests for the advanced operators: properties that must
hold under ANY parameterization, beyond what the fixture-specific
differential oracles exercise.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dso_import_spark.operators.bloom import bloom_build, bloom_prune
from dso_import_spark.queries import REGISTRY
from dso_import_spark.queries_pkg.util import tables


def test_bloom_no_false_negatives_at_any_geometry(spark, sf_dir):
    """The no-FN contract is geometry-independent: even a saturated
    tiny filter (m=64, FPR near 1) may only ADD survivors, never drop
    a true match."""
    events, customer = tables(spark, sf_dir, "events", "customer")
    build = customer.where(F.col("c_acctbal") > 6000)
    true_ids = {
        r["event_id"]
        for r in events.join(
            build, events.user_id == build.c_custkey, "left_semi"
        ).collect()
    }
    for m, k in [(64, 2), (256, 3), (4096, 5)]:
        bl = bloom_build(build, "c_custkey", m=m, k=k)
        kept = {
            r["event_id"]
            for r in bloom_prune(events, bl, "user_id", m=m, k=k).collect()
        }
        assert true_ids <= kept, f"false negatives at m={m} k={k}"


def test_exact_quota_sums_to_target_exactly(spark, sf_dir):
    """Largest-remainder allocation: per-stratum samples must total
    EXACTLY the requested size (the property Bernoulli sampling lacks),
    and no stratum may exceed its population."""
    rows = REGISTRY["exact_quota_sample"].spark(spark, sf_dir).collect()
    assert sum(r["n_sampled"] for r in rows) == 100
    sizes = {
        r["lang"]: r["n"]
        for r in tables(spark, sf_dir, "documents")[0]
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        assert r["n_sampled"] == r["quota"]
        assert r["n_sampled"] <= sizes[r["lang"]]


def test_ks_statistic_bounds_and_self_zero(spark, sf_dir):
    """0 <= D <= 1 always; real two-period data must show SOME drift
    (continuous values make identical ECDFs measure-zero); and a
    sample compared against ITSELF must give exactly D == 0."""
    rows = REGISTRY["drift_ks_statistic"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["ks_d"] <= 1.0
    assert any(r["ks_d"] > 0 for r in rows)

    # self-comparison: duplicate every value into both periods — the
    # ECDFs coincide pointwise, so D must be exactly 0
    from pyspark.sql import Window

    (events,) = tables(spark, sf_dir, "events")
    vals = events.select("event_type", "value").where(
        F.col("value").isNotNull()
    )
    pts = (
        vals.groupBy("event_type", "value")
        .agg(F.count("*").alias("d_ref"))
        .withColumn("d_cur", F.col("d_ref"))
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
    ecdf = pts.join(tot, "event_type").select(
        "event_type",
        (F.sum("d_ref").over(w) / F.col("n_ref")).alias("f_ref"),
        (F.sum("d_cur").over(w) / F.col("n_cur")).alias("f_cur"),
    )
    d = ecdf.groupBy("event_type").agg(
        F.max(F.abs(F.col("f_ref") - F.col("f_cur"))).alias("d")
    )
    assert all(r["d"] == 0.0 for r in d.collect())


def test_winsorized_mean_never_exceeds_raw_mean_cap(spark, sf_dir):
    """Winsorizing at p95 can only pull the mean DOWN (values are
    capped, never raised), and each variant's raw max must reach or
    exceed its cap (otherwise the cap did nothing and the p95 is
    suspect)."""
    rows = REGISTRY["winsorized_variant_means"].spark(spark, sf_dir).collect()
    (events,) = tables(spark, sf_dir, "events")
    maxes = {
        r["variant"]: r["mx"]
        for r in events.where(F.col("event_type") == "purchase")
        .groupBy(
            F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("variant")
        )
        .agg(F.max("value").alias("mx"))
        .collect()
    }
    for r in rows:
        assert r["winsorized_mean"] <= r["raw_mean"] + 1e-9
        assert maxes[r["variant"]] >= r["cap_p95"] - 1e-9


def test_did_equals_cell_arithmetic(spark, sf_dir):
    """DiD must equal delta_a - delta_b exactly (the output carries
    all three, so the identity is checkable from the result alone)."""
    (r,) = REGISTRY["did_difference_in_differences"].spark(spark, sf_dir).collect()
    # tolerance 2.1e-6: did, delta_a, delta_b are each INDEPENDENTLY
    # rounded to 6 decimals, so the identity can legitimately drift by
    # up to 2e-6 when the roundings land on opposite sides
    assert abs(r["did"] - round(r["delta_a"] - r["delta_b"], 6)) <= 2.1e-6


def test_ewma_null_current_value_yields_null(spark, tmp_path):
    # oracle semantics: numerator 0.5*value propagates NULL — a NULL
    # current value must NOT be renormalized into a number. Drives the
    # REAL registered query over a tmp fixture (the shipped fixture has
    # no NULL values, which is exactly the latent gap).
    import pandas as pd

    from dso_import_spark.queries import REGISTRY

    # event_ids multiples of 101 so the query's sample filter keeps them
    rows = [
        (0, 1, 10.0, "2024-01-01 00:00:00"),
        (101, 1, None, "2024-01-01 00:01:00"),
        (202, 1, 30.0, "2024-01-01 00:02:00"),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "value", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf["event_type"] = "x"
    pdf.to_parquet(tmp_path / "events.parquet")
    out = {
        r.event_id: r.ewma
        for r in REGISTRY["ewma_fixed_lags"].spark(spark, str(tmp_path)).collect()
    }
    assert out[0] == 10.0
    assert out[101] is None        # NULL current value → NULL ewma
    assert out[202] is not None    # NULL history renormalizes, not NULLs


def test_bloom_join_rejects_key_type_mismatch(spark):
    import pytest
    from pyspark.sql import functions as F

    from dso_import_spark.operators.bloom import bloom_pruned_join

    probe = spark.range(10).select(F.col("id").cast("int").alias("k"))
    build = spark.range(10).select(F.col("id").alias("bk"))  # bigint
    with pytest.raises(ValueError, match="type mismatch"):
        bloom_pruned_join(probe, build, "k", "bk")


def test_asof_rejects_key_type_mismatch(spark):
    import pytest
    from pyspark.sql import functions as F

    from dso_import_spark.operators.asof import asof_tolerance_join

    left = spark.range(4).select(
        F.col("id").alias("event_id"),
        F.col("id").cast("int").alias("user_id"),
        F.current_timestamp().alias("ts"),
    )
    right = spark.range(4).select(
        F.col("id").alias("event_id"),
        F.col("id").alias("user_id"),  # bigint
        F.current_timestamp().alias("ts"),
    )
    with pytest.raises(ValueError, match="type mismatch"):
        asof_tolerance_join(left, right, key="user_id")


def test_asof_null_timestamps_survive_as_unmatched(spark):
    import datetime

    from pyspark.sql import functions as F

    from dso_import_spark.operators.asof import asof_tolerance_join

    t = datetime.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, 7, t), (2, 7, None), (3, 8, t)],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, 7, t - datetime.timedelta(seconds=5)), (11, 8, None)],
        "event_id long, user_id long, ts timestamp",
    )
    rows = {
        r.left_id: r
        for r in asof_tolerance_join(
            left, right, key="user_id", tolerance_secs=3600
        ).collect()
    }
    assert len(rows) == 3  # the NULL-ts left row is kept, not crashed on
    assert rows[1].right_id == 10 and rows[1].secs_since == 5
    assert rows[2].right_id is None  # NULL left ts: unmatched
    assert rows[3].right_id is None  # right side's only row had NULL ts


def test_salted_join_rejects_small_side_preserving_joins(spark):
    import pytest
    from pyspark.sql import functions as F

    from dso_import_spark.operators.skew import salted_join

    big = spark.range(10).select(F.col("id").alias("k"))
    small = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="REPLICATED"):
        salted_join(big, small, "k", n_salts=4, how="full")


def test_simhash_rejects_unreachable_hamming(spark, sf_dir):
    import pytest

    from dso_import_spark.operators.dedup import simhash_pairs
    from dso_import_spark.queries_pkg.util import tables

    (docs,) = tables(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="n_bands"):
        simhash_pairs(docs, max_hamming=4, n_bands=4)


def test_kmeans_rejects_k_above_row_count(spark, sf_dir):
    import pytest

    from dso_import_spark.operators.similarity import kmeans_assignments
    from dso_import_spark.queries_pkg.util import tables

    (emb,) = tables(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="exceeds"):
        kmeans_assignments(emb.limit(2), k=4, iters=2)


def test_compact_recovers_from_interrupted_swap(spark, sf_dir, tmp_path):
    """A crash between the two swap renames leaves the table at .old;
    the next compact must roll it back instead of failing."""
    import os
    import shutil

    from dso_import_spark.operators.maintenance import compact, dir_stats
    from dso_import_spark.queries_pkg.util import tables

    (orders,) = tables(spark, sf_dir, "orders")
    p = str(tmp_path / "t")
    orders.limit(500).repartition(6).write.parquet(p)
    n_rows = spark.read.parquet(p).count()
    # simulate the crash window: table renamed away, new data not yet in
    os.rename(p, p + ".old")
    compact(spark, p, target_bytes=1 << 30)
    assert spark.read.parquet(p).count() == n_rows
    assert not os.path.exists(p + ".old")
    # stale .compacting from a mid-write crash is discarded
    shutil.copytree(p, p + ".compacting")
    compact(spark, p, target_bytes=1 << 30)
    assert not os.path.exists(p + ".compacting")
    assert spark.read.parquet(p).count() == n_rows
