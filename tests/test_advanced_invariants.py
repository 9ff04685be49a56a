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
