"""The Lloyd assignment step has two physical forms that must agree:
the literal-centroid Column expression (k < _KERNEL_MIN_K — constant-
folded, SQL-oracle-replayable) and the Arrow-batched matmul kernel
(k >= _KERNEL_MIN_K — zero plan growth at corpus-clustering sizes).
Same norm identity, same smallest-index tie-break; this pins the two
paths to identical assignments on real fixture vectors, and the
auto-k semantic_dedup contract on top."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dso_import_spark.operators.similarity import (
    _assign,
    _assign_kernel,
    as_double,
    dot,
    semantic_dedup,
    train_centroids,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def z(spark):
    from dso_import_spark.queries_pkg.util import tables

    (emb,) = tables(spark, SF, "embeddings")
    v = as_double(F.col("embedding"))
    out = emb.select(
        F.col("vec_id"), v.alias("ve")
    ).withColumn("na", dot(F.col("ve"), F.col("ve")))
    out.cache()
    yield out
    out.unpersist()


def _collect_assign(df):
    return {
        r["vec_id"]: (r["cluster"], round(r["dist2"], 6))
        for r in df.select("vec_id", "cluster", "dist2").collect()
    }


def test_kernel_matches_literal_assignment(z):
    # k=16 stays under _KERNEL_MIN_K so _assign picks the literal
    # path; the kernel is invoked explicitly on the same centroids
    cents = train_centroids(z, k=16, iters=2)
    lit = _collect_assign(_assign(z, cents))
    ker = _collect_assign(_assign_kernel(z, cents))
    assert lit == ker


def test_assign_dispatches_to_kernel(z):
    # 64 centroids >= _KERNEL_MIN_K: dispatch must take the kernel
    # (mapInPandas) path — visible as a pythonUDF stage in the plan
    cents = train_centroids(z, k=64, iters=1)
    df = _assign(z, cents)
    assert "MapInPandas" in df._jdf.queryExecution().analyzed().toString()
    # and it still assigns every vector to a valid cluster
    rows = df.select("cluster").distinct().collect()
    assert all(0 <= r["cluster"] < 64 for r in rows)


def test_semantic_dedup_auto_k(spark):
    from dso_import_spark.queries_pkg.util import tables

    (emb,) = tables(spark, SF, "embeddings")
    n = emb.count()
    # target 10 → k = n // 10 clusters (50 at sf0.001, over the
    # kernel threshold when run on bigger fixtures; here it checks
    # the k arithmetic and that output schema/invariants hold)
    out = semantic_dedup(emb, k=4, iters=2, threshold=0.35, auto_k_target=10)
    rows = out.collect()
    assert len(rows) == n
    k_eff = max(4, n // 10)
    assert {r["cluster"] for r in rows} <= set(range(k_eff))
    # dropped implies a recorded best-lower-neighbor similarity
    for r in rows:
        assert r["dropped"] == (r["max_sim_lower"] is not None)
