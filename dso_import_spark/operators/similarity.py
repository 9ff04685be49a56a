"""Similarity search over embedding columns (SURVEY.md §2.10 extension).

Two tiers:
- brute_force_topk: exact cosine top-k — the correctness baseline.
  Query set × corpus join; fine when the query side is small or the
  corpus is blocked. All math is Column expressions (functions.vectors).
- ivf_topk: IVF-style scale path — k-means-ish coarse quantization
  using per-label centroids (or computed centroids), broadcast to
  prune the corpus to one cell per query before the exact rerank.
  At 100 TB the corpus is partitioned by cell id, the centroid table
  broadcasts, and each query scans ~1/n_cells of the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dso_import_spark.functions.vectors import as_double, cosine, dot, norm


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    round_scale: int = 6,
    query_extra: tuple = (),
    corpus_extra: tuple = (),
    pair_filter=None,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Deterministic rank: (rounded cosine desc, neighbor id asc).
    Returns (query_id, rank, neighbor_id, cos_sim, *extras).
    Self-matches (same id) are excluded.

    ``query_extra`` / ``corpus_extra`` carry additional columns into
    the pair relation (query-side columns are prefixed ``q_``);
    ``pair_filter`` is an optional Column predicate applied to each
    pair before ranking — hard-negative mining passes labels through
    and filters q_label != label, so the shared score/rank tail is
    maintained once.
    """
    q = queries.select(
        F.col(query_id).alias("query_id"),
        as_double(F.col(vec_col)).alias("qv"),
        *[F.col(c).alias(f"q_{c}") for c in query_extra],
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cv"),
        *[F.col(c) for c in corpus_extra],
    )
    pairs = q.crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))
    if pair_filter is not None:
        pairs = pairs.filter(pair_filter)
    sim = F.round(cosine(F.col("qv"), F.col("cv")), round_scale)
    extras = [f"q_{c}" for c in query_extra] + list(corpus_extra)
    scored = pairs.select(
        "query_id", "neighbor_id", sim.alias("cos_sim"), *extras
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim", *extras)
    )


def centroids_by_label(
    corpus: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label mean vector: posexplode → avg per (label, pos) → re-collect.

    Two narrow aggregations; output is n_labels rows (broadcastable).
    """
    exploded = corpus.select(
        F.col(label_col).alias("label"),
        F.posexplode(as_double(F.col(vec_col))).alias("pos", "x"),
    )
    per_dim = exploded.groupBy("label", "pos").agg(F.avg("x").alias("m"))
    return (
        per_dim.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("m")))
                ),
                lambda s: s["m"],
            ).alias("centroid")
        )
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_scale: int = 6,
) -> DataFrame:
    """IVF-bucketed approximate top-k: route each query to its nearest
    centroid cell, exact-rerank only within that cell.

    The centroid table broadcasts; the corpus joins on its own cell id
    (label), so the expensive exact cosine runs against ~1/n_cells of
    the corpus. Recall vs brute force is checked in tests against the
    fixture's cluster labels.
    """
    cents = F.broadcast(centroids_by_label(corpus, label_col, vec_col))
    q = queries.select(
        F.col(query_id).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    routed = (
        q.crossJoin(cents)
        .select(
            "query_id",
            "qv",
            "label",
            cosine(F.col("qv"), F.col("centroid")).alias("cent_sim"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cent_sim").desc(), F.col("label")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("query_id", "qv", "label")
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(label_col).alias("label"),
        as_double(F.col(vec_col)).alias("cv"),
    )
    pairs = routed.join(c, "label").filter(F.col("query_id") != F.col("neighbor_id"))
    sim = F.round(cosine(F.col("qv"), F.col("cv")), round_scale)
    scored = pairs.select("query_id", "neighbor_id", sim.alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def hard_negative_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    n_probe: int | None = None,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_scale: int = 6,
) -> DataFrame:
    """Hard-negative mining via IVF cell routing: for each query, the
    top-k most-cosine-similar corpus vectors with a DIFFERENT label,
    found by probing other-label cells — never a query×corpus
    cartesian product.

    Shape (the IVF candidate path the brute-force baseline lacks):
    1. per-label centroids (n_labels rows) broadcast;
    2. each query ranks the OTHER-label centroids by cosine and keeps
       its ``n_probe`` nearest cells (None = all other cells — exact,
       because cell == label here, so every different-label vector
       lives in a probed cell);
    3. candidates come from an equi-join on the cell id — the corpus
       hash-partitions by label, queries fan out n_probe rows each —
       then exact cosine reranks candidates only.

    At 100 TB, ``n_probe`` bounds work to the n_probe nearest cells'
    volume (the recall/cost knob every IVF index exposes); the plan
    contains no CartesianProduct at any setting. Deterministic rank:
    (rounded cosine desc, neighbor id asc).
    Returns (query_id, rank, negative_id, neg_label, cos_sim).
    """
    cents = F.broadcast(centroids_by_label(corpus, label_col, vec_col))
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(label_col).alias("q_label"),
        as_double(F.col(vec_col)).alias("qv"),
    )
    probed = (
        q.crossJoin(cents)  # broadcast nested loop over n_labels rows
        .filter(F.col("label") != F.col("q_label"))
        .select(
            "query_id",
            "q_label",
            "qv",
            "label",
            cosine(F.col("qv"), F.col("centroid")).alias("cent_sim"),
        )
    )
    if n_probe is not None:
        cw = Window.partitionBy("query_id").orderBy(
            F.col("cent_sim").desc(), F.col("label")
        )
        probed = (
            probed.withColumn("crk", F.row_number().over(cw))
            .filter(F.col("crk") <= n_probe)
        )
    probed = probed.select("query_id", "q_label", "qv", "label")
    c = corpus.select(
        F.col(corpus_id).alias("negative_id"),
        F.col(label_col).alias("label"),
        as_double(F.col(vec_col)).alias("cv"),
    )
    cands = probed.join(c, "label")  # cell-pruned equi-join
    sim = F.round(cosine(F.col("qv"), F.col("cv")), round_scale)
    scored = cands.select(
        "query_id",
        "negative_id",
        F.col("label").alias("neg_label"),
        sim.alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("negative_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "negative_id", "neg_label", "cos_sim")
    )


def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    topk: int = 5,
    m: int = 2,
    k_codes: int = 4,
    iters: int = 2,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_scale: int = 6,
) -> DataFrame:
    """IVF + PQ: the production ANN composition — coarse-route each
    query to its nearest cell (per-label centroids, broadcast), then
    ADC-score with product-quantization codes ONLY within that cell.

    Per query, work = k_cells centroid dots (routing) + |cell| ADC
    lookups — against a corpus stored as m small codes per vector. At
    100 TB: the corpus is partitioned by cell id, codes live next to
    the ids (8-16 bytes/vector instead of kilobytes), and a query
    touches one partition's codes. Classic IVFADC minus the residual
    encoding (codebooks are trained on raw vectors corpus-wide, not on
    cell residuals) — the variant a SQL oracle can replay with the
    same CTEs as ann_ivf_topk + ann_pq_topk.

    Returns (query_id, rank, neighbor_id, adc_dist2).
    """
    # --- coarse routing: identical to ivf_topk's first stage
    cents = F.broadcast(centroids_by_label(corpus, label_col, vec_col))
    q = queries.select(
        F.col(query_id).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    routed = (
        q.crossJoin(cents)
        .select(
            "query_id",
            "qv",
            "label",
            cosine(F.col("qv"), F.col("centroid")).alias("cent_sim"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cent_sim").desc(), F.col("label")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("query_id", "qv", "label")
    )

    # --- PQ codebooks + coded corpus (shared helpers with pq_topk)
    z = corpus.select(
        F.col(corpus_id).alias("vec_id"),
        F.col(label_col).alias("label"),
        as_double(F.col(vec_col)).alias("ve"),
    )
    books, sub, coded = _pq_encode(
        z, m, k_codes, iters, round_scale, extra_cols=("label",)
    )

    # --- per-query distance tables + cell-restricted ADC scoring:
    # the join keys on the routed cell (equi on label), so each query
    # scores ~1/n_cells of the coded corpus
    qtabs = _pq_query_tables(routed, books, sub, m, extra_cols=("label",))
    scored = (
        F.broadcast(qtabs)
        .join(coded, "label")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", _pq_adc(m, round_scale).alias("adc_dist2")
        )
    )
    return _topk_by_adc(scored, topk)


def lsh_bucket(
    vec_col: Column | str, n_bits: int = 6, scale: int = 1000
) -> Column:
    """Signed-random-projection LSH bucket id as a pure Column expression.

    Engine-portable by construction: vectors are quantized to integers
    (``floor(x*scale + 0.5)``), hyperplane signs come from an arithmetic
    hash of (bit, dim) — so the bucket id is exact integer math and any
    engine (the DuckDB oracle included) computes the identical bucket.
    One bit per hyperplane: sign of the signed-sum of quantized dims;
    bucket = the n_bits-wide bit pattern. Narrow map, no shuffle.
    """
    v = as_double(F.col(vec_col) if isinstance(vec_col, str) else vec_col)
    qi = F.transform(v, lambda x: F.floor(x * scale + F.lit(0.5)))

    def signer(b: int):
        # sign of hyperplane b at dim j: portable arithmetic hash of (b, j)
        return lambda x, j: F.when(
            ((F.lit(b) * 8191 + j) * F.lit(2654435761)) % 97 < 48, x
        ).otherwise(-x)

    bucket = F.lit(0).cast("long")
    for b in range(n_bits):
        signed = F.zip_with(qi, F.sequence(F.lit(1), F.size(qi)), signer(b))
        s = F.aggregate(signed, F.lit(0).cast("long"), lambda acc, x: acc + x)
        bucket = bucket + F.when(s >= 0, F.lit(1 << b)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 6,
    round_scale: int = 6,
    broadcast_queries: bool | None = None,
    broadcast_bytes_hint: int = 32 * 1024 * 1024,
) -> DataFrame:
    """LSH-bucketed approximate top-k: exact cosine rerank only within
    the query's bucket (single-probe).

    The corpus-side bucket is a narrow map fused into the scan; the
    join keys on (bucket) so each query compares against ~corpus/2^n_bits
    candidates. At 100 TB the corpus is written bucketed/partitioned by
    this id and the per-bucket join never sees the other buckets.

    ``broadcast_queries`` controls the join strategy: True forces a
    broadcast of the query side (right for interactive lookups — the
    corpus never shuffles), False keys both sides on bucket with a
    shuffled hash join (right when queries ≈ corpus, e.g. full
    all-pairs kNN). Default None decides from the optimizer's
    sizeInBytes plan estimate against ``broadcast_bytes_hint`` —
    no Spark job is triggered, and broadcast is chosen only when the
    estimate is confidently small (AQE can still upgrade a shuffled
    plan to broadcast at runtime from exact sizes).
    """
    q = queries.select(
        F.col(query_id).alias("query_id"),
        as_double(F.col(vec_col)).alias("qv"),
        lsh_bucket(vec_col, n_bits).alias("bucket"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cv"),
        lsh_bucket(vec_col, n_bits).alias("bucket"),
    )
    if broadcast_queries is None:
        # optimizer size estimate: no job, just plan statistics — the
        # shared _est_bytes helper (its unavailable-sentinel is huge,
        # so estimate-unavailable still resolves to no-broadcast, the
        # same decision the old inline copy made via sz=None)
        broadcast_queries = _est_bytes(queries) <= broadcast_bytes_hint
    pairs = (F.broadcast(q) if broadcast_queries else q).join(c, "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    sim = F.round(cosine(F.col("qv"), F.col("cv")), round_scale)
    scored = pairs.select("query_id", "neighbor_id", sim.alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    round_scale: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocks.

    Blocked self-join (never unblocked O(n²)); returns
    (id_a, id_b, cos_sim) with rounded cos_sim >= threshold.
    """
    cols = [F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")]
    if block_col:
        cols.append(F.col(block_col).alias("block"))
    base = df.select(*cols)
    a, b = base.alias("a"), base.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if block_col:
        cond = cond & (F.col("a.block") == F.col("b.block"))
    sim = F.round(cosine(F.col("a.v"), F.col("b.v")), round_scale)
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            sim.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def kmeans_assignments(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scale: int = 6,
) -> DataFrame:
    """Lloyd's k-means over an embedding column — the IVF coarse-quantizer
    trainer for ivf_topk, expressed as iterated DataFrame jobs.

    Deterministic by construction so a SQL oracle can replay it:
    - init: the k vectors with the smallest ids, cluster = id rank;
    - assign: argmin over squared L2 via the norm identity
      ``|a|² + |c|² − 2·a·c`` (dot products are sequential folds —
      functions/vectors.py — so both engines compute identical doubles);
      ties break to the smallest cluster id;
    - update: per-dimension mean ROUNDED to ``round_scale`` at each
      iteration boundary, so the centroids fed to the next iteration
      are identical decimals in any engine; empty clusters keep their
      previous centroid.

    Scale shape: each iteration is one narrow assignment pass (centroids
    are literals — broadcast by construction, k·dims doubles) plus one
    posexplode/groupBy((cluster,pos)) shuffle bounded by k·dims output
    rows. The only driver traffic is the k×dims centroid matrix per
    iteration — Lloyd's on any engine has that synchronization point.

    Returns (vec_id, cluster, dist2) — final assignments with rounded
    squared distance.
    """
    z = (
        df.select(
            F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("ve")
        )
        .withColumn("na", dot(F.col("ve"), F.col("ve")))
    )
    z.cache()
    cents = train_centroids(z, k, iters, round_scale)
    out = _assign(z, cents).select(
        "vec_id",
        "cluster",
        F.round(F.col("dist2"), round_scale).alias("dist2"),
    )
    z.unpersist()
    return out


# Below this input size, semantic_dedup skips the base-relation
# localCheckpoint: eager materialization costs fixed overhead that
# triple recompute undercuts on tiny corpora. Both arms re-measured in
# round 14 (SCALING.md "checkpoint gate", round-14 row), interleaved
# same-session A/Bs with construction inside the timed region: 2k
# vectors / 0.8 MB est — checkpoint WINS (best 3.63 s stable vs
# 4.22 s with 2x noise spikes; the r5 grid's opposite sf0.1 cell did
# not reproduce), 500 vectors / 0.19 MB — within noise either way
# (2.47 vs 2.75 best, overlapping vectors). 512 KiB keeps every
# re-measured cell on its winning arm: sf0.1 and everything larger
# checkpoints, only corpora too small for the arms to differ skip it.
_CHECKPOINT_MIN_INPUT_BYTES = 512 * 1024


def _est_bytes(df: DataFrame) -> int:
    """Catalyst's optimized-plan size estimate in bytes — plan-time
    metadata (parquet footer sizes fold through), never a job. Returns
    a huge sentinel when unavailable so callers fail toward the
    at-scale posture."""
    try:
        return int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:
        return 1 << 62


# Above this k, Lloyd assignment switches from the literal-centroid
# Column expression to the Arrow-batched matmul kernel: the literal
# plan carries k·dims literal nodes (fine at quantizer sizes, hostile
# to analysis/codegen at corpus-clustering sizes), while one
# (batch×dims)@(dims×k) BLAS call per Arrow batch does the same n·k
# flops with zero plan growth — the embedding-covariance lesson
# (SCALING.md) applied to assignment.
_KERNEL_MIN_K = 64


def _assign_kernel(z: DataFrame, cents_: list[list[float]]) -> DataFrame:
    """Kernel Lloyd assignment: argmin_c |v|² + |c|² − 2·v·c per Arrow
    batch via one matmul. Same identity, same smallest-index
    tie-break as ``centroid_dists`` (np.argmin returns the first
    minimum); float64 throughout, distances unrounded — parity with
    the literal path asserted in tests/test_kmeans_kernel.py.

    Summation-order caveat: |c|² here is numpy pairwise summation and
    v·c is one BLAS matmul, while the literal path (and the SQL
    oracles) fold sequentially — doubles agree to within a few ulps
    but are not bit-identical, so argmin could in principle flip on a
    near-exact distance tie. Fixture vectors are continuous random
    floats (nearest distinct centroid distances differ by ≫1e-9), and
    the kernel is oracle-checked end-to-end on them by the
    `semdedup_autok_kernel` differential query at every SF."""
    import numpy as np
    import pandas as pd

    C = np.asarray(cents_, dtype=np.float64)
    nc = (C * C).sum(axis=1)
    Ct = C.T.copy()

    def part(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf["ve"].tolist(), dtype=np.float64)
            d2 = pdf["na"].to_numpy()[:, None] + nc[None, :] - 2.0 * (X @ Ct)
            cl = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "ve": pdf["ve"],
                    "cluster": cl.astype("int64"),
                    "dist2": d2[np.arange(len(cl)), cl],
                }
            )

    id_type = z.schema["vec_id"].dataType.simpleString()
    return z.mapInPandas(
        part, f"vec_id {id_type}, ve array<double>, cluster long, dist2 double"
    )


def _assign(z: DataFrame, cents_: list[list[float]]) -> DataFrame:
    """Assignment step dispatch: (vec_id, ve, cluster, dist2) with
    dist2 unrounded. Literal-expression path below _KERNEL_MIN_K
    (constant-folds into whole-stage codegen, exactly replayable by
    the SQL oracles), matmul kernel above it."""
    if len(cents_) >= _KERNEL_MIN_K:
        return _assign_kernel(z, cents_)
    d = centroid_dists(cents_, F.col("ve"), F.col("na"))
    return (
        z.withColumn("dists", d)
        .withColumn(
            "cluster",
            (F.array_position(F.col("dists"), F.array_min("dists")) - 1).cast(
                "long"
            ),
        )
        .select(
            "vec_id",
            "ve",
            "cluster",
            F.element_at(
                F.col("dists"), (F.col("cluster") + 1).cast("int")
            ).alias("dist2"),
        )
    )


def centroid_dists(cents_: list[list[float]], ve: Column, na: Column) -> Column:
    """Squared-L2 distances of ``ve`` to every centroid, as ONE transform
    over a literal centroid matrix — not k separate fold expressions:
    the dot-product lambda appears once in the plan regardless of k, so
    the expression tree (and codegen) is O(k·dims) literals + O(dims)
    logic instead of O(k·dims) logic — the difference between k=4 and
    a realistic k=256 quantizer compiling. ``na`` is the caller's
    precomputed |ve|² (pass ``dot(ve, ve)`` to inline it)."""
    C = F.array(*[F.array(*[F.lit(float(v)) for v in cv]) for cv in cents_])
    norms = []
    for cv in cents_:
        nc = 0.0
        for v in cv:
            nc += v * v
        norms.append(F.lit(nc))
    nc_arr = F.array(*norms)
    return F.transform(
        C,
        lambda c, i: (na + F.element_at(nc_arr, i + 1)) - (F.lit(2.0) * dot(ve, c)),
    )


def train_centroids(
    z: DataFrame, k: int, iters: int, round_scale: int = 6
) -> list[list[float]]:
    """Deterministic Lloyd trainer over ``z`` = (vec_id, ve, na).

    ``iters`` counts assignment rounds: updates run between them, so
    iters=2 is assign(c0) → update → (caller assigns with c1). Returns
    the final centroid matrix as Python floats (k×dims — the bounded
    driver traffic any Lloyd implementation has per iteration).
    """
    init = z.orderBy("vec_id").limit(k).collect()
    cents = [list(r["ve"]) for r in init]
    if len(cents) < k:
        raise ValueError(
            f"train_centroids: k={k} exceeds the {len(cents)} input "
            "rows — the update loop would index past the centroid list"
        )
    for _ in range(iters - 1):
        assigned = _assign(z, cents)
        # collect at (cluster, pos) granularity — k·dims rows, the
        # same bounded driver traffic — and assemble the per-cluster
        # vectors driver-side: the old second groupBy(cluster) +
        # array_sort(collect_list) pass was one extra exchange per
        # iteration spent re-shaping rows the driver reads anyway
        # (round 13). Values unchanged: same round(avg) per group.
        # The driver transfer is toPandas (Arrow, guide §6), not
        # collect(): at corpus-clustering k the k·dims rows arrive as
        # three flat Arrow arrays instead of k·dims pickled Row
        # objects (round 14 — interleaved A/B at k=400×64: Arrow
        # never worse at either scale, best reading in both variant
        # orderings; doubles cross Arrow bit-exactly, so the
        # assembled centroids are identical — parity asserted in the
        # same A/B and by the trainer oracles).
        pdf = (
            assigned.select(
                "cluster", F.posexplode("ve").alias("pos", "x")
            )
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("x"), round_scale).alias("m"))
            .toPandas()
        )
        new_map: dict[int, dict[int, float]] = {}
        for cl, pos, mval in zip(pdf["cluster"], pdf["pos"], pdf["m"]):
            new_map.setdefault(int(cl), {})[int(pos)] = float(mval)
        cents = [
            (
                [cell[p] for p in range(len(cents[c]))]
                if (cell := new_map.get(c)) is not None
                else cents[c]
            )
            for c in range(k)
        ]
    return cents


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    topk: int = 5,
    m: int = 2,
    k_codes: int = 4,
    iters: int = 2,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    round_scale: int = 6,
) -> DataFrame:
    """Product-quantization top-k by asymmetric distance (ADC).

    The 100 TB embedding-search compression path: vectors are cut into
    ``m`` subspaces, each subspace gets its own ``k_codes``-entry
    codebook (the same deterministic Lloyd trainer as the IVF coarse
    quantizer, run per subspace), and every corpus vector is stored as
    m small integer codes — log2(k)·m bits instead of 4·dims bytes.
    Queries never decompress the corpus: per query, one distance TABLE
    per subspace (query-subvector to each code, k·m entries), and each
    candidate scores as a sum of m table lookups (ADC, Jégou et al.
    2011, "Product Quantization for Nearest Neighbor Search").

    Plan shape: training is per-subspace Lloyd (bounded driver traffic
    k×dims); encoding is a narrow map over literal codebooks; scoring
    joins the tiny query side (with its tables) against the coded
    corpus — per-pair cost is m array lookups, no dims-length math. In
    production PQ nests inside IVF cells; this operator is the flat
    scan so the oracle can replay every step.

    Returns (query_id, rank, neighbor_id, adc_dist2) — approximate
    squared L2, rank by (rounded adc, neighbor_id), self excluded.
    """
    z = corpus.select(
        F.col(corpus_id).alias("vec_id"), as_double(F.col(vec_col)).alias("ve")
    )
    books, sub, coded = _pq_encode(z, m, k_codes, iters, round_scale)

    q = queries.select(
        F.col(query_id).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    qtabs = _pq_query_tables(q, books, sub, m)
    scored = (
        F.broadcast(qtabs)
        .join(coded, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", _pq_adc(m, round_scale).alias("adc_dist2")
        )
    )
    return _topk_by_adc(scored, topk)


def _pq_update_books(
    z: DataFrame,
    books: list[list[list[float]]],
    m: int,
    sub: int,
    round_scale: int,
) -> list[list[list[float]]]:
    """One Lloyd update round for ALL m subspace codebooks,
    CONCURRENTLY: each subspace keeps the proven per-subspace job
    shape (literal-centroid argmin computed once per row BELOW the
    posexplode — the cluster column crosses the Generate as a plain
    attribute, so the optimizer cannot inline the argmin into the
    per-element projection), and the m jobs are submitted from a
    thread pool so their stages overlap (guide §2.6) instead of
    running back-to-back. NOTE (r13 advisory): this update round
    always uses the literal-expression argmin, NOT the ``_assign``
    dispatch — so the "same expression" equivalence to the old
    train_centroids-based loop holds for k_codes < _KERNEL_MIN_K
    (every registered PQ configuration; defaults are k_codes=4). At
    k_codes >= _KERNEL_MIN_K the old loop would have routed through
    the matmul kernel, whose summation order differs by ulps — the
    encode step already used the literal path at every k, so training
    here is at least self-consistent with encoding.
    Two single-job formulations were measured
    and rejected (round 13): posexplode with an ABOVE-generate
    element_at over the cluster array re-evaluates the argmin per
    element (3x slower at sf0.1), and a GROUPING SETS pass with
    dims-many avg(element_at) measures halves the job count but
    2x-es per-row aggregate cost at x100 (10.9-12.8 s vs 5.2-5.7 s
    measured on 200k x 64-dim vectors). Empty clusters keep their
    previous centroid (driver-side merge, as in
    ``train_centroids``)."""
    from concurrent.futures import ThreadPoolExecutor

    def upd(j: int) -> list:
        sv = F.slice(F.col("ve"), j * sub + 1, sub)
        d = centroid_dists(books[j], sv, dot(sv, sv))
        assigned = z.select(
            (F.array_position(d, F.array_min(d)) - 1)
            .cast("long")
            .alias("cluster"),
            sv.alias("sve"),
        )
        return (
            assigned.select("cluster", F.posexplode("sve").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("x"), round_scale).alias("m"))
            .collect()
        )

    with ThreadPoolExecutor(max_workers=min(m, 4)) as pool:
        per_sub = list(pool.map(upd, range(m)))
    out: list[list[list[float]]] = []
    for j, rows in enumerate(per_sub):
        upd_map: dict[int, dict[int, float]] = {}
        for r in rows:
            upd_map.setdefault(int(r["cluster"]), {})[int(r["pos"])] = r["m"]
        out.append(
            [
                (
                    [cell[p] for p in range(sub)]
                    if (cell := upd_map.get(c)) is not None
                    else books[j][c]
                )
                for c in range(len(books[j]))
            ]
        )
    return out


def _pq_encode(
    z: DataFrame,
    m: int,
    k_codes: int,
    iters: int,
    round_scale: int,
    extra_cols: tuple[str, ...] = (),
    materialize: bool = True,
) -> tuple[list[list[list[float]]], int, DataFrame]:
    """Shared PQ train+encode stage (pq_topk / ivf_pq_topk).

    ``z`` is (vec_id, [extra...], ve). Trains one ``k_codes``-entry
    codebook per subspace with the deterministic Lloyd recurrence, then
    encodes every vector as its per-subspace argmin codes. Returns
    (books, sub_dims, coded) where ``coded`` is the tiny
    (neighbor_id, *extra, c0..c{m-1}) relation, MATERIALIZED via eager
    localCheckpoint — downstream scoring plans read the few-bytes-per-
    vector codes instead of re-scanning and re-encoding the corpus
    (the same reason production PQ persists codes next to the ids).

    Training is batched ACROSS subspaces (round 13, guide §1.2/§2.6):
    the k_codes smallest-id FULL vectors hold every subspace's Lloyd
    init in ONE collect (slicing the collected doubles driver-side
    yields the identical values the old per-subspace ``orderBy().
    limit(k)`` collects read — this also covers the old dims probe),
    and each Lloyd update round submits the m per-subspace update
    jobs CONCURRENTLY (``_pq_update_books``) so their stages overlap
    instead of running back-to-back — the old loop paid 1 probe +
    2·m serial jobs. Per-subspace centroid values are unchanged: the
    assignment expression is the same literal-centroid
    ``centroid_dists`` tree over the same ``F.slice``, and the update
    is the same ``round(avg(x), round_scale)`` over the same groups
    (summation order inside a group was never pinned — both engines
    already rely on the round absorbing it).
    """
    z.cache()
    init = z.orderBy("vec_id").limit(k_codes).collect()
    if not init:
        raise ValueError("pq encode: empty corpus")
    dims = len(init[0]["ve"])
    assert dims % m == 0, f"dims {dims} not divisible by m={m}"
    sub = dims // m
    if len(init) < k_codes:
        raise ValueError(
            f"train_centroids: k={k_codes} exceeds the {len(init)} input "
            "rows — the update loop would index past the centroid list"
        )
    books: list[list[list[float]]] = [
        [list(r["ve"])[j * sub : (j + 1) * sub] for r in init]
        for j in range(m)
    ]
    for _ in range(iters - 1):
        books = _pq_update_books(z, books, m, sub, round_scale)

    def code_expr(j: int) -> Column:
        sv = F.slice(F.col("ve"), j * sub + 1, sub)
        d = centroid_dists(books[j], sv, dot(sv, sv))
        return (F.array_position(d, F.array_min(d)) - 1).cast("int")

    coded = z.select(
        F.col("vec_id").alias("neighbor_id"),
        *[F.col(c) for c in extra_cols],
        *[code_expr(j).alias(f"c{j}") for j in range(m)],
    )
    if materialize:
        # scoring consumers read the coded relation several times —
        # checkpoint so the few-bytes-per-vector codes, not the
        # corpus re-encode, feed every downstream plan
        coded = coded.localCheckpoint(eager=True)
        z.unpersist()
    else:
        # caller persists coded itself exactly once (pq_index_write):
        # the eager checkpoint would be a full extra encode pass whose
        # output is read once and dropped. z stays cached for that one
        # write; the caller unpersists via the returned frame's session
        pass
    return books, sub, coded


def _pq_query_tables(
    qdf: DataFrame,
    books: list[list[list[float]]],
    sub: int,
    m: int,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-query ADC distance tables: t{j}[c] = d²(query subvector j,
    code c) — k·m doubles per query, computed once, looked up per
    candidate. ``qdf`` is (query_id, [extra...], qv)."""
    def tab(j: int) -> Column:
        sv = F.slice(F.col("qv"), j * sub + 1, sub)
        return centroid_dists(books[j], sv, dot(sv, sv))

    return qdf.select(
        "query_id",
        *[F.col(c) for c in extra_cols],
        *[tab(j).alias(f"t{j}") for j in range(m)],
    )


def _pq_adc(m: int, round_scale: int) -> Column:
    """Asymmetric distance: sum of the m per-subspace table lookups."""
    return F.round(
        sum(F.element_at(F.col(f"t{j}"), F.col(f"c{j}") + 1) for j in range(m)),
        round_scale,
    )


def _topk_by_adc(scored: DataFrame, topk: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy("adc_dist2", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "rank", "neighbor_id", "adc_dist2")
    )


def semantic_dedup(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_scale: int = 6,
    auto_k_target: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with k-means, then
    drop, within each cluster, every vector that has a near-duplicate
    (cosine >= threshold) with a smaller id.

    The keep rule is the deterministic ``exists lower-id neighbor``
    variant rather than the paper's sequential greedy sweep: a vector
    is dropped iff ANY lower-id vector in its cluster is within the
    epsilon-ball, whether or not that vector was itself dropped. This
    over-drops relative to greedy on transitive chains (a~b, b~c,
    a!~c drops both b and c; greedy keeps c) but is order-independent
    and a pure join — no iteration, so a SQL oracle can replay it and
    the 100 TB plan is one blocked self-join instead of a sequential
    scan. Chains are rare at high thresholds, where SemDeDup operates.

    Scale shape: clustering cost is kmeans_assignments (narrow passes,
    centroid literals); the pair join is blocked by cluster id, so per
    -block pair blowup is bounded by the largest cluster — at corpus
    scale pick k ~ n/target_cluster_size (the paper uses tens of
    thousands of clusters for LAION-scale data) and the join never
    goes O(n^2). Because k can be far below the core count (it is 4
    here, pinned by the differential oracle), the join key is salted
    result-identically: the left side replicates over n_salts probe
    buckets and the right side joins on its own vec_id-derived bucket,
    turning k-way parallelism into k*n_salts-way without changing
    which pairs meet. Returns (vec_id, cluster, dropped,
    max_sim_lower) where max_sim_lower is the best in-cluster cosine
    to a lower id (NULL when none reaches the threshold).

    ``auto_k_target`` is the scale knob the paper implies: pass a
    target cluster SIZE and k becomes ``max(k, n // auto_k_target)``
    (one count() of driver traffic), so the expected within-cluster
    pair count stays ~n·target/2 — linear in the corpus — instead of
    growing n²/k with a fixed k. Large auto-k values route assignment
    through the matmul kernel (_KERNEL_MIN_K); measured flat in
    SCALING.md ("SemDeDup with corpus-proportional k").
    """
    if auto_k_target is not None:
        k = max(k, df.count() // auto_k_target)
    assign = kmeans_assignments(df, k, iters, id_col, vec_col, round_scale)
    # normalize ONCE per vector, not once per pair: the pair stage then
    # costs a single sequential dot-product fold instead of dot + two
    # norms — the oracle mirrors the exact same unit-vector arithmetic
    # (element division, then sequential fold) so parity stays exact.
    # The norm is projected to a BOUND column first: embedding norm(v)
    # inside the transform lambda re-evaluates the O(dims) fold once
    # per ELEMENT — O(dims²) per row (round-8 review; the
    # shingle_array_from_tokens codegen-re-evaluation hazard). Same
    # value, same per-element expression, so oracle parity is
    # untouched.
    v = as_double(F.col(vec_col))
    base = (
        df.select(
            F.col(id_col).alias("vec_id"),
            v.alias("__v"),
            norm(v).alias("__nv"),
        )
        .select(
            "vec_id",
            F.transform(
                F.col("__v"), lambda x: x / F.col("__nv")
            ).alias("u"),
        )
        .join(assign.select("vec_id", "cluster"), "vec_id")
    )
    # three consumers (both pair-join sides + the final left join)
    # would each replay the normalize + k-means-assignment join, so
    # materialize the |corpus|-row (id, unit vec, cluster) relation
    # once (README "truncate lineage when reused") — but only above a
    # volume where triple recompute costs more than the eager
    # materialization (see _CHECKPOINT_MIN_INPUT_BYTES for the
    # round-14 re-measured grid; a repartition("cluster") shuffle-
    # reuse third arm was also measured and rejected — it collapses
    # the pair join onto k partitions, defeating the salting:
    # 6.8-8.9 s vs 0.9 s at sf0.1). Gate on Catalyst's size estimate
    # of the INPUT relation (no job, unlike a count; a 100 TB scan
    # must never pay a count() here); estimate unavailable →
    # checkpoint (safe at scale).
    if _est_bytes(df) >= _CHECKPOINT_MIN_INPUT_BYTES:
        base = base.localCheckpoint(eager=True)
    n_salts = max(df.sparkSession.sparkContext.defaultParallelism, 8)
    a = base.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("probe")
    ).alias("a")
    # hash-based bucket, not pmod(id): a STRING id would pmod to NULL
    # (silently emptying the pair join); xxhash64 takes any type, and
    # the probe side covers every bucket so the pair set is identical
    b = base.withColumn(
        "bucket", F.pmod(F.xxhash64("vec_id"), F.lit(n_salts))
    ).alias("b")
    sim = F.round(dot(F.col("a.u"), F.col("b.u")), round_scale)
    dup = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.probe") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("b.vec_id").alias("dup_id"), sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .groupBy("dup_id")
        .agg(F.max("cos_sim").alias("max_sim_lower"))
    )
    return (
        base.join(dup, base["vec_id"] == dup["dup_id"], "left")
        .select(
            "vec_id",
            "cluster",
            F.col("max_sim_lower").isNotNull().alias("dropped"),
            "max_sim_lower",
        )
    )


def gram_partial_batches(col: str, base_index: int = 0, mean=None):
    """Shared Arrow-batch kernel for distributed Gram/covariance
    matrices: returns a mapInPandas generator that emits ONE
    upper-triangle X^T X partial per batch (dim_i, dim_j, s, n) —
    dims are derived from each batch, never hardcoded. ``mean`` (a
    numpy vector) centres rows first; pass None when the input column
    is already centred. ``base_index`` picks 0- or 1-based dim labels
    (the SQL-oracle-facing query uses 1-based to match
    generate_subscripts). Both embedding_covariance (queries_pkg.
    curation) and covariance_partials below use this one kernel so
    batch handling can never drift between them."""
    import numpy as np
    import pandas as pd

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(a, dtype=np.float64) for a in pdf[col]]
            )
            if mean is not None:
                x = x - mean
            iu = np.triu_indices(x.shape[1])
            g = x.T @ x
            yield pd.DataFrame(
                {
                    "dim_i": iu[0] + base_index,
                    "dim_j": iu[1] + base_index,
                    "s": g[iu],
                    "n": len(pdf),
                }
            )

    return partials


def covariance_partials(vectors: DataFrame, vec_col: str = "ve"):
    """Distributed mean + covariance for an embedding column, in the
    batch-matmul shape (see queries_pkg.curation.embedding_covariance):
    returns (mean ndarray, cov ndarray dims x dims, n). Driver state is
    dims + dims^2 floats — bounded like a k-means centroid update."""
    import numpy as np

    rows = (
        vectors.select(F.posexplode(vec_col).alias("pos", "val"))
        .groupBy("pos")
        .agg(F.avg(F.col("val").cast("double")).alias("m"))
        .orderBy("pos")
        .collect()
    )
    mean = np.asarray([r["m"] for r in rows], dtype=np.float64)
    dims = len(mean)

    cells = (
        vectors.select(F.col(vec_col).alias("__v"))
        .mapInPandas(
            gram_partial_batches("__v", base_index=0, mean=mean),
            "dim_i int, dim_j int, s double, n long",
        )
        .groupBy("dim_i", "dim_j")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        .collect()
    )
    n = max(int(cells[0]["n"]), 1) if cells else 1
    cov = np.zeros((dims, dims))
    for r in cells:
        cov[r["dim_i"], r["dim_j"]] = r["s"] / n
        cov[r["dim_j"], r["dim_i"]] = r["s"] / n
    return mean, cov, n


def pca_project(
    df: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[float]]:
    """Distributed PCA projection: covariance via batch-matmul
    partials, eigendecomposition on the driver (dims x dims — the
    bounded synchronization step every distributed PCA has), then one
    Arrow-batched pass projects every vector onto the top-k
    components. Returns (projected DF (id, proj array<double>),
    explained-variance ratios desc).

    Not registry-exposed: the eigen step has no SQL-oracle
    counterpart, so its contract lives in tests
    (orthonormal basis, monotone explained variance, reconstruction
    error shrinking with k, parity with a local numpy reference).
    """
    import numpy as np

    v = df.select(
        F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("ve")
    )
    # derive the id type from the input (round-8 review): hardcoding
    # 'vec_id long' crashed any non-bigint id at Arrow conversion even
    # though id_col is a parameter — _assign_kernel derives its schema
    # the same way
    id_type = dict(v.dtypes)["vec_id"]
    mean, cov, _n = covariance_partials(v, "ve")
    w_all, u = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(w_all)[::-1]
    evr = (w_all[order] / max(w_all.sum(), 1e-300)).tolist()
    comps = u[:, order[:k]]  # dims x k

    import pandas as pd

    def project(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(a, dtype=np.float64) for a in pdf["ve"]]
            ) - mean
            p = x @ comps
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "proj": [row.tolist() for row in p],
                }
            )

    out = v.mapInPandas(project, f"vec_id {id_type}, proj array<double>")
    return out, evr[:k]
