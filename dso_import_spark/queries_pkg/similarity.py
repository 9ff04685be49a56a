"""Similarity-search queries over the embeddings table (north-star)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dso_import_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    kmeans_assignments,
    lsh_topk,
)
from dso_import_spark.queries import query
from dso_import_spark.queries_pkg.util import tables


@query(
    "ann_brute_force_topk",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id % 101 = 0),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
    scored AS (
      SELECT q.query_id, c.neighbor_id,
             round(list_dot_product(q.qv, c.cv) /
                   (sqrt(list_dot_product(q.qv, q.qv)) *
                    sqrt(list_dot_product(c.cv, c.cv))), 6) AS cos_sim
      FROM q CROSS JOIN c WHERE q.query_id <> c.neighbor_id)
    SELECT query_id, rank, neighbor_id, cos_sim
    FROM (SELECT query_id, neighbor_id, cos_sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos_sim DESC, neighbor_id) AS rank
          FROM scored)
    WHERE rank <= 5
    """,
    doc="Exact cosine top-5 neighbors for sampled query vectors "
    "(brute_force_topk operator; F.zip_with/aggregate, no UDF).",
)
def ann_brute_force_topk(spark, sf_dir):
    (emb,) = tables(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 101 == 0)
    return brute_force_topk(queries, emb, k=5)


@query(
    "ann_ivf_topk",
    oracle="""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS ve FROM embeddings),
    e AS (SELECT label, u.pos, avg(ve[u.pos]) AS m
          FROM v, UNNEST(generate_series(1, len(v.ve))) AS u(pos)
          GROUP BY label, u.pos),
    cent AS (SELECT label, list(m ORDER BY pos) AS centroid FROM e GROUP BY label),
    q AS (SELECT vec_id AS query_id, ve AS qv FROM v WHERE vec_id % 101 = 0),
    routed AS (
      SELECT query_id, qv, label FROM (
        SELECT q.query_id, q.qv, cent.label,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY list_dot_product(q.qv, cent.centroid) /
                          (sqrt(list_dot_product(q.qv, q.qv)) *
                           sqrt(list_dot_product(cent.centroid, cent.centroid)))
                          DESC, cent.label) AS rn
        FROM q CROSS JOIN cent)
      WHERE rn = 1),
    scored AS (
      SELECT r.query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(r.qv, c.ve) /
                   (sqrt(list_dot_product(r.qv, r.qv)) *
                    sqrt(list_dot_product(c.ve, c.ve))), 6) AS cos_sim
      FROM routed r JOIN v c ON r.label = c.label AND r.query_id <> c.vec_id)
    SELECT query_id, rank, neighbor_id, cos_sim
    FROM (SELECT query_id, neighbor_id, cos_sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos_sim DESC, neighbor_id) AS rank
          FROM scored) WHERE rank <= 5
    """,
    doc="IVF-bucketed approximate top-5: broadcast per-label centroids, "
    "route query to nearest cell, exact rerank within cell only. The "
    "oracle recomputes the same centroids/routing in SQL; routing uses "
    "unrounded centroid cosine (fixture clusters are well-separated, "
    "so cross-engine double-summation order cannot flip the argmax).",
)
def ann_ivf_topk(spark, sf_dir):
    (emb,) = tables(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 101 == 0)
    return ivf_topk(queries, emb, k=5)


@query(
    "ann_lsh_topk",
    oracle="""
    WITH z AS (
      SELECT vec_id, embedding::DOUBLE[] AS ve,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS qi
      FROM embeddings),
    bits AS (
      SELECT z.vec_id, b.b,
             CASE WHEN sum(CASE WHEN ((b.b * 8191 + u.pos) * 2654435761) % 97
                                     < 48
                                THEN z.qi[u.pos] ELSE -z.qi[u.pos] END) >= 0
                  THEN 1 ELSE 0 END AS bit
      FROM z
      CROSS JOIN (SELECT unnest(range(0, 6)) AS b) b,
      UNNEST(generate_series(1, len(z.qi))) AS u(pos)
      GROUP BY z.vec_id, b.b),
    buckets AS (
      SELECT vec_id, CAST(sum(bit * (1 << b)) AS BIGINT) AS bucket
      FROM bits GROUP BY vec_id),
    v AS (SELECT z.vec_id, z.ve, bk.bucket FROM z JOIN buckets bk USING (vec_id)),
    q AS (SELECT * FROM v WHERE vec_id % 101 = 0),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_dot_product(q.ve, c.ve) /
                   (sqrt(list_dot_product(q.ve, q.ve)) *
                    sqrt(list_dot_product(c.ve, c.ve))), 6) AS cos_sim
      FROM q JOIN v c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id)
    SELECT query_id, rank, neighbor_id, cos_sim
    FROM (SELECT query_id, neighbor_id, cos_sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos_sim DESC, neighbor_id) AS rank
          FROM scored)
    WHERE rank <= 5
    """,
    doc="Signed-random-projection LSH top-5 on the broadcast-workload "
    "Arrow kernel (lsh_topk_arrow): integer-quantized hyperplane bits "
    "make the bucket id exact integer math, so Spark and the oracle "
    "bucket identically; the exact double-cosine rerank runs only "
    "inside the query's bucket (~1/64 of the corpus per query at 6 "
    "bits) as a corpus-partition numpy kernel whose sequential-fold "
    "dot is bit-identical to the oracle's list_dot_product (round 11 "
    "— replaced the interpreted HOF pair join that measured 316.9 s "
    "at x100; the HOF form lsh_topk remains the operator-level "
    "correctness pin, differentially tested in tests/test_retrieval.py).",
)
def ann_lsh_topk(spark, sf_dir):
    from dso_import_spark.operators.ann_kernel import lsh_topk_arrow

    (emb,) = tables(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 101 == 0)
    return lsh_topk_arrow(queries, emb, k=5, n_bits=6)


@query(
    "embedding_near_dup_lsh",
    oracle="""
    WITH z AS (
      SELECT vec_id, embedding::DOUBLE[] AS ve,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS qi
      FROM embeddings WHERE vec_id % 4 = 0),
    bits AS (
      SELECT z.vec_id, b.b,
             CASE WHEN sum(CASE WHEN ((b.b * 8191 + u.pos) * 2654435761) % 97
                                     < 48
                                THEN z.qi[u.pos] ELSE -z.qi[u.pos] END) >= 0
                  THEN 1 ELSE 0 END AS bit
      FROM z
      CROSS JOIN (SELECT unnest(range(0, 6)) AS b) b,
      UNNEST(generate_series(1, len(z.qi))) AS u(pos)
      GROUP BY z.vec_id, b.b),
    buckets AS (
      SELECT vec_id, CAST(sum(bit * (1 << b)) AS BIGINT) AS bucket
      FROM bits GROUP BY vec_id),
    v AS (SELECT z.vec_id, z.ve, bk.bucket FROM z JOIN buckets bk USING (vec_id))
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.ve, b.ve) /
                 (sqrt(list_dot_product(a.ve, a.ve)) *
                  sqrt(list_dot_product(b.ve, b.ve))), 6) AS cos_sim
    FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.ve, b.ve) /
                (sqrt(list_dot_product(a.ve, a.ve)) *
                 sqrt(list_dot_product(b.ve, b.ve))), 6) >= 0.3
    """,
    doc="Embedding near-dup pairs blocked by the portable LSH bucket "
    "instead of the label column — the scale path: bucket count grows "
    "with corpus size (2^n_bits tunable) where label blocks grow "
    "linearly, so per-block pair blowup stays bounded. Near-identical "
    "vectors land in the same signed-projection bucket with high "
    "probability; the oracle reproduces buckets exactly (integer "
    "math). Threshold 0.3 on this near-orthogonal synthetic fixture "
    "(production near-dup runs 0.9+ — the plan is threshold-"
    "independent): at 0.9 the fixture has no qualifying pair and a "
    "zero-row differential green is vacuous.",
)
def embedding_near_dup_lsh(spark, sf_dir):
    from dso_import_spark.operators.similarity import lsh_bucket

    (emb,) = tables(spark, sf_dir, "embeddings")
    sample = emb.filter(F.col("vec_id") % 4 == 0).withColumn(
        "bucket", lsh_bucket("embedding", n_bits=6)
    )
    return embedding_near_dup_pairs(
        sample, threshold=0.3, block_col="bucket"
    )


@query(
    "embedding_near_dup",
    oracle="""
    WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS ve FROM embeddings
               WHERE vec_id % 4 = 0)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.ve, b.ve) /
                 (sqrt(list_dot_product(a.ve, a.ve)) *
                  sqrt(list_dot_product(b.ve, b.ve))), 6) AS cos_sim
    FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.ve, b.ve) /
                (sqrt(list_dot_product(a.ve, a.ve)) *
                 sqrt(list_dot_product(b.ve, b.ve))), 6) >= 0.3
    """,
    doc="Embedding-cosine near-duplicate pairs, label-blocked self-join "
    "(embedding_near_dup_pairs operator). Threshold 0.3 on the "
    "near-orthogonal fixture so the pair set is non-empty (5 pairs "
    "at sf0.01); production uses 0.9+, same plan.",
)
def embedding_near_dup(spark, sf_dir):
    (emb,) = tables(spark, sf_dir, "embeddings")
    sample = emb.filter(F.col("vec_id") % 4 == 0)
    return embedding_near_dup_pairs(sample, threshold=0.3)


@query(
    "ivf_kmeans_train",
    oracle="""
    WITH z AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
    n AS (SELECT vec_id, ve, list_dot_product(ve, ve) AS na FROM z),
    c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, ve AS cv
           FROM (SELECT vec_id, ve FROM z ORDER BY vec_id LIMIT 4)),
    a1 AS (
      SELECT vec_id, c AS cluster FROM (
        SELECT n.vec_id, c0.c,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY (n.na + list_dot_product(c0.cv, c0.cv))
                          - (2 * list_dot_product(n.ve, c0.cv)), c0.c) AS rn
        FROM n CROSS JOIN c0) WHERE rn = 1),
    dims AS (
      SELECT a1.cluster,
             unnest(range(1, len(z.ve) + 1)) AS pos,
             unnest(z.ve) AS x
      FROM a1 JOIN z USING (vec_id)),
    c1new AS (
      SELECT cluster AS c, list(m ORDER BY pos) AS cv
      FROM (SELECT cluster, pos, round(avg(x), 6) AS m
            FROM dims GROUP BY cluster, pos)
      GROUP BY cluster),
    c1 AS (SELECT c0.c, coalesce(c1new.cv, c0.cv) AS cv
           FROM c0 LEFT JOIN c1new USING (c))
    SELECT vec_id, cluster, round(d2, 6) AS dist2 FROM (
      SELECT n.vec_id, c1.c AS cluster,
             (n.na + list_dot_product(c1.cv, c1.cv))
               - (2 * list_dot_product(n.ve, c1.cv)) AS d2,
             row_number() OVER (
               PARTITION BY n.vec_id
               ORDER BY (n.na + list_dot_product(c1.cv, c1.cv))
                        - (2 * list_dot_product(n.ve, c1.cv)), c1.c) AS rn
      FROM n CROSS JOIN c1) WHERE rn = 1
    """,
    doc="Lloyd's k-means (k=4, 2 assignment rounds) training the IVF "
    "coarse quantizer on the embeddings table (kmeans_assignments "
    "operator). The oracle unrolls both iterations as CTEs: identical "
    "init, argmin tie-breaks, boundary rounding, and empty-cluster "
    "carry-over — an end-to-end differential of an ITERATIVE algorithm.",
)
def ivf_kmeans_train(spark, sf_dir):
    (emb,) = tables(spark, sf_dir, "embeddings")
    return kmeans_assignments(emb, k=4, iters=2)



@query(
    "ann_recall_report",
    oracle="""
    WITH v0 AS (SELECT vec_id, label, embedding::DOUBLE[] AS ve
                FROM embeddings),
    q0 AS (SELECT vec_id AS query_id, ve AS qv
           FROM v0 WHERE vec_id % 101 = 0),
    ex_scored AS (
      SELECT q0.query_id, c.vec_id AS neighbor_id,
             list_dot_product(q0.qv, c.ve) /
               (sqrt(list_dot_product(q0.qv, q0.qv)) *
                sqrt(list_dot_product(c.ve, c.ve))) AS cos_sim
      FROM q0 CROSS JOIN v0 c WHERE q0.query_id <> c.vec_id),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY round(cos_sim, 6) DESC, neighbor_id) AS rank
        FROM ex_scored) WHERE rank <= 5),
    e AS (SELECT label, u.pos, avg(ve[u.pos]) AS m
          FROM v0, UNNEST(generate_series(1, len(v0.ve))) AS u(pos)
          GROUP BY label, u.pos),
    cent AS (SELECT label, list(m ORDER BY pos) AS centroid
             FROM e GROUP BY label),
    routed AS (
      SELECT query_id, qv, label FROM (
        SELECT q0.query_id, q0.qv, cent.label,
               row_number() OVER (PARTITION BY q0.query_id
                 ORDER BY list_dot_product(q0.qv, cent.centroid) /
                          (sqrt(list_dot_product(q0.qv, q0.qv)) *
                           sqrt(list_dot_product(cent.centroid,
                                                 cent.centroid)))
                          DESC, cent.label) AS rn
        FROM q0 CROSS JOIN cent)
      WHERE rn = 1),
    ivf_scored AS (
      SELECT r.query_id, c.vec_id AS neighbor_id,
             list_dot_product(r.qv, c.ve) /
               (sqrt(list_dot_product(r.qv, r.qv)) *
                sqrt(list_dot_product(c.ve, c.ve))) AS cos_sim
      FROM routed r JOIN v0 c
        ON r.label = c.label AND r.query_id <> c.vec_id),
    ivf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY round(cos_sim, 6) DESC, neighbor_id) AS rank
        FROM ivf_scored) WHERE rank <= 5),
    zq AS (SELECT vec_id, ve,
                  list_transform(ve,
                    x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS qi
           FROM v0),
    bits AS (
      SELECT zq.vec_id, b.b,
             CASE WHEN sum(CASE WHEN ((b.b * 8191 + u.pos) * 2654435761)
                                     % 97 < 48
                                THEN zq.qi[u.pos]
                                ELSE -zq.qi[u.pos] END) >= 0
                  THEN 1 ELSE 0 END AS bit
      FROM zq
      CROSS JOIN (SELECT unnest(range(0, 6)) AS b) b,
      UNNEST(generate_series(1, len(zq.qi))) AS u(pos)
      GROUP BY zq.vec_id, b.b),
    buckets AS (
      SELECT vec_id, CAST(sum(bit * (1 << b)) AS BIGINT) AS bucket
      FROM bits GROUP BY vec_id),
    vb AS (SELECT zq.vec_id, zq.ve, bk.bucket
           FROM zq JOIN buckets bk USING (vec_id)),
    qb AS (SELECT * FROM vb WHERE vec_id % 101 = 0),
    lsh_scored AS (
      SELECT qb.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(qb.ve, c.ve) /
               (sqrt(list_dot_product(qb.ve, qb.ve)) *
                sqrt(list_dot_product(c.ve, c.ve))) AS cos_sim
      FROM qb JOIN vb c
        ON qb.bucket = c.bucket AND qb.vec_id <> c.vec_id),
    lsh AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY round(cos_sim, 6) DESC, neighbor_id) AS rank
        FROM lsh_scored) WHERE rank <= 5),
    per_q AS (
      SELECT 'ivf' AS method, e.query_id,
             sum(CASE WHEN a.neighbor_id IS NULL THEN 0 ELSE 1 END)
               / 5.0 AS recall
      FROM exact e LEFT JOIN ivf a
        ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
      GROUP BY e.query_id
      UNION ALL
      SELECT 'lsh', e.query_id,
             sum(CASE WHEN a.neighbor_id IS NULL THEN 0 ELSE 1 END)
               / 5.0
      FROM exact e LEFT JOIN lsh a
        ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
      GROUP BY e.query_id)
    SELECT method,
           count(*)::BIGINT AS n_queries,
           round(avg(recall), 6) AS mean_recall,
           round(min(recall), 6) AS min_recall,
           sum(CASE WHEN recall = 1.0 THEN 1 ELSE 0 END)::BIGINT
             AS n_perfect
    FROM per_q GROUP BY method ORDER BY method
    """,
    doc="ANN recall certification: recall@5 of the IVF and LSH "
    "approximate paths against the exact brute-force neighbors, per "
    "method (query count, mean/min recall, perfect-recall count) — "
    "the measurement a production vector pipeline publishes before "
    "swapping an exact scan for an index, here as a first-class "
    "relational op composing three existing operators. The exact "
    "side runs only on the SAMPLED query set (vec_id % 101), which "
    "is how recall certification stays affordable at 100 TB: "
    "brute-force cost is |sample| x corpus, the approximate sides "
    "are bucketed, and the recall join is per-(query, neighbor) on "
    "k-row-per-query relations. Oracle replays all three searches "
    "in SQL from the same fixture. On THIS fixture the measured "
    "recall is low (IVF 0.2, LSH 0.08 at sf0.01) because the "
    "synthetic embeddings are near-uniform — top-5 cosine neighbors "
    "are essentially arbitrary directions no partition scheme "
    "predicts; that is the true answer, and precisely the situation "
    "this report exists to catch before an index replaces an exact "
    "scan (real text embeddings cluster, pushing IVF recall toward "
    "the 0.9+ regime).",
)
def ann_recall_report(spark, sf_dir):
    (emb,) = tables(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 101 == 0)
    exact = brute_force_topk(queries, emb, k=5).select(
        "query_id", "neighbor_id"
    )
    exact = exact.localCheckpoint(eager=False)  # one exact scan, 2 uses

    def per_q(approx, method):
        a = approx.select("query_id", "neighbor_id").withColumn(
            "hit", F.lit(1)
        )
        return (
            exact.join(a, ["query_id", "neighbor_id"], "left")
            .groupBy("query_id")
            .agg((F.sum(F.coalesce("hit", F.lit(0))) / 5.0).alias("recall"))
            .select(F.lit(method).alias("method"), "query_id", "recall")
        )

    both = per_q(ivf_topk(queries, emb, k=5), "ivf").unionByName(
        per_q(lsh_topk(queries, emb, k=5, n_bits=6), "lsh")
    )
    return (
        both.groupBy("method")
        .agg(
            F.count("*").alias("n_queries"),
            F.round(F.avg("recall"), 6).alias("mean_recall"),
            F.round(F.min("recall"), 6).alias("min_recall"),
            F.sum(F.when(F.col("recall") == 1.0, 1).otherwise(0)).alias(
                "n_perfect"
            ),
        )
        .orderBy("method")
    )
