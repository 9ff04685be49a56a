"""Similarity-search queries over the embeddings table (north-star)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dso_import_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    ivf_topk,
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
    oracle=None,  # IVF routing is engine-specific; recall tested in tests/
    doc="IVF-bucketed approximate top-5: broadcast per-label centroids, "
    "route query to nearest cell, exact rerank within cell only.",
)
def ann_ivf_topk(spark, sf_dir):
    (emb,) = tables(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 101 == 0)
    return ivf_topk(queries, emb, k=5)


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
                 sqrt(list_dot_product(b.ve, b.ve))), 6) >= 0.9
    """,
    doc="Embedding-cosine near-duplicate pairs, label-blocked self-join "
    "(embedding_near_dup_pairs operator).",
)
def embedding_near_dup(spark, sf_dir):
    (emb,) = tables(spark, sf_dir, "embeddings")
    sample = emb.filter(F.col("vec_id") % 4 == 0)
    return embedding_near_dup_pairs(sample, threshold=0.9)
