"""End-to-end retrieval compositions: document text -> embedding
lookup -> ANN candidates -> lexical / cross-encoder re-rank.

The registry exercised this pipeline only piecewise (tokenize/TF-IDF,
IVF ANN, RRF each alone — r9 verdict #5); these queries chain the
shipped primitives into the two shapes a retrieval corpus pipeline
actually runs:

- ``retrieval_hybrid_topk``: semantic candidates fused with exact
  lexical overlap (hybrid search, the BM25+vector pattern);
- ``rerank_hashed_crossencoder``: a hashed-interaction-feature linear
  scorer over the candidate PAIRS (the cheap stand-in for a
  cross-encoder re-rank stage — same dataflow, deterministic model).

Scale discipline (100 TB posture — x100-measured at birth, with one
at-birth re-shape):
- the embedding lookup is a key equi-join documents⋈embeddings
  (bucketable on doc_id/vec_id at scale);
- candidate generation is ``operators/ann_kernel.ivf_topk_arrow``:
  broadcast centroids route queries; the corpus is NEVER shuffled —
  each corpus partition streams through an Arrow int64-matmul kernel
  against the (broadcast, workload-sized) query matrix, emitting
  per-batch partial top-k. The first cut reused the HOF ``ivf_topk``
  and died at x100: the label equi-join has ~10 distinct keys, so
  ~100M interpreted-HOF cosine pairs funneled through ~10 tasks;
- rank keys are bit-exact cross-engine: quantized-integer dot
  products commute, so the raw float64 cosine is identical in
  numpy / the JVM / DuckDB, the lexical Jaccard is an int/int
  division, and the cross-encoder logit is an exact BIGINT sum.
  Rounding appears only in DISPLAY columns, never in rank keys;
- all lexical/interaction work happens on the CANDIDATE relation:
  query- and neighbor-side term sets are id-pruned BEFORE the
  explode+distinct, so token work is bounded by |Q| + |Q|*k docs,
  never the corpus.

Reference parity note: the reference engine (Amsterdam/dso-import)
has no retrieval surface — these are north-star extension operators
(SURVEY.md §2.10) composed from shipped primitives
(operators/ann_kernel.py, functions/text.py word_hash32).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dso_import_spark.functions.text import word_hash32
from dso_import_spark.operators.ann_kernel import ivf_topk_arrow
from dso_import_spark.queries import query
from dso_import_spark.queries_pkg.util import tables

_Q_MOD = 101  # query sample: doc_id % 101 == 0 (the ANN convention)
_ANN_K = 20  # candidate depth fed to the re-rank stages
_TOP_K = 5  # final depth after re-rank
_CE_BUCKETS = 512  # hashed interaction-feature space
_CE_SCALE = 1000  # quantized weight scale (quality_classifier scheme)
_VSCALE = 1000  # embedding quantization (the LSH-bucket convention)

# The IVF routing + candidate CTEs shared by ALL THREE oracles
# (DuckDB), parameterized over the query CTE / probe count / depth so
# the routing + quantization semantics live in exactly one place
# (review pass 2: the multiprobe oracle had copy-pasted them).
# Routing is identical to the ann_ivf_topk oracle (double-precision
# centroids, well-separated fixture cells); the rerank runs on
# QUANTIZED vectors. cos_raw stays unrounded: integer dots make it
# bit-identical to the Spark kernel's float64. Zero-quantized-norm
# vectors are dropped on both the query and candidate side, mirroring
# the kernel (0/0 has no direction); NULL/empty vectors and (for
# centroids and candidates) NULL labels are dropped explicitly, so
# the oracle's routing cells are exactly the kernel's (third review
# pass: DuckDB GROUP BY would otherwise keep a NULL-label centroid
# the kernel never builds).
def _cand_sql(
    query_cte: str,
    n_probe: int = 1,
    depth: int = _ANN_K,
    pair_key: bool = False,
) -> str:
    # pair_key=True threads documents.source through v (as pkey) and
    # the query CTE (as qkey) and keeps only cross-key pairs — the
    # attribute-masked ANN shape; SQL <> gives the NULL semantics the
    # kernel mirrors (NULL on either side drops the pair)
    vkey = ",\n                 d.source AS pkey" if pair_key else ""
    vjoin = (
        " JOIN documents d ON d.doc_id = em.vec_id" if pair_key else ""
    )
    qkey = ", qkey" if pair_key else ""
    qkey_inner = ", q.qkey" if pair_key else ""
    pair_pred = "\n         AND c.pkey <> r.qkey" if pair_key else ""
    return f"""
    v AS (SELECT em.vec_id, em.label, em.embedding::DOUBLE[] AS ve,
                 list_transform(em.embedding::DOUBLE[],
                                x -> floor(x * {_VSCALE} + 0.5)) AS qi{vkey}
          FROM embeddings em{vjoin}
          WHERE em.embedding IS NOT NULL AND len(em.embedding) > 0),
    e AS (SELECT label, u.pos, avg(ve[u.pos]) AS m
          FROM v, UNNEST(generate_series(1, len(v.ve))) AS u(pos)
          WHERE v.label IS NOT NULL
          GROUP BY label, u.pos),
    cent AS (SELECT label, list(m ORDER BY pos) AS centroid
             FROM e GROUP BY label),
    q AS ({query_cte}),
    routed AS (
      SELECT query_id, qqi, label{qkey} FROM (
        SELECT q.query_id, q.qqi, cent.label{qkey_inner},
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY list_dot_product(q.qv, cent.centroid) /
                          (sqrt(list_dot_product(q.qv, q.qv)) *
                           sqrt(list_dot_product(cent.centroid,
                                                 cent.centroid)))
                          DESC, cent.label) AS rn
        FROM q CROSS JOIN cent
        WHERE list_dot_product(q.qqi, q.qqi) > 0)
      WHERE rn <= {n_probe}),
    cand AS (
      SELECT query_id, neighbor_id, cos_raw,
             row_number() OVER (PARTITION BY query_id
                ORDER BY cos_raw DESC, neighbor_id) AS ann_rank
      FROM (
        SELECT r.query_id, c.vec_id AS neighbor_id,
               list_dot_product(r.qqi, c.qi) /
                 (sqrt(list_dot_product(r.qqi, r.qqi)) *
                  sqrt(list_dot_product(c.qi, c.qi))) AS cos_raw
        FROM routed r JOIN v c ON r.label = c.label
         AND r.query_id <> c.vec_id
         AND list_dot_product(c.qi, c.qi) > 0{pair_pred})
      QUALIFY ann_rank <= {depth}),
    dterm AS (
      SELECT DISTINCT doc_id, term FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        FROM documents)),
    ndist AS (SELECT doc_id, count(*)::BIGINT AS n_terms
              FROM dterm GROUP BY doc_id)
"""


# the embedding LOOKUP as the shared compositions' query CTE: queries
# come from documents joined to their vectors, not from embeddings
_DOC_QUERY_CTE = f"""SELECT d.doc_id AS query_id, v.ve AS qv, v.qi AS qqi
          FROM documents d JOIN v ON v.vec_id = d.doc_id
          WHERE d.doc_id % {_Q_MOD} = 0"""

_CAND_SQL = _cand_sql(_DOC_QUERY_CTE)


def _candidates(spark, sf_dir):
    """documents, (query_id, ann_rank, neighbor_id, cos_raw) at depth
    _ANN_K — the shared text->embedding-lookup->IVF-ANN front half."""
    docs, emb = tables(spark, sf_dir, "documents", "embeddings")
    qdocs = docs.filter(F.col("doc_id") % _Q_MOD == 0).select("doc_id")
    # the embedding LOOKUP: a key equi-join, not a filter on
    # embeddings — the retrieval entry point is a document
    qemb = qdocs.join(emb, qdocs["doc_id"] == emb["vec_id"]).select(
        "vec_id", "embedding", "label"
    )
    cand = ivf_topk_arrow(qemb, emb, k=_ANN_K, scale=_VSCALE)
    # |Q|*k rows feed 4-5 plan branches (qids, nids, shared, the
    # fused/scored join): localCheckpoint so the corpus scan + kernel
    # run ONCE, not once per branch (the logrank subtree lesson)
    return docs, cand.withColumnRenamed("rank", "ann_rank").localCheckpoint(
        eager=True
    )


def _pruned_terms(docs, ids, id_alias):
    """Distinct (id_alias, term) unigrams for ONLY the docs in `ids`
    — the id prune runs BEFORE the explode, so token work is bounded
    by the candidate set, never the corpus."""
    pruned = docs.join(F.broadcast(ids), "doc_id")
    return pruned.select(
        F.col("doc_id").alias(id_alias),
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("term"),
    ).distinct()


def _pair_terms(docs, cand):
    """(qterm, nterm): candidate-bounded distinct-term relations for
    the query side (broadcast — |Q| docs) and the neighbor side
    (|Q|*k docs at most)."""
    qids = cand.select(F.col("query_id").alias("doc_id")).distinct()
    nids = cand.select(F.col("neighbor_id").alias("doc_id")).distinct()
    qterm = F.broadcast(_pruned_terms(docs, qids, "query_id"))
    nterm = _pruned_terms(docs, nids, "neighbor_id")
    return qterm, nterm


@query(
    "retrieval_hybrid_topk",
    oracle=f"""
    WITH {_CAND_SQL},
    shared AS (
      SELECT c.query_id, c.neighbor_id, count(*)::BIGINT AS n_shared
      FROM cand c
      JOIN dterm tq ON tq.doc_id = c.query_id
      JOIN dterm tn ON tn.doc_id = c.neighbor_id AND tn.term = tq.term
      GROUP BY c.query_id, c.neighbor_id),
    fused AS (
      SELECT c.query_id, c.neighbor_id, c.cos_raw,
             coalesce(s.n_shared, 0) AS n_shared,
             coalesce(s.n_shared, 0)::DOUBLE
               / (nq.n_terms + nn.n_terms - coalesce(s.n_shared, 0))
               AS lex_jaccard
      FROM cand c
      LEFT JOIN shared s ON s.query_id = c.query_id
                        AND s.neighbor_id = c.neighbor_id
      JOIN ndist nq ON nq.doc_id = c.query_id
      JOIN ndist nn ON nn.doc_id = c.neighbor_id)
    SELECT query_id, rank, neighbor_id,
           round(cos_raw, 6) AS cos_sim,
           round(lex_jaccard, 6) AS lex_jaccard,
           round(0.5 * cos_raw + 0.5 * lex_jaccard, 6) AS hybrid_score
    FROM (SELECT *,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY 0.5 * cos_raw + 0.5 * lex_jaccard DESC,
                            neighbor_id) AS rank
          FROM fused)
    WHERE rank <= {_TOP_K}
    """,
    doc="Hybrid retrieval end-to-end: document -> embedding lookup "
    "(key equi-join documents⋈embeddings) -> Arrow-kernel IVF top-20 "
    "candidates -> fuse semantic cosine with exact lexical Jaccard "
    "over distinct unigrams -> top-5. The fusion rank key is "
    "0.5*cos_raw + 0.5*jaccard on bit-exact doubles (integer-"
    "quantized dot products; int/int division), so ranks cannot flip "
    "cross-engine; rounding is display-only. Lexical work is "
    "candidate-bounded: term sets id-pruned before the explode, "
    "query terms broadcast.",
)
def retrieval_hybrid_topk(spark, sf_dir):
    docs, cand = _candidates(spark, sf_dir)
    qterm, nterm = _pair_terms(docs, cand)
    nq = qterm.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("nq_terms")
    )
    nn = nterm.groupBy("neighbor_id").agg(
        F.count(F.lit(1)).cast("long").alias("nn_terms")
    )
    shared = (
        cand.select("query_id", "neighbor_id")
        .join(qterm, "query_id")
        .join(nterm, ["neighbor_id", "term"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    fused = (
        cand.join(shared, ["query_id", "neighbor_id"], "left")
        .withColumn("n_shared", F.coalesce(F.col("n_shared"), F.lit(0)))
        .join(F.broadcast(nq), "query_id")
        .join(nn, "neighbor_id")
        .withColumn(
            "lex_jaccard",
            F.col("n_shared").cast("double")
            / (F.col("nq_terms") + F.col("nn_terms") - F.col("n_shared")),
        )
        .withColumn(
            "hybrid", 0.5 * F.col("cos_raw") + 0.5 * F.col("lex_jaccard")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("hybrid").desc(), F.col("neighbor_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.round("cos_raw", 6).alias("cos_sim"),
            F.round("lex_jaccard", 6).alias("lex_jaccard"),
            F.round("hybrid", 6).alias("hybrid_score"),
        )
    )


@query(
    "rerank_hashed_crossencoder",
    oracle=f"""
    WITH {_CAND_SQL},
    inter AS (
      SELECT c.query_id, c.neighbor_id, count(*)::BIGINT AS n_shared,
             sum((('0x' || substr(md5(tq.term), 1, 8))::BIGINT
                    % {_CE_BUCKETS} * 2654435761)
                 % (2 * {_CE_SCALE} + 1) - {_CE_SCALE})::BIGINT AS logit_q
      FROM cand c
      JOIN dterm tq ON tq.doc_id = c.query_id
      JOIN dterm tn ON tn.doc_id = c.neighbor_id AND tn.term = tq.term
      GROUP BY c.query_id, c.neighbor_id),
    scored AS (
      SELECT c.query_id, c.neighbor_id, c.ann_rank, c.cos_raw,
             coalesce(i.n_shared, 0) AS n_shared,
             coalesce(i.logit_q, 0) AS logit_q
      FROM cand c
      LEFT JOIN inter i ON i.query_id = c.query_id
                       AND i.neighbor_id = c.neighbor_id)
    SELECT query_id, rerank, neighbor_id, ann_rank,
           round(cos_raw, 6) AS cos_sim, n_shared,
           round(1 / (1 + exp(-(logit_q::DOUBLE
             / ({_CE_SCALE}.0 * greatest(n_shared, 1))))), 6) AS ce_score
    FROM (SELECT *,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY logit_q DESC, cos_raw DESC, neighbor_id)
                   AS rerank
          FROM scored)
    WHERE rerank <= {_TOP_K}
    """,
    doc="Cross-encoder-style re-rank over ANN candidates: the same "
    "embedding-lookup -> Arrow-kernel IVF top-20 front half, then a "
    "hashed interaction-feature linear scorer on each (query, "
    "candidate) PAIR — shared distinct unigrams hashed into 512 "
    "buckets, quantized integer weights derived from the bucket id "
    "(the quality_classifier scheme; a trained cross-encoder "
    "distillate would broadcast the same way). The re-rank ORDER key "
    "is (exact BIGINT interaction logit, bit-exact quantized cosine, "
    "id) — the sigmoid appears only as a display column, so cross-"
    "engine transcendental drift cannot flip a rank. Pair work is "
    "bounded at |Q|*k rows.",
)
def rerank_hashed_crossencoder(spark, sf_dir):
    docs, cand = _candidates(spark, sf_dir)
    qterm, nterm = _pair_terms(docs, cand)
    shared = (
        cand.select("query_id", "neighbor_id")
        .join(qterm, "query_id")
        .join(nterm, ["neighbor_id", "term"])
    )
    bucket = word_hash32(F.col("term")) % _CE_BUCKETS
    wq = (bucket * F.lit(2654435761)) % (2 * _CE_SCALE + 1) - _CE_SCALE
    inter = (
        shared.select("query_id", "neighbor_id", wq.alias("wq"))
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared"),
            F.sum("wq").cast("long").alias("logit_q"),
        )
    )
    scored = (
        cand.join(inter, ["query_id", "neighbor_id"], "left")
        .withColumn("n_shared", F.coalesce(F.col("n_shared"), F.lit(0)))
        .withColumn("logit_q", F.coalesce(F.col("logit_q"), F.lit(0)))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("logit_q").desc(), F.col("cos_raw").desc(), F.col("neighbor_id")
    )
    norm = F.col("logit_q").cast("double") / (
        float(_CE_SCALE) * F.greatest(F.col("n_shared"), F.lit(1))
    )
    return (
        scored.withColumn("rerank", F.row_number().over(w))
        .filter(F.col("rerank") <= _TOP_K)
        .select(
            "query_id",
            "rerank",
            "neighbor_id",
            "ann_rank",
            F.round("cos_raw", 6).alias("cos_sim"),
            "n_shared",
            F.round(1 / (1 + F.exp(-norm)), 6).alias("ce_score"),
        )
    )


_N_PROBE = 2  # probed cells for the multi-probe variant


@query(
    "ann_multiprobe_topk",
    oracle=f"""
    WITH {_cand_sql(
        f"SELECT vec_id AS query_id, ve AS qv, qi AS qqi FROM v "
        f"WHERE vec_id % {_Q_MOD} = 0",
        n_probe=_N_PROBE,
        depth=_TOP_K,
    )}
    SELECT query_id, ann_rank AS rank, neighbor_id,
           round(cos_raw, 6) AS cos_sim
    FROM cand
    """,
    doc="Multi-probe IVF top-5 (n_probe=2): the standard IVF "
    "recall/latency knob — each query is scored against its TWO "
    "nearest centroid cells instead of one, recovering neighbors "
    "that fall just across a cell boundary. Same Arrow kernel as "
    "the retrieval compositions (a probing query simply appears in "
    "two entries of the broadcast query map; each corpus row is "
    "scored once per probing query; the final window merges the "
    "per-cell partial top-ks). Rank key is the bit-exact quantized "
    "cosine; recall(p=2) >= recall(p=1) is pinned against numpy "
    "brute force in tests.",
)
def ann_multiprobe_topk(spark, sf_dir):
    (emb,) = tables(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % _Q_MOD == 0)
    out = ivf_topk_arrow(
        queries, emb, k=_TOP_K, scale=_VSCALE, n_probe=_N_PROBE
    )
    return out.select(
        "query_id",
        "rank",
        "neighbor_id",
        F.round("cos_raw", 6).alias("cos_sim"),
    )


@query(
    "ann_crosssource_topk",
    oracle=f"""
    WITH {_cand_sql(
        f"SELECT vec_id AS query_id, ve AS qv, qi AS qqi, pkey AS qkey "
        f"FROM v WHERE vec_id % {_Q_MOD} = 0",
        depth=_TOP_K,
        pair_key=True,
    )}
    SELECT query_id, ann_rank AS rank, neighbor_id,
           round(cos_raw, 6) AS cos_sim
    FROM cand
    """,
    doc="Attribute-masked ANN: cosine top-5 where query and neighbor "
    "must come from DIFFERENT sources (documents.source threaded "
    "through the embedding relation) — the cross-source retrieval / "
    "hard-negative / decontamination shape. The exclusion is applied "
    "PER PAIR inside the Arrow kernel, before the top-k depth cut — "
    "a post-filter on an unfiltered top-k would under-fill ranks. "
    "NULL keys drop the pair on both engines (SQL <> semantics, "
    "mirrored in the kernel mask).",
)
def ann_crosssource_topk(spark, sf_dir):
    docs, emb = tables(spark, sf_dir, "documents", "embeddings")
    src = docs.select("doc_id", "source")
    # thread the attribute through the vector relation (key equi-join)
    ev = emb.join(src, emb["vec_id"] == src["doc_id"]).select(
        "vec_id", "embedding", "label", "source"
    )
    queries = ev.filter(F.col("vec_id") % _Q_MOD == 0)
    out = ivf_topk_arrow(
        queries, ev, k=_TOP_K, scale=_VSCALE, exclude_key="source"
    )
    return out.select(
        "query_id",
        "rank",
        "neighbor_id",
        F.round("cos_raw", 6).alias("cos_sim"),
    )
