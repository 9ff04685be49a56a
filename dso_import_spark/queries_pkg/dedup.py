"""Deduplication queries over the documents table (north-star surface)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dso_import_spark.functions.text import simhash32
from dso_import_spark.operators.dedup import (
    duplicated_span_stats,
    exact_dedup,
    minhash_band_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from dso_import_spark.queries import query
from dso_import_spark.queries_pkg.util import tables


@query(
    "dedup_exact_stats",
    oracle="""
    SELECT count(*) AS n_docs,
           count(DISTINCT text) AS n_unique_texts,
           (count(*) - count(DISTINCT text))::BIGINT AS n_exact_dups,
           count(DISTINCT md5(text)) AS n_unique_hashes
    FROM documents
    """,
    doc="Exact dedup summary: hash-groupBy duplicate detection.",
)
def dedup_exact_stats(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("n_unique_texts"),
        (F.count(F.lit(1)) - F.countDistinct("text")).cast("long").alias("n_exact_dups"),
        F.countDistinct(F.md5("text")).alias("n_unique_hashes"),
    )


@query(
    "dedup_prefix_groups",
    oracle="""
    SELECT fp, min(doc_id) AS keeper_id, count(*)::BIGINT AS n_dups
    FROM (SELECT doc_id,
                 lower(array_to_string(string_split(text, ' ')[1:5], ' ')) AS fp
          FROM documents)
    GROUP BY fp HAVING count(*) > 1
    """,
    doc="Normalized exact dedup: 5-word-prefix fingerprint groups with "
    "deterministic min-id keeper (exact_dedup operator).",
)
def dedup_prefix_groups(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    fp = F.lower(F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 5)))
    groups = exact_dedup(docs.withColumn("fp", fp), ["fp"], "doc_id")
    return groups.filter(F.col("n_dups") > 1).select(
        "fp", "keeper_id", F.col("n_dups").cast("long").alias("n_dups")
    )


@query(
    "dedup_ngram_jaccard",
    oracle=r"""
    WITH sample_docs AS (
      SELECT doc_id, lang, text FROM documents WHERE doc_id % 20 = 0),
    toks AS (
      SELECT doc_id, lang, list_distinct(regexp_split_to_array(text, '\s+')) AS t
      FROM sample_docs),
    words AS (
      SELECT doc_id, lang, len(t)::BIGINT AS n_toks, unnest(t) AS word FROM toks),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.n_toks AS n_a, b.n_toks AS n_b, count(*) AS n_shared
      FROM words a JOIN words b
        ON a.word = b.word AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4)
    SELECT id_a, id_b,
           round(n_shared / (n_a + n_b - n_shared), 4) AS jaccard
    FROM shared
    WHERE round(n_shared / (n_a + n_b - n_shared), 4) >= 0.5
    """,
    doc="Exact n-gram (word-set) Jaccard near-dup pairs, language-blocked "
    "(ngram_jaccard_pairs operator).",
)
def dedup_ngram_jaccard(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    sample = docs.filter(F.col("doc_id") % 20 == 0)
    return ngram_jaccard_pairs(
        sample, "text", "doc_id", block_cols=["lang"], threshold=0.5
    )


@query(
    "dedup_simhash_fingerprints",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, list_distinct(regexp_split_to_array(text, '\s+')) AS t
      FROM documents WHERE doc_id % 10 = 0),
    raw_words AS (
      SELECT doc_id, unnest(t) AS word FROM toks),
    words AS (
      SELECT doc_id, ('0x' || substr(md5(word), 1, 8))::BIGINT AS h
      FROM raw_words),
    bits AS (
      SELECT doc_id, b.bit,
             sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      FROM words, (SELECT unnest(generate_series(0, 31)) AS bit) b
      GROUP BY doc_id, b.bit),
    fp AS (
      SELECT doc_id,
             sum(CASE WHEN vote > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT
               AS simhash
      FROM bits GROUP BY doc_id)
    SELECT doc_id, simhash FROM fp
    """,
    doc="32-bit SimHash document fingerprints (md5-derived word hashes; "
    "functions.text.simhash32 — pure Column expressions, no shuffle).",
)
def dedup_simhash_fingerprints(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", simhash32("text").alias("simhash"))
    )


@query(
    "dedup_minhash_lsh",
    oracle=r"""
    WITH sample_docs AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
    toks AS (
      SELECT doc_id, list_distinct(regexp_split_to_array(text, '\s+')) AS t
      FROM sample_docs),
    words AS (
      SELECT doc_id, len(t)::BIGINT AS n_toks, unnest(t) AS word FROM toks),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.n_toks AS n_a, b.n_toks AS n_b, count(*) AS n_shared
      FROM words a JOIN words b
        ON a.word = b.word AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4)
    SELECT id_a, id_b,
           round(n_shared / (n_a + n_b - n_shared), 4) AS jaccard
    FROM shared
    WHERE round(n_shared / (n_a + n_b - n_shared), 4) >= 0.5
    """,
    doc="MinHash-LSH near-dup pairs (Spark ML MinHashLSH seed=42 for "
    "candidates, exact word-set Jaccard verify at >= 0.5). The exact "
    "verify makes the output engine-independent: with 32 single-hash "
    "tables a J>=0.5 pair is missed with probability < 2^-32, so the "
    "result equals the full exact-Jaccard pair set and the oracle "
    "computes it without modeling Spark ML's hashes — a falsifiable "
    "check of BOTH candidate recall and the verify arithmetic.",
)
def dedup_minhash_lsh(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    sample = docs.filter(F.col("doc_id") % 10 == 0)
    return minhash_lsh_pairs(sample, threshold=0.5)


@query(
    "dedup_minhash_banded",
    oracle=r"""
    WITH sample_docs AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
    toks AS (
      SELECT doc_id, list_distinct(regexp_split_to_array(text, '\s+')) AS t
      FROM sample_docs),
    words AS (
      SELECT doc_id, ('0x' || substr(md5(word), 1, 8))::BIGINT AS x,
             word
      FROM (SELECT doc_id, unnest(t) AS word FROM toks)),
    sigs AS (
      SELECT doc_id,
             min(((40503*0 + 1) * x + (12345*0 + 7)) % 4294967311) AS m0,
             min(((40503*1 + 1) * x + (12345*1 + 7)) % 4294967311) AS m1,
             min(((40503*2 + 1) * x + (12345*2 + 7)) % 4294967311) AS m2,
             min(((40503*3 + 1) * x + (12345*3 + 7)) % 4294967311) AS m3,
             min(((40503*4 + 1) * x + (12345*4 + 7)) % 4294967311) AS m4,
             min(((40503*5 + 1) * x + (12345*5 + 7)) % 4294967311) AS m5,
             min(((40503*6 + 1) * x + (12345*6 + 7)) % 4294967311) AS m6,
             min(((40503*7 + 1) * x + (12345*7 + 7)) % 4294967311) AS m7
      FROM words GROUP BY doc_id),
    bands AS (
      SELECT doc_id, 0 AS band, m0 AS v0, m1 AS v1 FROM sigs
      UNION ALL SELECT doc_id, 1, m2, m3 FROM sigs
      UNION ALL SELECT doc_id, 2, m4, m5 FROM sigs
      UNION ALL SELECT doc_id, 3, m6, m7 FROM sigs),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.v0 = b.v0 AND a.v1 = b.v1
       AND a.doc_id < b.doc_id),
    nt AS (SELECT doc_id, len(t)::BIGINT AS n_toks FROM toks),
    shared AS (
      SELECT c.id_a, c.id_b, count(*) AS n_shared
      FROM cand c
      JOIN words wa ON wa.doc_id = c.id_a
      JOIN words wb ON wb.doc_id = c.id_b AND wb.word = wa.word
      GROUP BY c.id_a, c.id_b)
    SELECT s.id_a, s.id_b,
           round(s.n_shared / (na.n_toks + nb.n_toks - s.n_shared), 4)
             AS jaccard
    FROM shared s
    JOIN nt na ON na.doc_id = s.id_a
    JOIN nt nb ON nb.doc_id = s.id_b
    WHERE round(s.n_shared / (na.n_toks + nb.n_toks - s.n_shared), 4) >= 0.5
    """,
    doc="Engine-portable MinHash+banding near-dup pairs "
    "(minhash_band_pairs operator): md5-derived word hashes, 8 affine "
    "min-hashes, 4 bands of 2, exact-Jaccard verify — the oracle "
    "reproduces signatures, candidates, AND the verify step exactly.",
)
def dedup_minhash_banded(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    sample = docs.filter(F.col("doc_id") % 10 == 0)
    return minhash_band_pairs(sample, threshold=0.5)


@query(
    "incremental_corpus_dedup",
    oracle=r"""
    WITH fp AS (
      SELECT doc_id, lang,
             md5(array_to_string(list_sort(list_distinct(
                 regexp_split_to_array(text, '\s+'))), ' ')) AS fp
      FROM documents),
    corpus AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 3 <> 0),
    batch AS (
      SELECT f.doc_id, f.lang, f.fp,
             (c.fp IS NOT NULL) AS in_corpus,
             row_number() OVER (PARTITION BY f.fp ORDER BY f.doc_id) AS rn
      FROM fp f LEFT JOIN corpus c ON f.fp = c.fp
      WHERE f.doc_id % 3 = 0)
    SELECT lang,
           count(*) AS n_batch,
           count(*) FILTER (in_corpus) AS n_dup_vs_corpus,
           count(*) FILTER (NOT in_corpus AND rn > 1) AS n_dup_in_batch,
           count(*) FILTER (NOT in_corpus AND rn = 1) AS n_kept
    FROM batch GROUP BY lang
    """,
    doc="Incremental corpus update: dedup an incoming document batch "
    "(doc_id % 3 = 0) against the existing corpus (the rest) AND "
    "within itself, by bag-of-words fingerprint. The corpus side is "
    "reduced to distinct fingerprints before the join — at 100 TB "
    "that fingerprint table is the persistent dedup index you join "
    "each new batch against (shuffle join keyed on fp; the full "
    "corpus text is never re-read). Within-batch survivors are the "
    "rn = 1 rows of a fingerprint window.",
)
def incremental_corpus_dedup(spark, sf_dir):
    from pyspark.sql import Window

    from dso_import_spark.functions.text import bow_fingerprint

    (docs,) = tables(spark, sf_dir, "documents")
    fp = docs.select("doc_id", "lang", bow_fingerprint("text").alias("fp"))
    corpus = fp.filter(F.col("doc_id") % 3 != 0).select("fp").distinct()
    marked = (
        fp.filter(F.col("doc_id") % 3 == 0)
        .join(corpus.withColumn("in_corpus", F.lit(True)), "fp", "left")
        .withColumn("in_corpus", F.coalesce("in_corpus", F.lit(False)))
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")),
        )
    )
    keep = ~F.col("in_corpus") & (F.col("rn") == 1)
    return marked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_batch"),
        F.count(F.when(F.col("in_corpus"), 1)).alias("n_dup_vs_corpus"),
        F.count(F.when(~F.col("in_corpus") & (F.col("rn") > 1), 1)).alias(
            "n_dup_in_batch"
        ),
        F.count(F.when(keep, 1)).alias("n_kept"),
    )


@query(
    "dedup_substring_spans",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
      FROM documents
    ),
    sized AS (SELECT doc_id, t, len(t) AS n FROM toks),
    positions AS (
      SELECT doc_id, t,
             unnest(CASE WHEN n >= 8 THEN range(1, n - 6) ELSE [] END) AS s
      FROM sized
    ),
    shingles AS (
      SELECT doc_id, s, array_to_string(t[s : s + 7], ' ') AS sh FROM positions
    ),
    dup_sh AS (SELECT sh FROM shingles GROUP BY sh HAVING count(DISTINCT doc_id) > 1),
    dup_pos AS (SELECT doc_id, s, sh FROM shingles
                WHERE sh IN (SELECT sh FROM dup_sh)),
    covered AS (
      SELECT doc_id, count(DISTINCT ti) AS covered_tokens
      FROM (SELECT doc_id, unnest(range(s, s + 8)) AS ti FROM dup_pos)
      GROUP BY doc_id
    ),
    per_doc AS (
      SELECT doc_id, count(*) AS n_dup_spans, count(DISTINCT sh) AS n_dup_shingles
      FROM dup_pos GROUP BY doc_id
    )
    SELECT d.doc_id, d.n AS n_tokens,
           coalesce(p.n_dup_spans, 0)::BIGINT    AS n_dup_spans,
           coalesce(p.n_dup_shingles, 0)::BIGINT AS n_dup_shingles,
           coalesce(c.covered_tokens, 0)::BIGINT AS covered_tokens,
           round(coalesce(c.covered_tokens, 0) / d.n::DOUBLE, 4) AS dup_coverage
    FROM sized d
    LEFT JOIN per_doc p USING (doc_id)
    LEFT JOIN covered c USING (doc_id)
    """,
    doc="Exact duplicated-substring spans (suffix-array dedup re-expressed "
    "as positioned 8-gram shingles + one hash agg; Lee et al. 2022): "
    "per-doc duplicated-span counts and exact covered-token coverage "
    "(duplicated_span_stats operator).",
)
def dedup_substring_spans(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    return duplicated_span_stats(docs, "text", "doc_id", n=8)
