"""Text-analysis queries over the documents table (north-star surface)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dso_import_spark.functions.text import (
    STOPWORDS,
    bow_fingerprint,
    bpe_token_estimate,
    stopword_ratio,
    token_count,
)
from dso_import_spark.queries import query
from dso_import_spark.queries_pkg.util import tables

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


@query(
    "text_token_stats",
    oracle=r"""
    SELECT lang,
           count(*) AS n_docs,
           sum(len(regexp_split_to_array(text, '\s+')))::BIGINT AS total_tokens,
           round(avg(len(regexp_split_to_array(text, '\s+'))), 4) AS avg_tokens,
           round(avg(n_chars), 4) AS avg_chars,
           sum(ceil(length(text) / 4.0))::BIGINT AS est_bpe_tokens
    FROM documents GROUP BY lang
    """,
    doc="Whitespace token counting + BPE-ish estimate per language.",
)
def text_token_stats(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text")).alias("total_tokens"),
        F.round(F.avg(token_count("text")), 4).alias("avg_tokens"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.sum(bpe_token_estimate("text")).alias("est_bpe_tokens"),
    )


@query(
    "text_quality_scores",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks, length(text) AS n_ch
      FROM documents WHERE doc_id % 25 = 0),
    m AS (
      SELECT doc_id,
             len(toks)::BIGINT AS n_tokens,
             round(len(list_filter(toks, w -> lower(w) IN ({_STOP_SQL})))
                   / greatest(len(toks), 1), 4) AS stop_ratio,
             round((n_ch - len(toks) + 1) / greatest(len(toks), 1)::DOUBLE, 4)
               AS avg_word_len
      FROM t)
    SELECT doc_id, n_tokens, stop_ratio, avg_word_len,
           round(least(n_tokens / 100.0, 1.0) * 0.5
                 + stop_ratio * 0.3
                 + least(avg_word_len / 10.0, 1.0) * 0.2, 4) AS quality
    FROM m
    """,
    doc="Composite quality score: length, stopword ratio, avg word length.",
)
def text_quality_scores(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    sample = docs.filter(F.col("doc_id") % 25 == 0)
    n_tokens = token_count("text")
    stop = F.round(stopword_ratio("text"), 4)
    awl = F.round(
        (F.length("text") - n_tokens + 1) / F.greatest(n_tokens, F.lit(1)).cast("double"),
        4,
    )
    m = sample.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        stop.alias("stop_ratio"),
        awl.alias("avg_word_len"),
    )
    quality = F.round(
        F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.5
        + F.col("stop_ratio") * 0.3
        + F.least(F.col("avg_word_len") / 10.0, F.lit(1.0)) * 0.2,
        4,
    )
    return m.withColumn("quality", quality)


@query(
    "lang_id_heuristic",
    oracle="""
    WITH f AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(text, ' '),
                             w -> w IN ('the', 'and', 'of', 'a')))::BIGINT AS s_en,
             len(list_filter(string_split(text, ' '),
                             w -> w IN ('el', 'la', 'de', 'y')))::BIGINT   AS s_es,
             len(list_filter(string_split(text, ' '),
                             w -> w IN ('der', 'die', 'das', 'und')))::BIGINT AS s_de
      FROM documents)
    SELECT lang,
           CASE WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
                WHEN s_es >= s_de THEN 'es' ELSE 'de' END AS predicted,
           count(*) AS n
    FROM f GROUP BY 1, 2
    """,
    doc="n-gram/stopword-profile language-ID heuristic (deterministic "
    "argmax with fixed tie-break order). Round-8 compute-amplification "
    "gate: three tokenize+filter passes per row — volume-gated spread "
    "before the scan (x100: 8.6 s unspread vs 1.9 s spread, "
    "SCALING.md round-8).",
)
def lang_id_heuristic(spark, sf_dir):
    from dso_import_spark.queries_pkg.util import spread_for_explode

    (docs,) = tables(spark, sf_dir, "documents")
    docs = spread_for_explode(docs, "doc_id", amplification=32)
    toks = F.split(F.col("text"), " ")

    def score(words: tuple[str, ...]):
        return F.size(F.filter(toks, lambda w: w.isin(*words))).cast("long")

    f = docs.select(
        "lang",
        score(("the", "and", "of", "a")).alias("s_en"),
        score(("el", "la", "de", "y")).alias("s_es"),
        score(("der", "die", "das", "und")).alias("s_de"),
    )
    predicted = (
        F.when(
            (F.col("s_en") >= F.col("s_es")) & (F.col("s_en") >= F.col("s_de")), "en"
        )
        .when(F.col("s_es") >= F.col("s_de"), "es")
        .otherwise("de")
    )
    return (
        f.select("lang", predicted.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "doc_fingerprints",
    oracle=r"""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
               regexp_split_to_array(text, '\s+'))), ' '))
             AS fingerprint
    FROM documents WHERE doc_id % 25 = 0
    """,
    doc="Bag-of-words md5 document fingerprint (order-invariant identity).",
)
def doc_fingerprints(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") % 25 == 0)
        .select("doc_id", bow_fingerprint("text").alias("fingerprint"))
    )


@query(
    "text_tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    tf AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf
      FROM toks GROUP BY doc_id, term),
    df AS (
      SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM toks GROUP BY term),
    n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(n.n_docs / df.df), 4) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n)
    SELECT doc_id, term, tfidf, rnk
    FROM (SELECT doc_id, term, tfidf,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, term) AS rnk
          FROM scored)
    WHERE rnk <= 3 AND doc_id % 50 = 0
    """,
    doc="Exact TF-IDF (tf * ln(N/df)) with top-3 terms per sampled doc. "
    "Document frequency is one broadcastable agg over exploded tokens; "
    "no MLlib fit step, pure DataFrame ops.",
)
def text_tfidf_top_terms(spark, sf_dir):
    from pyspark.sql.window import Window

    (docs,) = tables(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    # df must stay GLOBAL, but tf / the join probe / the top-k window
    # only matter for the sampled docs — filter first, or the plan
    # ranks top-3 terms for the other 98% just to discard them
    tf = (
        toks.filter(F.col("doc_id") % 50 == 0)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.count()  # scalar; the one driver-side value allowed
    # df scales with the vocabulary (unbounded at corpus scale) —
    # hint-free; AQE broadcasts while it fits
    scored = tf.join(df, "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 4).alias(
            "tfidf"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tfidf", "rnk")
    )


@query(
    "doc_chunking",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words,
             len(string_split(text, ' ')) AS n
      FROM documents WHERE doc_id % 10 = 0),
    starts AS (
      SELECT doc_id, words, n, unnest(range(1, n + 1, 25)) AS start FROM w)
    SELECT doc_id, ((start - 1) / 25)::INT AS chunk_index,
           least(50, n - start + 1)::BIGINT AS n_words,
           md5(array_to_string(words[start : least(start + 49, n)], ' '))
             AS chunk_md5
    FROM starts
    """,
    doc="Overlapping sliding-window document chunking (50-word chunks, "
    "25-word stride) for training-data prep — pure expressions "
    "(split/sequence/posexplode/slice), no Python per row.",
)
def doc_chunking(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    w = docs.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id",
        F.split(F.col("text"), " ").alias("words"),
        F.size(F.split(F.col("text"), " ")).alias("n"),
    )
    starts = w.select(
        "doc_id",
        "words",
        "n",
        F.posexplode(F.sequence(F.lit(1), F.col("n"), F.lit(25))).alias(
            "chunk_index", "start"
        ),
    )
    return starts.select(
        "doc_id",
        "chunk_index",
        F.least(F.lit(50), F.col("n") - F.col("start") + 1)
        .cast("long")
        .alias("n_words"),
        F.md5(F.concat_ws(" ", F.slice("words", F.col("start"), 50))).alias(
            "chunk_md5"
        ),
    )
