"""Training-data pipeline operators beyond dedup/ANN: stratified
sampling, sequence packing, and benchmark decontamination.

These are the corpus-construction steps an LLM data pipeline runs after
dedup and before tokenization (reference has no analog; north-star
extension surface per SURVEY.md §2.10):

- ``stratified_sample_lang``: deterministic per-language downsampling
  with the same arithmetic LCG hash as ``hash_split_train_test`` — a
  stateless map at any scale (no shuffle except the reporting agg), and
  the keep/drop decision is reproducible across engines and runs.
- ``seq_packing_bins``: token-aware greedy sequence packing — assign
  documents to fixed-size context windows (2048 tokens) by cumulative
  token count. Window cumsum partitioned by language; at 100 TB the
  partition key becomes (lang, shard) so no single window partition
  exceeds an executor, which changes bin numbering but not the
  algorithm.
- ``decontam_ngram_overlap``: test-set decontamination — count distinct
  8-gram overlaps between each training document and a benchmark set.
  The benchmark gram set is small by construction (real benchmarks are
  MBs, not TBs), so the join is a broadcast hash join against the
  flat-mapped training grams: the 100 TB side never shuffles until the
  final per-doc aggregation.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.sql.functions import broadcast

from dso_import_spark.functions.text import (
    STOPWORDS,
    bow_fingerprint,
    stopword_ratio,
    token_count,
)
from dso_import_spark.queries import query
from dso_import_spark.queries_pkg.util import tables

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

# same LCG as hash_split_train_test: both engines compute it identically
# on BIGINT doc_id, unlike engine-specific hash() builtins
_LCG = "(doc_id * 1103515245 + 12345) % 1000"


@query(
    "stratified_sample_lang",
    oracle=f"""
    SELECT lang,
           count(*) AS n_total,
           count(*) FILTER (WHERE b < keep_limit) AS n_kept,
           coalesce(sum(n_chars) FILTER (WHERE b < keep_limit), 0)::BIGINT
             AS kept_chars
    FROM (SELECT lang, n_chars, {_LCG} AS b,
                 CASE lang WHEN 'en' THEN 300 WHEN 'zh' THEN 600
                      ELSE 1000 END AS keep_limit
          FROM documents)
    GROUP BY lang
    """,
    doc="Deterministic stratified sampling: downsample high-resource "
    "languages (en→30%, zh→60%) via the portable LCG bucket — a "
    "stateless, reproducible map; the groupBy exists only to report.",
)
def stratified_sample_lang(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    b = (F.col("doc_id") * 1103515245 + 12345) % 1000
    keep_limit = (
        F.when(F.col("lang") == "en", 300)
        .when(F.col("lang") == "zh", 600)
        .otherwise(1000)
    )
    kept = b < keep_limit
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(kept, 1)).alias("n_kept"),
        F.coalesce(F.sum(F.when(kept, F.col("n_chars"))), F.lit(0))
        .cast("long")
        .alias("kept_chars"),
    )


@query(
    "seq_packing_bins",
    oracle="""
    WITH t AS (SELECT doc_id, lang,
                      len(string_split(text, ' ')) AS n_tok
               FROM documents),
    c AS (SELECT *, sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id)
                      AS cum
          FROM t)
    SELECT lang,
           CAST((cum - n_tok) // 2048 AS BIGINT) AS bin,
           count(*) AS n_docs,
           sum(n_tok)::BIGINT AS bin_tokens
    FROM c
    GROUP BY lang, bin
    """,
    doc="Token-aware sequence packing: cumulative token count over a "
    "deterministic doc order assigns each document to a 2048-token "
    "context bin; per-bin doc/token totals are the packing manifest.",
)
def seq_packing_bins(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    w = Window.partitionBy("lang").orderBy("doc_id")
    c = docs.select("doc_id", "lang", n_tok.alias("n_tok")).withColumn(
        "cum", F.sum("n_tok").over(w)
    )
    return (
        c.withColumn(
            "bin", F.floor((F.col("cum") - F.col("n_tok")) / 2048).cast("long")
        )
        .groupBy("lang", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("bin_tokens"),
        )
    )


@query(
    "decontam_ngram_overlap",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS w
                  FROM documents),
    grams AS (
      SELECT doc_id, array_to_string(w[i:i+7], ' ') AS g
      FROM toks, UNNEST(generate_series(1, greatest(len(w) - 7, 0))) AS t(i)
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 0)
    SELECT g2.doc_id, count(DISTINCT g2.g)::BIGINT AS n_overlap
    FROM (SELECT doc_id, g FROM grams WHERE doc_id % 10 <> 0) g2
    JOIN bench USING (g)
    GROUP BY g2.doc_id
    """,
    doc="Benchmark decontamination: flag training documents sharing "
    "8-gram shingles with a held-out benchmark set (doc_id % 10 = 0 "
    "stands in for the benchmark). Broadcast the small benchmark gram "
    "set; the training side stays shuffle-free until the per-doc agg. "
    "Grams travel as xxhash64 fingerprints (8 bytes vs ~50-byte "
    "strings) through the distinct/broadcast/join/count — identical "
    "counts absent a 64-bit collision, same discipline as "
    "duplicated_span_stats.",
)
def decontam_ngram_overlap(spark, sf_dir):
    from dso_import_spark.queries_pkg.util import spread_for_explode

    (docs,) = tables(spark, sf_dir, "documents")
    # ~300x gram amplification: parallelize by rows, not input splits
    docs = spread_for_explode(
        docs.select("doc_id", "text"), "doc_id", amplification=500
    )
    w = F.split(F.lower(F.col("text")), " ")
    # Spark sequence(1, 0) yields a DESCENDING [1, 0] — guard short docs
    # explicitly (DuckDB generate_series(1, 0) is empty).
    grams_arr = F.when(
        F.size(w) >= 8,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 7),
            lambda i: F.xxhash64(F.array_join(F.slice(w, i, 8), " ")),
        ),
    ).otherwise(F.array().cast("array<long>"))
    grams = docs.select("doc_id", F.explode(grams_arr).alias("g"))
    bench = grams.filter(F.col("doc_id") % 10 == 0).select("g").distinct()
    return (
        grams.filter(F.col("doc_id") % 10 != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").cast("long").alias("n_overlap"))
    )


@query(
    "corpus_pipeline_stats",
    oracle=rf"""
    WITH base AS (
      SELECT doc_id, lang,
             len(regexp_split_to_array(text, '\s+'))::BIGINT AS n_tokens,
             round(len(list_filter(regexp_split_to_array(text, '\s+'),
                                   w -> lower(w) IN ({_STOP_SQL})))
                   / greatest(len(regexp_split_to_array(text, '\s+')), 1), 4)
               AS stop_ratio,
             round((length(text) - len(regexp_split_to_array(text, '\s+')) + 1)
                   / greatest(len(regexp_split_to_array(text, '\s+')), 1)::DOUBLE, 4)
               AS avg_word_len,
             md5(array_to_string(
                 list_sort(list_distinct(regexp_split_to_array(text, '\s+'))), ' '))
               AS fp
      FROM documents),
    scored AS (
      SELECT *, round(least(n_tokens / 100.0, 1.0) * 0.5
                      + stop_ratio * 0.3
                      + least(avg_word_len / 10.0, 1.0) * 0.2, 4) AS quality
      FROM base),
    filt AS (SELECT * FROM scored WHERE quality >= 0.4),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      FROM filt)
    SELECT lang,
           count(*)::BIGINT AS n_candidates,
           count(*) FILTER (rn = 1)::BIGINT AS n_kept,
           coalesce(sum(n_tokens) FILTER (rn = 1), 0)::BIGINT AS kept_tokens,
           round(avg(quality) FILTER (rn = 1), 4) AS avg_quality_kept
    FROM ranked GROUP BY lang
    """,
    doc="End-to-end corpus construction in one DAG: quality scoring → "
    "threshold filter → global exact dedup (bag-of-words fingerprint, "
    "keep lowest doc_id) → per-language manifest. The stages an LLM "
    "data pipeline chains before tokenization, composed from the same "
    "operators the individual queries verify (oracle tokenizes with "
    "regexp \\\\s+ to match the text.py helpers exactly — a literal "
    "single-space split counts consecutive-space empty tokens "
    "differently). Two shuffles total "
    "(fingerprint window, language agg); the quality filter runs "
    "before the dedup shuffle so rejected docs never shuffle.",
)
def corpus_pipeline_stats(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    n_tokens = token_count("text")
    stop = F.round(stopword_ratio("text"), 4)
    awl = F.round(
        (F.length("text") - n_tokens + 1)
        / F.greatest(n_tokens, F.lit(1)).cast("double"),
        4,
    )
    base = docs.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        stop.alias("stop_ratio"),
        awl.alias("avg_word_len"),
        bow_fingerprint("text").alias("fp"),
    )
    quality = F.round(
        F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.5
        + F.col("stop_ratio") * 0.3
        + F.least(F.col("avg_word_len") / 10.0, F.lit(1.0)) * 0.2,
        4,
    )
    filt = base.withColumn("quality", quality).filter(F.col("quality") >= 0.4)
    w = Window.partitionBy("fp").orderBy("doc_id")
    ranked = filt.withColumn("rn", F.row_number().over(w))
    kept = F.col("rn") == 1
    return ranked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.count(F.when(kept, 1)).alias("n_kept"),
        F.coalesce(F.sum(F.when(kept, F.col("n_tokens"))), F.lit(0))
        .cast("long")
        .alias("kept_tokens"),
        F.round(F.avg(F.when(kept, F.col("quality"))), 4).alias(
            "avg_quality_kept"
        ),
    )


@query(
    "lm_bigram_quality",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    bg AS (
      SELECT doc_id, toks[u.pos] AS w1, toks[u.pos + 1] AS w2
      FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS u(pos)),
    uni AS (SELECT w1, count(*)::BIGINT AS c1 FROM bg GROUP BY w1),
    bi AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM bg GROUP BY w1, w2)
    SELECT bg.doc_id, count(*)::BIGINT AS n_bigrams,
           round(avg(ln(bi.c12 / uni.c1)), 4) AS avg_logprob
    FROM bg JOIN bi USING (w1, w2) JOIN uni USING (w1)
    GROUP BY bg.doc_id
    """,
    doc="CCNet-style LM quality score: train a bigram language model on "
    "the corpus itself (MLE, no smoothing — every scored bigram is in "
    "the counts by construction), then score each document by its mean "
    "bigram log-probability. Low scores flag boilerplate/gibberish for "
    "filtering. Shape: token split is a narrow map; unigram/bigram "
    "counts are two map-side-combined aggs; scoring is one shuffle "
    "join on the bigram key + per-doc agg. At 100 TB the bigram count "
    "table is itself distributed (no broadcast needed); an optional "
    "optimization broadcasts only the top-K bigram probabilities with "
    "a backoff default for the tail.",
)
def lm_bigram_quality(spark, sf_dir):
    from dso_import_spark.queries_pkg.util import spread_for_explode

    (docs,) = tables(spark, sf_dir, "documents")
    toks = spread_for_explode(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    n = F.size("toks")
    bg = (
        toks.select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("toks"), 1, n - 1),
                    F.slice(F.col("toks"), 2, n - 1),
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
    )
    # three consumers (uni, bi, the probe side of the score join) with
    # different grouping keys — no exchange reuse; without the
    # checkpoint the corpus re-explodes three times (dsir documents
    # the same measurement for the identical relation)
    bg = bg.localCheckpoint(eager=False)
    uni = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    bi = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    return (
        bg.join(bi, ["w1", "w2"])
        .join(uni, "w1")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(F.log(F.col("c12") / F.col("c1"))), 4).alias(
                "avg_logprob"
            ),
        )
    )


@query(
    "source_overlap_matrix",
    oracle="""
    WITH toks AS (SELECT source, string_split(lower(text), ' ') AS w
                  FROM documents),
    sg AS (
      SELECT DISTINCT source, array_to_string(w[i:i+4], ' ') AS g
      FROM toks, UNNEST(generate_series(1, greatest(len(w) - 4, 0))) AS t(i)),
    sizes AS (SELECT source, count(*)::BIGINT AS n_grams FROM sg GROUP BY source),
    inter AS (
      SELECT a.source AS source_a, b.source AS source_b,
             count(*)::BIGINT AS n_shared
      FROM sg a JOIN sg b ON a.g = b.g AND a.source < b.source
      GROUP BY a.source, b.source)
    SELECT i.source_a, i.source_b, i.n_shared,
           round(i.n_shared /
                 (sa.n_grams + sb.n_grams - i.n_shared)::DOUBLE, 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.source_a = sa.source
    JOIN sizes sb ON i.source_b = sb.source
    """,
    doc="Cross-source contamination matrix: pairwise Jaccard overlap of "
    "each source's distinct 5-gram shingle sets — which corpus sources "
    "copy from each other (mirror detection in web-corpus curation). "
    "Grams travel as xxhash64 fingerprints (count parity with the "
    "string-gram oracle absent a 64-bit collision, same discipline as "
    "decontam_ngram_overlap). Shape: one distinct agg on (source, "
    "gram-hash), then an equi-join on the gram key where per-gram "
    "fan-out is bounded by the number of sources sharing it; at "
    "web-domain scale add a document-frequency cap (drop grams in "
    "> df_max sources) to bound the hot-gram pair blowup.",
)
def source_overlap_matrix(spark, sf_dir):
    from dso_import_spark.queries_pkg.util import spread_for_explode

    (docs,) = tables(spark, sf_dir, "documents")
    docs = spread_for_explode(docs, "doc_id", amplification=500)  # ~300x n-gram
    # amplification from a single input split otherwise runs
    # one task (see util.spread_for_explode)
    w = F.split(F.lower(F.col("text")), " ")
    grams_arr = F.when(
        F.size(w) >= 5,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 4),
            lambda i: F.xxhash64(F.array_join(F.slice(w, i, 5), " ")),
        ),
    ).otherwise(F.array().cast("array<long>"))
    sg = docs.select("source", F.explode(grams_arr).alias("g")).distinct()
    sizes = sg.groupBy("source").agg(F.count("*").alias("n_grams"))
    a, b = sg.alias("a"), sg.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("n_grams").alias("na")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("n_grams").alias("nb")
    )
    return (
        inter.join(sa, "source_a")
        .join(sb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.round(
                F.col("n_shared")
                / (F.col("na") + F.col("nb") - F.col("n_shared")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )


@query(
    "quality_classifier_score",
    oracle="""
    WITH t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
               FROM documents),
    b AS (SELECT doc_id,
                 ('0x' || substr(md5(term), 1, 8))::BIGINT % 1024 AS bucket
          FROM t),
    s AS (SELECT doc_id, count(*)::BIGINT AS n_tok,
                 sum((bucket * 2654435761) % 2001 - 1000)::BIGINT AS logit_q
          FROM b GROUP BY doc_id)
    SELECT doc_id, n_tok, logit_q,
           round(1 / (1 + exp(-(logit_q / (1000.0 * n_tok)))), 6) AS score,
           logit_q > 0 AS keep
    FROM s
    """,
    doc="fastText-style linear quality classifier applied at corpus "
    "scale: hashed unigram features (portable md5-prefix hash, 1024 "
    "buckets) scored against a fixed weight vector derived "
    "arithmetically from the bucket id (standing in for trained "
    "weights, which would broadcast the same way). The per-doc logit "
    "is an exact BIGINT sum of quantized weights, so the score is "
    "order-independent — no floating-point drift across engines or "
    "partitionings. Shape: one explode + narrow hash map + one "
    "map-side-combinable per-doc agg; model inference as a pure "
    "column expression, no UDF, no model server.",
)
def quality_classifier_score(spark, sf_dir):
    from dso_import_spark.functions.text import word_hash32

    (docs,) = tables(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("term"),
    )
    bucket = word_hash32(F.col("term")) % 1024
    wq = (bucket * F.lit(2654435761)) % 2001 - 1000
    s = t.select("doc_id", wq.alias("wq")).groupBy("doc_id").agg(
        F.count("*").alias("n_tok"),
        F.sum("wq").alias("logit_q"),
    )
    logit = F.col("logit_q") / (1000.0 * F.col("n_tok"))
    return s.select(
        "doc_id",
        "n_tok",
        "logit_q",
        F.round(1 / (1 + F.exp(-logit)), 6).alias("score"),
        (F.col("logit_q") > 0).alias("keep"),
    )


@query(
    "priority_sample_topk",
    oracle="""
    WITH pr AS (
      SELECT doc_id, lang, n_chars,
             n_chars * 1000.0 /
               (((doc_id * 1103515245 + 12345) % 1000) + 1) AS priority
      FROM documents)
    SELECT lang, rank, doc_id, n_chars, round(priority, 4) AS priority
    FROM (SELECT lang, doc_id, n_chars, priority,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY priority DESC, doc_id) AS rank
          FROM pr)
    WHERE rank <= 5
    """,
    doc="Priority sampling (Duffield-Lund-Thorup, JACM 2007): per-item "
    "priority w/u with u uniform from the portable LCG — taking the "
    "top-k per stratum yields a weight-proportional sample with "
    "unbiased subset-sum estimators, the principled 'sample big "
    "documents more' primitive (vs stratified_sample_lang's uniform "
    "keep). Arithmetic is only * and / (IEEE correctly-rounded, "
    "bit-identical across engines — no pow/ln whose libm results "
    "could flip ranks); priority is rounded for DISPLAY only, after "
    "ranking. One narrow map + one per-stratum top-k window.",
)
def priority_sample_topk(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    u_scaled = ((F.col("doc_id") * 1103515245 + 12345) % 1000) + 1
    pr = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        (F.col("n_chars") * 1000.0 / u_scaled).alias("priority"),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("priority"), "doc_id")
    return (
        pr.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("lang", "rank", "doc_id", "n_chars",
                F.round("priority", 4).alias("priority"))
    )


@query(
    "dsir_importance_scores",
    oracle="""
    WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks
               FROM documents),
    bg AS (
      SELECT doc_id, lang, toks[u.pos] AS w1, toks[u.pos + 1] AS w2
      FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS u(pos)),
    v AS (SELECT count(DISTINCT w1)::DOUBLE AS v
          FROM (SELECT w1 FROM bg UNION ALL SELECT w2 FROM bg)),
    tgt_uni AS (SELECT w1, count(*)::BIGINT AS c1 FROM bg
                WHERE lang = 'en' GROUP BY w1),
    tgt_bi  AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM bg
                WHERE lang = 'en' GROUP BY w1, w2),
    gen_uni AS (SELECT w1, count(*)::BIGINT AS c1 FROM bg GROUP BY w1),
    gen_bi  AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM bg GROUP BY w1, w2),
    scored AS (
      SELECT bg.doc_id,
             ln((COALESCE(tb.c12, 0) + 0.5) / (COALESCE(tu.c1, 0) + 0.5 * v.v))
             - ln((gb.c12 + 0.5) / (gu.c1 + 0.5 * v.v)) AS lr
      FROM bg
      JOIN gen_bi gb ON bg.w1 = gb.w1 AND bg.w2 = gb.w2
      JOIN gen_uni gu ON bg.w1 = gu.w1
      LEFT JOIN tgt_bi tb ON bg.w1 = tb.w1 AND bg.w2 = tb.w2
      LEFT JOIN tgt_uni tu ON bg.w1 = tu.w1
      CROSS JOIN v)
    SELECT doc_id, round(avg(lr), 4) AS importance
    FROM scored GROUP BY doc_id
    ORDER BY importance DESC, doc_id
    LIMIT 20
    """,
    doc="DSIR-style importance resampling scores (Xie et al. 2023): "
    "rank corpus documents by how target-domain-like they are — the "
    "mean log-ratio of an add-0.5-smoothed bigram LM trained on the "
    "target slice (lang='en' stands in for the downstream domain) "
    "over one trained on the whole corpus. Docs the target model "
    "likes more than the general model float up; sampling by this "
    "score skews a pretraining mix toward the domain without "
    "hand-curated filters. Shape: the two count tables are map-side-"
    "combined aggs over the same exploded bigrams; scoring is "
    "shuffle joins on the bigram key (no broadcast of corpus-sized "
    "state), one per-doc agg, TakeOrdered top-20. The smoothing "
    "vocabulary is a scalar broadcast.",
)
def dsir_importance_scores(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "lang", F.split("text", " ").alias("toks"))
    n = F.size("toks")
    bg = toks.select(
        "doc_id",
        "lang",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("toks"), 1, n - 1),
                F.slice(F.col("toks"), 2, n - 1),
            )
        ).alias("p"),
    ).select("doc_id", "lang", F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
    # the bigram relation feeds SIX consumers (vocab, two models x two
    # count tables, the score join) — checkpoint it once or every
    # branch re-explodes the corpus (measured 7 scans without this)
    bg = bg.localCheckpoint(eager=True)
    v = (
        bg.select(F.col("w1").alias("w"))
        .unionAll(bg.select(F.col("w2").alias("w")))
        .agg(F.count_distinct("w").cast("double").alias("v"))
    )
    tgt = bg.where(F.col("lang") == "en")
    tgt_uni = tgt.groupBy("w1").agg(F.count("*").alias("tc1"))
    tgt_bi = tgt.groupBy("w1", "w2").agg(F.count("*").alias("tc12"))
    gen_uni = bg.groupBy("w1").agg(F.count("*").alias("gc1"))
    gen_bi = bg.groupBy("w1", "w2").agg(F.count("*").alias("gc12"))
    lr = F.log(
        (F.coalesce(F.col("tc12"), F.lit(0)) + 0.5)
        / (F.coalesce(F.col("tc1"), F.lit(0)) + 0.5 * F.col("v"))
    ) - F.log((F.col("gc12") + 0.5) / (F.col("gc1") + 0.5 * F.col("v")))
    return (
        bg.join(gen_bi, ["w1", "w2"])
        .join(gen_uni, "w1")
        .join(tgt_bi, ["w1", "w2"], "left")
        .join(tgt_uni, "w1", "left")
        .crossJoin(broadcast(v))
        .groupBy("doc_id")
        .agg(F.round(F.avg(lr), 4).alias("importance"))
        .orderBy(F.desc("importance"), "doc_id")
        .limit(20)
    )


@query(
    "diversity_distinct_ngrams",
    oracle="""
    WITH t AS (SELECT source, string_split(lower(text), ' ') AS toks
               FROM documents),
    uni AS (
      SELECT source, u.tok FROM t, UNNEST(toks) AS u(tok)),
    bi AS (
      SELECT source, toks[u.pos] || ' ' || toks[u.pos + 1] AS g
      FROM t, UNNEST(generate_series(1, len(toks) - 1)) AS u(pos))
    SELECT u.source,
           count(*)::BIGINT                            AS n_tokens,
           round(count(DISTINCT u.tok) / count(*)::DOUBLE, 6)  AS distinct_1,
           round(b.d2 / b.n2::DOUBLE, 6)               AS distinct_2
    FROM uni u
    JOIN (SELECT source, count(DISTINCT g) AS d2, count(*) AS n2
          FROM bi GROUP BY source) b ON u.source = b.source
    GROUP BY u.source, b.d2, b.n2
    ORDER BY u.source
    """,
    doc="Corpus diversity metrics (distinct-n): per source, the "
    "distinct-unigram and distinct-bigram ratios — the standard "
    "template-detection screen (a source whose distinct-2 collapses "
    "is boilerplate/mirrored content; self-BLEU's cheap dual). Two "
    "exploded aggregations with map-side partial distinct; state per "
    "source is its n-gram set, the same bound as source_overlap_"
    "matrix. One scan, no joins on raw rows.",
)
def diversity_distinct_ngrams(spark, sf_dir):
    from dso_import_spark.queries_pkg.util import spread_for_explode

    (docs,) = tables(spark, sf_dir, "documents")
    docs = spread_for_explode(docs, "doc_id", amplification=500)  # ~300x n-gram
    # amplification from a single input split otherwise runs
    # one task (see util.spread_for_explode)
    toks = docs.select("source", F.split(F.lower("text"), " ").alias("toks"))
    uni = toks.select("source", F.explode("toks").alias("tok"))
    n = F.size("toks")
    bi = toks.select(
        "source",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("toks"), 1, n - 1),
                F.slice(F.col("toks"), 2, n - 1),
            )
        ).alias("p"),
    ).select(
        "source", F.concat_ws(" ", F.col("p.0"), F.col("p.1")).alias("g")
    )
    uni_stats = uni.groupBy("source").agg(
        F.count("*").alias("n_tokens"),
        F.count_distinct("tok").alias("d1"),
    )
    bi_stats = bi.groupBy("source").agg(
        F.count("*").alias("n2"), F.count_distinct("g").alias("d2")
    )
    return (
        uni_stats.join(bi_stats, "source")
        .select(
            "source",
            "n_tokens",
            F.round(F.col("d1") / F.col("n_tokens").cast("double"), 6).alias("distinct_1"),
            F.round(F.col("d2") / F.col("n2").cast("double"), 6).alias("distinct_2"),
        )
        .orderBy("source")
    )
