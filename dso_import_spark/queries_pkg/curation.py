"""Corpus-curation statistics: quality gating and embedding prep.

Second round-3 batch of training-data-pipeline operators, covering the
two curation stages the earlier modules left open:

- text-quality *decisions* rather than raw signals:
  ``char_entropy_quality`` (gibberish detector),
  ``gopher_quality_gate`` (a composite rule funnel with per-rule drop
  counts, the shape of Gopher/C4 document filtering),
  ``ngram_novelty_decay`` (how fast a growing corpus stops
  contributing new shingles — the crawl-more-or-stop signal),
  ``word_zipf_slope`` (per-source Zipf exponent fit, a
  distribution-health check);
- embedding-corpus preparation:
  ``embedding_dim_stats`` (per-dimension moments for whitening/PCA
  prep), ``embedding_quantize_int8`` (symmetric per-dimension int8
  quantization with reconstruction-error report — the vector-DB
  compression step).

All are pure DataFrame plans with exact DuckDB oracles. Scale notes
live on each operator; the common shape is explode → map-side-combined
aggregate bounded by a small domain (charset, vocabulary, dims), which
is the only explode pattern that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dso_import_spark.queries import query
from dso_import_spark.queries_pkg.util import spread_for_explode, tables

# gopher_quality_gate rule constants (mirrored literally in the oracle)
_G_MIN_WORDS = 30
_G_MAX_WORDS = 120
_G_MIN_WLEN = 3.0
_G_MAX_WLEN = 8.0
_G_MIN_STOP = 2  # occurrences of {'the','a'}
_G_MAX_REP = 0.125  # max single-word share of the document


@query(
    "char_entropy_quality",
    oracle="""
    WITH ch AS (SELECT doc_id, source,
                       unnest(string_split(text, '')) AS ch
                FROM documents WHERE text <> ''),
    cnt AS (SELECT doc_id, source, ch, count(*)::DOUBLE AS c
            FROM ch GROUP BY doc_id, source, ch),
    ent AS (SELECT doc_id, source,
                   log2(sum(c)) - sum(c * log2(c)) / sum(c) AS h
            FROM cnt GROUP BY doc_id, source)
    SELECT source,
           count(*)::BIGINT AS n_docs,
           round(avg(h), 6) AS avg_entropy,
           round(min(h), 6) AS min_entropy,
           round(max(h), 6) AS max_entropy
    FROM ent GROUP BY source ORDER BY source
    """,
    doc="Per-document character-distribution Shannon entropy, "
    "aggregated per source — the classic gibberish/encoding-noise "
    "detector (mojibake and base64 blobs sit far from natural-language "
    "entropy; low-entropy docs are repeated-char padding). Uses the "
    "shuffle-free identity H = log2(n) - sum(c*log2 c)/n so one "
    "map-side-combined (doc, char) count feeds one per-doc aggregate; "
    "the char explode amplifies ~400x, so the input is hash-spread "
    "first (see spread_for_explode). The (doc, char) relation is "
    "bounded by |doc| x |charset| — at 100 TB the per-task combine "
    "collapses it to ~100 distinct chars per doc before any exchange.",
)
def char_entropy_quality(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    docs = docs.filter(F.col("text") != "")  # split('') yields [''] on
    # empty input in Spark but [] in DuckDB — filter symmetrically
    docs = spread_for_explode(docs.select("doc_id", "source", "text"), "doc_id")
    chars = docs.select(
        "doc_id", "source", F.explode(F.split("text", "")).alias("ch")
    )
    cnt = chars.groupBy("doc_id", "source", "ch").agg(
        F.count("*").cast("double").alias("c")
    )
    ent = cnt.groupBy("doc_id", "source").agg(
        (
            F.log2(F.sum("c"))
            - F.sum(F.col("c") * F.log2("c")) / F.sum("c")
        ).alias("h")
    )
    return (
        ent.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("h"), 6).alias("avg_entropy"),
            F.round(F.min("h"), 6).alias("min_entropy"),
            F.round(F.max("h"), 6).alias("max_entropy"),
        )
        .orderBy("source")
    )


@query(
    "gopher_quality_gate",
    oracle=f"""
    WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
               FROM documents),
    pw AS (SELECT doc_id, w, count(*)::DOUBLE AS c
           FROM w GROUP BY doc_id, w),
    pd AS (SELECT doc_id,
                  sum(c) AS n_words,
                  sum(c * length(w)) / sum(c) AS mean_wlen,
                  sum(CASE WHEN w IN ('the', 'a') THEN c ELSE 0 END)
                    AS n_stop,
                  max(c) AS max_c
           FROM pw GROUP BY doc_id),
    flags AS (SELECT
                CASE WHEN n_words < {_G_MIN_WORDS}
                       OR n_words > {_G_MAX_WORDS} THEN 1 ELSE 0 END
                  AS f_len,
                CASE WHEN mean_wlen < {_G_MIN_WLEN}
                       OR mean_wlen > {_G_MAX_WLEN} THEN 1 ELSE 0 END
                  AS f_wlen,
                CASE WHEN n_stop < {_G_MIN_STOP} THEN 1 ELSE 0 END
                  AS f_stop,
                CASE WHEN max_c / n_words > {_G_MAX_REP} THEN 1 ELSE 0
                  END AS f_rep
              FROM pd)
    SELECT count(*)::BIGINT AS n_docs,
           sum(f_len)::BIGINT AS n_fail_length,
           sum(f_wlen)::BIGINT AS n_fail_word_length,
           sum(f_stop)::BIGINT AS n_fail_stopwords,
           sum(f_rep)::BIGINT AS n_fail_repetition,
           sum(CASE WHEN f_len + f_wlen + f_stop + f_rep = 0
                    THEN 1 ELSE 0 END)::BIGINT AS n_pass
    FROM flags
    """,
    doc="Gopher-style composite document-quality gate as a funnel "
    "report: word-count bounds, mean-word-length bounds, minimum "
    "stopword occurrences, and a max single-word repetition share, "
    "with per-rule failure counts plus the pass-all count (the "
    "numbers a curation run publishes before committing a filter). "
    "One explode feeds one (doc, word) map-side-combined count from "
    "which every rule statistic derives in a single per-doc "
    "aggregate — no joins, no windows; the final funnel is a "
    "single-row global aggregate. Rule thresholds are constants "
    "mirrored in the oracle (Gopher's published values, rescaled to "
    "the fixture's 30-120-word documents).",
)
def gopher_quality_gate(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    docs = spread_for_explode(docs.select("doc_id", "text"), "doc_id")
    w = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    pw = w.groupBy("doc_id", "w").agg(F.count("*").cast("double").alias("c"))
    pd = pw.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        (F.sum(F.col("c") * F.length("w")) / F.sum("c")).alias("mean_wlen"),
        F.sum(
            F.when(F.col("w").isin("the", "a"), F.col("c")).otherwise(0.0)
        ).alias("n_stop"),
        F.max("c").alias("max_c"),
    )
    flags = pd.select(
        F.when(
            (F.col("n_words") < _G_MIN_WORDS)
            | (F.col("n_words") > _G_MAX_WORDS),
            1,
        )
        .otherwise(0)
        .alias("f_len"),
        F.when(
            (F.col("mean_wlen") < _G_MIN_WLEN)
            | (F.col("mean_wlen") > _G_MAX_WLEN),
            1,
        )
        .otherwise(0)
        .alias("f_wlen"),
        F.when(F.col("n_stop") < _G_MIN_STOP, 1).otherwise(0).alias("f_stop"),
        F.when(F.col("max_c") / F.col("n_words") > _G_MAX_REP, 1)
        .otherwise(0)
        .alias("f_rep"),
    )
    return flags.agg(
        F.count("*").alias("n_docs"),
        F.sum("f_len").alias("n_fail_length"),
        F.sum("f_wlen").alias("n_fail_word_length"),
        F.sum("f_stop").alias("n_fail_stopwords"),
        F.sum("f_rep").alias("n_fail_repetition"),
        F.sum(
            F.when(
                F.col("f_len")
                + F.col("f_wlen")
                + F.col("f_stop")
                + F.col("f_rep")
                == 0,
                1,
            ).otherwise(0)
        ).alias("n_pass"),
    )


@query(
    "ngram_novelty_decay",
    oracle="""
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                      generate_subscripts(string_split(text, ' '), 1)
                        AS pos
               FROM documents),
    sh AS (SELECT DISTINCT doc_id, g FROM (
             SELECT doc_id, w || ' ' || lead(w, 1) OVER
                      (PARTITION BY doc_id ORDER BY pos) AS g
             FROM t) z
           WHERE g IS NOT NULL),
    numer AS (SELECT first_doc AS doc_id, count(*)::DOUBLE AS n_new
              FROM (SELECT min(doc_id) AS first_doc FROM sh GROUP BY g)
              GROUP BY first_doc),
    denom AS (SELECT doc_id, count(*)::DOUBLE AS n_grams
              FROM sh GROUP BY doc_id),
    per_doc AS (SELECT d.doc_id,
                       coalesce(n.n_new, 0.0) / d.n_grams AS novelty
                FROM denom d LEFT JOIN numer n USING (doc_id)),
    bucketed AS (SELECT novelty,
                        ntile(10) OVER (ORDER BY doc_id) AS bucket
                 FROM per_doc)
    SELECT bucket, count(*)::BIGINT AS n_docs,
           round(avg(novelty), 6) AS avg_novelty
    FROM bucketed GROUP BY bucket ORDER BY bucket
    """,
    doc="N-gram novelty decay: for each ingestion decile (doc_id "
    "order), the average fraction of a document's distinct word "
    "shingles never seen in any earlier document — the curve a crawl "
    "operator reads to decide whether more of a source still adds "
    "information (novelty flat near zero means the source is mined "
    "out). Shingling is the boilerplate_ngram_mass plan; the novelty "
    "ratio needs NO gram-keyed join back: the per-doc numerator is "
    "how many shingles have min(doc_id) equal to it — a second count "
    "over the firsts aggregate — and the denominator is the per-doc "
    "shingle count, so the only join is doc-keyed between two "
    "corpus/1000-sized aggregates (measured: the join-back form was "
    "18.7x at x100 docs, this form stays linear). The only global "
    "window (ntile over doc order) runs on the per-document "
    "aggregate; at 100 TB replace it with range-bucketing on the "
    "known id/date domain for a window-free plan.",
)
def ngram_novelty_decay(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    docs = spread_for_explode(
        docs.select("doc_id", "text"), "doc_id", amplification=500
    )
    ws = F.split(F.col("text"), " ")
    # a <2-word doc has no shingle: F.sequence(0, size-2) would produce
    # the DESCENDING [0,-1] and element_at(ws, 2) throws in Spark 4 —
    # filter first (the oracle's lead()-NULL shingles drop them too)
    docs = docs.filter(F.size(ws) >= 2)
    sh = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(ws) - 2),
                lambda i: F.concat_ws(
                    " ", F.element_at(ws, i + 1), F.element_at(ws, i + 2)
                ),
            )
        ).alias("g"),
    ).distinct()
    sh = sh.localCheckpoint(eager=False)  # two consumers, one shingling
    numer = (
        sh.groupBy("g")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy(F.col("first_doc").alias("doc_id"))
        .agg(F.count("*").cast("double").alias("n_new"))
    )
    denom = sh.groupBy("doc_id").agg(
        F.count("*").cast("double").alias("n_grams")
    )
    per_doc = denom.join(numer, "doc_id", "left").select(
        "doc_id",
        (F.coalesce(F.col("n_new"), F.lit(0.0)) / F.col("n_grams")).alias(
            "novelty"
        ),
    )
    bucketed = per_doc.select(
        "novelty", F.ntile(10).over(Window.orderBy("doc_id")).alias("bucket")
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("novelty"), 6).alias("avg_novelty"),
        )
        .orderBy("bucket")
    )


@query(
    "word_zipf_slope",
    oracle="""
    WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS w
               FROM documents),
    freq AS (SELECT source, w, count(*)::DOUBLE AS c
             FROM w GROUP BY source, w),
    ranked AS (SELECT source, c,
                      row_number() OVER (PARTITION BY source
                                         ORDER BY c DESC, w) AS r
               FROM freq)
    SELECT source,
           count(*)::BIGINT AS n_terms,
           round(covar_pop(ln(c), ln(r))
                 / nullif(var_pop(ln(r)), 0), 6) AS zipf_slope
    FROM ranked GROUP BY source ORDER BY source
    """,
    doc="Per-source Zipf exponent: least-squares slope of log-"
    "frequency against log-rank over the source's word-frequency "
    "table — a distribution-health check for scraped sources "
    "(natural language sits near -1; template farms and spam runs "
    "flatten or steepen the curve). The frequency table is one "
    "map-side-combined count bounded by |source| x vocabulary; "
    "ranking windows only that collapsed table, and the fit is a "
    "closed-form covar/var aggregate — no iteration, no UDF.",
)
def word_zipf_slope(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    # no spread key: hash-by-source would cap the explode stage at
    # |sources| (~20) partitions; round-robin keeps every core busy and
    # the groupBy(source, w) reshuffles afterwards regardless
    docs = spread_for_explode(docs.select("source", "text"))
    w = docs.select("source", F.explode(F.split("text", " ")).alias("w"))
    freq = w.groupBy("source", "w").agg(
        F.count("*").cast("double").alias("c")
    )
    win = Window.partitionBy("source").orderBy(F.desc("c"), F.col("w"))
    ranked = freq.select(
        "source", "c", F.row_number().over(win).alias("r")
    )
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").alias("n_terms"),
            F.round(
                F.covar_pop(F.log("c"), F.log("r"))
                / F.nullif(F.var_pop(F.log("r")), F.lit(0.0)),
                6,
            ).alias("zipf_slope"),
        )
        .orderBy("source")
    )


@query(
    "embedding_dim_stats",
    oracle="""
    WITH v AS (SELECT unnest(embedding)::DOUBLE AS val,
                      generate_subscripts(embedding, 1) AS dim
               FROM embeddings)
    SELECT dim,
           count(*)::BIGINT AS n,
           round(avg(val), 6) + 0.0 AS mean_val,
           round(stddev_pop(val), 6) AS std_val,
           round(min(val), 6) AS min_val,
           round(max(val), 6) AS max_val
    FROM v GROUP BY dim ORDER BY dim
    """,
    doc="Per-dimension moments of the embedding corpus (mean, "
    "population stddev, min, max) — the statistics a whitening/PCA "
    "or normalization pass precomputes before indexing. posexplode "
    "then one map-side-combined aggregate whose result is bounded by "
    "the dimensionality (64 here), independent of corpus size: the "
    "canonical 100 TB-safe explode. Partial aggregation collapses "
    "each task to dims rows before the single exchange.",
)
def embedding_dim_stats(spark, sf_dir):
    (emb,) = tables(spark, sf_dir, "embeddings")
    v = emb.select(F.posexplode("embedding").alias("pos", "val")).select(
        (F.col("pos") + 1).alias("dim"), F.col("val").cast("double")
    )
    return (
        v.groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            (F.round(F.avg("val"), 6) + F.lit(0.0)).alias("mean_val"),
            F.round(F.stddev_pop("val"), 6).alias("std_val"),
            F.round(F.min("val"), 6).alias("min_val"),
            F.round(F.max("val"), 6).alias("max_val"),
        )
        .orderBy("dim")
    )


@query(
    "embedding_quantize_int8",
    oracle="""
    WITH v AS (SELECT unnest(embedding)::DOUBLE AS val,
                      generate_subscripts(embedding, 1) AS dim
               FROM embeddings),
    scales AS (SELECT dim, max(abs(val)) AS scale FROM v GROUP BY dim),
    q AS (SELECT v.dim, v.val, s.scale,
                 greatest(-127.0, least(127.0,
                   floor(v.val / s.scale * 127.0 + 0.5))) AS code
          FROM v JOIN scales s ON v.dim = s.dim),
    err AS (SELECT dim, scale,
                   val - code * scale / 127.0 AS e
            FROM q)
    SELECT dim,
           round(any_value(scale), 6) AS scale,
           round(avg(e * e) * 1e6, 6) AS mse_ppm,
           round(max(abs(e)), 6) AS max_abs_err
    FROM err GROUP BY dim ORDER BY dim
    """,
    doc="Symmetric per-dimension int8 quantization of the embedding "
    "corpus with a reconstruction-error report (per-dim scale, MSE "
    "in parts-per-million, max abs error) — the compression step a "
    "vector store runs before building an index, and the error "
    "numbers that decide int8 vs fp16. Two passes: a dims-bounded "
    "absmax aggregate, broadcast back onto the exploded values "
    "(scales table is dims rows — never a shuffle), then one "
    "dims-bounded error aggregate. Quantization uses an explicit "
    "floor(x+0.5) so both engines round identically.",
)
def embedding_quantize_int8(spark, sf_dir):
    (emb,) = tables(spark, sf_dir, "embeddings")
    v = emb.select(F.posexplode("embedding").alias("pos", "val")).select(
        (F.col("pos") + 1).alias("dim"), F.col("val").cast("double")
    )
    scales = v.groupBy("dim").agg(F.max(F.abs("val")).alias("scale"))
    q = v.join(F.broadcast(scales), "dim").select(
        "dim",
        "scale",
        F.greatest(
            F.lit(-127.0),
            F.least(
                F.lit(127.0),
                F.floor(F.col("val") / F.col("scale") * 127.0 + 0.5).cast(
                    "double"
                ),
            ),
        ).alias("code"),
        F.col("val"),
    )
    err = q.select(
        "dim",
        "scale",
        (F.col("val") - F.col("code") * F.col("scale") / 127.0).alias("e"),
    )
    return (
        err.groupBy("dim")
        .agg(
            F.round(F.first("scale"), 6).alias("scale"),
            F.round(F.avg(F.col("e") * F.col("e")) * 1e6, 6).alias("mse_ppm"),
            F.round(F.max(F.abs("e")), 6).alias("max_abs_err"),
        )
        .orderBy("dim")
    )


@query(
    "k_anonymity_audit",
    oracle="""
    WITH g AS (SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS n
               FROM customer GROUP BY c_nationkey, c_mktsegment)
    SELECT count(*)::BIGINT AS n_groups,
           sum(CASE WHEN n < 10 THEN 1 ELSE 0 END)::BIGINT
             AS n_risky_groups,
           sum(CASE WHEN n < 10 THEN n ELSE 0 END)::BIGINT
             AS n_risky_rows,
           min(n)::BIGINT AS min_group_size
    FROM g
    """,
    doc="k-anonymity audit over the quasi-identifier pair (nation, "
    "market segment): how many identifier combinations have fewer "
    "than k=10 members, and how many rows sit in those re-"
    "identifiable groups — the privacy gate a training-data release "
    "runs before shipping user-derived records. One map-side-"
    "combined group count bounded by the quasi-identifier domain, "
    "then a single-row summary of that collapsed table; at 100 TB "
    "the group table is |QI-domain| rows regardless of input size.",
)
def k_anonymity_audit(spark, sf_dir):
    (cust,) = tables(spark, sf_dir, "customer")
    g = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("n")
    )
    return g.agg(
        F.count("*").alias("n_groups"),
        F.sum(F.when(F.col("n") < 10, 1).otherwise(0)).alias(
            "n_risky_groups"
        ),
        F.sum(F.when(F.col("n") < 10, F.col("n")).otherwise(0)).alias(
            "n_risky_rows"
        ),
        F.min("n").alias("min_group_size"),
    )


@query(
    "join_key_skew_profile",
    oracle="""
    WITH per_key AS (SELECT user_id, count(*)::BIGINT AS n
                     FROM events GROUP BY user_id)
    SELECT count(*)::BIGINT AS n_keys,
           max(n)::BIGINT AS max_rows,
           round(avg(n), 4) AS avg_rows,
           round(quantile_cont(n, 0.5), 4) AS p50_rows,
           round(quantile_cont(n, 0.99), 4) AS p99_rows,
           round(max(n) / avg(n), 4) AS skew_ratio
    FROM per_key
    """,
    doc="Join/shuffle-key skew profile for a prospective key "
    "(events.user_id): per-key row counts collapsed to a single-row "
    "distribution summary (max, mean, exact p50/p99, max/mean skew "
    "ratio) — the diagnostic that decides between a plain shuffle "
    "join, AQE skew splitting, and explicit salting BEFORE burning a "
    "cluster-day discovering the hot key. One map-side-combined "
    "count (bounded by key cardinality) feeds a 1-row combine; exact "
    "percentiles run over the per-key aggregate — swap in "
    "percentile_approx at extreme key cardinality, same plan shape.",
)
def join_key_skew_profile(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    per_key = events.groupBy("user_id").agg(F.count("*").alias("n"))
    return per_key.agg(
        F.count("*").alias("n_keys"),
        F.max("n").alias("max_rows"),
        F.round(F.avg("n"), 4).alias("avg_rows"),
        F.round(F.percentile("n", F.lit(0.5)), 4).alias("p50_rows"),
        F.round(F.percentile("n", F.lit(0.99)), 4).alias("p99_rows"),
        F.round(F.max("n") / F.avg("n"), 4).alias("skew_ratio"),
    )


@query(
    "embedding_covariance",
    oracle="""
    WITH v AS (SELECT vec_id, unnest(embedding)::DOUBLE AS val,
                      generate_subscripts(embedding, 1) AS dim
               FROM embeddings)
    SELECT a.dim AS dim_i, b.dim AS dim_j,
           round(covar_pop(a.val, b.val), 6) + 0.0 AS cov
    FROM v a JOIN v b ON a.vec_id = b.vec_id AND a.dim <= b.dim
    GROUP BY a.dim, b.dim
    ORDER BY dim_i, dim_j
    """,
    doc="Upper-triangle covariance matrix of the embedding corpus — "
    "the input to PCA/whitening (eigendecomposition of the dims x "
    "dims result is a bounded driver-side step, like k-means "
    "centroid updates). Scale shape: per-dimension means come from "
    "the dims-bounded stats aggregate (broadcast back via a 1-row "
    "cross join); then ONE Arrow batch pass computes a BLAS X^T X "
    "partial per ~10k-vector batch (2080 upper-triangle rows each) "
    "and the final combine sums partials — dims^2-bounded output, "
    "no self-join, no per-product rows. The pure-Column explode of "
    "dims(dims+1)/2 products per VECTOR measured 105 s at x100 "
    "vectors (a billion generated rows); the batch-matmul partials "
    "measure 2.8 s (2.1x for 100x data) — the textbook case where "
    "a vectorized Pandas stage beats built-in explode (SCALING.md). "
    "Oracle uses the (vec_id-join x covar_pop) formulation so both "
    "engines reach the same matrix by different plans; both sides "
    "add +0.0 after round() to collapse IEEE -0.0 on exactly-zero "
    "cells.",
)
def embedding_covariance(spark, sf_dir):
    (emb,) = tables(spark, sf_dir, "embeddings")
    v = emb.select(
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "ve"
        )
    )
    means_row = (
        v.select(F.posexplode("ve").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.avg("val").alias("m"))
        .groupBy()
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("mv")
        )
    )
    centred = v.crossJoin(F.broadcast(means_row)).select(
        F.zip_with(
            F.col("ve"), F.col("mv"), lambda x, m: x - m
        ).alias("c")
    )

    # Arrow-batched BLAS partials: each batch emits ONE dims x dims
    # X^T X partial (as upper-triangle rows) + its row count — a pure
    # Column explode of the dims(dims+1)/2 products per VECTOR was
    # measured at 29x for x100 vectors (a billion generated rows);
    # the per-BATCH matmul emits 2080 rows per ~10k-vector batch.
    from dso_import_spark.operators.similarity import gram_partial_batches

    pairs = centred.mapInPandas(
        gram_partial_batches("c", base_index=1),
        "dim_i int, dim_j int, s double, n long",
    )
    return (
        pairs.groupBy("dim_i", "dim_j")
        .agg(
            (F.round(F.sum("s") / F.sum("n"), 6) + F.lit(0.0)).alias("cov")
        )
        .orderBy("dim_i", "dim_j")
    )
