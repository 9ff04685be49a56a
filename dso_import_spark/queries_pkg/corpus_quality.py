"""Corpus-quality operators for training-data curation (round 3).

Three pipeline stages a large-scale LLM-data build runs between raw
scrape and tokenizer training, each a pure DataFrame plan with an
exact DuckDB oracle:

- ``boilerplate_ngram_mass`` — cross-document duplicated n-gram mass
  per document (the Gopher/CCNet "fraction of duplicated n-grams"
  quality signal): template/boilerplate text shows up as shingles
  shared by many documents.
- ``bpe_pair_merge_counts`` — adjacent-pair frequency counting, the
  inner statistic of one BPE-training merge round, distributed as a
  narrow array transform + one counting shuffle.
- ``length_quantile_filter`` — per-language adaptive length gates
  (exact p05/p95 quantiles) with kept/trimmed counts: absolute length
  cutoffs are wrong across languages, quantile gates are the
  production form.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dso_import_spark.queries import query
from dso_import_spark.queries_pkg.util import spread_for_explode, tables

# shingle width for the duplicated-mass signal: 2 on this fixture's
# 31-term vocabulary (961 possible bigrams — collisions are the
# point); real corpora use 8-13 grams (Gopher uses duplicate
# 5/6/7/8-grams) where the same plan applies unchanged
_BP_N = 2
# a shingle is "duplicated mass" when it appears in > 5% of documents
_BP_DF = 0.05


@query(
    "boilerplate_ngram_mass",
    oracle=f"""
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                      generate_subscripts(string_split(text, ' '), 1) AS pos
               FROM documents),
    sh AS (SELECT DISTINCT doc_id, g FROM (
             SELECT doc_id, w || ' ' || lead(w, 1) OVER
                      (PARTITION BY doc_id ORDER BY pos) AS g
             FROM t) z
           WHERE g IS NOT NULL),
    nd AS (SELECT count(DISTINCT doc_id) AS n FROM sh),
    dfq AS (SELECT g, count(*) AS df FROM sh GROUP BY g)
    SELECT sh.doc_id,
           count(*)::BIGINT AS n_shingles,
           round(avg(CASE WHEN dfq.df > {_BP_DF} * (SELECT n FROM nd)
                          THEN 1.0 ELSE 0.0 END), 6) AS dup_fraction
    FROM sh JOIN dfq USING (g)
    GROUP BY sh.doc_id
    ORDER BY sh.doc_id
    """,
    doc="Cross-document duplicated n-gram mass per document — the "
    "Gopher/CCNet boilerplate signal: the fraction of a document's "
    "distinct word shingles that occur in > 5% of all documents. "
    "Shingling is a narrow array transform (no window, no shuffle); "
    "the document-frequency table is one map-side-combined agg whose "
    "size is bounded by the shingle vocabulary, and the per-doc "
    "re-join is shuffle-on-shingle — at 100 TB the df table is "
    "Zipf-shaped and the >df-threshold flags compress it to the "
    "heavy tail, exactly the CCNet duplicated-paragraph-hash shape. "
    "n=2 here (31-term fixture vocabulary); production uses 5-8.",
)
def boilerplate_ngram_mass(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    docs = spread_for_explode(
        docs.select("doc_id", "text"), "doc_id", amplification=500
    )
    ws = F.split(F.col("text"), " ")
    # <n-gram-width docs have no shingle; without this filter
    # F.sequence(0, size-n) descends and element_at throws (the
    # oracle's lead()-NULL shingles drop those docs anyway)
    docs = docs.filter(F.size(ws) >= _BP_N)
    shingled = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(ws) - _BP_N),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(ws, i + j + 1) for j in range(_BP_N)]
                ),
            )
        ).alias("g"),
    ).distinct()
    n_docs = shingled.select("doc_id").distinct().count()
    dfq = shingled.groupBy("g").agg(F.count("*").alias("df"))
    return (
        shingled.join(dfq, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.round(
                F.avg(
                    F.when(F.col("df") > _BP_DF * n_docs, 1.0).otherwise(0.0)
                ),
                6,
            ).alias("dup_fraction"),
        )
        .orderBy("doc_id")
    )


@query(
    "bpe_pair_merge_counts",
    oracle="""
    WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
                      generate_subscripts(string_split(text, ' '), 1) AS pos
               FROM documents),
    pairs AS (SELECT w AS left_tok,
                     lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos)
                       AS right_tok
              FROM t),
    counted AS (SELECT left_tok, right_tok, count(*)::BIGINT AS pair_count
                FROM pairs WHERE right_tok IS NOT NULL
                GROUP BY left_tok, right_tok)
    SELECT rank, left_tok, right_tok, pair_count
    FROM (SELECT left_tok, right_tok, pair_count,
                 row_number() OVER (ORDER BY pair_count DESC,
                                    left_tok, right_tok) AS rank
          FROM counted)
    WHERE rank <= 20
    """,
    doc="Adjacent-pair frequency counting — the inner statistic of a "
    "BPE-training merge round (the argmax pair becomes the next "
    "merge): top-20 adjacent token pairs with deterministic "
    "tie-break. Pairs come from a narrow array zip (sequence + "
    "element_at, no window and no per-doc shuffle); the only "
    "exchange is the map-side-combined pair count, bounded by "
    "vocabulary², and the final top-k ranks only that collapsed "
    "table — the plan a distributed BPE trainer "
    "runs per merge round over 100 TB of tokenized text.",
)
def bpe_pair_merge_counts(spark, sf_dir):
    from pyspark.sql import Window

    (docs,) = tables(spark, sf_dir, "documents")
    docs = spread_for_explode(docs.select("text"), amplification=1000)
    ws = F.split(F.col("text"), " ")
    docs = docs.filter(F.size(ws) >= 2)  # see boilerplate_ngram_mass
    pairs = docs.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(ws) - 2),
                lambda i: F.struct(
                    F.element_at(ws, i + 1).alias("left_tok"),
                    F.element_at(ws, i + 2).alias("right_tok"),
                ),
            )
        ).alias("p")
    ).select("p.left_tok", "p.right_tok")
    counted = pairs.groupBy("left_tok", "right_tok").agg(
        F.count("*").alias("pair_count")
    )
    w = Window.orderBy(
        F.desc("pair_count"), F.col("left_tok"), F.col("right_tok")
    )
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select("rank", "left_tok", "right_tok", "pair_count")
    )


@query(
    "length_quantile_filter",
    oracle="""
    WITH gates AS (
      SELECT lang,
             quantile_cont(n_chars, 0.05) AS lo,
             quantile_cont(n_chars, 0.95) AS hi
      FROM documents GROUP BY lang
    )
    SELECT d.lang,
           round(any_value(g.lo), 4) AS p05_chars,
           round(any_value(g.hi), 4) AS p95_chars,
           sum(CASE WHEN d.n_chars BETWEEN g.lo AND g.hi
                    THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           sum(CASE WHEN d.n_chars < g.lo OR d.n_chars > g.hi
                    THEN 1 ELSE 0 END)::BIGINT AS n_trimmed
    FROM documents d JOIN gates g USING (lang)
    GROUP BY d.lang
    ORDER BY d.lang
    """,
    doc="Per-language adaptive length gates: exact p05/p95 character "
    "quantiles per language, then kept/trimmed counts against those "
    "gates — absolute length cutoffs misfire across languages (a "
    "short Chinese doc carries more content than an equal-length "
    "English one), so production length filtering is quantile-"
    "relative per language. The gate table is |langs| rows "
    "(broadcast back); exact quantiles per group need one sort-"
    "based agg — at 100 TB swap percentile for percentile_approx "
    "with identical plan shape, or compute gates on a sample.",
)
def length_quantile_filter(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    gates = docs.groupBy("lang").agg(
        F.percentile("n_chars", F.lit(0.05)).alias("lo"),
        F.percentile("n_chars", F.lit(0.95)).alias("hi"),
    )
    return (
        docs.join(F.broadcast(gates), "lang")
        .groupBy("lang")
        .agg(
            F.round(F.first("lo"), 4).alias("p05_chars"),
            F.round(F.first("hi"), 4).alias("p95_chars"),
            F.sum(
                F.when(
                    F.col("n_chars").between(F.col("lo"), F.col("hi")), 1
                ).otherwise(0)
            ).alias("n_kept"),
            F.sum(
                F.when(
                    (F.col("n_chars") < F.col("lo"))
                    | (F.col("n_chars") > F.col("hi")),
                    1,
                ).otherwise(0)
            ).alias("n_trimmed"),
        )
        .orderBy("lang")
    )
