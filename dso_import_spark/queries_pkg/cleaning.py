"""Corpus-cleaning queries: PII redaction and repetition-based quality
filters over the ``documents`` table.

The reference has no text surface at all (SURVEY.md §2.10); these are
north-star training-data operators in the C4/Gopher mold:

- ``pii_redaction_stats`` — regex redaction of emails / IPv4s / phone
  numbers with per-language audit counts. Pure ``regexp_count`` /
  ``regexp_replace`` Column expressions, so the whole pass is one
  narrow map stage: no shuffle until the final per-language aggregate,
  and whole-stage codegen keeps it JVM-side at 100 TB.
- ``repetition_quality_flags`` — Gopher-style repetition metrics
  (distinct-token ratio, top-token fraction, top-bigram fraction).
  Token/bigram counting is explode → two-level aggregation, which
  Spark executes with map-side partial aggregation on (doc_id, term):
  the shuffle carries only per-doc partial counts, never raw tokens
  repeated per occurrence.

The fixture corpus contains no real PII, so ``pii_redaction_stats``
plants deterministic synthetic PII derived from ``doc_id`` before
redacting — the audit counts then have a closed-form oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dso_import_spark.queries import query
from dso_import_spark.queries_pkg.util import tables

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{4}\b"


@query(
    "pii_redaction_stats",
    oracle=f"""
    WITH aug AS (
      SELECT lang,
             text || ' contact user' || doc_id || '@example.com from 10.0.'
                  || (doc_id % 256) || '.7 tel 555-'
                  || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS t
      FROM documents),
    red AS (
      SELECT lang,
             len(regexp_extract_all(t, '{EMAIL_RE}')) AS emails,
             len(regexp_extract_all(t, '{IPV4_RE}')) AS ips,
             len(regexp_extract_all(t, '{PHONE_RE}')) AS phones,
             regexp_replace(regexp_replace(regexp_replace(t,
                 '{EMAIL_RE}', '<EMAIL>', 'g'),
                 '{IPV4_RE}', '<IP>', 'g'),
                 '{PHONE_RE}', '<PHONE>', 'g') AS clean,
             length(t) AS len_before
      FROM aug)
    SELECT lang,
           count(*) AS n_docs,
           sum(emails)::BIGINT AS emails,
           sum(ips)::BIGINT AS ips,
           sum(phones)::BIGINT AS phones,
           sum(len(regexp_extract_all(clean, '{EMAIL_RE}'))
               + len(regexp_extract_all(clean, '{IPV4_RE}'))
               + len(regexp_extract_all(clean, '{PHONE_RE}')))::BIGINT
             AS residual,
           round(avg(len_before - length(clean)), 4) AS avg_len_delta
    FROM red GROUP BY lang
    """,
    doc="PII redaction (emails, IPv4s, phone numbers) with audit "
    "counts per language and a residual-match check proving the "
    "redacted corpus is clean. All regex work is JVM-side "
    "regexp_count/regexp_replace — one narrow stage before the "
    "per-language aggregate. Round-8 compute-amplification gate (the "
    "flesch lesson generalized): ~10 regex passes per input byte make "
    "splits-not-bytes the right parallelism unit, so the scan is "
    "volume-gated-spread first — measured at x100 docs: 41.5 s "
    "unspread (single-split scan does all the regex work in one task) "
    "vs 4.1 s spread, the worst unspread hazard in the audit "
    "(SCALING.md round-8).",
)
def pii_redaction_stats(spark, sf_dir):
    from dso_import_spark.queries_pkg.util import spread_for_explode

    (docs,) = tables(spark, sf_dir, "documents")
    docs = spread_for_explode(docs, "doc_id", amplification=32)
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id"),
        F.lit("@example.com from 10.0."),
        F.col("doc_id") % 256,
        F.lit(".7 tel 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    t = docs.select("lang", aug.alias("t"))

    def n_matches(col, pat):
        return F.regexp_count(col, F.lit(pat))

    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), EMAIL_RE, "<EMAIL>"),
            IPV4_RE,
            "<IP>",
        ),
        PHONE_RE,
        "<PHONE>",
    )
    red = t.select(
        "lang",
        n_matches(F.col("t"), EMAIL_RE).alias("emails"),
        n_matches(F.col("t"), IPV4_RE).alias("ips"),
        n_matches(F.col("t"), PHONE_RE).alias("phones"),
        clean.alias("clean"),
        F.length("t").alias("len_before"),
    )
    return red.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("emails").alias("emails"),
        F.sum("ips").alias("ips"),
        F.sum("phones").alias("phones"),
        F.sum(
            n_matches(F.col("clean"), EMAIL_RE)
            + n_matches(F.col("clean"), IPV4_RE)
            + n_matches(F.col("clean"), PHONE_RE)
        ).alias("residual"),
        F.round(F.avg(F.col("len_before") - F.length("clean")), 4).alias(
            "avg_len_delta"
        ),
    )


@query(
    "repetition_quality_flags",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS w
      FROM documents WHERE doc_id % 5 = 0),
    uni AS (
      SELECT doc_id, t, count(*) AS c
      FROM (SELECT doc_id, unnest(w) AS t FROM d) GROUP BY doc_id, t),
    um AS (
      SELECT doc_id, sum(c)::BIGINT AS n_tokens,
             count(*)::BIGINT AS n_distinct, max(c) AS top_c
      FROM uni GROUP BY doc_id),
    bg AS (
      SELECT doc_id, g, count(*) AS c
      FROM (SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(w) - 1),
                                         i -> w[i] || ' ' || w[i + 1])) AS g
            FROM d) GROUP BY doc_id, g),
    bm AS (
      SELECT doc_id, sum(c)::BIGINT AS n_bigrams, max(c) AS top_bc
      FROM bg GROUP BY doc_id),
    m AS (
      SELECT um.doc_id, n_tokens,
             round(n_distinct / n_tokens::DOUBLE, 4) AS distinct_ratio,
             round(top_c / n_tokens::DOUBLE, 4) AS top_token_frac,
             round(coalesce(top_bc, 0)
                   / greatest(coalesce(n_bigrams, 0), 1)::DOUBLE, 4)
               AS top_bigram_frac
      FROM um LEFT JOIN bm ON um.doc_id = bm.doc_id)
    SELECT doc_id, n_tokens, distinct_ratio, top_token_frac,
           top_bigram_frac,
           (distinct_ratio < 0.3 OR top_bigram_frac > 0.1) AS repetitive
    FROM m
    """,
    doc="Gopher-style repetition quality metrics per document: "
    "distinct-token ratio, top-token fraction, top-bigram fraction, "
    "and a repetitive flag from the rounded metrics (identical "
    "thresholds on both engines, so the flag is portable). Counting "
    "is explode -> groupBy with map-side combine; the bigram array "
    "guards Spark's descending sequence(1, 0) edge case on short "
    "docs.",
)
def repetition_quality_flags(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    d = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", F.split(F.col("text"), " ").alias("w")
    )
    uni = (
        d.select("doc_id", F.explode("w").alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    um = uni.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    # Spark sequence(1, 0) yields DESCENDING [1, 0]; guard docs with <2 tokens.
    bigrams = F.expr(
        "CASE WHEN size(w) >= 2 THEN "
        "transform(sequence(0, size(w) - 2), i -> concat_ws(' ', w[i], w[i+1])) "
        "ELSE array() END"
    )
    bg = (
        d.select("doc_id", F.explode(bigrams).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bm = bg.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bc")
    )
    m = um.join(bm, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.round(F.col("n_distinct") / F.col("n_tokens").cast("double"), 4).alias(
            "distinct_ratio"
        ),
        F.round(F.col("top_c") / F.col("n_tokens").cast("double"), 4).alias(
            "top_token_frac"
        ),
        F.round(
            F.coalesce(F.col("top_bc"), F.lit(0))
            / F.greatest(F.coalesce(F.col("n_bigrams"), F.lit(0)), F.lit(1)).cast(
                "double"
            ),
            4,
        ).alias("top_bigram_frac"),
    )
    return m.withColumn(
        "repetitive",
        (F.col("distinct_ratio") < 0.3) | (F.col("top_bigram_frac") > 0.1),
    )
