"""ML-data preparation, evaluation, and pipeline-governance operators.

Seventeen operators a training-data pipeline runs between ingest and
training, each with an end-to-end DuckDB oracle:

Certification tier:
- ``semdedup_autok_kernel``: the k >= _KERNEL_MIN_K differential the
  matmul Lloyd kernel never had (review finding r4) — auto_k_target=7
  forces every assignment pass through the Arrow kernel while the
  oracle replays everything with sequential folds.
- ``minhash_recall_cert``: the dedup analog of the ANN recall report —
  recall per similarity decile of the banded candidate set against
  exact-Jaccard ground truth, tracing the LSH S-curve.
- ``join_cardinality_estimate``: the System R histogram estimator vs
  the exact join count — ANALYZE-grade statistics, certified.
- ``selectivity_estimate_cert``: equi-depth histogram + within-bin
  interpolation vs the exact filter fraction — the other half of
  optimizer statistics.

Sampling / splitting tier:
- ``stratified_sample_exact``: exact ceil(rate·n) per-stratum
  allocation via an engine-replayable Knuth-mixed permutation.
- ``weighted_sample_es``: Efraimidis–Spirakis weighted sampling
  without replacement (key = ln(u)/w, per-stratum top-k).

Quality / relevance tier:
- ``shingle_containment``: word-3-gram containment near-dup pairs —
  the quote/boilerplate-inclusion detector Jaccard misses.
- ``bm25_scoring``: BM25 against a fixed query (tf saturation +
  length normalization, broadcast corpus constants).
- ``source_quality_blocklist``: domain-level blocklisting (duplicate
  and short-doc shares per source), the RefinedWeb/Dolma discipline.
- ``woe_feature_binning``: weight-of-evidence + IV per price decile.

Model-eval tier:
- ``decile_lift_table``: lift/gains per score decile, percentile-
  binned (no global sort).
- ``auc_mann_whitney``: exact tie-aware AUC via distinct-score
  grouping + two-phase bucketed ranking — bounded window state only.

Monitoring / governance tier:
- ``cusum_changepoint``: CUSUM mean-shift detection via the prefix-sum
  identity s_d = S_d − min(0, min S_j) — recursion as algebra.
- ``wasserstein_drift``: exact W1 (earth-mover) drift per series —
  the mass-distance PSI's bins and KS's max-gap both miss.
- ``l_diversity_audit``: the disclosure gate k-anonymity misses.
- ``theil_sen_capped``: Theil–Sen with the per-group pair cap the
  100 TB docstring prescribes — quadratic term made constant.
- ``dp_sensitivity_audit``: per-user contribution bounds and the p99
  clamp — the sensitivity analysis every DP release runs first.
- ``ridge_regression_normal_eq``: closed-form ridge as ONE 9-value
  aggregate + a Cramer solve — training as aggregation.

No UDFs; the only Python-side compute is the kernel query's Arrow
matmul, which is the operator under test.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dso_import_spark.queries import query
from dso_import_spark.queries_pkg.util import tables

# ---------------------------------------------------------------------------
# SemDeDup auto-k at kernel scale (k >= _KERNEL_MIN_K = 64)
# ---------------------------------------------------------------------------

_KERNEL_TARGET = 7  # 500 fixture vectors // 7 = 71 clusters > _KERNEL_MIN_K


def _autok_oracle(target: int) -> str:
    """The semdedup auto-k replay (same derivation as extras.py's
    semdedup_prune_autok oracle) with the cluster-size target
    parameterized, so k = max(4, n // target) comes from the oracle's
    own count()."""
    return f"""
    WITH z AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
    n AS (SELECT vec_id, ve, list_dot_product(ve, ve) AS na FROM z),
    c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, ve AS cv
           FROM (SELECT vec_id, ve FROM z ORDER BY vec_id
                 LIMIT (SELECT greatest(4, count(*) // {target}) FROM z))),
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
           FROM c0 LEFT JOIN c1new USING (c)),
    av AS (
      SELECT vec_id, ve, cluster FROM (
        SELECT n.vec_id, n.ve, c1.c AS cluster,
               row_number() OVER (
                 PARTITION BY n.vec_id
                 ORDER BY (n.na + list_dot_product(c1.cv, c1.cv))
                          - (2 * list_dot_product(n.ve, c1.cv)), c1.c) AS rn
        FROM n CROSS JOIN c1) WHERE rn = 1),
    un AS (
      SELECT vec_id, cluster,
             list_transform(ve, x -> x / sqrt(list_dot_product(ve, ve)))
               AS u
      FROM av),
    dup AS (
      SELECT dup_id, max(cos_sim) AS max_sim_lower FROM (
        SELECT b.vec_id AS dup_id,
               round(list_dot_product(a.u, b.u), 6) AS cos_sim
        FROM un a JOIN un b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id)
      WHERE cos_sim >= 0.35 GROUP BY dup_id)
    SELECT av.vec_id, av.cluster,
           dup.dup_id IS NOT NULL AS dropped, dup.max_sim_lower
    FROM av LEFT JOIN dup ON av.vec_id = dup.dup_id
    """


@query(
    "semdedup_autok_kernel",
    oracle=_autok_oracle(_KERNEL_TARGET),
    doc="SemDeDup auto-k forced into the matmul-kernel regime: "
    f"auto_k_target={_KERNEL_TARGET} makes k = n//{_KERNEL_TARGET} "
    "(71 on the 500-vector fixture, 285 at sf0.1) — above "
    "_KERNEL_MIN_K=64, so BOTH Lloyd assignment passes run through "
    "the Arrow-batched (batch×dims)@(dims×k) kernel "
    "(operators/similarity.py:_assign_kernel) rather than the "
    "literal-centroid expression. The oracle replays init, one "
    "update, final assignment, and the epsilon-ball drop with "
    "sequential-fold dot products — end-to-end agreement is the "
    "kernel's differential certification on real data at every SF "
    "(review finding r4: the kernel path was previously never "
    "oracle-checked; semdedup_prune_autok resolves to k=4 on "
    "fixtures). BLAS vs fold summation-order ulps cannot flip the "
    "argmin on this data: nearest-centroid margins are ~1e-2, ulps "
    "~1e-13.",
)
def semdedup_autok_kernel(spark, sf_dir):
    from dso_import_spark.operators.similarity import semantic_dedup

    (emb,) = tables(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, k=4, iters=2, threshold=0.35, auto_k_target=_KERNEL_TARGET
    )


# ---------------------------------------------------------------------------
# Shingle containment near-dup
# ---------------------------------------------------------------------------


@query(
    "shingle_containment",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, lang, string_split_regex(text, '\s+') AS t
      FROM documents),
    sh AS (
      SELECT doc_id, lang,
             list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                            for i in range(1, greatest(len(t) - 1, 1))]) AS s
      FROM toks),
    ex AS (SELECT doc_id, lang, len(s)::BIGINT AS n_sh, unnest(s) AS shingle
           FROM sh),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS n_shared
      FROM ex a JOIN ex b
        ON a.shingle = b.shingle AND a.lang = b.lang AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4)
    SELECT id_a, id_b,
           round(n_shared / least(n_a, n_b), 4) AS containment
    FROM shared
    WHERE round(n_shared / least(n_a, n_b), 4) >= 0.1
    """,
    doc="Word-3-gram shingle CONTAINMENT pairs (Broder's resemblance "
    "vs containment distinction): |A∩B| / min(|A|,|B|) >= 0.1 over "
    "distinct shingle sets, lang-blocked. Containment is the "
    "quote/boilerplate-inclusion detector — a 30-word passage pasted "
    "into a 300-word doc scores ~1.0 here and ~0.1 on Jaccard. "
    "Shingles are selective enough that the (shingle, lang) equi-join "
    "fans out near 1:1 with no max-df cap (3.7k candidate pairs from "
    "500 docs); at 100 TB the same shape runs off a MinHash-LSH "
    "candidate set instead of all shared shingles, with this exact "
    "verify stage unchanged.",
)
def shingle_containment(spark, sf_dir):
    from dso_import_spark.operators.dedup import shingle_containment_pairs

    (docs,) = tables(spark, sf_dir, "documents")
    return shingle_containment_pairs(
        docs, "text", "doc_id", block_cols=["lang"], threshold=0.1
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------

# Knuth multiplicative mix on the 31-bit-masked id (house pattern from
# placement.py): a pseudorandom but engine-identical total order inside
# each stratum, so "the first ceil(rate·n)" is a deterministic sample.
_SMIX = 2654435761
_SSHIFT = 13
_SMASK = 1 << 31
# rank bucket: the Knuth key tops out at ((2^31-1) * _SMIX) >> _SSHIFT
# ~ 2^49.3, so >> 42 yields <= ~170 buckets — the bucket-offset
# relation stays |strata| x |buckets| bounded
_SBUCKET_SHIFT = 42
_RATE = 0.1


@query(
    "stratified_sample_exact",
    oracle=f"""
    WITH keyed AS (
      SELECT lang, source, doc_id, n_chars,
             (((doc_id % {_SMASK}) * {_SMIX}) >> {_SSHIFT}) AS skey
      FROM documents),
    ranked AS (
      SELECT lang, source, doc_id, n_chars,
             row_number() OVER (PARTITION BY lang, source
                                ORDER BY skey, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang, source) AS n_total
      FROM keyed)
    SELECT lang, source, max(n_total)::BIGINT AS n_total,
           count(*) FILTER (WHERE rn <= CAST(ceil(n_total * {_RATE}) AS BIGINT))
             ::BIGINT AS n_sampled,
           sum(n_chars) FILTER (WHERE rn <= CAST(ceil(n_total * {_RATE}) AS BIGINT))
             ::BIGINT AS sampled_chars,
           sum(doc_id) FILTER (WHERE rn <= CAST(ceil(n_total * {_RATE}) AS BIGINT))
             ::BIGINT AS sampled_id_sum
    FROM ranked GROUP BY lang, source
    """,
    doc="Deterministic stratified sampling with EXACT allocation: "
    f"every (lang, source) stratum contributes ceil({_RATE}·n) docs — "
    "the eval-carve-out discipline Bernoulli sampling can't give "
    "(its stratum counts drift, skewing the mix precisely for small "
    "strata). Order inside a stratum is the Knuth-mixed doc id (a "
    "pseudorandom, engine-replayable permutation), so the sample is "
    "stable under reruns AND re-stratification. Round 12 (VERDICT "
    "r11 #4): the rank is BUCKET-OFFSET (the spearman_rank_"
    "correlation shape) instead of one row_number window per stratum "
    "— a hot stratum holding most of a 100 TB corpus would serialize "
    "through that window's single sort task. The Knuth key's high "
    "bits form <= ~170 buckets, per-(stratum, bucket) counts "
    "prefix-sum into offsets over that bounded relation, and "
    "row_number runs per (stratum, bucket) partition; the bucket is "
    "a monotone prefix of the (skey, doc_id) sort key, so the total "
    "order — and the unchanged plain-window oracle — is identical. "
    "Stratum totals come from a map-side-combined groupBy broadcast "
    "back, not a count window (same single-task hazard). "
    "sampled_id_sum is the checksum pinning WHICH docs were chosen, "
    "not just how many.",
)
def stratified_sample_exact(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    skey = F.shiftright((F.col("doc_id") % _SMASK) * F.lit(_SMIX), _SSHIFT)
    keyed = docs.select(
        "lang",
        "source",
        "doc_id",
        "n_chars",
        skey.alias("skey"),
        F.shiftright(skey, _SBUCKET_SHIFT).alias("bkt"),
    )
    # one bounded aggregate serves both the offsets and the stratum
    # totals (review pass 1: a separate tot groupBy was a third full
    # corpus scan)
    bstats = keyed.groupBy("lang", "source", "bkt").agg(
        F.count(F.lit(1)).cast("long").alias("btot")
    )
    w_off = (
        Window.partitionBy("lang", "source")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("lang", "source")
    boff = bstats.select(
        "lang",
        "source",
        "bkt",
        F.coalesce(F.sum("btot").over(w_off), F.lit(0))
        .cast("long")
        .alias("off"),
        F.sum("btot").over(w_all).cast("long").alias("n_total"),
    )
    w_in = Window.partitionBy("lang", "source", "bkt").orderBy(
        "skey", "doc_id"
    )
    # NULL-SAFE stratum join (review pass 1, reproduced divergence):
    # NULL lang/source are strata — DuckDB's PARTITION BY/GROUP BY
    # keep them, and the pre-round-12 pure-window form did too; a
    # null-intolerant equi-join here silently dropped every NULL-key
    # stratum from the sample
    k, o = keyed.alias("k"), boff.alias("o")
    ranked = k.join(
        F.broadcast(o),
        F.col("k.lang").eqNullSafe(F.col("o.lang"))
        & F.col("k.source").eqNullSafe(F.col("o.source"))
        & F.col("k.bkt").eqNullSafe(F.col("o.bkt")),
    ).select(
        F.col("k.lang").alias("lang"),
        F.col("k.source").alias("source"),
        F.col("k.skey").alias("skey"),
        F.col("k.bkt").alias("bkt"),
        F.col("k.doc_id").alias("doc_id"),
        F.col("k.n_chars").alias("n_chars"),
        F.col("o.off").alias("off"),
        F.col("o.n_total").alias("n_total"),
    )
    ranked = ranked.select(
        "lang",
        "source",
        "doc_id",
        "n_chars",
        "n_total",
        (F.col("off") + F.row_number().over(w_in)).alias("rn"),
    )
    picked = F.col("rn") <= F.ceil(F.col("n_total") * _RATE).cast("long")
    return ranked.groupBy("lang", "source").agg(
        F.max("n_total").cast("long").alias("n_total"),
        F.sum(picked.cast("long")).cast("long").alias("n_sampled"),
        F.sum(F.when(picked, F.col("n_chars"))).cast("long").alias(
            "sampled_chars"
        ),
        F.sum(F.when(picked, F.col("doc_id"))).cast("long").alias(
            "sampled_id_sum"
        ),
    )


# ---------------------------------------------------------------------------
# Weight-of-evidence feature binning
# ---------------------------------------------------------------------------

_WOE_FRACTIONS = [k / 10 for k in range(1, 10)]


@query(
    "woe_feature_binning",
    oracle=f"""
    WITH bounds AS (
      SELECT quantile_cont(o_totalprice, {_WOE_FRACTIONS}) AS bs FROM orders),
    binned AS (
      SELECT 1 + len(list_filter(bs, b -> o_totalprice > b)) AS bin,
             (o_orderstatus = 'F')::INT AS is_event
      FROM orders CROSS JOIN bounds),
    per_bin AS (
      SELECT bin, sum(is_event)::BIGINT AS n_event,
             sum(1 - is_event)::BIGINT AS n_nonevent
      FROM binned GROUP BY bin),
    tot AS (
      SELECT sum(n_event) AS ge, sum(n_nonevent) AS gn FROM per_bin)
    SELECT bin, n_event, n_nonevent,
           CAST(round(1000 * ln((n_event * gn) * 1.0 / (ge * n_nonevent)))
                AS BIGINT) AS woe_mill,
           round((n_event * 1.0 / ge - n_nonevent * 1.0 / gn)
                 * CAST(round(1000 * ln((n_event * gn) * 1.0
                                        / (ge * n_nonevent))) AS BIGINT)
                 / 1000.0, 6) AS iv_part
    FROM per_bin, tot
    """,
    doc="Weight-of-evidence + information-value per price decile — "
    "the classic credit-scoring / feature-screening statistic "
    "(event = order status 'F'). Deciles come from ONE exact "
    "percentile aggregate broadcast back (never a global-sort ntile "
    "— the same histogram discipline as equi_depth_histogram, and at "
    "100 TB the same approx_percentile swap applies); WoE is "
    "quantized to millis (round(1000·ln(odds-ratio))) so the only "
    "libm call is compared at a granularity ~1e9 coarser than any "
    "cross-engine ulp, and the IV contribution reuses the quantized "
    "WoE. Assumes every bin has both classes (true at every SF: "
    "~1500 rows/bin, 3 statuses); a production gate would Laplace-"
    "smooth the counts.",
)
def woe_feature_binning(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    price = orders.select(
        F.col("o_totalprice").alias("p"),
        (F.col("o_orderstatus") == "F").cast("int").alias("is_event"),
    )
    bounds = price.agg(
        F.percentile(
            "p", F.array(*[F.lit(f) for f in _WOE_FRACTIONS])
        ).alias("bs")
    )
    per_bin = (
        price.crossJoin(F.broadcast(bounds))
        .select(
            (
                F.lit(1) + F.size(F.filter("bs", lambda b: F.col("p") > b))
            ).alias("bin"),
            "is_event",
        )
        .groupBy("bin")
        .agg(
            F.sum("is_event").cast("long").alias("n_event"),
            F.sum(1 - F.col("is_event")).cast("long").alias("n_nonevent"),
        )
    )
    tot = per_bin.agg(
        F.sum("n_event").alias("ge"), F.sum("n_nonevent").alias("gn")
    )
    odds = (F.col("n_event") * F.col("gn")) * F.lit(1.0) / (
        F.col("ge") * F.col("n_nonevent")
    )
    woe_mill = F.round(F.lit(1000) * F.log(odds)).cast("long")
    return per_bin.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_event",
        "n_nonevent",
        woe_mill.alias("woe_mill"),
        F.round(
            (
                F.col("n_event") * F.lit(1.0) / F.col("ge")
                - F.col("n_nonevent") * F.lit(1.0) / F.col("gn")
            )
            * woe_mill
            / F.lit(1000.0),
            6,
        ).alias("iv_part"),
    )


# ---------------------------------------------------------------------------
# l-diversity audit
# ---------------------------------------------------------------------------

_L_MIN = 3  # all three order statuses must appear in a releasable group


@query(
    "l_diversity_audit",
    oracle=f"""
    SELECT o_orderpriority AS priority,
           extract(year FROM o_orderdate)::BIGINT AS yr,
           count(*)::BIGINT AS n_orders,
           count(DISTINCT o_orderstatus)::BIGINT AS l_distinct,
           (count(DISTINCT o_orderstatus) >= {_L_MIN}) AS releasable
    FROM orders GROUP BY 1, 2
    """,
    doc="l-diversity audit over the (priority, order-year) quasi-"
    "identifier: a group is releasable only when >= l distinct "
    "sensitive values (order status) appear in it — the disclosure "
    "gate k-anonymity misses (a 1000-row group whose status is "
    "constant still reveals every member's status; see Machanavajjhala "
    "et al. 2007). Complements curation.py's k_anonymity_audit. One "
    "hash agg with a count-distinct — Spark plans it as the standard "
    "two-phase expand/agg, uniform keys, no skew.",
)
def l_diversity_audit(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    return orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.year("o_orderdate").cast("long").alias("yr"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.countDistinct("o_orderstatus").cast("long").alias("l_distinct"),
        (F.countDistinct("o_orderstatus") >= _L_MIN).alias("releasable"),
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection
# ---------------------------------------------------------------------------

_CUSUM_DRIFT = 0.5  # slack per step, in sd units (standard CUSUM K)
_CUSUM_H = 4.0  # alarm threshold, in sd units


@query(
    "cusum_changepoint",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, ts::DATE AS day, round(avg(value), 6) AS v
      FROM events GROUP BY 1, 2),
    stats AS (
      SELECT event_type, round(avg(v), 6) AS mu,
             round(stddev_samp(v), 6) AS sd
      FROM daily GROUP BY 1),
    x AS (
      SELECT d.event_type, d.day,
             round((d.v - s.mu) / s.sd, 6) - {_CUSUM_DRIFT} AS xi
      FROM daily d JOIN stats s USING (event_type)),
    prefix AS (
      SELECT event_type, day,
             sum(xi) OVER (PARTITION BY event_type ORDER BY day
                           ROWS UNBOUNDED PRECEDING) AS s
      FROM x),
    runmin AS (
      SELECT event_type, day, s,
             min(s) OVER (PARTITION BY event_type ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS mn
      FROM prefix)
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           round(s - least(mn, 0), 6) AS cusum,
           (round(s - least(mn, 0), 6) > {_CUSUM_H}) AS alarm
    FROM runmin
    """,
    doc="One-sided CUSUM mean-shift detection per event-type daily "
    "series (Page 1954): the textbook recursion "
    "s_d = max(0, s_(d-1) + z_d - K) is replayed EXACTLY by the "
    "prefix-sum identity s_d = S_d - min(0, min_(j<=d) S_j), which "
    "needs only two stacked running windows — no recursion, no UDF, "
    "no driver loop. Deviations are standardized per series "
    "(K = 0.5 sd, alarm at 4 sd, the standard tuning); every "
    "floating intermediate is rounded to 6dp BEFORE entering the "
    "running sums, and both engines then fold identical decimals in "
    "the same day order, so the windows are bit-identical. Scale: "
    "partitioned by event_type — embarrassingly parallel per series; "
    "the daily pre-agg is map-side combinable.",
)
def cusum_changepoint(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.round(F.avg("value"), 6).alias("v"))
    stats = daily.groupBy("event_type").agg(
        F.round(F.avg("v"), 6).alias("mu"),
        F.round(F.stddev_samp("v"), 6).alias("sd"),
    )
    x = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        (
            F.round((F.col("v") - F.col("mu")) / F.col("sd"), 6)
            - F.lit(_CUSUM_DRIFT)
        ).alias("xi"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prefix = x.select(
        "event_type", "day", F.sum("xi").over(w).alias("s")
    )
    runmin = prefix.select(
        "event_type", "day", "s", F.min("s").over(w).alias("mn")
    )
    cusum = F.round(F.col("s") - F.least(F.col("mn"), F.lit(0.0)), 6)
    return runmin.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        cusum.alias("cusum"),
        (cusum > _CUSUM_H).alias("alarm"),
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis A-Res)
# ---------------------------------------------------------------------------

_ES_K = 20  # sample size per stratum
# deterministic uniform in (0,1): Knuth-mixed id reduced to 6 decimal
# digits, +0.5 so u is never 0 (ln(0) = -inf) — engine-identical
_ES_U = "((((doc_id % 2147483648) * 2654435761) >> 13) % 1000000 + 0.5) / 1000000.0"


@query(
    "weighted_sample_es",
    oracle=f"""
    WITH keyed AS (
      SELECT lang, doc_id, n_chars,
             round(ln({_ES_U}) / n_chars, 12) AS akey
      FROM documents),
    ranked AS (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY lang
                                ORDER BY akey DESC, doc_id) AS rn
      FROM keyed)
    SELECT lang, count(*)::BIGINT AS n_sampled,
           sum(doc_id)::BIGINT AS sampled_id_sum,
           sum(n_chars)::BIGINT AS sampled_chars
    FROM ranked WHERE rn <= {_ES_K} GROUP BY lang
    """,
    doc="Weighted sampling WITHOUT replacement per language stratum — "
    "the Efraimidis–Spirakis A-Res algorithm (2006): each item draws "
    "key u^(1/w) (rank-equivalently ln(u)/w) from a uniform u and the "
    f"k={_ES_K} largest keys are the sample, giving inclusion odds "
    "proportional to weight (n_chars) in ONE pass with no sequential "
    "state — the only distributed-friendly weighted-without-"
    "replacement scheme, and the one Spark's own sampleBy cannot do "
    "(it is Bernoulli per stratum, not weighted). The uniform is a "
    "Knuth-mixed doc id (engine-replayable); the key is quantized to "
    "12dp so the lone libm ln() is compared far coarser than "
    "cross-engine ulps. One per-stratum window (top-k via WindowGroup"
    "Limit, no global sort); sampled_id_sum pins WHICH docs.",
)
def weighted_sample_es(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    u = (
        (F.shiftright((F.col("doc_id") % _SMASK) * F.lit(_SMIX), _SSHIFT)
         % 1000000)
        + F.lit(0.5)
    ) / F.lit(1000000.0)
    keyed = docs.select(
        "lang",
        "doc_id",
        "n_chars",
        F.round(F.log(u) / F.col("n_chars"), 12).alias("akey"),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("akey"), "doc_id")
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _ES_K)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sampled"),
            F.sum("doc_id").cast("long").alias("sampled_id_sum"),
            F.sum("n_chars").cast("long").alias("sampled_chars"),
        )
    )


# ---------------------------------------------------------------------------
# BM25 relevance scoring
# ---------------------------------------------------------------------------

_BM25_TERMS = ["table", "spark", "merge"]
_BM25_K1 = 1.2
_BM25_B = 0.75


@query(
    "bm25_scoring",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    dl AS (SELECT doc_id, count(*)::BIGINT AS dlen FROM toks GROUP BY doc_id),
    stats AS (
      SELECT (SELECT count(*) FROM documents) AS n_docs,
             (SELECT round(avg(dlen), 6) FROM dl) AS avgdl),
    tf AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks
      WHERE term IN ({", ".join("'" + t + "'" for t in _BM25_TERMS)})
      GROUP BY doc_id, term),
    df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             sum(ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                 * tf.tf * ({_BM25_K1} + 1.0)
                 / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                    + {_BM25_B} * dl.dlen / stats.avgdl))) AS s
      FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats
      GROUP BY tf.doc_id)
    SELECT doc_id, CAST(round(1000 * s) AS BIGINT) AS bm25_mill
    FROM scored
    """,
    doc="BM25 relevance scoring (Robertson–Spärck Jones) of every "
    f"document against the fixed query {_BM25_TERMS}: the retrieval "
    "scorer behind corpus search and hard-negative mining, distinct "
    "from tf-idf by term-frequency saturation (k1) and document-"
    "length normalization (b). Shape: term filter BEFORE the tf "
    "aggregate (only query terms survive the explode), a |Q|-row df "
    "relation and a 1-row (N, avgdl) relation broadcast back, one "
    "per-doc combine. avgdl is rounded before use and the score is "
    "mill-quantized, so the ln() idf is compared far coarser than "
    "libm ulps. At 100 TB: identical plan — the explode is the "
    "corpus scan, everything after the term filter is |Q|-bounded "
    "per doc.",
)
def bm25_scoring(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    from dso_import_spark.functions.text import tokens

    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("dlen"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    avgdl = dl.select(F.round(F.avg("dlen"), 6).alias("avgdl"))
    tf = (
        toks.filter(F.col("term").isin(_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + _BM25_K1 * (
        1.0 - _BM25_B + _BM25_B * F.col("dlen") / F.col("avgdl")
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(avgdl))
        .groupBy("doc_id")
        .agg(
            F.sum(idf * F.col("tf") * (_BM25_K1 + 1.0) / denom).alias("s")
        )
    )
    return scored.select(
        "doc_id", F.round(F.lit(1000) * F.col("s")).cast("long").alias("bm25_mill")
    )


# ---------------------------------------------------------------------------
# Model-eval: decile lift table and exact AUC
# ---------------------------------------------------------------------------

# deterministic "model score": an explicit 4-component sum, evaluated in
# the same order by both engines, so the doubles are bit-identical
_SCORE_SQL = (
    "(embedding[1]::DOUBLE + embedding[2]::DOUBLE"
    " + embedding[3]::DOUBLE + embedding[4]::DOUBLE)"
)
_LIFT_FRACTIONS = [k / 10 for k in range(1, 10)]


def _score_col():
    e = F.col("embedding").cast("array<double>")
    return (
        F.element_at(e, 1) + F.element_at(e, 2)
        + F.element_at(e, 3) + F.element_at(e, 4)
    )


@query(
    "decile_lift_table",
    oracle=f"""
    WITH scored AS (
      SELECT vec_id, {_SCORE_SQL} AS score,
             (label <= 1)::INT AS pos
      FROM embeddings),
    bounds AS (SELECT quantile_cont(score, {_LIFT_FRACTIONS}) AS bs FROM scored),
    binned AS (
      SELECT pos,
             1 + len(list_filter(bs, b -> score < b)) AS decile
      FROM scored CROSS JOIN bounds),
    per AS (
      SELECT decile, count(*)::BIGINT AS n, sum(pos)::BIGINT AS n_pos
      FROM binned GROUP BY decile),
    tot AS (SELECT sum(n) AS nn, sum(n_pos) AS pp FROM per)
    SELECT decile, n, n_pos,
           round(sum(n_pos) OVER (ORDER BY decile) * 1.0 / tot.pp, 6)
             AS cum_capture,
           round((n_pos * 1.0 / n) / (tot.pp * 1.0 / tot.nn), 6) AS lift
    FROM per, tot
    """,
    doc="Decile lift/gains table — the model-eval readout for ranked "
    "targeting (deciles of the score distribution, highest first is "
    "decile 1 by score DESC ordering convention inverted: here decile "
    "1 = lowest scores, cum_capture accumulates upward; the direction "
    "is a labeling choice the oracle shares). Positives = label <= 1 "
    "(~20%). Deciles come from ONE percentile aggregate broadcast "
    "back — NOT a global-sort row_number, so the shape survives any "
    "corpus size (the same swap equi_depth_histogram documents); "
    "per-decile lift and cumulative capture are integer-count "
    "divisions, exact in both engines. The 10-row window is bounded "
    "state.",
)
def decile_lift_table(spark, sf_dir):
    (emb,) = tables(spark, sf_dir, "embeddings")
    scored = emb.select(
        _score_col().alias("score"),
        (F.col("label") <= 1).cast("int").alias("pos"),
    )
    bounds = scored.agg(
        F.percentile(
            "score", F.array(*[F.lit(f) for f in _LIFT_FRACTIONS])
        ).alias("bs")
    )
    per = (
        scored.crossJoin(F.broadcast(bounds))
        .select(
            (
                F.lit(1)
                + F.size(F.filter("bs", lambda b: F.col("score") < b))
            ).alias("decile"),
            "pos",
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("pos").cast("long").alias("n_pos"),
        )
    )
    tot = per.agg(F.sum("n").alias("nn"), F.sum("n_pos").alias("pp"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.crossJoin(F.broadcast(tot))
        .withColumn(
            "cum_capture",
            F.round(F.sum("n_pos").over(w) * F.lit(1.0) / F.col("pp"), 6),
        )
        .select(
            "decile",
            "n",
            "n_pos",
            "cum_capture",
            F.round(
                (F.col("n_pos") * F.lit(1.0) / F.col("n"))
                / (F.col("pp") * F.lit(1.0) / F.col("nn")),
                6,
            ).alias("lift"),
        )
    )


@query(
    "auc_mann_whitney",
    oracle=f"""
    WITH scored AS (
      SELECT {_SCORE_SQL} AS score, (label <= 1)::INT AS pos
      FROM embeddings),
    per_score AS (
      SELECT score, sum(pos)::BIGINT AS n_pos,
             sum(1 - pos)::BIGINT AS n_neg
      FROM scored GROUP BY score),
    ordered AS (
      SELECT n_pos, n_neg,
             coalesce(sum(n_neg) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS neg_below
      FROM per_score),
    tot AS (
      SELECT sum(n_pos) AS p, sum(n_neg) AS q FROM per_score)
    SELECT tot.p::BIGINT AS n_pos, tot.q::BIGINT AS n_neg,
           round(sum(ordered.n_pos * (ordered.neg_below
                     + ordered.n_neg / 2.0)) / (tot.p * tot.q), 6) AS auc,
           round(2 * sum(ordered.n_pos * (ordered.neg_below
                     + ordered.n_neg / 2.0)) / (tot.p * tot.q) - 1, 6)
             AS gini
    FROM ordered, tot GROUP BY tot.p, tot.q
    """,
    doc="Exact AUC via the Mann–Whitney identity, tie-aware: group by "
    "DISTINCT score and AUC = sum over positive mass of (negatives "
    "strictly below + half the tied negatives) / (P*N) — no per-row "
    "ranks, no pairwise join. 'Negatives strictly below' is computed "
    "by TWO-PHASE ranking so no unbounded relation ever crosses a "
    "single-partition exchange: percentile boundaries bucket the "
    "scores (1-row broadcast), the running negative-mass prefix is a "
    "window PARTITIONED BY bucket, and the cross-bucket offsets come "
    "from the <=17-row per-bucket totals (bounded state, like the "
    "skyline's block-max relation). The oracle is deliberately the "
    "single-window textbook formulation — an independent derivation, "
    "so agreement certifies the decomposition. Counts are integers; "
    "the single division is rounded identically.",
)
def auc_mann_whitney(spark, sf_dir):
    (emb,) = tables(spark, sf_dir, "embeddings")
    scored = emb.select(
        _score_col().alias("score"),
        (F.col("label") <= 1).cast("int").alias("pos"),
    )
    per_score = scored.groupBy("score").agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum(1 - F.col("pos")).cast("long").alias("n_neg"),
    )
    bounds = per_score.agg(
        F.percentile(
            "score", F.array(*[F.lit(k / 16) for k in range(1, 16)])
        ).alias("bs")
    )
    bucketed = per_score.crossJoin(F.broadcast(bounds)).select(
        "score",
        "n_pos",
        "n_neg",
        F.size(F.filter("bs", lambda b: F.col("score") > b)).alias("bkt"),
    )
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_bkt = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    bkt_tot = bucketed.groupBy("bkt").agg(
        F.sum("n_neg").alias("bneg")
    ).select("bkt", F.coalesce(F.sum("bneg").over(w_bkt), F.lit(0)).alias(
        "neg_before_bkt"
    ))
    ordered = (
        bucketed.withColumn(
            "neg_in", F.coalesce(F.sum("n_neg").over(w_in), F.lit(0))
        )
        .join(F.broadcast(bkt_tot), "bkt")
        .select(
            "n_pos",
            "n_neg",
            (F.col("neg_in") + F.col("neg_before_bkt")).alias("neg_below"),
        )
    )
    tot = per_score.agg(
        F.sum("n_pos").alias("p"), F.sum("n_neg").alias("q")
    )
    u = F.sum(
        F.col("n_pos") * (F.col("neg_below") + F.col("n_neg") / F.lit(2.0))
    )
    return (
        ordered.crossJoin(F.broadcast(tot))
        .groupBy("p", "q")
        .agg(
            F.round(u / (F.col("p") * F.col("q")), 6).alias("auc"),
            F.round(
                F.lit(2) * u / (F.col("p") * F.col("q")) - 1, 6
            ).alias("gini"),
        )
        .select(
            F.col("p").cast("long").alias("n_pos"),
            F.col("q").cast("long").alias("n_neg"),
            "auc",
            "gini",
        )
    )


# ---------------------------------------------------------------------------
# MinHash-banding recall certification (the LSH S-curve, measured)
# ---------------------------------------------------------------------------

_CERT_TRUTH_T = 0.2  # ground-truth similarity floor (below the band knee)


@query(
    "minhash_recall_cert",
    oracle=rf"""
    WITH sample_docs AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
    toks AS (
      SELECT doc_id, list_distinct(regexp_split_to_array(text, '\s+')) AS t
      FROM sample_docs),
    words AS (
      SELECT doc_id, len(t)::BIGINT AS n_toks, unnest(t) AS word FROM toks),
    truth AS (
      SELECT id_a, id_b, jaccard FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(count(*) / (a.n_toks + b.n_toks - count(*)), 4)
                 AS jaccard
        FROM words a JOIN words b
          ON a.word = b.word AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id, a.n_toks, b.n_toks)
      WHERE jaccard >= {_CERT_TRUTH_T}),
    hw AS (
      SELECT doc_id, ('0x' || substr(md5(word), 1, 8))::BIGINT AS x
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
      FROM hw GROUP BY doc_id),
    bands AS (
      SELECT doc_id, 0 AS band, m0 AS v0, m1 AS v1 FROM sigs
      UNION ALL SELECT doc_id, 1, m2, m3 FROM sigs
      UNION ALL SELECT doc_id, 2, m4, m5 FROM sigs
      UNION ALL SELECT doc_id, 3, m6, m7 FROM sigs),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.v0 = b.v0 AND a.v1 = b.v1
       AND a.doc_id < b.doc_id)
    SELECT round(floor(t.jaccard * 10) / 10, 1) AS sim_bucket,
           count(*)::BIGINT AS n_truth,
           sum(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_surfaced,
           round(sum(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 4) AS recall
    FROM truth t LEFT JOIN cand c
      ON t.id_a = c.id_a AND t.id_b = c.id_b
    GROUP BY 1
    """,
    doc="MinHash-banding recall certification — the dedup analog of "
    "ann_recall_report: ground truth is EVERY exact-Jaccard pair at "
    f">= {_CERT_TRUTH_T} (below the banding knee on purpose), and "
    "each truth pair is checked against the banded CANDIDATE set "
    "(pre-verify — the verify stage would mask banding misses). "
    "Recall per similarity decile traces the LSH S-curve the "
    "(bands, rows) parameters promise: P(candidate) = 1-(1-j^r)^b, "
    "so low buckets surface rarely and j→1 buckets always — the "
    "measurement that justifies banding parameters before a 100 TB "
    "dedup run, where a mis-set knee silently drops near-dups. "
    "All arithmetic (md5-derived hashes, affine min-hashes, band "
    "equi-join) is engine-portable, so the oracle replays candidates "
    "exactly.",
)
def minhash_recall_cert(spark, sf_dir):
    from dso_import_spark.operators.dedup import (
        minhash_band_candidates,
        ngram_jaccard_pairs,
    )

    (docs,) = tables(spark, sf_dir, "documents")
    sample = docs.filter(F.col("doc_id") % 10 == 0)
    truth = ngram_jaccard_pairs(sample, threshold=_CERT_TRUTH_T)
    cand = minhash_band_candidates(sample).withColumn("hit", F.lit(1))
    joined = truth.join(cand, ["id_a", "id_b"], "left")
    bucket = F.round(F.floor(F.col("jaccard") * 10) / 10, 1)
    return joined.groupBy(bucket.alias("sim_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_truth"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias(
            "n_surfaced"
        ),
        F.round(
            F.sum(F.coalesce(F.col("hit"), F.lit(0))) * F.lit(1.0)
            / F.count(F.lit(1)),
            4,
        ).alias("recall"),
    )


# ---------------------------------------------------------------------------
# Theil–Sen with a per-group pair cap (the documented 100 TB form)
# ---------------------------------------------------------------------------

_TS_CAP = 40  # max events per user entering the pairwise stage


@query(
    "theil_sen_capped",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, ts, epoch_us(ts) AS us, value,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY (((event_id % 2147483648) * 2654435761) >> 13),
                        event_id) AS rk
      FROM events WHERE user_id % 5 = 0),
    capped AS (SELECT * FROM ev WHERE rk <= {_TS_CAP}),
    pairs AS (
      SELECT a.user_id,
             (b.value - a.value) * 1000000.0 / (b.us - a.us) AS slope
      FROM capped a JOIN capped b
        ON a.user_id = b.user_id AND a.ts < b.ts),
    per_user AS (
      SELECT user_id, count(*)::BIGINT AS n_pairs,
             round(median(slope), 6) + 0.0 AS sen_slope
      FROM pairs GROUP BY user_id),
    counts AS (
      SELECT user_id, count(*)::BIGINT AS n_used FROM capped GROUP BY user_id)
    SELECT c.user_id, c.n_used, p.n_pairs, p.sen_slope
    FROM counts c JOIN per_user p ON c.user_id = p.user_id
    """,
    doc="Theil–Sen with the per-group pair cap theil_sen_trend's "
    f"docstring prescribes for 100 TB: at most {_TS_CAP} events per "
    "user enter the pairwise stage, chosen by a Knuth-mixed "
    "deterministic rank (an engine-replayable uniform subsample, the "
    "same mix discipline as stratified_sample_exact) — so a hot user "
    f"contributes at most C({_TS_CAP},2) pairs no matter how many "
    "events they have, turning the estimator's quadratic term into a "
    "constant per group. Published Theil–Sen-at-scale implementations "
    "subsample exactly this way; the estimator stays consistent "
    "because every pair of sampled points is equally likely.",
)
def theil_sen_capped(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    base = events.filter(F.col("user_id") % 5 == 0).select(
        "user_id",
        "ts",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "value",
        F.shiftright(
            (F.col("event_id") % _SMASK) * F.lit(_SMIX), _SSHIFT
        ).alias("mixk"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("mixk", "event_id")
    capped = (
        base.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TS_CAP)
        .select("user_id", "ts", "us", "value")
    )
    a, b = capped.alias("a"), capped.alias("b")
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.ts") < F.col("b.ts")),
    ).select(
        F.col("a.user_id").alias("user_id"),
        (
            (F.col("b.value") - F.col("a.value"))
            * F.lit(1000000.0)
            / (F.col("b.us") - F.col("a.us"))
        ).alias("slope"),
    )
    per_user = pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        (F.round(F.median("slope"), 6) + F.lit(0.0)).alias("sen_slope"),
    )
    counts = capped.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_used")
    )
    return counts.join(per_user, "user_id").select(
        "user_id", "n_used", "n_pairs", "sen_slope"
    )


# ---------------------------------------------------------------------------
# Join-cardinality estimation certificate (optimizer statistics)
# ---------------------------------------------------------------------------

_JC_BUCKETS = 64


@query(
    "join_cardinality_estimate",
    oracle=f"""
    WITH bounds AS (
      SELECT min(o_custkey) AS lo, max(o_custkey) AS hi FROM orders),
    ob AS (
      SELECT least(CAST(floor((o_custkey - lo) * {_JC_BUCKETS}.0
                    / greatest(hi - lo + 1, 1)) AS BIGINT),
                   {_JC_BUCKETS - 1}) AS bkt,
             count(*)::BIGINT AS n_rows,
             count(DISTINCT o_custkey)::BIGINT AS n_keys
      FROM orders CROSS JOIN bounds GROUP BY 1),
    cb AS (
      SELECT least(CAST(floor((c_custkey - lo) * {_JC_BUCKETS}.0
                    / greatest(hi - lo + 1, 1)) AS BIGINT),
                   {_JC_BUCKETS - 1}) AS bkt,
             count(*)::BIGINT AS n_rows,
             count(DISTINCT c_custkey)::BIGINT AS n_keys
      FROM customer CROSS JOIN bounds
      WHERE c_custkey BETWEEN lo AND hi GROUP BY 1),
    est AS (
      SELECT sum(CAST(ob.n_rows AS DOUBLE) * cb.n_rows
                 / greatest(ob.n_keys, cb.n_keys))::DOUBLE AS est_rows
      FROM ob JOIN cb USING (bkt)),
    actual AS (
      SELECT count(*)::BIGINT AS actual_rows
      FROM orders JOIN customer ON o_custkey = c_custkey)
    SELECT CAST(round(est.est_rows) AS BIGINT) AS est_rows,
           actual.actual_rows,
           round(est.est_rows / actual.actual_rows, 4) AS est_over_actual
    FROM est, actual
    """,
    doc="Join-cardinality estimation certificate — the System R "
    "estimator every cost-based optimizer uses, checked against "
    f"truth: both join sides histogram into {_JC_BUCKETS} equi-width "
    "key buckets (rows + distinct keys per bucket), the per-bucket "
    "estimate is |A_b|*|B_b| / max(d_A(b), d_B(b)) (containment-of-"
    "values assumption), and the certificate reports estimate vs the "
    "exact join count. Per-bucket stats are one map-side-combined "
    "agg per side; the estimate join is {_JC_BUCKETS} rows against "
    "{_JC_BUCKETS} rows; only the TRUTH side (a certification input, "
    "not the production path) runs the real join. On the uniform "
    "TPC-H-like fixture the ratio lands near 1.0, which is exactly "
    "what ANALYZE-grade histograms promise.",
)
def join_cardinality_estimate(spark, sf_dir):
    orders, customer = tables(spark, sf_dir, "orders", "customer")
    bounds = orders.agg(
        F.min("o_custkey").alias("lo"), F.max("o_custkey").alias("hi")
    )

    def bucketed(df, key):
        return (
            df.crossJoin(F.broadcast(bounds))
            .filter(F.col(key).between(F.col("lo"), F.col("hi")))
            .select(
                F.least(
                    F.floor(
                        (F.col(key) - F.col("lo"))
                        * float(_JC_BUCKETS)
                        / F.greatest(
                            F.col("hi") - F.col("lo") + 1, F.lit(1)
                        )
                    ).cast("long"),
                    F.lit(_JC_BUCKETS - 1),
                ).alias("bkt"),
                F.col(key).alias("k"),
            )
            .groupBy("bkt")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.countDistinct("k").cast("long").alias("n_keys"),
            )
        )

    ob = bucketed(orders, "o_custkey")
    cb = bucketed(customer, "c_custkey")
    est = (
        ob.join(cb.withColumnsRenamed({"n_rows": "cn", "n_keys": "ck"}), "bkt")
        .agg(
            F.sum(
                F.col("n_rows").cast("double")
                * F.col("cn")
                / F.greatest("n_keys", "ck")
            ).alias("est_rows")
        )
    )
    actual = (
        orders.join(
            customer, orders["o_custkey"] == customer["c_custkey"]
        ).agg(F.count(F.lit(1)).cast("long").alias("actual_rows"))
    )
    return est.crossJoin(F.broadcast(actual)).select(
        F.round("est_rows").cast("long").alias("est_rows"),
        "actual_rows",
        F.round(F.col("est_rows") / F.col("actual_rows"), 4).alias(
            "est_over_actual"
        ),
    )


# ---------------------------------------------------------------------------
# Wasserstein-1 distribution drift (per series, exact)
# ---------------------------------------------------------------------------

_W1_SPLIT = "2024-01-16"  # same reference/current split as the PSI/KS ops


@query(
    "wasserstein_drift",
    oracle=f"""
    WITH tagged AS (
      SELECT event_type, round(value, 2) AS v,
             CASE WHEN ts < TIMESTAMP '{_W1_SPLIT}' THEN 1 ELSE 0 END AS is_ref
      FROM events WHERE value IS NOT NULL),
    tot AS (
      SELECT event_type, sum(is_ref)::DOUBLE AS n_ref,
             sum(1 - is_ref)::DOUBLE AS n_cur
      FROM tagged GROUP BY event_type),
    pts AS (
      SELECT event_type, v, sum(is_ref) AS d_ref, sum(1 - is_ref) AS d_cur
      FROM tagged GROUP BY event_type, v),
    ecdf AS (
      SELECT p.event_type, p.v,
             sum(p.d_ref) OVER w / t.n_ref AS f_ref,
             sum(p.d_cur) OVER w / t.n_cur AS f_cur,
             lead(p.v) OVER w2 AS v_next
      FROM pts p JOIN tot t USING (event_type)
      WINDOW w AS (PARTITION BY p.event_type ORDER BY p.v
                   ROWS UNBOUNDED PRECEDING),
             w2 AS (PARTITION BY p.event_type ORDER BY p.v))
    SELECT event_type,
           round(sum(abs(f_ref - f_cur) * (v_next - v)), 6) AS w1_distance
    FROM ecdf WHERE v_next IS NOT NULL
    GROUP BY event_type
    """,
    doc="Exact Wasserstein-1 (earth-mover) drift per event type "
    "between the reference and current periods: W1 = integral of "
    "|ECDF_ref − ECDF_cur| — the drift measure that weighs HOW FAR "
    "mass moved, which PSI (fixed bins) and KS (max gap only) both "
    "miss; a small shift of all mass and a large shift of little "
    "mass are distinguishable only here. Values quantized to 2dp "
    "before grouping so the distinct-value relation is bounded by "
    "the value domain, then one per-series ordered prefix (windows "
    "PARTITIONED BY event_type — the KS machinery) and one agg. "
    "Same split constant as the PSI/KS ops so the drift suite reads "
    "one experiment three ways.",
)
def wasserstein_drift(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    tagged = events.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.round("value", 2).alias("v"),
        (F.col("ts") < F.lit(_W1_SPLIT).cast("timestamp"))
        .cast("int")
        .alias("is_ref"),
    )
    tot = tagged.groupBy("event_type").agg(
        F.sum("is_ref").cast("double").alias("n_ref"),
        F.sum(1 - F.col("is_ref")).cast("double").alias("n_cur"),
    )
    pts = tagged.groupBy("event_type", "v").agg(
        F.sum("is_ref").alias("d_ref"),
        F.sum(1 - F.col("is_ref")).alias("d_cur"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w2 = Window.partitionBy("event_type").orderBy("v")
    ecdf = pts.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "v",
        (F.sum("d_ref").over(w) / F.col("n_ref")).alias("f_ref"),
        (F.sum("d_cur").over(w) / F.col("n_cur")).alias("f_cur"),
        F.lead("v").over(w2).alias("v_next"),
    )
    return (
        ecdf.filter(F.col("v_next").isNotNull())
        .groupBy("event_type")
        .agg(
            F.round(
                F.sum(
                    F.abs(F.col("f_ref") - F.col("f_cur"))
                    * (F.col("v_next") - F.col("v"))
                ),
                6,
            ).alias("w1_distance")
        )
    )


# ---------------------------------------------------------------------------
# Source-level quality gate (domain blocklisting)
# ---------------------------------------------------------------------------

_SRC_DUP_MAX = 0.05  # max share of exact-duplicate docs per source
_SRC_SHORT_MAX = 0.5  # max share of short (<100 chars) docs per source


@query(
    "source_quality_blocklist",
    oracle=f"""
    WITH per_doc AS (
      SELECT source, doc_id, n_chars, text,
             count(*) OVER (PARTITION BY source, text) AS text_copies
      FROM documents),
    per_src AS (
      SELECT source,
             count(*)::BIGINT AS n_docs,
             round(avg(n_chars), 2) AS mean_chars,
             round(sum(CASE WHEN text_copies > 1 THEN 1 ELSE 0 END)
                   * 1.0 / count(*), 4) AS dup_share,
             round(sum(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END)
                   * 1.0 / count(*), 4) AS short_share
      FROM per_doc GROUP BY source)
    SELECT source, n_docs, mean_chars, dup_share, short_share,
           (dup_share > {_SRC_DUP_MAX} OR short_share > {_SRC_SHORT_MAX})
             AS blocked
    FROM per_src
    """,
    doc="Source-level quality gate — the domain-blocklist discipline "
    "of RefinedWeb/Dolma-class pipelines applied at the `source` "
    "grain: per source, the exact-duplicate share (same text within "
    "the source — a window over (source, text), partition-local) and "
    "the short-document share; a source exceeding either threshold "
    "is blocked WHOLESALE, because document-level filters cannot see "
    "that a domain is systematically low-quality. One windowed pass "
    "plus one agg, both keyed on the source — at 100 TB the source "
    "cardinality is the state, not the corpus.",
)
def source_quality_blocklist(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    w = Window.partitionBy("source", "text")
    per_doc = docs.select(
        "source",
        "n_chars",
        F.count(F.lit(1)).over(w).alias("text_copies"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg("n_chars"), 2).alias("mean_chars"),
        F.round(
            F.sum((F.col("text_copies") > 1).cast("int")) * F.lit(1.0)
            / F.count(F.lit(1)),
            4,
        ).alias("dup_share"),
        F.round(
            F.sum((F.col("n_chars") < 100).cast("int")) * F.lit(1.0)
            / F.count(F.lit(1)),
            4,
        ).alias("short_share"),
    ).select(
        "source",
        "n_docs",
        "mean_chars",
        "dup_share",
        "short_share",
        (
            (F.col("dup_share") > _SRC_DUP_MAX)
            | (F.col("short_share") > _SRC_SHORT_MAX)
        ).alias("blocked"),
    )


# ---------------------------------------------------------------------------
# Ridge regression by normal equations (training as aggregation)
# ---------------------------------------------------------------------------

_RIDGE_L = 1.0  # L2 penalty (applied to all three coefficients)


@query(
    "ridge_regression_normal_eq",
    oracle=f"""
    WITH m AS (
      SELECT round(count(*) + {_RIDGE_L}, 2) AS a,
             round(sum(l_quantity), 2) AS b,
             round(sum(l_discount), 2) AS c,
             round(sum(l_quantity * l_quantity) + {_RIDGE_L}, 2) AS e,
             round(sum(l_quantity * l_discount), 2) AS f,
             round(sum(l_discount * l_discount) + {_RIDGE_L}, 2) AS i,
             round(sum(l_extendedprice), 2) AS p,
             round(sum(l_quantity * l_extendedprice), 2) AS q,
             round(sum(l_discount * l_extendedprice), 2) AS r
      FROM lineitem),
    s AS (
      SELECT *,
             (a * (e * i - f * f)) - (b * (b * i - f * c))
               + (c * (b * f - e * c)) AS det
      FROM m)
    SELECT round(((p * (e * i - f * f)) - (b * (q * i - f * r))
                  + (c * (q * f - e * r))) / det, 6) AS beta0,
           round(((a * (q * i - f * r)) - (p * (b * i - c * f))
                  + (c * (b * r - q * c))) / det, 6) AS beta1,
           round(((a * (e * r - q * f)) - (b * (b * r - q * c))
                  + (p * (b * f - e * c))) / det, 6) AS beta2
    FROM s
    """,
    doc="Ridge regression (extendedprice ~ quantity + discount) solved "
    "in closed form — model TRAINING expressed as one aggregation: "
    "the 3x3 normal-equation matrix X'X + lambda*I and X'y are nine "
    "map-side-combinable sums (the same moments regr_slope uses, one "
    "shuffle of 9 doubles total), and the solve is Cramer's rule "
    "written as the IDENTICAL expression tree on both engines. The "
    "nine sums are rounded to 2dp before solving — at 1e10 magnitudes "
    "a cross-partition summation ulp is ~2e-6, so the rounding "
    "absorbs order effects and both engines then evaluate the same "
    "IEEE operations on the same decimals. At 100 TB nothing changes: "
    "training cost is one scan + a 9-value combine, the solve is "
    "driver-side O(p^3) with p=3 — the normal-equation regime every "
    "distributed ML library uses below ~10k features. Uncentered "
    "normal equations amplify the moment rounding by the condition "
    "number (~1e-3 relative vs LAPACK, pinned in tests); production "
    "solvers center features first — the two-pass variant — which "
    "the oracle-parity contract here deliberately trades away.",
)
def ridge_regression_normal_eq(spark, sf_dir):
    (li,) = tables(spark, sf_dir, "lineitem")
    m = li.agg(
        F.round(F.count(F.lit(1)) + _RIDGE_L, 2).alias("a"),
        F.round(F.sum("l_quantity"), 2).alias("b"),
        F.round(F.sum("l_discount"), 2).alias("c"),
        F.round(F.sum(F.col("l_quantity") * F.col("l_quantity")) + _RIDGE_L, 2).alias("e"),
        F.round(F.sum(F.col("l_quantity") * F.col("l_discount")), 2).alias("f"),
        F.round(F.sum(F.col("l_discount") * F.col("l_discount")) + _RIDGE_L, 2).alias("i"),
        F.round(F.sum("l_extendedprice"), 2).alias("p"),
        F.round(F.sum(F.col("l_quantity") * F.col("l_extendedprice")), 2).alias("q"),
        F.round(F.sum(F.col("l_discount") * F.col("l_extendedprice")), 2).alias("r"),
    )
    a, b, c = F.col("a"), F.col("b"), F.col("c")
    e, f, i = F.col("e"), F.col("f"), F.col("i")
    p, q, r = F.col("p"), F.col("q"), F.col("r")
    det = (a * (e * i - f * f)) - (b * (b * i - f * c)) + (c * (b * f - e * c))
    s = m.withColumn("det", det)
    return s.select(
        F.round(
            ((p * (e * i - f * f)) - (b * (q * i - f * r))
             + (c * (q * f - e * r))) / F.col("det"), 6
        ).alias("beta0"),
        F.round(
            ((a * (q * i - f * r)) - (p * (b * i - c * f))
             + (c * (b * r - q * c))) / F.col("det"), 6
        ).alias("beta1"),
        F.round(
            ((a * (e * r - q * f)) - (b * (b * r - q * c))
             + (p * (b * f - e * c))) / F.col("det"), 6
        ).alias("beta2"),
    )


# ---------------------------------------------------------------------------
# DP-prep sensitivity audit (per-user contribution bounds)
# ---------------------------------------------------------------------------

_DP_DOM = 0.05  # a single user contributing > 5% of a statistic dominates it


@query(
    "dp_sensitivity_audit",
    oracle=f"""
    WITH per_user AS (
      SELECT event_type, user_id, round(sum(abs(value)), 2) AS contrib
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    per_type AS (
      SELECT event_type,
             count(*)::BIGINT AS n_users,
             round(sum(contrib), 2) AS total_mass,
             round(max(contrib), 2) AS max_contrib,
             round(quantile_cont(contrib, 0.99), 2) AS p99_clamp
      FROM per_user GROUP BY event_type)
    SELECT event_type, n_users, max_contrib, p99_clamp,
           round(max_contrib / total_mass, 4) AS max_share,
           (round(max_contrib / total_mass, 4) > {_DP_DOM}) AS dominated
    FROM per_type
    """,
    doc="Differential-privacy preparation audit: per statistic (event "
    "type), the largest single-user contribution, its share of the "
    "total mass, and the p99 per-user contribution as the suggested "
    "clamp bound — the sensitivity analysis every DP release does "
    "BEFORE choosing noise scale (noise is calibrated to max per-user "
    "contribution; unclamped heavy users force useless noise levels). "
    "Deterministic by design — the audit is exact arithmetic; only "
    "the eventual noise draw is random and out of scope. Two "
    "map-side-combinable aggs (user grain then type grain), exact "
    "p99 per type with group-bounded combine; at 100 TB swap "
    "approx_percentile exactly as the histogram ops document.",
)
def dp_sensitivity_audit(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    per_user = (
        events.filter(F.col("value").isNotNull())
        .groupBy("event_type", "user_id")
        .agg(F.round(F.sum(F.abs("value")), 2).alias("contrib"))
    )
    per_type = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.round(F.sum("contrib"), 2).alias("total_mass"),
        F.round(F.max("contrib"), 2).alias("max_contrib"),
        F.round(F.percentile("contrib", F.lit(0.99)), 2).alias("p99_clamp"),
    )
    share = F.round(F.col("max_contrib") / F.col("total_mass"), 4)
    return per_type.select(
        "event_type",
        "n_users",
        "max_contrib",
        "p99_clamp",
        share.alias("max_share"),
        (share > _DP_DOM).alias("dominated"),
    )


# ---------------------------------------------------------------------------
# Histogram selectivity-estimation certificate
# ---------------------------------------------------------------------------

_FRACTIONS_SEL = [k / 16 for k in range(1, 16)]
_SEL_CUT = 150000.0  # the probe predicate: o_totalprice <= _SEL_CUT


@query(
    "selectivity_estimate_cert",
    oracle=f"""
    WITH bounds AS (
      SELECT quantile_cont(o_totalprice, {_FRACTIONS_SEL}) AS bs FROM orders),
    binned AS (
      SELECT o_totalprice AS v,
             1 + len(list_filter(bs, b -> o_totalprice > b)) AS bin
      FROM orders CROSS JOIN bounds),
    per_bin AS (
      SELECT bin, count(*)::BIGINT AS n,
             min(v) AS lo, max(v) AS hi
      FROM binned GROUP BY bin),
    tot AS (SELECT sum(n)::DOUBLE AS nn FROM per_bin),
    est AS (
      SELECT round(sum(
        CASE WHEN hi <= {_SEL_CUT} THEN n
             WHEN lo > {_SEL_CUT} THEN 0
             ELSE n * ({_SEL_CUT} - lo) / greatest(hi - lo, 1e-12) END
      ) / tot.nn, 4) AS est_sel
      FROM per_bin, tot GROUP BY tot.nn),
    act AS (
      SELECT round(sum(CASE WHEN v <= {_SEL_CUT} THEN 1 ELSE 0 END)
                   / (SELECT nn FROM tot), 4) AS actual_sel
      FROM binned)
    SELECT est.est_sel, act.actual_sel,
           (abs(est.est_sel - act.actual_sel) <= 0.02) AS within_tol
    FROM est, act
    """,
    doc="Filter-selectivity estimation certificate — the other half "
    "of ANALYZE statistics (join_cardinality_estimate covers joins): "
    "a 16-bin equi-depth histogram estimates the selectivity of "
    f"o_totalprice <= {_SEL_CUT:.0f} with the textbook within-bin "
    "linear interpolation, certified against the exact fraction. "
    "Equi-depth bounds the per-bin error at 1/16 by construction and "
    "interpolation shrinks it far below that — the reason every "
    "cost-based optimizer stores equal-HEIGHT (not equal-width) "
    "histograms. One percentile aggregate, one per-bin combine, one "
    "exact count: all map-side-combinable.",
)
def selectivity_estimate_cert(spark, sf_dir):
    (orders,) = tables(spark, sf_dir, "orders")
    price = orders.select(F.col("o_totalprice").alias("v"))
    bounds = price.agg(
        F.percentile(
            "v", F.array(*[F.lit(k / 16) for k in range(1, 16)])
        ).alias("bs")
    )
    per_bin = (
        price.crossJoin(F.broadcast(bounds))
        .select(
            "v",
            (F.lit(1) + F.size(F.filter("bs", lambda b: F.col("v") > b))).alias(
                "bin"
            ),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
    )
    tot = per_bin.agg(F.sum("n").cast("double").alias("nn"))
    cut = F.lit(_SEL_CUT)
    est = (
        per_bin.crossJoin(F.broadcast(tot))
        .groupBy("nn")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("hi") <= cut, F.col("n"))
                    .when(F.col("lo") > cut, F.lit(0))
                    .otherwise(
                        F.col("n")
                        * (cut - F.col("lo"))
                        / F.greatest(F.col("hi") - F.col("lo"), F.lit(1e-12))
                    )
                )
                / F.col("nn"),
                4,
            ).alias("est_sel")
        )
        .select("est_sel")
    )
    act = price.crossJoin(F.broadcast(tot)).agg(
        F.round(
            F.sum((F.col("v") <= cut).cast("int")) / F.first("nn"), 4
        ).alias("actual_sel")
    )
    return est.crossJoin(F.broadcast(act)).select(
        "est_sel",
        "actual_sel",
        (F.abs(F.col("est_sel") - F.col("actual_sel")) <= 0.02).alias(
            "within_tol"
        ),
    )
