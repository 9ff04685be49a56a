"""Round-6 mlops batch: calibration, divergence, collocations, and
leakage-safe time-series CV — four operators a model-evaluation /
corpus-governance pipeline runs after the round-5 mlops set, each with
an end-to-end DuckDB oracle.

- ``calibration_ece_bins``: reliability diagram + expected-calibration
  -error contributions per confidence bin — the readout that tells you
  whether a score is a probability (AUC alone cannot).
- ``js_divergence_sources``: per-source Jensen–Shannon divergence from
  the corpus token distribution over a bounded top-V vocabulary — the
  symmetric, finite drift measure KL lacks (KL blows up on zero
  counts; JS is bounded by ln 2).
- ``pmi_collocations``: top-k adjacent-bigram collocations by
  pointwise mutual information with a min-count floor — the classic
  corpus-analysis operator (and the fixed-phrase detector tokenizer
  teams use to seed merge rules).
- ``purged_timeseries_cv``: contiguous time folds with an embargo zone
  — the leakage-safe cross-validation split for temporally correlated
  data (a plain random K-fold leaks near-future rows into training).

Determinism discipline (same as mlops.py): every libm call (ln) is
quantized — ``round(Q·ln(rational-of-exact-integer-counts))`` cast to
BIGINT — before any cross-row sum, and cross-row sums are over
BIGINTs, so partition order can never flip a value; probabilities are
single divisions of exact counts. No UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dso_import_spark.queries import query
from dso_import_spark.queries_pkg.util import tables

# ---------------------------------------------------------------------------
# Calibration: reliability bins + ECE
# ---------------------------------------------------------------------------

_CAL_BINS = 10


@query(
    "calibration_ece_bins",
    oracle=f"""
    WITH scored AS (
      SELECT (embedding[1]::DOUBLE + embedding[2]::DOUBLE
              + embedding[3]::DOUBLE + embedding[4]::DOUBLE) AS score,
             (label <= 1)::INT AS pos
      FROM embeddings),
    rng AS (SELECT min(score) AS mn, max(score) AS mx FROM scored),
    conf AS (
      SELECT pos,
             CAST(round(1000000 * (score - mn) / (mx - mn)) AS BIGINT)
               AS conf_micro
      FROM scored, rng),
    binned AS (
      SELECT least(conf_micro * {_CAL_BINS} // 1000000,
                   {_CAL_BINS - 1}) + 1 AS bin,
             pos, conf_micro
      FROM conf),
    per AS (
      SELECT bin, count(*)::BIGINT AS n, sum(pos)::BIGINT AS n_pos,
             sum(conf_micro)::BIGINT AS conf_sum
      FROM binned GROUP BY bin),
    tot AS (SELECT sum(n) AS nn FROM per)
    SELECT bin, n, n_pos,
           round(conf_sum * 1.0 / n / 1000000, 6) AS avg_conf,
           round(n_pos * 1.0 / n, 6) AS pos_rate,
           round(abs(conf_sum * 1.0 / n / 1000000 - n_pos * 1.0 / n)
                 * n / tot.nn, 6) AS ece_part
    FROM per, tot
    """,
    doc="Reliability diagram + expected-calibration-error parts per "
    f"confidence bin ({_CAL_BINS} equal-width bins over the min-max-"
    "normalized score; positives = label <= 1): per bin the average "
    "claimed confidence, the observed positive rate, and the "
    "bin-weighted |gap| whose sum is ECE — the calibration readout "
    "AUC cannot give (a perfectly-ranked but over-confident model has "
    "AUC 1 and terrible ECE). Confidence is quantized to integer "
    "micros per ROW before any aggregation, so every cross-row sum is "
    "a BIGINT sum (partition-order-proof) and the only doubles are "
    "final single divisions. Plan: one 2-value min/max agg broadcast "
    "back, one 10-key hash agg, one 1-row total joined broadcast — "
    "scan-bound at any corpus size.",
)
def calibration_ece_bins(spark, sf_dir):
    (emb,) = tables(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    score = (
        F.element_at(e, 1) + F.element_at(e, 2)
        + F.element_at(e, 3) + F.element_at(e, 4)
    )
    scored = emb.select(
        score.alias("score"), (F.col("label") <= 1).cast("int").alias("pos")
    )
    rng = scored.agg(F.min("score").alias("mn"), F.max("score").alias("mx"))
    conf = scored.crossJoin(F.broadcast(rng)).select(
        "pos",
        F.round(
            F.lit(1000000) * (F.col("score") - F.col("mn"))
            / (F.col("mx") - F.col("mn"))
        )
        .cast("long")
        .alias("conf_micro"),
    )
    binned = conf.select(
        (
            F.least(
                (F.col("conf_micro") * _CAL_BINS / F.lit(1000000))
                .cast("long"),
                F.lit(_CAL_BINS - 1),
            )
            + 1
        ).alias("bin"),
        "pos",
        "conf_micro",
    )
    per = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("conf_micro").cast("long").alias("conf_sum"),
    )
    tot = per.agg(F.sum("n").alias("nn"))
    avg_conf = F.col("conf_sum") * 1.0 / F.col("n") / F.lit(1000000)
    pos_rate = F.col("n_pos") * 1.0 / F.col("n")
    return per.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        "n_pos",
        F.round(avg_conf, 6).alias("avg_conf"),
        F.round(pos_rate, 6).alias("pos_rate"),
        F.round(
            F.abs(avg_conf - pos_rate) * F.col("n") / F.col("nn"), 6
        ).alias("ece_part"),
    )


# ---------------------------------------------------------------------------
# Jensen–Shannon divergence per source
# ---------------------------------------------------------------------------

_JS_VOCAB = 200


@query(
    "js_divergence_sources",
    oracle=rf"""
    WITH words AS (
      SELECT source, unnest(string_split_regex(text, '\s+')) AS w
      FROM documents),
    vocab AS (
      SELECT w FROM (
        SELECT w, count(*) AS c FROM words GROUP BY w
        ORDER BY c DESC, w LIMIT {_JS_VOCAB})),
    cs AS (
      SELECT source, w, count(*)::BIGINT AS c
      FROM words JOIN vocab USING (w) GROUP BY source, w),
    corpus AS (
      SELECT w, sum(c)::BIGINT AS cq FROM cs GROUP BY w),
    stot AS (SELECT source, sum(c)::BIGINT AS ts FROM cs GROUP BY source),
    qtot AS (SELECT sum(cq)::BIGINT AS tq FROM corpus),
    grid AS (
      SELECT stot.source, corpus.w, stot.ts, corpus.cq, qtot.tq,
             coalesce(cs.c, 0)::BIGINT AS c
      FROM stot CROSS JOIN corpus
      CROSS JOIN qtot
      LEFT JOIN cs ON cs.source = stot.source AND cs.w = corpus.w),
    terms AS (
      SELECT source,
             CASE WHEN c = 0 THEN 0 ELSE CAST(round(1000000 *
               (c * 1.0 / ts) * ln((c * 1.0 / ts)
                 / (((c * 1.0 / ts) + (cq * 1.0 / tq)) / 2))) AS BIGINT)
             END AS p_term,
             CAST(round(1000000 *
               (cq * 1.0 / tq) * ln((cq * 1.0 / tq)
                 / (((c * 1.0 / ts) + (cq * 1.0 / tq)) / 2))) AS BIGINT)
               AS q_term
      FROM grid)
    SELECT source,
           round((sum(p_term) + sum(q_term)) / 2000000.0, 6) AS js
    FROM terms GROUP BY source
    """,
    doc="Per-source Jensen–Shannon divergence from the corpus token "
    f"distribution over the top-{_JS_VOCAB} vocabulary (deterministic "
    "count-desc/token-asc cut) — the bounded, symmetric source-drift "
    "score: KL explodes on any token a source never uses, JS caps at "
    "ln 2, so sources rank comparably. Every probability is a single "
    "division of exact BIGINT counts; each p·ln(p/m) term is "
    "quantized to integer micros BEFORE the per-source sum (the woe "
    "pattern: libm ulp differences sit ~1e9 below the quantum), so "
    "the cross-row sums are exact integer sums. The vocab cut bounds "
    "all downstream state: the source×vocab grid is |sources|×"
    f"{_JS_VOCAB} rows built from two broadcast-size relations — at "
    "100 TB only the initial token count scans scale, both map-side "
    "combinable.",
)
def js_divergence_sources(spark, sf_dir):
    from dso_import_spark.functions.text import tokens
    from dso_import_spark.queries_pkg.util import spread_for_explode

    (docs,) = tables(spark, sf_dir, "documents")
    # staged token projection + explode_outer: no filter may reference
    # the computed array (SCALING.md round-6, InferFiltersFromGenerate);
    # pre-spread because the token explode amplifies ~100× while the
    # doc parquet arrives in few splits (×100 replica: 2 splits →
    # 17.8 s unspread vs 6.1 s spread)
    docs = spread_for_explode(docs, "doc_id", amplification=100)
    words = docs.select("source", tokens("text").alias("t")).select(
        "source", F.explode_outer("t").alias("w")
    )
    # ONE token scan: the (source, token) count relation feeds both the
    # vocabulary cut (via its token-grain rollup) and the per-source
    # counts — a second scan of the exploded tokens would double the
    # dominant cost (the oracle's two-CTE formulation is the same math)
    # isNotNull drops explode_outer's NULL row for NULL-text docs
    # (DuckDB's unnest emits none); attribute filter, nothing inlines
    cs_all = words.filter(F.col("w").isNotNull()).groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint(eager=False)  # two consumers (vocab rollup + the
    # vocab-cut counts); without the materialization each would replay
    # the corpus token scan. State is |sources| × |distinct tokens| —
    # orders of magnitude below the corpus it summarizes
    corpus_all = cs_all.groupBy("w").agg(
        F.sum("c").cast("long").alias("cq")
    )
    vocab = (
        corpus_all.orderBy(F.desc("cq"), F.asc("w"))
        .limit(_JS_VOCAB)
        .select("w")
    )
    cs = cs_all.join(F.broadcast(vocab), "w")
    corpus = cs.groupBy("w").agg(F.sum("c").cast("long").alias("cq"))
    stot = cs.groupBy("source").agg(F.sum("c").cast("long").alias("ts"))
    qtot = corpus.agg(F.sum("cq").cast("long").alias("tq"))
    grid = (
        stot.crossJoin(F.broadcast(corpus))
        .crossJoin(F.broadcast(qtot))
        .join(cs, ["source", "w"], "left")
        .select(
            "source",
            "w",
            "ts",
            "cq",
            "tq",
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c"),
        )
    )
    p = F.col("c") * 1.0 / F.col("ts")
    q = F.col("cq") * 1.0 / F.col("tq")
    m = (p + q) / 2
    micro = lambda x: F.round(F.lit(1000000) * x).cast("long")  # noqa: E731
    terms = grid.select(
        "source",
        F.when(F.col("c") == 0, F.lit(0).cast("long"))
        .otherwise(micro(p * F.log(p / m)))
        .alias("p_term"),
        micro(q * F.log(q / m)).alias("q_term"),
    )
    return terms.groupBy("source").agg(
        F.round(
            (F.sum("p_term") + F.sum("q_term")) / F.lit(2000000.0), 6
        ).alias("js")
    )


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 5
_PMI_TOP_K = 20


@query(
    "pmi_collocations",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
    big AS (
      SELECT unnest([t[i] || ' ' || t[i+1]
                     for i in range(1, greatest(len(t), 1))]) AS bg
      FROM toks),
    uni AS (
      SELECT unnest(t) AS w FROM toks),
    bc AS (SELECT bg, count(*)::BIGINT AS cxy FROM big GROUP BY bg
           HAVING count(*) >= {_PMI_MIN_COUNT}),
    uc AS (SELECT w, count(*)::BIGINT AS c FROM uni GROUP BY w),
    nb AS (SELECT count(*)::BIGINT AS tb FROM big),
    nu AS (SELECT count(*)::BIGINT AS tu FROM uni),
    pmi AS (
      SELECT bg, cxy,
             CAST(round(1000 * ln((cxy * 1.0 / tb)
               / ((ux.c * 1.0 / tu) * (uy.c * 1.0 / tu)))) AS BIGINT)
               AS pmi_milli
      FROM bc CROSS JOIN nb CROSS JOIN nu
      JOIN uc ux ON ux.w = string_split(bc.bg, ' ')[1]
      JOIN uc uy ON uy.w = string_split(bc.bg, ' ')[2])
    SELECT bg AS bigram, cxy AS n_pair, pmi_milli
    FROM pmi ORDER BY pmi_milli DESC, bg LIMIT {_PMI_TOP_K}
    """,
    doc=f"Top-{_PMI_TOP_K} adjacent-bigram collocations by pointwise "
    "mutual information (PMI = ln(P(xy)/(P(x)P(y))), bigram count "
    f">= {_PMI_MIN_COUNT}) — the fixed-phrase detector: high-PMI "
    "pairs are multiword units a tokenizer should learn as merges "
    "and a dedup pipeline should treat as boilerplate signals. "
    "Counts are exact BIGINTs; the single ln is quantized to millis "
    "before ranking (ulp-proof); the top-k is ORDER BY + LIMIT "
    "(TakeOrderedAndProject — per-partition heaps, never a "
    "SinglePartition window), tie-broken by the bigram string. "
    "Bigrams come from an index zip over the staged token array "
    "(non-distinct, position-preserving) with explode_outer so no "
    "inferable filter drags the token pipeline below the spread.",
)
def pmi_collocations(spark, sf_dir):
    from dso_import_spark.functions.text import tokens
    from dso_import_spark.queries_pkg.util import spread_for_explode

    (docs,) = tables(spark, sf_dir, "documents")
    docs = spread_for_explode(docs, "doc_id", amplification=100)
    toked = docs.select("doc_id", tokens("text").alias("t"))
    # the size >= 2 guard matters: concat_ws SKIPS nulls, so an
    # unguarded sequence(1, 1) on a 1-token doc would fabricate a
    # 1-word "bigram" the oracle's range(1, len) never emits
    bigrams = F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 1),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("t"), i),
                F.element_at(F.col("t"), i + 1),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    big = toked.select(bigrams.alias("bgs")).select(
        F.explode_outer("bgs").alias("bg")
    )
    uni = toked.select(F.explode_outer("t").alias("w"))
    # checkpoint the two count relations: each feeds BOTH its grand
    # total and the downstream scoring — without the materialization
    # the token pipeline would be evaluated four times (counts ×2,
    # 1-row totals ×2). State is the distinct-gram count tables, far
    # below the corpus they summarize.
    # the isNotNull drops explode_outer's NULL row for empty gram
    # arrays (1-token or NULL-text docs) — DuckDB's unnest emits no
    # such row, so totals must exclude it on this side too; the filter
    # references only the generated ATTRIBUTE, so nothing inlines
    bc_all = big.filter(F.col("bg").isNotNull()).groupBy("bg").agg(
        F.count(F.lit(1)).cast("long").alias("cxy")
    ).localCheckpoint(eager=False)
    uc = uni.filter(F.col("w").isNotNull()).groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint(eager=False)
    bc = bc_all.filter(F.col("cxy") >= _PMI_MIN_COUNT)
    nb = bc_all.agg(F.sum("cxy").cast("long").alias("tb"))
    nu = uc.agg(F.sum("c").cast("long").alias("tu"))
    parts = F.split(F.col("bg"), " ")
    scored = (
        bc.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nu))
        .withColumn("wx", F.element_at(parts, 1))
        .withColumn("wy", F.element_at(parts, 2))
        .join(
            F.broadcast(uc.select(F.col("w").alias("wx"), F.col("c").alias("cx"))),
            "wx",
        )
        .join(
            F.broadcast(uc.select(F.col("w").alias("wy"), F.col("c").alias("cy"))),
            "wy",
        )
        .select(
            F.col("bg").alias("bigram"),
            F.col("cxy").alias("n_pair"),
            F.round(
                F.lit(1000)
                * F.log(
                    (F.col("cxy") * 1.0 / F.col("tb"))
                    / (
                        (F.col("cx") * 1.0 / F.col("tu"))
                        * (F.col("cy") * 1.0 / F.col("tu"))
                    )
                )
            )
            .cast("long")
            .alias("pmi_milli"),
        )
    )
    return scored.orderBy(F.desc("pmi_milli"), F.asc("bigram")).limit(
        _PMI_TOP_K
    )


# ---------------------------------------------------------------------------
# Purged time-series cross-validation folds
# ---------------------------------------------------------------------------

_CV_FOLDS = 5
_CV_EMBARGO_US = 86_400_000_000  # 1 day


@query(
    "purged_timeseries_cv",
    oracle=f"""
    WITH ev AS (SELECT epoch_us(ts) AS us FROM events),
    rng AS (SELECT min(us) AS mn, max(us) AS mx FROM ev),
    w AS (SELECT mn, mx, (mx - mn) // {_CV_FOLDS} + 1 AS width FROM rng),
    folds AS (
      SELECT f.fold, w.mn + (f.fold - 1) * w.width AS fs,
             w.mn + f.fold * w.width AS fe
      FROM (SELECT unnest(range(1, {_CV_FOLDS + 1})) AS fold) f, w),
    cells AS (
      SELECT folds.fold,
             CASE
               WHEN ev.us >= folds.fs AND ev.us < folds.fe THEN 'test'
               WHEN ev.us >= folds.fs - {_CV_EMBARGO_US}
                    AND ev.us < folds.fe + {_CV_EMBARGO_US} THEN 'purged'
               ELSE 'train'
             END AS role
      FROM ev CROSS JOIN folds)
    SELECT fold,
           sum((role = 'test')::INT)::BIGINT AS n_test,
           sum((role = 'purged')::INT)::BIGINT AS n_purged,
           sum((role = 'train')::INT)::BIGINT AS n_train
    FROM cells GROUP BY fold
    """,
    doc=f"Purged time-series cross-validation: {_CV_FOLDS} contiguous "
    "time folds (integer epoch-microsecond arithmetic — BIGINT "
    "division, exact on both engines) with a 1-day embargo zone on "
    "each side of the test fold; rows inside the embargo are PURGED "
    "from training (Lopez de Prado's leakage fix: temporally adjacent "
    "rows are correlated, so a random K-fold quietly trains on the "
    "test set's neighbors). Output is the per-fold train/test/purged "
    "census — the audit a temporal model pipeline runs before "
    "training. Plan: one 2-value min/max agg, then each event "
    f"classifies against a broadcast {_CV_FOLDS}-row fold table — "
    "scan × folds, no shuffle wider than the final 5-key agg.",
)
def purged_timeseries_cv(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    ev = events.select(
        (F.unix_micros(F.col("ts").cast("timestamp"))).alias("us")
    )
    rng = ev.agg(F.min("us").alias("mn"), F.max("us").alias("mx"))
    # `div` = exact BIGINT floor division, matching DuckDB's `//`
    # (a double-division cast could land on the wrong side of an
    # integer boundary for large epoch spans)
    w = rng.select(
        "mn", F.expr(f"(mx - mn) div {_CV_FOLDS} + 1 as width")
    )
    folds = (
        w.select(
            "mn",
            "width",
            F.explode(
                F.sequence(F.lit(1), F.lit(_CV_FOLDS))
            ).alias("fold"),
        )
        .select(
            "fold",
            (F.col("mn") + (F.col("fold") - 1) * F.col("width")).alias("fs"),
            (F.col("mn") + F.col("fold") * F.col("width")).alias("fe"),
        )
    )
    cells = ev.crossJoin(F.broadcast(folds)).select(
        "fold",
        F.when(
            (F.col("us") >= F.col("fs")) & (F.col("us") < F.col("fe")),
            F.lit("test"),
        )
        .when(
            (F.col("us") >= F.col("fs") - _CV_EMBARGO_US)
            & (F.col("us") < F.col("fe") + _CV_EMBARGO_US),
            F.lit("purged"),
        )
        .otherwise(F.lit("train"))
        .alias("role"),
    )
    return cells.groupBy("fold").agg(
        F.sum((F.col("role") == "test").cast("int")).cast("long").alias(
            "n_test"
        ),
        F.sum((F.col("role") == "purged").cast("int")).cast("long").alias(
            "n_purged"
        ),
        F.sum((F.col("role") == "train").cast("int")).cast("long").alias(
            "n_train"
        ),
    )


# ---------------------------------------------------------------------------
# NDCG@k ranking evaluation
# ---------------------------------------------------------------------------

_NDCG_K = 10
_NDCG_GROUPS = 50

_SCORE2_SQL = (
    "(embedding[1]::DOUBLE + embedding[2]::DOUBLE"
    " + embedding[3]::DOUBLE + embedding[4]::DOUBLE)"
)


@query(
    "ndcg_at_k",
    oracle=f"""
    WITH scored AS (
      SELECT vec_id % {_NDCG_GROUPS} AS qgroup, vec_id,
             {_SCORE2_SQL} AS score,
             greatest(3 - label, 0)::BIGINT AS rel
      FROM embeddings),
    ranked AS (
      SELECT qgroup, rel,
             row_number() OVER (PARTITION BY qgroup
                                ORDER BY score DESC, vec_id) AS i,
             row_number() OVER (PARTITION BY qgroup
                                ORDER BY rel DESC, vec_id) AS j
      FROM scored),
    gains AS (
      SELECT qgroup,
             sum(CASE WHEN i <= {_NDCG_K} THEN
               CAST(round(1000000 * rel / log2(i + 1)) AS BIGINT)
               ELSE 0 END)::BIGINT AS dcg_micro,
             count(*)::BIGINT AS n_items
      FROM ranked GROUP BY qgroup),
    igains AS (
      SELECT qgroup,
             sum(CASE WHEN j <= {_NDCG_K} THEN
               CAST(round(1000000 * rel / log2(j + 1)) AS BIGINT)
               ELSE 0 END)::BIGINT AS idcg_micro
      FROM ranked GROUP BY qgroup)
    SELECT g.qgroup, g.n_items, g.dcg_micro, i.idcg_micro,
           CASE WHEN i.idcg_micro = 0 THEN NULL
                ELSE round(g.dcg_micro * 1.0 / i.idcg_micro, 6) END AS ndcg
    FROM gains g JOIN igains i USING (qgroup)
    """,
    doc=f"NDCG@{_NDCG_K} per query group ({_NDCG_GROUPS} synthetic "
    "groups = vec_id mod, score = leading-dims sum, graded relevance "
    "= max(3 - label, 0)): the ranking-quality readout retrieval and "
    "recommender evaluation leads with — position-discounted gain "
    "against the ideal ordering. Each item's discounted gain is "
    "quantized to integer micros (rel/log2(rank+1) takes one of 40 "
    "possible values; libm ulps sit ~1e7 below the quantum), so "
    "per-group DCG/IDCG are exact BIGINT sums and NDCG is one "
    "division. Ranks come from group-partitioned windows (parallelism "
    "= group count, no global sort); all-irrelevant groups yield NULL "
    "(try_divide), matching the oracle's CASE. Deterministic "
    "tie-breaks on vec_id in the predicted ordering; ties in the "
    "ideal ordering are interchangeable equal-rel items, so the IDCG "
    "sum is order-invariant.",
)
def ndcg_at_k(spark, sf_dir):
    (emb,) = tables(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    score = (
        F.element_at(e, 1) + F.element_at(e, 2)
        + F.element_at(e, 3) + F.element_at(e, 4)
    )
    scored = emb.select(
        (F.col("vec_id") % _NDCG_GROUPS).alias("qgroup"),
        F.col("vec_id"),
        score.alias("score"),
        F.greatest(F.lit(3) - F.col("label"), F.lit(0))
        .cast("long")
        .alias("rel"),
    )
    wi = Window.partitionBy("qgroup").orderBy(
        F.desc("score"), F.asc("vec_id")
    )
    wj = Window.partitionBy("qgroup").orderBy(F.desc("rel"), F.asc("vec_id"))
    ranked = scored.select(
        "qgroup",
        "rel",
        F.row_number().over(wi).alias("i"),
        F.row_number().over(wj).alias("j"),
    )

    def gain(rank_col: str) -> F.Column:
        return F.when(
            F.col(rank_col) <= _NDCG_K,
            F.round(
                F.lit(1000000) * F.col("rel") / F.log2(F.col(rank_col) + 1)
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    per = ranked.groupBy("qgroup").agg(
        F.sum(gain("i")).cast("long").alias("dcg_micro"),
        F.sum(gain("j")).cast("long").alias("idcg_micro"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )
    return per.select(
        "qgroup",
        "n_items",
        "dcg_micro",
        "idcg_micro",
        F.round(
            F.try_divide(
                F.col("dcg_micro") * F.lit(1.0),
                F.when(F.col("idcg_micro") == 0, None).otherwise(
                    F.col("idcg_micro")
                ),
            ),
            6,
        ).alias("ndcg"),
    )


# ---------------------------------------------------------------------------
# Split-conformal coverage certification
# ---------------------------------------------------------------------------

_CONF_ALPHA = 0.1
# Fixed-size calibration sample (VERDICT r6 "What's wrong #3"): the
# registered form calibrates on AT MOST this many rows, picked by the
# house Knuth-mix deterministic permutation (same constants as
# stratified_sample_exact), so the order-statistic sort+limit state is
# corpus-independent — coverage precision saturates at ~1/sqrt(n_cal)
# anyway, which is why production conformal calibrates on a sample.
_CONF_CAL_LIMIT = 200
_CONF_MIX = 2654435761
_CONF_SHIFT = 13
_CONF_MASK = 1 << 31


@query(
    "conformal_coverage_cert",
    oracle=f"""
    WITH scored AS (
      SELECT vec_id, {_SCORE2_SQL} AS score FROM embeddings),
    cal AS (
      SELECT score FROM (
        SELECT score,
               (((vec_id % {_CONF_MASK}) * {_CONF_MIX}) >> {_CONF_SHIFT})
                 AS skey,
               vec_id
        FROM scored WHERE vec_id % 2 = 0
        ORDER BY skey, vec_id LIMIT {_CONF_CAL_LIMIT})),
    tst AS (SELECT score FROM scored WHERE vec_id % 2 = 1),
    nc AS (SELECT count(*)::BIGINT AS n_cal FROM cal),
    klo AS (SELECT greatest(CAST(floor({_CONF_ALPHA} / 2 * (n_cal + 1))
                            AS BIGINT), 1) AS k FROM nc),
    khi AS (SELECT least(CAST(ceil((1 - {_CONF_ALPHA} / 2) * (n_cal + 1))
                         AS BIGINT), n_cal) AS k FROM nc),
    qlo AS (SELECT max(score) AS q FROM
              (SELECT score FROM cal ORDER BY score
               LIMIT (SELECT k FROM klo))),
    qhi AS (SELECT min(score) AS q FROM
              (SELECT score FROM cal ORDER BY score DESC
               LIMIT (SELECT (SELECT n_cal FROM nc) - k + 1 FROM khi)))
    SELECT nc.n_cal,
           (SELECT count(*) FROM tst)::BIGINT AS n_test,
           round(qlo.q, 6) AS q_lo, round(qhi.q, 6) AS q_hi,
           round((SELECT count(*) FILTER (WHERE score >= qlo.q
                                          AND score <= qhi.q)
                  FROM tst) * 1.0
                 / (SELECT count(*) FROM tst), 6) AS coverage
    FROM nc, qlo, qhi
    """,
    doc=f"Split-conformal coverage certification (alpha = "
    f"{_CONF_ALPHA}): the calibration half (even ids) yields the "
    "rank-based empirical interval [q_lo, q_hi] (order statistics at "
    "floor(alpha/2·(n+1)) and ceil((1-alpha/2)·(n+1)) — the "
    "finite-sample-valid conformal ranks, not interpolated "
    "percentiles), and the held-out half measures realized coverage — "
    "the distribution-free guarantee every conformal deployment "
    "certifies before trusting its intervals. Order statistics are "
    "PICKED values via sort+limit (TakeOrderedAndProject per-partition "
    "heaps, never a global-sort window), so both engines compare "
    "against bit-identical doubles and coverage is an exact count "
    "ratio. The one count() is calibration-set sizing, the same "
    "driver-scalar class as semdedup's auto-k — and it is bounded by "
    f"``calibration_limit`` ({_CONF_CAL_LIMIT}), never the corpus. "
    "Scale posture: the calibration set is a FIXED-SIZE deterministic "
    "sample of the even-id half — the calibration_limit smallest "
    "Knuth-mixed ids (the stratified_sample_exact permutation, "
    "engine-replayable), taken with orderBy+limit = "
    "TakeOrderedAndProject per-partition heaps of calibration_limit "
    "rows. Every subsequent order-statistic sort runs on <= "
    "calibration_limit rows, so state is corpus-independent at any "
    "scale; coverage precision saturates at ~1/sqrt(n_cal), which is "
    "why production conformal calibrates on a sample in the first "
    "place (VERDICT r6 what's-wrong #3: the registered form now IS "
    "the scale-safe form).",
)
def conformal_coverage_cert(spark, sf_dir, calibration_limit=_CONF_CAL_LIMIT):
    (emb,) = tables(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    score = (
        F.element_at(e, 1) + F.element_at(e, 2)
        + F.element_at(e, 3) + F.element_at(e, 4)
    )
    scored = emb.select(F.col("vec_id"), score.alias("score"))
    skey = F.shiftright(
        (F.col("vec_id") % _CONF_MASK) * F.lit(_CONF_MIX), _CONF_SHIFT
    )
    cal = (
        scored.filter(F.col("vec_id") % 2 == 0)
        .select("score", "vec_id", skey.alias("skey"))
        .orderBy("skey", "vec_id")
        .limit(calibration_limit)
        .select("score")
    )
    tst = scored.filter(F.col("vec_id") % 2 == 1).select("score")
    import math

    n_cal = cal.count()
    k_lo = max(int(math.floor(_CONF_ALPHA / 2 * (n_cal + 1))), 1)
    k_hi = min(int(math.ceil((1 - _CONF_ALPHA / 2) * (n_cal + 1))), n_cal)
    qlo = cal.orderBy(F.asc("score")).limit(k_lo).agg(
        F.max("score").alias("q_lo")
    )
    qhi = cal.orderBy(F.desc("score")).limit(n_cal - k_hi + 1).agg(
        F.min("score").alias("q_hi")
    )
    cov = (
        tst.crossJoin(F.broadcast(qlo))
        .crossJoin(F.broadcast(qhi))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                (
                    (F.col("score") >= F.col("q_lo"))
                    & (F.col("score") <= F.col("q_hi"))
                ).cast("int")
            ).alias("n_in"),
            F.first("q_lo").alias("q_lo"),
            F.first("q_hi").alias("q_hi"),
        )
    )
    return cov.select(
        F.lit(n_cal).cast("long").alias("n_cal"),
        "n_test",
        F.round(F.col("q_lo"), 6).alias("q_lo"),
        F.round(F.col("q_hi"), 6).alias("q_hi"),
        F.round(F.col("n_in") * F.lit(1.0) / F.col("n_test"), 6).alias(
            "coverage"
        ),
    )


# ---------------------------------------------------------------------------
# Standardized-mean-difference covariate balance
# ---------------------------------------------------------------------------


@query(
    "smd_balance_check",
    oracle="""
    WITH armed AS (
      SELECT event_type,
             CASE WHEN user_id % 2 = 0 THEN 't' ELSE 'c' END AS arm,
             value
      FROM events),
    per AS (
      SELECT event_type, arm, count(*)::BIGINT AS n,
             avg(value) AS mu, var_samp(value) AS s2
      FROM armed GROUP BY event_type, arm)
    SELECT t.event_type,
           t.n AS n_t, c.n AS n_c,
           round(t.mu, 6) AS mean_t, round(c.mu, 6) AS mean_c,
           round((t.mu - c.mu) / sqrt((t.s2 + c.s2) / 2), 4) AS smd,
           (abs(round((t.mu - c.mu) / sqrt((t.s2 + c.s2) / 2), 4)) < 0.1)
             AS balanced
    FROM per t JOIN per c
      ON t.event_type = c.event_type AND t.arm = 't' AND c.arm = 'c'
    """,
    doc="Standardized-mean-difference covariate balance per stratum "
    "(arms = user-id parity, strata = event type, covariate = value): "
    "SMD = (mean_t - mean_c) / sqrt((var_t + var_c)/2), the "
    "causal-inference balance diagnostic run BEFORE trusting any "
    "treatment-effect estimate — |SMD| < 0.1 is the conventional "
    "balanced threshold, and the boolean is derived from the ROUNDED "
    "smd so both engines compare the identical quantized value. One "
    "map-side-combinable (stratum, arm) aggregate, then a stratum-"
    "keyed self-join of the tiny stats relation — the same shape as "
    "ab_test_welch_t, whose 6-decimal rounding of double moments this "
    "inherits (events.value sums are ~1e7, twelve orders below the "
    "quantum).",
)
def smd_balance_check(spark, sf_dir):
    (events,) = tables(spark, sf_dir, "events")
    armed = events.select(
        "event_type",
        F.when(F.col("user_id") % 2 == 0, "t").otherwise("c").alias("arm"),
        "value",
    )
    per = armed.groupBy("event_type", "arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("value").alias("mu"),
        F.var_samp("value").alias("s2"),
    )
    t = per.filter(F.col("arm") == "t").alias("t")
    c = per.filter(F.col("arm") == "c").alias("c")
    smd = F.round(
        (F.col("t.mu") - F.col("c.mu"))
        / F.sqrt((F.col("t.s2") + F.col("c.s2")) / 2),
        4,
    )
    return t.join(c, F.col("t.event_type") == F.col("c.event_type")).select(
        F.col("t.event_type").alias("event_type"),
        F.col("t.n").alias("n_t"),
        F.col("c.n").alias("n_c"),
        F.round(F.col("t.mu"), 6).alias("mean_t"),
        F.round(F.col("c.mu"), 6).alias("mean_c"),
        smd.alias("smd"),
        (F.abs(smd) < 0.1).alias("balanced"),
    )
