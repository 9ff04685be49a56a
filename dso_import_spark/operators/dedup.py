"""Deduplication operators for large-scale document pipelines.

Five tiers, cheapest to most expensive (run in this order at scale —
each tier shrinks the candidate set for the next):

1. exact_dedup            hash groupBy on a normalization key; one shuffle
2. simhash fingerprints   narrow projection (functions.text.simhash32)
3. minhash_lsh_pairs      Spark ML MinHashLSH banding → bucket join
4. ngram_jaccard_pairs    exact Jaccard on a blocked candidate set
5. embedding near-dup     cosine over blocked pairs (operators.similarity)

Scale notes: everything shuffles at most once on a dedup/band key.
The pairwise joins are always *blocked* (LSH band, label, language) —
never an unblocked O(n²) cross join. At 100 TB you'd additionally
salt hot bands and cap per-bucket fan-out; the band-hash keyspace is
uniform by construction so skew is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dso_import_spark.functions.text import (
    bow_fingerprint,
    simhash32,
    tokens,
    word_hash32,
)


def exact_dedup(
    df: DataFrame,
    key_cols: list,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup: keep the min-id row per key (deterministic keeper).

    Returns (key..., keeper_id, n_dups). One hash-aggregation shuffle;
    map-side partial aggregation makes this robust to duplicate-heavy
    inputs (the common case in web-scale corpora).
    """
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("keeper_id"),
        F.count(F.lit(1)).alias("n_dups"),
    )


def normalized_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on the bag-of-words md5 fingerprint (case/order-proof).

    Lowercases before fingerprinting: ``bow_fingerprint`` itself is
    case-SENSITIVE (tokens() is a pinned cross-engine definition shared
    with ~30 oracles), so the case-insensitivity this operator promises
    is applied here, on the way in. Execution-tested in
    tests/test_export_coverage.py (the simhash_pairs lesson: this
    operator previously shipped with a docstring promising case-proof
    dedup while delivering case-sensitive dedup, caught only when the
    export audit forced an executing test).
    """
    return exact_dedup(
        df.withColumn("fingerprint", bow_fingerprint(F.lower(F.col(text_col)))),
        ["fingerprint"],
        id_col,
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Near-dup candidate pairs via SimHash banding + Hamming verify.

    A 32-bit simhash is split into ``n_bands`` 8-bit bands; docs
    sharing any band collide into a candidate bucket (guaranteed to
    catch all pairs with < n_bands differing bits). Candidates are then
    verified with an exact popcount. Join is on (band_idx, band_value)
    — bounded buckets, no cross join.
    """
    from dso_import_spark.functions.text import hamming32

    if max_hamming >= n_bands:
        raise ValueError(
            f"simhash_pairs: max_hamming={max_hamming} needs more than "
            f"n_bands={n_bands} bands — banding only guarantees a "
            "collision for pairs with FEWER than n_bands differing "
            "bits, so pairs inside the requested distance could be "
            "silently missed; raise n_bands"
        )
    band_bits = 32 // n_bands
    sh = df.select(
        F.col(id_col).alias("id"), simhash32(text_col).alias("simhash")
    )
    banded = sh.select(
        "id",
        "simhash",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    # call_function, not F.shiftright: the PySpark
                    # wrapper only accepts a LITERAL int bit count and
                    # raises at plan build for a Column (round-8
                    # review — this operator was dead code until then;
                    # same workaround as bloom.py and the verify notes)
                    F.call_function(
                        "shiftright", F.col("simhash"), b * band_bits
                    )
                    .bitwiseAND(F.lit((1 << band_bits) - 1))
                    .alias("value"),
                ),
            )
        ).alias("bv"),
    ).select("id", "simhash", F.col("bv.band").alias("band"), F.col("bv.value").alias("value"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.value") == F.col("b.value"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.withColumn(
        "hamming", hamming32(F.col("sh_a"), F.col("sh_b"))
    ).filter(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: list | None = None,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-set Jaccard similarity over blocked candidate pairs.

    explode distinct tokens → self-join on (token, block) → per-pair
    intersection count → |A∩B| / (|A|+|B|-|A∩B|). The block columns
    bound the join fan-out; at scale you block on an LSH band instead
    of metadata. Returns (id_a, id_b, jaccard) with jaccard >= threshold.
    """
    block_cols = block_cols or []
    toks = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in block_cols],
        F.array_distinct(tokens(text_col)).alias("toks"),
    ).withColumn("n_toks", F.size("toks"))
    words = toks.select(
        "id", "n_toks", *block_cols, F.explode("toks").alias("word")
    )
    a, b = words.alias("a"), words.alias("b")
    join_cond = (F.col("a.word") == F.col("b.word")) & (
        F.col("a.id") < F.col("b.id")
    )
    for c in block_cols:
        join_cond = join_cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    shared = (
        a.join(b, join_cond)
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_toks").alias("n_a"),
            F.col("b.n_toks").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    jac = F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
    return (
        shared.withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def shingle_array_from_tokens(t, shingle_len: int = 3):
    """Distinct word ``shingle_len``-gram array from a token-array
    Column (space-joined token windows; empty array below
    ``shingle_len`` tokens).

    Pass a BOUND column (a projected attribute), not an inline
    ``tokens(...)`` expression: this expression references the token
    array ~3× per shingle, and codegen re-evaluates embedded
    subexpressions each time — an inline split() makes one shingling
    pass O(n_tokens²) per row (measured: 9.2 s for one pass over 5000
    sf0.1 docs inline vs <1 s with the tokens projected first)."""
    return F.when(
        F.size(t) >= shingle_len,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (shingle_len - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(t, i + off) for off in range(shingle_len)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingle_array(text_col: str, shingle_len: int = 3):
    """Distinct word ``shingle_len``-gram array of a text column, as a
    pure Column expression. Convenience wrapper embedding the tokenize
    — fine under an explode (one evaluation), quadratic when consumed
    many times per row; prefer projecting ``tokens()`` to a column and
    calling ``shingle_array_from_tokens`` (see its docstring)."""
    return shingle_array_from_tokens(tokens(text_col), shingle_len)


def shingle_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: list | None = None,
    threshold: float = 0.1,
    shingle_len: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Asymmetric near-dup detection by word-shingle CONTAINMENT
    (Broder 1997): max-containment = |A∩B| / min(|A|,|B|) over distinct
    word ``shingle_len``-gram sets. Containment catches what Jaccard
    misses — a short document quoted inside a long one scores ~1.0 on
    containment but near 0 on Jaccard — which is exactly the
    training-data case (boilerplate inclusion, quoted passages).

    Scale shape: shingles are far more selective than unigrams, so the
    (shingle, block) equi-join's fan-out per key is near 1 without any
    max-df guard; everything else is the blocked-pair pattern of
    ngram_jaccard_pairs (explode → self-join → count). The input is
    pre-spread (`spread_for_explode`, amplification ~500 for shingle
    strings) because document parquet reads as few splits while the
    shingle explode amplifies ~500×: measured 36.8 s single-split vs
    14.1 s spread at sf0.1, and the ×10 corpus ran single-task for
    minutes unspread (SCALING.md round-5 table). Returns
    (id_a, id_b, containment >= threshold) with containment rounded
    to 4dp.

    SCALE WARNING — this exact form self-joins on EVERY shared
    (shingle, block) key: a shingle present in d documents contributes
    d·(d−1)/2 candidate pairs, so one viral boilerplate shingle goes
    quadratic (measured: ×10 corpus replication → 136× pairs; ×100 →
    DNF, SCALING.md round-5 table). Keep this form as the
    certification pin on bounded corpora; at 100 TB run
    ``shingle_containment_banded`` (MinHash-banded candidates feeding
    the identical verify arithmetic — candidate count is bounded by
    the LSH S-curve, not by shingle document frequency).

    ``max_df`` is the guard for the exact form: when set, the shingle
    document frequency per block is profiled BEFORE the self-join,
    shingles occurring in more than ``max_df`` documents are dropped
    from PAIR GENERATION ONLY (the standard max-df cap — boilerplate
    docs still pair through their thousands of non-viral shingles),
    and a ``UserWarning`` names the hottest shingle's frequency so the
    would-be blowup is visible before it burns a cluster-day.
    Candidates are then scored by ``exact_containment_verify`` against
    the UNCAPPED exploded relation, so every surviving pair carries
    its exact containment value, hot shingles included — the cap
    changes results only for pairs whose EVERY shared shingle is
    hotter than ``max_df`` (they generate no candidate). Verify cost
    is O(candidates · avg set size), linear in the hot shingles it
    re-admits, never quadratic in their document frequency.
    """
    from dso_import_spark.queries_pkg.util import spread_for_explode

    block_cols = block_cols or []
    df = spread_for_explode(df, id_col, amplification=500)
    # tokens staged as a bound column, and explode_OUTER: a plain
    # explode lets the optimizer infer `size(sh) > 0` and push it —
    # with the whole shingle expression inlined — below the spread
    # exchange into the single-split scan task, serializing the
    # shingling (measured 14.1 s vs 3.0 s at sf0.1). explode_outer
    # infers nothing; the NULL shingle row an empty doc emits can
    # never satisfy the a.shingle = b.shingle equi-join, so results
    # are identical.
    toked = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in block_cols],
        tokens(text_col).alias("t"),
    )
    sh = toked.select(
        "id",
        *block_cols,
        shingle_array_from_tokens(F.col("t"), shingle_len).alias("sh"),
    ).withColumn("n_sh", F.size("sh"))
    ex = sh.select(
        "id", "n_sh", *block_cols, F.explode_outer("sh").alias("shingle")
    )
    if max_df is not None:
        import warnings

        freq = (
            ex.filter(F.col("shingle").isNotNull())
            .groupBy(*block_cols, "shingle")
            .agg(F.count(F.lit(1)).alias("df"))
        )
        hot = freq.filter(F.col("df") > max_df)
        top = hot.agg(
            F.count(F.lit(1)).alias("n_hot"), F.max("df").alias("top_df")
        ).collect()[0]
        if top["n_hot"]:
            warnings.warn(
                f"shingle_containment_pairs: {top['n_hot']} shingles "
                f"exceed max_df={max_df} (hottest appears in "
                f"{top['top_df']} docs → ~{top['top_df'] ** 2 // 2} pairs "
                "from that key alone); dropping them from pair "
                "generation. For unbounded corpora use "
                "shingle_containment_banded.",
                UserWarning,
                stacklevel=2,
            )
        # capped relation for PAIR GENERATION only: any pair sharing a
        # mix of hot and cold shingles still candidates through its
        # cold ones, and the verify below re-scores against the
        # UNCAPPED relation so containment stays exact (a capped
        # n_shared would silently undercount mixed pairs and drop them
        # below threshold)
        cold = ex.join(
            hot.select(*block_cols, "shingle"),
            [*block_cols, "shingle"],
            "left_anti",
        )
        a, b = cold.alias("a"), cold.alias("b")
        cond = (F.col("a.shingle") == F.col("b.shingle")) & (
            F.col("a.id") < F.col("b.id")
        )
        for c in block_cols:
            cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
        cand = (
            a.join(b, cond)
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
        return exact_containment_verify(ex, cand, threshold)
    a, b = ex.alias("a"), ex.alias("b")
    cond = (F.col("a.shingle") == F.col("b.shingle")) & (
        F.col("a.id") < F.col("b.id")
    )
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    shared = (
        a.join(b, cond)
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    cont = F.col("n_shared") / F.least(F.col("n_a"), F.col("n_b"))
    return (
        shared.withColumn("containment", F.round(cont, 4))
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )


def minhash_sig_cols(hash_arr_col: str, n_hashes: int = 8) -> list:
    """Array-native MinHash signature Column expressions over a
    projected hash-array column: ``m_i = array_min((a_i·x + b_i) mod
    P)`` with the engine-portable constants ``P = 4294967311``,
    ``a_i = 40503·i + 1``, ``b_i = 12345·i + 7`` — identical values to
    ``minhash_band_candidates``'s explode + groupBy(min) (asserted by
    tests/test_compositions.py's parity test) with ZERO shuffle.

    Built via a lambda FACTORY on purpose: passing F.transform a
    ``lambda x, i=i: ...`` silently turns it into the two-argument
    (element, index) lambda form — ``i`` becomes the array INDEX
    column and every signature collapses to one index-weighted
    expression. That bug shipped briefly in round 6 and the end-to-end
    containment differential did NOT catch it (the fixture's
    qualifying pairs coincided under both candidate sets); the sig
    parity test is the guard.
    """
    P = 4294967311

    def affine_min(i: int):
        return F.array_min(
            F.transform(
                F.col(hash_arr_col),
                lambda x: (F.lit(40503 * i + 1) * x + F.lit(12345 * i + 7))
                % P,
            )
        )

    return [affine_min(i).alias(f"m{i}") for i in range(n_hashes)]


def set_minhash_band_candidates(
    exploded: DataFrame,
    id_col: str = "id",
    elem_col: str = "shingle",
    block_cols: list | None = None,
    n_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """MinHash + LSH banding over an arbitrary exploded element set:
    the candidate-generation stage of every set-similarity pipeline,
    generalized from words (``minhash_band_candidates``) to any
    (id, element) relation — shingles, char-grams, feature ids.

    Same engine-portable arithmetic as ``minhash_band_candidates``
    (md5-prefix 32-bit element hash; signature i = min((a_i·x + b_i)
    mod P) with P = 4294967311, a_i = 40503·i + 1, b_i = 12345·i + 7;
    bands of ``band_size`` consecutive signatures), so a SQL oracle
    replays candidates exactly. ``block_cols`` (carried through the
    signature groupBy and required equal in the band join) confine
    candidates to a partition key — e.g. language.

    Plan: one shuffle to build signatures (groupBy id), one on the
    band key; band values are md5-derived minima, so bucket skew is
    bounded by true set similarity (identical sets collide — that is
    the point), never by a single hot element the way a raw
    element-equality self-join is. Returns distinct (id_a, id_b) with
    id_a < id_b.
    """
    P = 4294967311
    block_cols = block_cols or []
    n_bands = n_hashes // band_size
    hashed = exploded.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in block_cols],
        word_hash32(F.col(elem_col)).alias("x"),
    )
    sigs = hashed.groupBy("doc_id", *block_cols).agg(
        *[
            F.min((F.lit(40503 * i + 1) * F.col("x") + F.lit(12345 * i + 7)) % P)
            .alias(f"m{i}")
            for i in range(n_hashes)
        ]
    )
    bands = sigs.select(
        "doc_id",
        *block_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        *[
                            F.col(f"m{j * band_size + k}").alias(f"v{k}")
                            for k in range(band_size)
                        ],
                    )
                    for j in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("doc_id", *block_cols, "b.*")
    vkeys = ["band"] + [f"v{k}" for k in range(band_size)] + list(block_cols)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            [F.col(f"a.{k}") == F.col(f"b.{k}") for k in vkeys]
            + [F.col("a.doc_id") < F.col("b.doc_id")],
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )


def exact_containment_verify(
    exploded: DataFrame,
    cand: DataFrame,
    threshold: float = 0.1,
    round_scale: int = 4,
) -> DataFrame:
    """Exact set-containment over a candidate-pair set: |A∩B| /
    min(|A|,|B|) — the verify stage of ``shingle_containment_pairs``
    factored to run on candidates only.

    ``exploded`` is (id, n_sh, shingle) — one row per distinct element
    per set, with the set's TOTAL size carried on every row; ``cand``
    is (id_a, id_b) with id_a < id_b. Only candidate pairs are ever
    scored: two broadcast-or-shuffle hash joins against the exploded
    relation and one count aggregation, so cost is
    O(candidates · avg set size), never O(shared-element pairs).
    Returns (id_a, id_b, containment >= threshold), rounded.
    """
    words = exploded.select(
        F.col("id").alias("doc_id"), F.col("n_sh"), F.col("shingle")
    )
    shared = (
        cand.join(
            words.select(
                F.col("doc_id").alias("id_a"),
                F.col("n_sh").alias("n_a"),
                "shingle",
            ),
            "id_a",
        )
        .join(
            words.select(
                F.col("doc_id").alias("id_b"),
                F.col("n_sh").alias("n_b"),
                "shingle",
            ),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    cont = F.col("n_shared") / F.least(F.col("n_a"), F.col("n_b"))
    return (
        shared.withColumn("containment", F.round(cont, round_scale))
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )


def shingle_containment_banded(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: list | None = None,
    threshold: float = 0.1,
    shingle_len: int = 3,
    n_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """The 100 TB form of ``shingle_containment_pairs``: MinHash-banded
    candidate pairs over the shingle sets, then the identical exact
    containment verify on candidates only.

    The exact form's cost is Σ_shingle df·(df−1)/2 — quadratic in the
    hottest shingle's document frequency, which is exactly the viral-
    boilerplate case this operator exists to detect (measured DNF at
    ×100 replication, SCALING.md). Here candidate generation is the
    LSH band join instead: cost follows the banding S-curve
    P(candidate) = 1 − (1 − j^r)^b over shingle-set Jaccard j, bounded
    by true pair similarity rather than by any single key's frequency.
    The verify stage then computes the same rounded containment value
    the exact form would — so banded output ⊆ exact output, missing
    only pairs the S-curve keeps (quantified per-decile by
    ``minhash_recall_cert``'s machinery on word sets).

    Honest recall note: banding estimates shingle-set JACCARD, so this
    form is reliable only for NEAR-TWIN pairs — at default (b=4, r=2)
    a full inclusion at size ratio ρ has J ≈ 1/ρ and
    P(candidate) = 1 − (1 − J²)⁴: ratio 1 → 100%, 2× (J = 0.5) → 68%,
    3× (J = 0.33) → 37%, 5× (J = 0.2) → 15%, 10× (J = 0.1) → 4% — the
    S-curve floor, measured at 0.001 recall on the ×10 corpus
    (SCALING.md round-6 recall table). Asymmetric inclusions — the
    quoted-passage case containment exists for — need
    ``shingle_containment_prefix`` (prefix-filter candidates:
    deterministic 100% recall at ANY size ratio, measured 1.000 at
    2–30× on the round-7 inclusion fixture where this form measures
    0.56/0.12/0.04/0.04) or LSH-Ensemble-style size-stratified
    banding.

    Physical plan — everything stays ARRAY-NATIVE, never exploding the
    ~500× shingle inventory the exact form shuffles:
    - signatures are per-row Column expressions (``array_min`` over the
      affine-transformed shingle-hash array — same arithmetic as
      ``set_minhash_band_candidates``'s groupBy(min), zero shuffle);
    - the band explode emits ``n_bands`` 3-int rows per doc (not one
      row per shingle), so the only wide shuffle is the band equi-join;
    - the verify joins the small candidate set back to the per-doc
      shingle ARRAYS and counts ``array_intersect`` — O(|A|+|B|) per
      candidate pair, with AQE free to broadcast the candidate side.
    Measured at sf0.1: 2.1 s vs 17.9 s for the exploded composition and
    14.1 s for the exact form (SCALING.md round-6).

    Returns (id_a, id_b, containment >= threshold), rounded to 4dp.
    """
    from dso_import_spark.queries_pkg.util import spread_for_explode

    P = 4294967311
    block_cols = block_cols or []
    n_bands = n_hashes // band_size
    # No row explosion, but the per-doc Column work (tokenize → shingle
    # transform → n_hashes affine passes, × three consumers of `sets`)
    # is ~500 ops per input byte — the same splits ≪ cores hazard as an
    # explode, so the same volume-gated spread applies (measured: one
    # sf0.1 parquet split → every tokenize stage single-task, 32.3 s;
    # spread → 2.1 s).
    df = spread_for_explode(df, id_col, amplification=500)
    # Stage the array pipeline as separate projections so each level is
    # a BOUND attribute computed once per row (tokens → shingles →
    # hashes) — see shingle_array_from_tokens. Deliberately NO
    # row-level filter on the shingle array: a filter referencing it
    # (explicit n_sh > 0, or one inferred from an explode) gets
    # predicate-pushed below the spread exchange with the whole
    # shingle expression INLINED, shingling the corpus inside the
    # single-split scan task (measured: 14 s single-task vs 0.4 s
    # spread at sf0.1). Empty-shingle docs instead die algebraically:
    # array_min(empty) is NULL, and NULL band values match nothing in
    # the band equi-join.
    toked = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in block_cols],
        tokens(text_col).alias("t"),
    )
    sets = toked.select(
        "id",
        *block_cols,
        shingle_array_from_tokens(F.col("t"), shingle_len).alias("sh"),
    ).withColumn("n_sh", F.size("sh"))
    hashed = sets.withColumn("hs", F.transform(F.col("sh"), word_hash32))
    sigs = hashed.select(
        "id", *block_cols, *minhash_sig_cols("hs", n_hashes)
    )
    bands = sigs.select(
        "id",
        *block_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        *[
                            F.col(f"m{j * band_size + k}").alias(f"v{k}")
                            for k in range(band_size)
                        ],
                    )
                    for j in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("id", *block_cols, "b.*")
    vkeys = ["band"] + [f"v{k}" for k in range(band_size)] + list(block_cols)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            [F.col(f"a.{k}") == F.col(f"b.{k}") for k in vkeys]
            + [F.col("a.id") < F.col("b.id")],
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    scored = (
        cand.join(
            sets.select(
                F.col("id").alias("id_a"),
                F.col("n_sh").alias("n_a"),
                F.col("sh").alias("sh_a"),
            ),
            "id_a",
        )
        .join(
            sets.select(
                F.col("id").alias("id_b"),
                F.col("n_sh").alias("n_b"),
                F.col("sh").alias("sh_b"),
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.least("n_a", "n_b"),
                4,
            ).alias("containment"),
        )
    )
    return scored.filter(F.col("containment") >= threshold)


def shingle_containment_prefix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: list | None = None,
    threshold: float = 0.9,
    shingle_len: int = 3,
) -> DataFrame:
    """Asymmetric-inclusion containment pairs via PREFIX FILTERING:
    deterministic 100% recall at ANY size ratio — the scale path for
    the quoted-passage case (a short document embedded in a much
    longer one: containment ≈ 1.0, Jaccard ≈ 1/ratio) that MinHash
    banding structurally misses (``shingle_containment_banded``'s
    S-curve predicts P ≈ 4% at 10× ratio and ~0.4% at 30×; measured
    banded recall on the round-7 inclusion fixture: 0.56 / 0.12 /
    0.04 / 0.04 at 2×/5×/10×/30×, where this form measures 1.000 at
    every ratio — SCALING.md round-7 table).

    The prefix-filter bound (Chaudhuri et al. 2006 SSJoin / Xiao et
    al. PPJoin — the Jaccard form is ``dedup_prefix_filter_pairs``),
    adapted to max-containment C = |A∩B| / min(|A|,|B|): order the
    shingle universe by (document frequency ASC, shingle) and index
    each document by its ⌊(1−t)·n⌋ + 1 RAREST shingles. For any pair
    with C ≥ t, let A be the smaller side: fewer than ⌊(1−t)·n_A⌋ + 1
    of A's shingles lie outside B, so A's prefix MUST contain a
    shingle of B — joining every doc's prefix against the full
    inventory provably surfaces every qualifying pair, at any size
    ratio. (LSH Ensemble — size-stratified per-stratum (b, r) banding
    — solves the same regime probabilistically for the query-vs-index
    case; for the self-join case the prefix bound is strictly
    stronger: exact, parameter-free, and one join.)

    Round-8 re-shape (VERDICT r7 what's-wrong #2): the WHOLE pipeline
    runs in the HASHED shingle universe — each doc's shingle set maps
    to its DISTINCT ``word_hash32`` set (8-byte longs) immediately
    after shingling, and the df profile, per-doc rank, prefix join,
    and array-intersect verify all carry longs instead of ~50-byte
    shingle strings (~6× fewer shuffle bytes on every wide edge, the
    same re-shape that took banding_estimator_cert 43.4 → 16.9 s at
    ×100). The prefix bound holds verbatim in the hash universe (it is
    set-algebra over any element type), so recall stays deterministic
    100% — for pairs measured by HASH-set containment, which differs
    from string-set containment only when distinct shingles collide in
    32 bits (P ≈ n_a·n_b/2³² per pair; the equality-vs-exact-string
    tests in tests/test_components.py double as the collision guard on
    real corpora). The oracle replays the identical md5-prefix hash.

    Scale shape: candidates form only through RARE-shingle posting
    lists — a viral boilerplate shingle sits at the END of the global
    frequency order, so it enters a prefix only for documents made
    almost entirely of hotter shingles; the df-ascending order is
    exactly what caps the per-key fan-out the naive (shingle, shingle)
    self-join dies on. At threshold 0.9 the prefix is ~n/10 + 1
    shingles per doc, so the candidate join reads ~10% of the
    inventory on the probe side. Verify joins the candidate ids back
    to the per-doc hash ARRAYS (``array_intersect``, O(|A|+|B|)
    per pair), so output = EXACTLY the exact form's pairs at
    ``containment >= threshold`` — including the pairs whose RAW
    containment sits a half-quantum below t but rounds up to it,
    covered by the 5e-5 prefix-length slack (asserted against
    ``shingle_containment_pairs`` in tests/test_components.py).

    Shuffles: explode on (block, hash) for the df profile, one
    per-doc rank window (partition = doc — stratum-local, no global
    sort), the prefix-vs-inventory equi-join, and the pair-keyed
    verify. The tokenize→shingle→hash pipeline is recomputed for each
    of its consumers (df profile, rank input, inventory, two verify
    sides — Spark shares no subplans across a DAG): recompute vs an
    eager localCheckpoint of the compact per-doc hash relation was
    A/B-measured and RECOMPUTE wins at every scale (sf0.1 2.37 vs
    3.08 s, ×10 4.38 vs 5.26, ×100 76.2 vs 90.2 — materializing and
    re-reading 500k hash arrays costs more than re-running the
    codegen'd column pipeline over the parquet scan; SCALING.md
    round-8). Returns (id_a, id_b, containment), rounded to 4dp.
    """
    from pyspark.sql import Window

    from dso_import_spark.queries_pkg.util import spread_for_explode

    block_cols = block_cols or []
    df = spread_for_explode(df, id_col, amplification=500)
    toked = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in block_cols],
        tokens(text_col).alias("t"),
    )
    sets = toked.select(
        "id",
        *block_cols,
        shingle_array_from_tokens(F.col("t"), shingle_len).alias("sh"),
    )
    # the hashed universe: distinct word_hash32 set per doc. n_hv (not
    # the string-set size) drives both the prefix length and the
    # containment denominator, so bound and verify measure the SAME
    # sets and the recall proof applies end-to-end.
    hashed = sets.select(
        "id",
        *block_cols,
        F.array_distinct(F.transform(F.col("sh"), word_hash32)).alias("hv"),
    ).withColumn("n_hv", F.size("hv"))
    # explode_outer, not explode: an inferred size(hv) > 0 filter would
    # inline the shingle pipeline below the spread exchange (the
    # round-6 InferFiltersFromGenerate lesson); NULL hash rows die
    # in the inner df join below.
    ex = hashed.select(
        "id", "n_hv", *block_cols, F.explode_outer("hv").alias("h")
    )
    dfc = ex.groupBy(*block_cols, "h").agg(F.count(F.lit(1)).alias("dfc"))
    ranked = ex.join(dfc, [*block_cols, "h"]).withColumn(
        "rk",
        F.row_number().over(Window.partitionBy("id").orderBy("dfc", "h")),
    )
    # prefix length ⌊(1−t+5e-5)·n⌋ + 1, computed as
    # floor((1−t+5e-5)·n + 1e-9) + 1. Two guards live in that formula:
    # (a) the output filter below compares 4dp-ROUNDED containment, so
    # a pair with raw C in [t−5e-5, t) still passes the exact form —
    # the bound must therefore cover raw C ≥ t − 5e-5, hence the
    # half-quantum 5e-5 slack (one extra prefix shingle per 20 000 —
    # free; without it a 20 001-shingle doc at raw C = 0.899955 rounds
    # to 0.9000 yet its 2001-shingle prefix could sit entirely outside
    # the partner, a silent recall gap at exactly the document sizes
    # the operator targets); (b) the 1e-9 epsilon guards the
    # one-ulp-LOW float product ((1−0.9)·20 = 1.9999999999999996 would
    # floor to 1 and shorten the prefix below the guarantee). Both
    # overshoots only LENGTHEN the prefix, which is recall-safe. The
    # oracle embeds repr(1−t+5e-5) so both engines floor the identical
    # double.
    plen = (
        F.floor(
            F.lit(1.0 - threshold + 5e-5) * F.col("n_hv") + F.lit(1e-9)
        )
        + 1
    )
    prefix = ranked.where(F.col("rk") <= plen).select(
        F.col("id").alias("id_p"), *block_cols, "h"
    )
    inv = ex.select(F.col("id").alias("id_f"), *block_cols, "h")
    jcond = (F.col("p.h") == F.col("f.h")) & (
        F.col("p.id_p") != F.col("f.id_f")
    )
    for c in block_cols:
        jcond = jcond & (F.col(f"p.{c}") == F.col(f"f.{c}"))
    cand = (
        prefix.alias("p")
        .join(inv.alias("f"), jcond)
        .select(
            F.least("p.id_p", "f.id_f").alias("id_a"),
            F.greatest("p.id_p", "f.id_f").alias("id_b"),
        )
        .distinct()
    )
    scored = (
        cand.join(
            hashed.select(
                F.col("id").alias("id_a"),
                F.col("n_hv").alias("n_a"),
                F.col("hv").alias("hv_a"),
            ),
            "id_a",
        )
        .join(
            hashed.select(
                F.col("id").alias("id_b"),
                F.col("n_hv").alias("n_b"),
                F.col("hv").alias("hv_b"),
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("hv_a", "hv_b"))
                / F.least("n_a", "n_b"),
                4,
            ).alias("containment"),
        )
    )
    return scored.filter(F.col("containment") >= threshold)


def exact_jaccard_verify(
    df: DataFrame,
    cand: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    round_scale: int = 4,
) -> DataFrame:
    """Exact word-set Jaccard over a candidate-pair set.

    ``cand`` is (id_a, id_b) with id_a < id_b; the verify joins each
    side back to the exploded distinct-token table, counts shared
    words, and keeps pairs at ``jaccard >= threshold``. Only candidate
    pairs are ever scored — this is the shared verify stage of every
    banding scheme (minhash_band_pairs, minhash_lsh_pairs).
    """
    # one tokenize+distinct projection feeds both shapes (exploded words
    # and per-doc sizes); callers that loop can cache `df` upstream —
    # Spark shares no subplans, so the single definition point is what
    # makes that cache effective
    sel = df.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(tokens(text_col)).alias("toks"),
    )
    words = sel.select("doc_id", F.explode("toks").alias("word"))
    toks = sel.select("doc_id", F.size("toks").alias("n_toks"))
    shared = (
        cand.join(words.select(F.col("doc_id").alias("id_a"), "word"), "id_a")
        .join(words.select(F.col("doc_id").alias("id_b"), "word"), ["id_b", "word"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    jac = (
        shared.join(
            toks.select(F.col("doc_id").alias("id_a"), F.col("n_toks").alias("n_a")),
            "id_a",
        )
        .join(
            toks.select(F.col("doc_id").alias("id_b"), F.col("n_toks").alias("n_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                round_scale,
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hash_tables: int = 32,
    num_features: int = 1 << 18,
    threshold: float = 0.5,
    seed: int = 42,
    round_scale: int = 4,
) -> DataFrame:
    """Near-dup pairs: Spark ML MinHashLSH candidates + exact verify.

    tokens → HashingTF binary vectors → MinHashLSH bucket join for the
    candidate pairs (the banding turns the O(n²) similarity join into a
    bucketed equi-join — the standard web-scale dedup shape), then the
    candidates are re-verified with exact word-set Jaccard and kept at
    ``>= threshold``.

    The exact verify makes the output *engine-independent and
    falsifiable*: a pair with true Jaccard J shares at least one of the
    H=``num_hash_tables`` single-hash buckets with probability
    1 − (1−J)^H, so at H=32 a J ≥ 0.5 pair is missed with probability
    < 2⁻³², and the verified result equals the full exact-Jaccard pair
    set — which a SQL oracle reproduces without modeling Spark ML's
    hash functions. Returns (id_a, id_b, jaccard).
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    # NULL-text guard on the RAW column, not size(toks) > 0: split()
    # of any non-null string yields >= 1 element, so the two filters
    # are equivalent — but a size(toks) predicate inlines the whole
    # tokenize into a pushed-down filter (3 evals/row at the scan; the
    # round-6 InferFiltersFromGenerate lesson), while IsNotNull(text)
    # pushes into the parquet reader for free
    docs = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.array_distinct(tokens(text_col)).alias("toks")
    )
    tf = HashingTF(inputCol="toks", outputCol="features", numFeatures=num_features, binary=True)
    feat = tf.transform(docs)
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    )
    model = mh.fit(feat)
    # distance threshold 1.0 keeps every bucket-sharing candidate; the
    # exact verify below is the real filter
    pairs = model.approxSimilarityJoin(feat, feat, 1.0, distCol="dist")
    cand = (
        pairs.filter(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
        )
        .distinct()
    )
    return exact_jaccard_verify(
        df, cand, text_col, id_col, threshold, round_scale
    )


def minhash_band_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    band_size: int = 2,
    threshold: float = 0.5,
    round_scale: int = 4,
) -> DataFrame:
    """Engine-portable MinHash + LSH banding + exact-Jaccard verify.

    Unlike ``minhash_lsh_pairs`` (Spark ML, engine-specific banding),
    every step here is reproducible arithmetic, so a SQL oracle can
    verify the *whole* pipeline, candidates included:

    - word hash: md5-prefix 32-bit (functions.text.word_hash32);
    - signature i (i < n_hashes): ``min((a_i*x + b_i) % P)`` over the
      doc's distinct-word hashes, P = 4294967311 (prime > 2^32),
      a_i = 40503*i + 1, b_i = 12345*i + 7;
    - bands of ``band_size`` consecutive signature rows; candidate
      pairs share any band (equi-join on the band tuple — the O(n²)
      killer, same shape Spark ML uses internally);
    - candidates are verified with exact word-set Jaccard and kept at
      ``>= threshold``.

    Scale: one shuffle to build signatures (groupBy doc), one on the
    band key, and the verify join only touches candidate pairs. Band
    keys are uniform md5-derived ints, so bucket skew is bounded.
    Returns (id_a, id_b, jaccard).
    """
    cand = minhash_band_candidates(df, text_col, id_col, n_hashes, band_size)
    return exact_jaccard_verify(
        df, cand, text_col, id_col, threshold, round_scale
    )


def minhash_band_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """The candidate stage of ``minhash_band_pairs`` alone: distinct
    (id_a, id_b) pairs sharing any signature band, BEFORE the exact
    verify. Exposed separately so recall certifications can measure
    the banding S-curve (which pairs the bucketing surfaces) without
    the verify filter masking it."""
    P = 4294967311
    n_bands = n_hashes // band_size
    words = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens(text_col))).alias("word"),
    ).withColumn("x", word_hash32(F.col("word")))
    sigs = words.groupBy("doc_id").agg(
        *[
            F.min((F.lit(40503 * i + 1) * F.col("x") + F.lit(12345 * i + 7)) % P)
            .alias(f"m{i}")
            for i in range(n_hashes)
        ]
    )
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        *[
                            F.col(f"m{j * band_size + k}").alias(f"v{k}")
                            for k in range(band_size)
                        ],
                    )
                    for j in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.*")
    vkeys = ["band"] + [f"v{k}" for k in range(band_size)]
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            [F.col(f"a.{k}") == F.col(f"b.{k}") for k in vkeys]
            + [F.col("a.doc_id") < F.col("b.doc_id")],
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    max_rounds: int = 50,
    small_graph_edges: int = 200_000,
) -> DataFrame:
    """Near-dup pair set → cluster labels by min-label propagation
    with pointer jumping.

    ``pairs`` is (id_a, id_b); returns (id, cluster_id) for every id
    that appears in a pair, cluster_id = the minimum member id. Each
    round propagates the minimum over (own label, neighbors' labels,
    label-of-own-label): the extra pointer-jumping hop makes label
    distances collapse geometrically, so convergence is O(log
    diameter) rounds instead of O(diameter) — a 1000-hop boilerplate
    chain converges in ~10 rounds. Lineage is truncated with
    ``localCheckpoint`` so the plan stays flat across iterations (the
    discipline any iterative algorithm needs on Spark).

    Non-convergence within ``max_rounds`` RAISES instead of silently
    returning split clusters — the result must equal the transitive
    closure the differential oracles compute, or fail loudly.

    Bounded-graph fast path (round 11): candidate pair sets after
    banding/jaccard are usually tiny relative to the corpus, and each
    distributed round costs 2 actions of pure job latency — at sf0.1
    the rounds dominated corpus_curation_pipeline's wall time. When
    the DIRECTED edge list (both orientations of each input pair,
    duplicates included — duplicate input pairs shrink the effective
    gate, in the safe direction) holds at most ``2 *
    small_graph_edges`` rows — one limit(gate+1) collect on the eager
    checkpoint doubles as gate probe and edge fetch — the closure is
    computed with a driver union-find instead — the k-means-init
    bounded-collect posture (collected Rows cost ~100+ bytes each,
    so ~tens of MB at the default gate), identical output contract. Above the gate the
    distributed rounds run as before; pass ``small_graph_edges=0`` to
    force them (the property/convergence tests do).
    """
    # both orientations from ONE pass over the pair relation (round
    # 14): the previous select(a,b) UNION select(b,a) planned the pair
    # subtree twice — the self-join exchange was reused but the
    # post-exchange aggregate ran once per branch; exploding a 2-array
    # of structs emits both directed edges from a single subtree. The
    # projected fields cross the Generate as plain attributes (the
    # repo's Generate-inlining hazard does not apply).
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("src"), F.col("id_b").alias("dst")
                ),
                F.struct(
                    F.col("id_b").alias("src"), F.col("id_a").alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # both directions counted; small_graph_edges=0 must force the
    # distributed rounds even on an EMPTY pair set (second review
    # pass: `0 <= 2*0` silently took the fast path and made forced
    # convergence tests vacuous).
    # Gate probe and edge fetch are ONE limited collect (round 13):
    # limit(gate+1) returns every edge when the graph is under the
    # gate (any order — union-find is order-independent) and proves it
    # is over the gate otherwise, with the same driver-memory bound
    # the fast path's collect always had (CollectLimit stops fetching
    # at gate+1 rows). The probe runs on the UNcheckpointed plan
    # (round 14): the fast path consumes edges exactly once, so the
    # eager checkpoint was a wasted cache-materialization pass there;
    # the over-gate path (which DOES reuse edges every round)
    # checkpoints below, paying one recompute of the probe's work on
    # that rare branch.
    small_rows = None
    if small_graph_edges > 0:
        probe = edges.limit(2 * small_graph_edges + 1).collect()
        if len(probe) <= 2 * small_graph_edges:
            small_rows = probe
    if small_rows is not None:
        spark = pairs.sparkSession
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        # one pass over the collected rows: unions and the node set
        # together. Driver cost is the collected Row objects (~100+
        # bytes each, so ~tens of MB at the default 2x200k-row gate —
        # NOT 16 bytes/pair; raise small_graph_edges with that number
        # in mind) plus the parent/node dicts.
        nodes: set[int] = set()
        for r in small_rows:
            s, d = r["src"], r["dst"]
            nodes.add(s)
            nodes.add(d)
            a, b = find(s), find(d)
            if a != b:
                # union by MIN root so the representative is the
                # minimum member id (the min-label contract)
                lo, hi = (a, b) if a < b else (b, a)
                parent[hi] = lo
        rows = [(int(x), int(find(x))) for x in sorted(nodes)]
        # size the parallelize slices to the payload: the default
        # splits even a tiny label list into defaultParallelism pickled
        # partitions and every downstream evaluation pays one
        # Python-worker round-trip per partition (measured ~0.15 s
        # each, round 13) — one slice per ~25k rows keeps big label
        # sets parallel and small ones single-partition
        n_slices = max(1, min(
            spark.sparkContext.defaultParallelism, len(rows) // 25_000
        ))
        return spark.createDataFrame(
            spark.sparkContext.parallelize(rows, n_slices),
            "id long, cluster_id long",
        )
    edges = edges.localCheckpoint(eager=True)  # reused every round below
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "lbl", F.col("id")
    )
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_rounds):
        neighbor = edges.join(labels, edges.dst == labels.id).select(
            F.col("src").alias("id"), "lbl"
        )
        # pointer jumping: each id also adopts its current label's label
        jump = (
            labels.alias("a")
            .join(labels.alias("b"), F.col("a.lbl") == F.col("b.id"))
            .select(F.col("a.id").alias("id"), F.col("b.lbl").alias("lbl"))
        )
        new_labels = (
            labels.unionByName(neighbor)
            .unionByName(jump)
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"))
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("id", F.col("lbl").alias("cluster_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds — "
        "component diameter exceeds 2^rounds; raise max_rounds"
    )


def duplicated_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    key_by_hash: bool = True,
) -> DataFrame:
    """Exact duplicated-substring detection: per-document statistics of
    n-token spans that also occur in at least one OTHER document.

    This is the distributed re-expression of suffix-array substring
    dedup (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better"): instead of one global suffix array, every document
    emits its sliding n-gram shingles WITH positions, shingles seen in
    >1 document are found with one hash aggregation, and the positions
    of those shingles are unioned into exact covered-token counts.

    Plan shape (three shuffles, all on uniform keys):
      1. groupBy(shingle)          — find cross-document shingles
      2. left_semi join on shingle — keep only duplicated positions
      3. groupBy(doc_id)           — per-doc span/coverage stats

    Scale notes: with ``key_by_hash`` (default) the shuffle/join key is
    ``xxhash64(shingle)`` — 8 bytes instead of the ~50-byte shingle
    string, cutting shuffle volume ~6×. The per-document OUTPUT is
    identical to string keying unless two distinct shingles collide in
    64 bits (probability ~m²/2⁶⁵ — negligible even at 100 TB shingle
    counts per partition-group), so the DuckDB string-keyed oracle
    still verifies it; ``key_by_hash=False`` keeps byte-exact string
    keys. Shingle keyspace is near-uniform, so no salting is needed;
    AQE handles the residual skew from boilerplate spans.

    Returns one row per input document:
    (doc_id, n_tokens, n_dup_spans, n_dup_shingles, covered_tokens,
    dup_coverage) — zero-filled for documents with no duplicated span.
    """
    from dso_import_spark.queries_pkg.util import spread_for_explode

    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    # ~n_tokens× shingle amplification: parallelize by rows, not input
    # splits (see spread_for_explode — one modest split otherwise
    # explodes single-threaded)
    sized = spread_for_explode(
        df.select(F.col(id_col).alias("doc_id"), toks.alias("t")),
        "doc_id",
        amplification=500,
    ).withColumn("n", F.size("t").cast("long"))
    starts = F.when(
        F.col("n") >= n, F.sequence(F.lit(1).cast("long"), F.col("n") - (n - 1))
    ).otherwise(F.array().cast("array<long>"))
    sh_str = F.array_join(F.slice("t", F.col("s"), F.lit(n)), " ")
    shingles = sized.select(
        "doc_id", "t", F.explode(starts).alias("s")
    ).select(
        "doc_id",
        "s",
        (F.xxhash64(sh_str) if key_by_hash else sh_str).alias("sh"),
    )
    dup_sh = (
        shingles.groupBy("sh")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("sh")
    )
    dup_pos = shingles.join(dup_sh, "sh", "left_semi")
    # ONE groupBy(doc_id) computes spans, distinct shingles, AND exact
    # coverage: the covered-token set is the distinct union of the
    # per-span index ranges, folded inside the aggregate so the dup_pos
    # subtree is consumed once (Spark does not share subplans — a
    # second consumer would recompute the whole shingle pipeline).
    # Per-group memory is bounded by n·spans ≤ n·tokens of ONE doc.
    per_doc = dup_pos.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.count_distinct("sh").alias("n_dup_shingles"),
        F.size(
            F.array_distinct(
                F.flatten(
                    F.collect_list(F.sequence(F.col("s"), F.col("s") + (n - 1)))
                )
            )
        )
        .cast("long")
        .alias("covered_tokens"),
    )
    zero = F.lit(0).cast("long")
    return (
        sized.select("doc_id", F.col("n").alias("n_tokens"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_spans", zero).alias("n_dup_spans"),
            F.coalesce("n_dup_shingles", zero).alias("n_dup_shingles"),
            F.coalesce("covered_tokens", zero).alias("covered_tokens"),
            # try_divide: a zero-token doc (whitespace-only text)
            # would throw DIVIDE_BY_ZERO under default-ANSI Spark; the
            # oracle's 0/0::DOUBLE yields NULL — match it
            F.round(
                F.try_divide(
                    F.coalesce("covered_tokens", zero), F.col("n_tokens")
                ),
                4,
            ).alias("dup_coverage"),
        )
    )
