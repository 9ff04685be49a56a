"""Scale compositions (queries_pkg/compositions.py): the banded
containment pipeline's end-to-end invariants beyond the differential
suite's oracle match."""

from __future__ import annotations

from pyspark.sql import functions as F

from dso_import_spark.queries import REGISTRY


def _pairs(df):
    return {
        (r["id_a"], r["id_b"], r["containment"]) for r in df.collect()
    }


def test_banded_is_subset_of_exact_with_identical_values(spark, sf_dir):
    # the banded composition may MISS pairs (LSH S-curve) but every
    # pair it surfaces must carry the exact form's containment value —
    # candidate generation must not change verify arithmetic
    banded = _pairs(REGISTRY["shingle_containment_banded"].spark(spark, sf_dir))
    exact = _pairs(REGISTRY["shingle_containment"].spark(spark, sf_dir))
    assert banded, "banding surfaced no pairs on the fixture corpus"
    assert banded <= exact


def test_banded_catches_near_identical_inclusion(spark):
    from dso_import_spark.operators.dedup import shingle_containment_banded

    # two docs sharing a long passage: shingle-set Jaccard high enough
    # to sit above the (b=4, r=2) knee, containment 1.0
    passage = " ".join(f"tok{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, passage, "en"),
            (2, passage + " trailing extra words here", "en"),
            (3, "completely unrelated text about something else entirely", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    got = shingle_containment_banded(
        docs, block_cols=["lang"], threshold=0.5
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(1, 2)]
    assert got[0]["containment"] == 1.0


def test_banded_respects_block_cols(spark):
    from dso_import_spark.operators.dedup import shingle_containment_banded

    passage = " ".join(f"tok{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, passage, "en"), (2, passage, "nl")],
        "doc_id long, text string, lang string",
    )
    # identical shingle sets but different langs: the band join's block
    # equality must keep them apart
    assert (
        shingle_containment_banded(docs, block_cols=["lang"]).count() == 0
    )


def test_arraynative_sigs_equal_explode_groupby_sigs(spark, sf_dir):
    # the zero-shuffle array_min signature path must produce the SAME
    # m0..m7 as the explode + groupBy(min) ground truth — this is the
    # test that catches the F.transform two-parameter-lambda trap
    # (`lambda x, i=i` binds i to the ARRAY INDEX column and collapses
    # all signatures to one expression; it shipped briefly in round 6
    # and the end-to-end containment differential did not catch it)
    from dso_import_spark.functions.text import tokens, word_hash32
    from dso_import_spark.operators.dedup import (
        minhash_sig_cols,
        shingle_array_from_tokens,
    )
    from dso_import_spark.queries_pkg.util import tables

    P = 4294967311
    (docs,) = tables(spark, sf_dir, "documents")
    toked = docs.select(F.col("doc_id").alias("id"), tokens("text").alias("t"))
    sets = toked.select(
        "id", shingle_array_from_tokens(F.col("t")).alias("sh")
    )
    fast = sets.withColumn(
        "hs", F.transform(F.col("sh"), word_hash32)
    ).select("id", *minhash_sig_cols("hs", 8))
    ex = sets.select("id", F.explode_outer("sh").alias("w")).withColumn(
        "x", word_hash32(F.col("w"))
    )
    slow = ex.groupBy("id").agg(
        *[
            F.min(
                (F.lit(40503 * i + 1) * F.col("x") + F.lit(12345 * i + 7))
                % P
            ).alias(f"m{i}")
            for i in range(8)
        ]
    )
    f = {r["id"]: tuple(r[f"m{i}"] for i in range(8)) for r in fast.collect()}
    s = {r["id"]: tuple(r[f"m{i}"] for i in range(8)) for r in slow.collect()}
    assert f == s
    # and the signatures are not degenerate: some doc has 8 distinct sigs
    assert any(len(set(v)) == 8 for v in f.values() if v[0] is not None)


def test_set_minhash_candidates_match_word_banding(spark):
    # the generalized set-level candidate stage, fed word sets, must
    # reproduce minhash_band_candidates exactly (same hash constants,
    # same banding) — the reuse contract the composition relies on
    from dso_import_spark.functions.text import tokens
    from dso_import_spark.operators.dedup import (
        minhash_band_candidates,
        set_minhash_band_candidates,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma epsilon"),
            (3, "zeta eta theta iota"),
            (4, "zeta eta theta kappa"),
        ],
        "doc_id long, text string",
    )
    words = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(F.array_distinct(tokens("text"))).alias("shingle"),
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in set_minhash_band_candidates(words).collect()
    }
    want = {
        (r["id_a"], r["id_b"])
        for r in minhash_band_candidates(docs).collect()
    }
    assert got == want and want


# --- corpus_curation_pipeline (round 11): end-to-end invariants
# beyond the differential oracle match


def test_curation_pipeline_funnel_is_monotone(spark, sf_dir):
    rows = REGISTRY["corpus_curation_pipeline"].spark(spark, sf_dir).collect()
    assert rows, "pipeline produced no language rows"
    total_alloc, total_cap = 0.0, 0
    for r in rows:
        assert (
            r.n_input
            >= r.n_exact_unique
            >= r.n_canonical
            >= r.n_gated
            >= r.n_sampled
            > 0
        ), r
        # allocation bounded by capacity (4dp display rounding slack)
        assert r.alloc_tokens <= r.cap_tokens + 0.001, r
        assert r.sampled_tokens <= r.cap_tokens, r
        total_alloc += r.alloc_tokens
        total_cap += r.cap_tokens
    # water-filling exactness: allocations sum to the budget
    # (floor(total_cap / 2)) up to the per-lang 4dp rounding
    assert abs(total_alloc - total_cap // 2) <= 0.01 * len(rows), (
        total_alloc,
        total_cap,
    )


def test_curation_pipeline_exact_tier_collapses_replicas(spark, tmp_path):
    # a replica-dense corpus (the x100 fixture shape): 40 exact copies
    # of each of 3 base docs, one near-dup variant pair. The exact
    # tier must collapse copies to min-doc_id reps; the near-dup tier
    # must then merge the variant pair (shingle Jaccard >= 0.5)
    base = [
        # >= 30 words, mean word len in [3, 8], >= 2 stopwords, no
        # word above 12.5% share: passes the Gopher gate
        ("the quick brown fox jumps over a lazy dog while the rain "
         "falls gently onto green hills and many small birds sing "
         "about warm bright mornings near quiet rivers under clear "
         "skies with soft wind and fresh air around tall old trees"),
        ("some other document text with the usual filler words and a "
         "few more tokens about data systems joining tables quickly "
         "while scanning large files from remote storage into memory "
         "buffers before writing results back out to durable disks"),
        ("third base document mentions the weather and a calendar of "
         "events including markets festivals concerts lectures and "
         "workshops held across town during spring summer autumn and "
         "winter seasons attracting visitors from nearby villages"),
    ]
    rows = []
    did = 0
    for b, text in enumerate(base):
        for _ in range(40):
            rows.append((did, text, "en", f"s{did % 3}", len(text)))
            did += 1
    # near-dup variant of base[0]: one word changed -> high shingle
    # overlap with the original, same length class
    variant = base[0].replace("lazy dog", "lazy cat")
    rows.append((did, variant, "en", "sx", len(variant)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = REGISTRY["corpus_curation_pipeline"].spark(
        spark, str(tmp_path)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_input == 121
    assert r.n_exact_unique == 4  # 3 base texts + 1 variant
    assert r.n_canonical == 3  # variant merged into base[0]'s cluster
    assert r.n_gated == 3  # all three keepers pass the gate


def test_curation_pipeline_hostile_nulls_vs_oracle(spark, tmp_path):
    # NULL text, NULL lang, and empty text must flow through the
    # whole funnel identically on both engines: NULL text groups by a
    # NULL md5 key and dies at the gate join (no words on either
    # engine); the NULL-lang stratum is dropped by the final
    # equi-joins on lang (SQL NULL-key semantics, both engines —
    # verified: the output is the single 'en' row); empty text yields
    # the [''] token quirk on both engines and fails the word-count
    # gate
    import duckdb

    good = (
        "the quick brown fox jumps over a lazy dog while the rain "
        "falls gently onto green hills and many small birds sing "
        "about warm bright mornings near quiet rivers under clear "
        "skies with soft wind and fresh air around tall old trees"
    )
    rows = [
        (0, good, "en", "s0", len(good)),
        (1, good, "en", "s1", len(good)),  # exact dup of 0
        (2, None, "en", "s2", 0),          # NULL text
        (3, "", "en", "s3", 0),            # empty text
        (4, good, None, "s4", len(good)),  # NULL lang stratum
        (5, "tiny doc", "en", "s5", 8),    # fails word-count gate
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    spec = REGISTRY["corpus_curation_pipeline"]
    srows = sorted(
        tuple(str(x) for x in r)
        for r in spec.spark(spark, str(tmp_path)).collect()
    )
    drows = sorted(
        tuple(str(x) for x in r) for r in con.sql(spec.oracle).fetchall()
    )
    assert srows == drows, (srows, drows)
    # pin the funnel shape, not just engine agreement: exactly the
    # 'en' row survives (NULL-lang stratum dropped by the lang
    # equi-joins), docs 0/1 collapsed by the exact tier, and of en's
    # 4 exact-unique texts only doc 0 passes the gate
    assert len(srows) == 1
    (row,) = srows
    assert row[0] == "en" and row[1] == "5" and row[2] == "4", row


def test_curation_pipeline_banded_tier_agrees_with_exact(spark, tmp_path):
    # round 12 (VERDICT r11 #1): the pair stage volume-gates between
    # the exact shingle self-join and MinHash-banded candidates
    # (16 signature-pair bands) + the identical integer-Jaccard
    # verify. On a NON-replica-dense corpus (every text distinct —
    # the exact tier collapses nothing) with real near-dup clusters,
    # the two tiers must produce the IDENTICAL end-to-end funnel, and
    # the forced banded tier must agree with the parameterized oracle
    # replaying the same dispatch.
    import duckdb

    from dso_import_spark.queries_pkg.compositions import (
        _curation_pipeline_oracle,
    )

    base = [
        ("the quick brown fox jumps over a lazy dog while the rain "
         "falls gently onto green hills and many small birds sing "
         "about warm bright mornings near quiet rivers under clear "
         "skies with soft wind and fresh air around tall old trees"),
        ("some other document text with the usual filler words and a "
         "few more tokens about data systems joining tables quickly "
         "while scanning large files from remote storage into memory "
         "buffers before writing results back out to durable disks"),
        ("third base document mentions the weather and a calendar of "
         "events including markets festivals concerts lectures and "
         "workshops held across town during spring summer autumn and "
         "winter seasons attracting visitors from nearby villages"),
    ]
    # distinct texts: per cluster, one-word substitutions of a base —
    # ~3 shingles change per substitution out of ~40, so within-
    # cluster Jaccard stays >= 0.5 while every text is unique
    subs = [("quick", "swift"), ("filler", "common"), ("town", "city")]
    rows, did = [], 0
    for b, text in enumerate(base):
        old, new = subs[b]
        for v in range(4):
            t = text if v == 0 else text.replace(old, f"{new}{v}")
            rows.append((did, t, "en" if b < 2 else "nl",
                         f"s{did % 3}", len(t)))
            did += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    spec = REGISTRY["corpus_curation_pipeline"]
    exact = sorted(
        tuple(str(x) for x in r)
        for r in spec.spark(spark, str(tmp_path)).collect()
    )
    banded = sorted(
        tuple(str(x) for x in r)
        for r in spec.spark(spark, str(tmp_path), exact_max_reps=1).collect()
    )
    # all 12 texts are distinct (exact tier collapses nothing), the
    # near-dup tier must still canonicalize each 4-variant cluster
    assert exact == banded, (exact, banded)
    assert {r[0] for r in exact} == {"en", "nl"}
    for r in exact:
        n_input, n_uniq, n_canon = int(r[1]), int(r[2]), int(r[3])
        assert n_input == n_uniq, r            # no exact dups anywhere
        assert n_canon == n_uniq // 4, r       # 4-variant clusters merged
    # cross-engine: the forced banded tier vs the oracle replaying the
    # same dispatch (gate = 1 rep)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    drows = sorted(
        tuple(str(x) for x in r)
        for r in con.sql(_curation_pipeline_oracle(1)).fetchall()
    )
    assert banded == drows, (banded, drows)


def test_curation_pipeline_viral_shingle_routes_banded(spark, tmp_path):
    # round 13 (VERDICT r12 #4): the count gate alone let a ≤20k-rep
    # corpus with ONE viral boilerplate shingle (df ≈ n) pay ~df² join
    # rows through the exact tier. The max-df probe must route such a
    # corpus banded even though the count gate passes — and the oracle
    # replays the same two-predicate dispatch, so the differential
    # stays green on the banded path.
    import duckdb

    from dso_import_spark.queries_pkg.compositions import (
        _curation_pipeline_oracle,
        _funnel_pair_tier,
    )
    from pyspark.sql import functions as F

    base = [
        ("the quick brown fox jumps over a lazy dog while the rain "
         "falls gently onto green hills and many small birds sing "
         "about warm bright mornings near quiet rivers under clear "
         "skies with soft wind and fresh air around tall old trees"),
        ("some other document text with the usual filler words and a "
         "few more tokens about data systems joining tables quickly "
         "while scanning large files from remote storage into memory "
         "buffers before writing results back out to durable disks"),
        ("third base document mentions the weather and a calendar of "
         "events including markets festivals concerts lectures and "
         "workshops held across town during spring summer autumn and "
         "winter seasons attracting visitors from nearby villages"),
    ]
    # every doc gets the SAME unciphered 4-word tail: two shingles
    # whose df equals the corpus size (the boilerplate cliff)
    viral = " the story ends here"
    subs = [("quick", "swift"), ("filler", "common"), ("town", "city")]
    rows, did = [], 0
    for b, text in enumerate(base):
        old, new = subs[b]
        for v in range(4):
            t = (text if v == 0 else text.replace(old, f"{new}{v}")) + viral
            rows.append((did, t, "en" if b < 2 else "nl",
                         f"s{did % 3}", len(t)))
            did += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    # dispatch probe: with the df gate below the viral df (8 'en'
    # docs share the tail) the pair tier must take the banded lineage
    # (minhash signature columns present), with it above, the exact
    # lineage (no signatures) — observable in the optimized plan
    ex0 = docs.groupBy("lang", F.md5("text").alias("h")).agg(
        F.max("text").alias("text"),
        F.min("doc_id").alias("doc_id"),
        F.min("n_chars").alias("n_chars"),
    )
    plan_banded = _funnel_pair_tier(
        ex0, 12, 20_000, exact_max_df=5
    )._jdf.queryExecution().optimizedPlan().toString()
    plan_exact = _funnel_pair_tier(
        ex0, 12, 20_000, exact_max_df=1_000
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "m31" in plan_banded and "m31" not in plan_exact
    # end-to-end: the df-routed banded funnel agrees with the oracle
    # replaying the same (count, max-df) dispatch, and with the
    # forced-exact funnel (the tiers agree on this fixture — the
    # banded ~1% miss class needs j right at the threshold)
    spec = REGISTRY["corpus_curation_pipeline"]
    auto = sorted(
        tuple(str(x) for x in r)
        for r in spec.spark(spark, str(tmp_path), exact_max_df=5).collect()
    )
    exact = sorted(
        tuple(str(x) for x in r)
        for r in spec.spark(
            spark, str(tmp_path), exact_max_df=10**9
        ).collect()
    )
    assert auto == exact, (auto, exact)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    drows = sorted(
        tuple(str(x) for x in r)
        for r in con.sql(
            _curation_pipeline_oracle(20_000, exact_max_df=5)
        ).fetchall()
    )
    assert auto == drows, (auto, drows)
