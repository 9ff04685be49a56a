"""connected_components: transitive-closure correctness on long chains.

The differential oracles compute a full recursive closure; the operator
must match it even on high-diameter components (boilerplate near-dup
chains), which min-label propagation alone covers only in O(diameter)
rounds — pointer jumping makes it O(log diameter).
"""

from __future__ import annotations

import pytest

from dso_import_spark.operators.dedup import connected_components


def test_long_chain_collapses_to_one_cluster(spark):
    # a 200-node path: diameter 199, far beyond a 50-round linear walk
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "id_a long, id_b long"
    )
    out = connected_components(pairs).collect()
    assert len(out) == 200
    assert {r["cluster_id"] for r in out} == {0}


def test_multiple_components_keep_min_labels(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        "id_a long, id_b long",
    )
    got = {r["id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_nonconvergence_raises_instead_of_splitting(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        # small_graph_edges=0 forces the distributed rounds (the
        # driver union-find fast path has no convergence bound)
        connected_components(pairs, max_rounds=2, small_graph_edges=0)


def test_fast_path_and_distributed_rounds_agree(spark):
    # the round-11 bounded-graph union-find must return EXACTLY what
    # the distributed min-label rounds return — chain + triangle +
    # singleton-pair mix, both paths forced explicitly
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(50)]
        + [(100, 102), (102, 101), (101, 100), (200, 201)],
        "id_a long, id_b long",
    )
    fast = sorted(
        map(tuple, connected_components(pairs).collect())
    )  # default gate: fast path
    dist = sorted(
        map(
            tuple,
            connected_components(pairs, small_graph_edges=0).collect(),
        )
    )
    assert fast == dist
    assert len(fast) == 56  # 51-node chain + triangle + pair


def test_hot_shingle_max_df_guard_fires_and_caps(spark):
    # a viral boilerplate shingle shared by 30 docs would contribute
    # 30·29/2 = 435 pairs from that one key; with max_df the guard
    # must WARN (visibility before the burn) and drop the hot shingle
    # from pair generation, while rare-shingle pairs survive with
    # their exact containment (n_a/n_b uncapped)
    import warnings

    from dso_import_spark.operators.dedup import shingle_containment_pairs

    viral = "all rights reserved"
    docs = spark.createDataFrame(
        [(i, f"{viral} unique{i} filler{i} body{i}", "en") for i in range(30)]
        + [
            (100, "shared rare passage one two three", "en"),
            (101, "shared rare passage one two nine", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        capped = shingle_containment_pairs(
            docs, block_cols=["lang"], threshold=0.1, max_df=10
        ).collect()
    fired = [w for w in caught if "max_df=10" in str(w.message)]
    assert fired, "guard did not warn on a 30-doc hot shingle"
    assert "30 docs" in str(fired[0].message)
    got = {(r["id_a"], r["id_b"]) for r in capped}
    # every viral-only pair is gone; the rare-passage pair survives
    assert got == {(100, 101)}
    # and uncapped, the same input pays the quadratic price: all 435
    # viral pairs (plus the rare pair) come back
    full = shingle_containment_pairs(
        docs, block_cols=["lang"], threshold=0.1
    ).count()
    assert full == 435 + 1


def test_max_df_mixed_pair_keeps_exact_uncapped_containment(spark):
    # ADVICE round-6 (medium): a pair sharing a MIX of hot and cold
    # shingles must survive through its cold shingles AND carry the
    # exact containment computed over ALL shared shingles, hot
    # included — the capped relation is for pair generation only, the
    # verify runs against the uncapped exploded relation. The old code
    # counted n_shared on the capped relation, undercutting mixed
    # pairs (here 0.6 instead of 0.8) and silently dropping any pair
    # whose cold intersection alone fell below threshold.
    import warnings

    from dso_import_spark.operators.dedup import shingle_containment_pairs

    viral = "all rights reserved"
    docs = spark.createDataFrame(
        [(i, f"{viral} unique{i} filler{i} body{i}", "en") for i in range(30)]
        + [
            (100, f"{viral} common word chain alpha", "en"),
            (101, f"{viral} common word chain beta", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        got = {
            (r["id_a"], r["id_b"]): r["containment"]
            for r in shingle_containment_pairs(
                docs, block_cols=["lang"], threshold=0.7, max_df=10
            ).collect()
        }
    # 5 distinct shingles per doc, 4 shared (1 hot + 3 cold) → 0.8;
    # the capped-count bug would score 3/5 = 0.6 and drop it at 0.7
    assert got == {(100, 101): 0.8}


def _inclusion_fixture(spark, ratios=(2, 5, 10, 30)):
    """Quoted-passage corpus: one 40-token passage embedded verbatim in
    one host document per size ratio (host = unique filler + passage),
    plus unrelated docs. Every (passage, host) pair has containment
    exactly 1.0 at any ratio; shingle-set Jaccard ≈ 1/ratio."""
    passage = " ".join(f"p{i}" for i in range(40))
    rows = [(0, passage, "en")]
    rid = 1
    for ratio in ratios:
        filler = " ".join(f"h{ratio}x{i}" for i in range(40 * ratio - 40))
        rows.append((rid, f"{filler} {passage}", "en"))
        rid += 1
    for j in range(5):
        rows.append((rid, " ".join(f"u{j}w{i}" for i in range(60)), "en"))
        rid += 1
    return (
        spark.createDataFrame(rows, "doc_id long, text string, lang string"),
        {(0, r) for r in range(1, 1 + len(ratios))},
    )


def test_prefix_containment_exact_recall_at_extreme_size_ratios(spark):
    # VERDICT round-6 "What's wrong #1": the asymmetric-inclusion case
    # containment exists for. The prefix-filter bound is deterministic,
    # so recall is 1.000 at EVERY size ratio — including 10× and 30×,
    # where Jaccard-banding's S-curve reads P ≈ 4% and ~0 (the banded
    # form is ALLOWED to miss these; the prefix form is not).
    from dso_import_spark.operators.dedup import (
        shingle_containment_banded,
        shingle_containment_pairs,
        shingle_containment_prefix,
    )

    docs, truth = _inclusion_fixture(spark)
    exact = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in shingle_containment_pairs(docs, threshold=0.9).collect()
    }
    assert set(exact) == truth and set(exact.values()) == {1.0}
    pref = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in shingle_containment_prefix(docs, threshold=0.9).collect()
    }
    assert pref == exact  # 100% recall, exact values, no false positives
    # the banded form misses every ≥10× inclusion (S-curve floor) —
    # this pins the documented recall regime, not a bug
    band = {
        (r["id_a"], r["id_b"])
        for r in shingle_containment_banded(docs, threshold=0.9).collect()
    }
    assert band <= set(exact)
    assert (0, 3) not in band and (0, 4) not in band


def test_prefix_containment_matches_exact_on_real_corpus(spark, sf_dir):
    # block-keyed run on the real documents fixture: prefix output must
    # equal the exact form's output filtered to the prefix threshold
    from dso_import_spark.operators.dedup import (
        shingle_containment_pairs,
        shingle_containment_prefix,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {
        tuple(r)
        for r in shingle_containment_pairs(
            docs, block_cols=["lang"], threshold=0.1
        ).collect()
        if r["containment"] >= 0.9
    }
    pref = {
        tuple(r)
        for r in shingle_containment_prefix(
            docs, block_cols=["lang"], threshold=0.9
        ).collect()
    }
    assert pref == exact and pref


def test_prefix_containment_guarantee_on_randomized_corpora(spark):
    # Property pin for the prefix-filter bound: on seeded random
    # corpora with overlapping vocabulary (shared + private token
    # pools, varying doc sizes), the prefix path's output must EQUAL
    # the exact form's output at the same threshold — for several
    # thresholds, including low ones where prefixes are nearly whole
    # docs. Deterministic LCG so the corpus is reproducible.
    from dso_import_spark.operators.dedup import (
        shingle_containment_pairs,
        shingle_containment_prefix,
    )

    state = 123456789

    def rnd(n):
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        return state % n

    shared = [f"s{i}" for i in range(60)]
    rows = []
    for d in range(40):
        size = 10 + rnd(80)
        toks = []
        for _ in range(size):
            if rnd(10) < 6:  # 60% from the shared pool → real overlaps
                toks.append(shared[rnd(len(shared))])
            else:
                toks.append(f"p{d}w{rnd(30)}")
        rows.append((d, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    for thr in (0.5, 0.75, 0.9):
        exact = {
            tuple(r)
            for r in shingle_containment_pairs(docs, threshold=thr).collect()
        }
        pref = {
            tuple(r)
            for r in shingle_containment_prefix(
                docs, threshold=thr
            ).collect()
        }
        assert pref == exact, (thr, pref ^ exact)


def test_prefix_length_covers_the_rounding_boundary(spark):
    # Round-7 code-review finding: the output filter compares
    # 4dp-ROUNDED containment, so a pair with raw C in [t-5e-5, t)
    # passes the exact form (0.899955 -> 0.9000) — the prefix length
    # must therefore cover raw C >= t - 5e-5. For n = 20001 at t = 0.9
    # the worst case has |A\B| = 2001 shingles outside the partner;
    # the slack-free length floor(0.1*20001)+1 = 2001 could sit
    # entirely outside, while the slacked length must be >= 2002 so at
    # least one prefix shingle is shared. Pins the exact Column
    # arithmetic the operator (and its oracle, via repr(1-t+5e-5))
    # evaluates.
    from pyspark.sql import functions as F

    row = (
        spark.range(1)
        .select(F.lit(20001).alias("n_sh"))
        .select(
            (
                F.floor(
                    F.lit(1.0 - 0.9 + 5e-5) * F.col("n_sh") + F.lit(1e-9)
                )
                + 1
            ).alias("plen")
        )
        .collect()[0]
    )
    assert row["plen"] >= 2002
    # and a DuckDB replay of the embedded literal floors identically
    import duckdb

    (dplen,) = duckdb.sql(
        f"SELECT CAST(floor({1.0 - 0.9 + 5e-5!r}::DOUBLE * 20001 + 1e-9)"
        " AS BIGINT) + 1"
    ).fetchone()
    assert dplen == row["plen"]


def test_simhash_pairs_actually_executes(spark):
    # round-8 review: F.shiftright with a Column bit count raised at
    # plan build, making the operator dead code (the only prior test
    # covered the ValueError guard). Two near-identical docs must pair
    # within hamming 3; an unrelated doc must not.
    from dso_import_spark.operators.dedup import simhash_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),
            (3, "completely different words nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(docs, max_hamming=3, n_bands=4).collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_multimodal_decode_survives_null_and_truncated_payloads(spark):
    # round-8 review: bytes(None) and b[4] on a 4-byte payload killed
    # the whole batch; both must yield unknown rows instead
    from dso_import_spark.operators.multimodal import MAGIC, decode_media

    media = spark.createDataFrame(
        [(1, "s", None), (2, "s", MAGIC), (3, "s", b"garbage")],
        "doc_id long, source string, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_media(media, allow_fake=True).collect()}
    assert rows[1]["media_type"] is None and rows[1]["payload_bytes"] == 0
    assert rows[2]["media_type"] is None and rows[2]["payload_bytes"] == 4
    assert rows[3]["media_type"] is None


def test_wav_stats_drops_null_payload_rows(spark):
    from dso_import_spark.operators.multimodal import wav_stats

    audio = spark.createDataFrame(
        [(1, "s", None)], "doc_id long, source string, payload binary"
    )
    assert wav_stats(audio).count() == 0


def test_asof_join_rejects_unsupported_key_types_loudly(spark):
    import pytest

    from dso_import_spark.operators.asof import asof_tolerance_join

    left = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00", 1)],
        "user_id string, ts string, event_id long",
    ).withColumn("ts", __import__("pyspark").sql.functions.col("ts").cast("timestamp"))
    with pytest.raises(ValueError, match="bigint key"):
        asof_tolerance_join(left, left)
