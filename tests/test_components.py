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
        connected_components(pairs, max_rounds=2)


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
