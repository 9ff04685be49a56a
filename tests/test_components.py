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
