"""validate_fk_array (J3): element-level FK validation on array columns.

Reference semantics (bagh/batch.py:374-378,408-431): invalid pand ids
are dropped from the list while the ROW is always kept. The operator
must also never collect the reference-id set into a single row — the
scale-safe plan is posexplode → (broadcast) join → regroup.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dso_import_spark.operators.quality import validate_fk_array


def _fixture(spark):
    rows = [
        # (row id, fk array, other payload)
        (1, ["a", "b", "zz"], "r1"),   # one invalid element dropped
        (2, ["zz", "yy"], "r2"),       # all invalid -> empty array
        (3, [], "r3"),                 # empty stays empty
        (4, None, "r4"),               # NULL array stays NULL
        (5, ["b", "b", "a"], "r5"),    # duplicates + order preserved
    ]
    df = spark.createDataFrame(rows, "rid int, fks array<string>, payload string")
    refs = spark.createDataFrame([("a",), ("b",), ("c",)], "id string")
    return df, refs


def _check(out_rows):
    by_rid = {r["rid"]: r for r in out_rows}
    assert len(by_rid) == 5, "every input row must be kept"
    assert by_rid[1]["fks"] == ["a", "b"]
    assert by_rid[2]["fks"] == []
    assert by_rid[3]["fks"] == []
    assert by_rid[4]["fks"] is None
    assert by_rid[5]["fks"] == ["b", "b", "a"], "order and duplicates preserved"
    assert by_rid[1]["payload"] == "r1"


def test_fk_array_semantics_broadcast(spark):
    df, refs = _fixture(spark)
    out = validate_fk_array(df, refs, "fks")
    assert out.columns == df.columns
    _check(out.collect())


def test_fk_array_semantics_shuffled(spark):
    df, refs = _fixture(spark)
    out = validate_fk_array(df, refs, "fks", broadcast=False)
    _check(out.collect())


def test_fk_array_plan_has_no_driver_side_set(spark):
    """The scale guarantee: no collect_set-into-one-row, no cartesian."""
    df, refs = _fixture(spark)
    out = validate_fk_array(df, refs, "fks")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "collect_set" not in plan.lower()
    assert "cartesian" not in plan.lower()
