"""Unit tests for scalar parsers (P2-P10) and WKT coercion (G1) against
the exact edge cases visible in the reference code (SURVEY.md §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dso_import_spark.functions.geometry import coerce_wkt_value
from dso_import_spark.functions.parsers import (
    create_id,
    create_ids,
    int_or_none,
    parse_date,
    parse_date_time,
    parse_yesno_boolean,
    pipe_split,
    valid_date_range,
)


def _eval(spark, col, data: list[tuple], schema: str):
    df = spark.createDataFrame(data, schema)
    return [r["out"] for r in df.select(col.alias("out")).collect()]


def test_create_id(spark):
    out = _eval(
        spark,
        create_id(F.col("i"), F.col("v")),
        [("A1", 1), ("A1", 42), (None, 1), ("A1", None), ("A1", 1234)],
        "i string, v int",
    )
    assert out == ["A1_001", "A1_042", None, None, "A1_1234"]


def test_create_ids_zip(spark):
    col = create_ids(F.col("ids"), F.col("volgs"))
    out = _eval(
        spark,
        col,
        [
            ("X|Y", "1|2"),
            ("X", "7"),
            (None, None),
            ("", ""),
            ("X|Y", "1"),  # shorter volg list: zip-to-null, element dropped
        ],
        "ids string, volgs string",
    )
    assert out[0] == ["X_001", "Y_002"]
    assert out[1] == ["X_007"]
    assert out[2] is None or out[2] == []
    assert out[3] == []
    assert out[4] == ["X_001"]


def test_int_or_none(spark):
    out = _eval(
        spark,
        int_or_none(F.col("s")),
        [("123",), ("0",), ("-3",), ("1.5",), ("abc",), ("",), (None,)],
        "s string",
    )
    assert out == [123, 0, None, None, None, None, None]


def test_parse_date(spark):
    out = _eval(
        spark,
        parse_date(F.col("s")),
        [("2020-01-31",), ("2020-01-31T12:00:00",), ("",), (None,)],
        "s string",
    )
    assert [str(x) if x else x for x in out] == ["2020-01-31", "2020-01-31", None, None]


def test_parse_date_time(spark):
    out = _eval(
        spark,
        parse_date_time(F.col("s")),
        [("2020-01-31",), ("2020-01-31T12:34:56",), ("",)],
        "s string",
    )
    assert str(out[0]) == "2020-01-31 00:00:00"
    assert str(out[1]) == "2020-01-31 12:34:56"
    assert out[2] is None


def test_parse_yesno_boolean(spark):
    out = _eval(
        spark,
        parse_yesno_boolean(F.col("s")),
        [("J",), ("Y",), ("N",), ("",), ("x",), (None,)],
        "s string",
    )
    assert out == [True, True, False, None, None, None]


def test_valid_date_range(spark):
    out = _eval(
        spark,
        valid_date_range(F.to_date("b"), F.to_date("e")),
        [
            ("2020-01-01", "2020-06-01"),
            ("2020-01-01", "2020-01-01"),
            ("2020-06-01", "2020-01-01"),
            ("2020-01-01", None),
            (None, "2020-01-01"),
        ],
        "b string, e string",
    )
    assert out == [True, True, False, True, True]


def test_pipe_split(spark):
    out = _eval(
        spark,
        pipe_split(F.col("s")),
        [("a|b",), ("a",), ("",), (None,)],
        "s string",
    )
    assert out == [["a", "b"], ["a"], [], []]


# --- G1 WKT coercion decision table (geo.py:52-78) ---

POLY = "POLYGON((0 0, 0 1, 1 1, 0 0))"
POLY_HOLES = "POLYGON((0 0, 0 9, 9 9, 0 0),(1 1, 1 2, 2 2, 1 1))"
MPOLY = "MULTIPOLYGON(((0 0, 0 1, 1 1, 0 0)))"
POINT = "POINT(4.5 -52.1)"
LINE = "LINESTRING(0 0, 1 1)"
MLINE = "MULTILINESTRING((0 0, 1 1))"


@pytest.mark.parametrize(
    "wkt,geotype,expected",
    [
        (POLY, "multipolygon", "MULTIPOLYGON(((0 0, 0 1, 1 1, 0 0)))"),
        (POLY_HOLES, "multipolygon",
         "MULTIPOLYGON(((0 0, 0 9, 9 9, 0 0),(1 1, 1 2, 2 2, 1 1)))"),
        (MPOLY, "multipolygon", MPOLY),
        (POINT, "multipolygon", None),  # reject wrong type
        (LINE, "multipolygon", None),
        (POLY, "polygon", POLY),
        (MPOLY, "polygon", None),
        (POINT, "point", POINT),
        (POLY, "point", None),
        (LINE, "multiline", "MULTILINESTRING((0 0, 1 1))"),
        (MLINE, "multiline", MLINE),
        (POINT, "multiline", None),
        (POLY, "bogus_geotype", None),
        ("", "multipolygon", None),
        (None, "multipolygon", None),
        ("POLYGON((0 0, 0 1", "multipolygon", None),  # unbalanced parens
        ("POLYGON((0 0, banana))", "multipolygon", None),  # junk coords
        ("FOO((0 0))", "multipolygon", None),  # unknown type
    ],
)
def test_coerce_wkt_value(wkt, geotype, expected):
    assert coerce_wkt_value(wkt, geotype) == expected


def test_merge_nullsafe_array_compare(spark):
    """J6: NULL-safe whole-row change detection includes array columns."""
    from dso_import_spark.operators.merge import plan_merge

    schema = "id string, tags array<string>, n int"
    existing = spark.createDataFrame(
        [("a", ["x"], 1), ("b", None, None), ("c", ["y"], 2)], schema
    )
    staged = spark.createDataFrame(
        [("a", ["x"], 1), ("b", None, None), ("c", ["y", "z"], 2)], schema
    )
    plan = plan_merge(existing, staged)
    assert plan.updated.count() == 1  # only c (array changed)
    assert plan.unchanged.count() == 2  # NULL == NULL is not a change
    assert plan.inserted.count() == 0


def test_plan_merge_modes_agree_on_updates(spark):
    # fingerprint vs exact: same classified rows, including the
    # self-derived-lineage case (staged computed from existing) that
    # trips Spark's ambiguous-self-join analysis if keys leak names
    from pyspark.sql import functions as F

    from dso_import_spark.operators.merge import plan_merge

    existing = spark.createDataFrame(
        [(1, 10, "a", None, 1.0), (2, 20, "b", "q", 2.0), (3, 30, None, "r", None)],
        "id int, x int, y string, z string, w double",
    )
    staged = existing.withColumn(
        "x", F.when(F.col("id") == 2, 99).otherwise(F.col("x"))
    ).unionByName(
        spark.createDataFrame([(4, 40, "d", None, 4.0)], existing.schema)
    )
    exact = plan_merge(existing, staged, key="id", compare="exact")
    narrow = plan_merge(existing, staged, key="id", compare="fingerprint")
    for field in ("inserted", "updated", "unchanged", "deleted", "merged"):
        got_e = sorted(map(tuple, getattr(exact, field).collect()))
        got_n = sorted(map(tuple, getattr(narrow, field).collect()))
        assert got_e == got_n, field
    # 5 non-key columns → auto picks the fingerprint plan
    auto = plan_merge(existing, staged, key="id")
    plan_str = auto.updated._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan_str


def test_read_gob_csv_drops_malformed_lines(spark, tmp_path):
    # round-8 review: PERMISSIVE null-padding would let a truncated
    # row that still carries the key columns merge fabricated all-NULL
    # attributes into history; DROPMALFORMED drops ragged lines (short
    # AND long) and keeps well-formed ones
    from dso_import_spark.sources.csv import read_gob_csv

    p = tmp_path / "ragged.csv"
    p.write_text(
        "identificatie;volgnummer;naam\nA1;1;x\nA2;2\nA3;3;z;extra\nA4;4;w\n"
    )
    rows = sorted(tuple(r) for r in read_gob_csv(spark, str(p)).collect())
    assert rows == [("A1", "1", "x"), ("A4", "4", "w")]


def test_read_gob_csv_audited_accounts_for_drops(spark, tmp_path):
    # ADVICE r8: DROPMALFORMED alone discards ragged rows with no
    # count — the audited variant counts them and (a) aborts above
    # the threshold (default 0: the reference's strict posture,
    # batch/csv.py:46-61), (b) tolerates-and-logs below it, and
    # (c) stays silent on a clean file (incl. trailing blank lines,
    # which the line counter must not mistake for dropped rows)
    import pytest

    from dso_import_spark.sources.csv import read_gob_csv_audited

    clean = tmp_path / "clean.csv"
    clean.write_text("identificatie;volgnummer;naam\nA1;1;x\nA2;2;y\n\n")
    rows = sorted(
        tuple(r) for r in read_gob_csv_audited(spark, str(clean)).collect()
    )
    assert rows == [("A1", "1", "x"), ("A2", "2", "y")]

    ragged = tmp_path / "ragged.csv"
    ragged.write_text(
        "identificatie;volgnummer;naam\nA1;1;x\nA2;2\nA3;3;z;extra\nA4;4;w\n"
    )
    with pytest.raises(ValueError, match="2/4 malformed"):
        read_gob_csv_audited(spark, str(ragged))
    # 2 of 4 dropped = 50% — under a generous threshold it loads,
    # with the survivors intact
    rows = sorted(
        tuple(r)
        for r in read_gob_csv_audited(
            spark, str(ragged), max_dropped_fraction=0.5
        ).collect()
    )
    assert rows == [("A1", "1", "x"), ("A4", "4", "w")]


def test_create_id_survives_nonnumeric_and_huge_volgnummer(spark):
    # round-8 review: raw cast('int') aborted the job under ANSI on a
    # corrupt token and overflowed on 10+ digits where the reference's
    # Python int() succeeds — NULL-never-crash, and big volgnummers key
    from dso_import_spark.functions.parsers import create_id, create_ids
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("A", "7"), ("B", "2a"), ("C", "12345678901")],
        "ident string, volg string",
    )
    got = {
        r["ident"]: r["k"]
        for r in df.select(
            "ident", create_id("ident", "volg").alias("k")
        ).collect()
    }
    assert got == {"A": "A_007", "B": None, "C": "C_12345678901"}
    (row,) = (
        spark.createDataFrame([("X|Y|Z", "1|oops|12345678901")], "i string, v string")
        .select(create_ids("i", "v").alias("ks"))
        .collect()
    )
    assert row["ks"] == ["X_001", "Z_12345678901"]


def test_simhash_null_text_does_not_collide(spark):
    # round-8 review: NULL text used to fingerprint as 0, colliding all
    # missing-text rows into spurious near-dup pairs
    from dso_import_spark.functions.text import simhash32
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "real text here")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["s"] for r in df.select(
        "doc_id", simhash32("text").alias("s")).collect()}
    assert rows[1] is None and rows[2] is None
    assert rows[3] is not None


def test_wkt_geometry_type_rejects_non_geometry_prefixes(spark):
    from dso_import_spark.functions.geometry import wkt_geometry_type

    df = spark.createDataFrame(
        [("POINT (1 2)",), ("FOO (1 2)",), ("POINTZ (1 2 3)",), (" polygon((0 0,1 1,1 0,0 0))",)],
        "wkt string",
    )
    got = [r["t"] for r in df.select(wkt_geometry_type("wkt").alias("t")).collect()]
    assert got == ["POINT", None, None, "POLYGON"]
