"""WKT Python DataSource: byte-range split correctness.

The invariant under test is the TextInputFormat ownership rule
(sources/wkt_source.py): for ANY partition count, every line is read by
exactly one slice — no loss, no double-read — including lines that
straddle slice boundaries and slices smaller than one line.
"""

from __future__ import annotations

import os

import pytest

from dso_import_spark.sources.wkt_source import register_wkt_source


def _write(tmp_path, name, lines):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return str(p)


def _read(spark, path, **opts):
    register_wkt_source(spark)
    r = spark.read.format("wkt")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load(path)


@pytest.fixture(scope="module")
def wkt_lines():
    # mixed line lengths so byte-midpoints fall inside lines
    return [
        f"{i:04d}|POLYGON((0 0,{i} 0,{i} {i},0 0))" if i % 3 else f"{i:04d}|POINT({i} 1)"
        for i in range(200)
    ]


@pytest.mark.parametrize("n_parts", [1, 2, 3, 7, 64, 10_000])
def test_every_line_read_exactly_once(spark, tmp_path, wkt_lines, n_parts):
    path = _write(tmp_path, f"p{n_parts}.wkt", wkt_lines)
    df = _read(spark, path, numPartitions=n_parts)
    got = sorted((r["id"], r["wkt"]) for r in df.collect())
    want = sorted(tuple(ln.split("|", 1)) for ln in wkt_lines)
    assert got == want


def test_partition_count_actually_splits(spark, tmp_path, wkt_lines):
    path = _write(tmp_path, "split.wkt", wkt_lines)
    df = _read(spark, path, numPartitions=6)
    assert df.rdd.getNumPartitions() == 6


def test_directory_input_reads_all_files(spark, tmp_path, wkt_lines):
    d = tmp_path / "wktdir"
    d.mkdir()
    _write(d, "a.wkt", wkt_lines[:50])
    _write(d, "b.wkt", wkt_lines[50:120])
    _write(d, "c.wkt", wkt_lines[120:])
    (d / "_hidden").write_text("zz|SKIP\n")
    got = sorted(r["id"] for r in _read(spark, str(d), numPartitions=3).collect())
    assert got == sorted(ln.split("|", 1)[0] for ln in wkt_lines)


def test_custom_delimiter_and_missing_wkt(spark, tmp_path):
    p = tmp_path / "semi.wkt"
    p.write_text("a;POINT(1 2)\nb\n\nc;POLYGON((0 0,1 0,1 1,0 0))\n")
    rows = {r["id"]: r["wkt"] for r in _read(spark, str(p), delimiter=";").collect()}
    assert rows == {"a": "POINT(1 2)", "b": None, "c": "POLYGON((0 0,1 0,1 1,0 0))"}


def test_no_trailing_newline(spark, tmp_path):
    p = tmp_path / "trail.wkt"
    p.write_text("x|POINT(0 0)\ny|POINT(1 1)")  # last line unterminated
    got = sorted(r["id"] for r in _read(spark, str(p), numPartitions=4).collect())
    assert got == ["x", "y"]


def test_empty_file(spark, tmp_path):
    p = tmp_path / "empty.wkt"
    p.write_text("")
    assert _read(spark, str(p)).count() == 0
    assert os.path.getsize(p) == 0


def test_writer_two_phase_commit(spark, tmp_path):
    """Temps are invisible to the reader; commit publishes atomically;
    a second overwrite fully replaces the first state."""
    from pyspark.sql import functions as F

    from dso_import_spark.sources.wkt_source import register_wkt_source

    register_wkt_source(spark)
    out = str(tmp_path / "rt")
    df = spark.range(0, 50).select(
        F.col("id").cast("string"),
        F.concat(F.lit("POINT("), F.col("id"), F.lit(" 2)")).alias("wkt"),
    )
    df.repartition(3).write.format("wkt").mode("overwrite").save(out)
    import os

    names = sorted(os.listdir(out))
    assert "_SUCCESS" in names
    assert [n for n in names if n.endswith(".tmp")] == []
    assert len([n for n in names if n.startswith("part-")]) == 3
    assert open(os.path.join(out, "_SUCCESS")).read() == "50"
    back = spark.read.format("wkt").load(out)
    assert back.count() == 50
    # stray uncommitted temp from a dead task must never be read
    with open(os.path.join(out, ".part-dead.wkt.tmp"), "w") as f:
        f.write("999|POINT(0 0)\n")
    assert spark.read.format("wkt").load(out).count() == 50
    # overwrite with fewer rows replaces, never merges
    df.limit(10).repartition(2).write.format("wkt").mode(
        "overwrite"
    ).save(out)
    assert spark.read.format("wkt").load(out).count() == 10
    assert open(os.path.join(out, "_SUCCESS")).read() == "10"


def test_writer_rejects_append_and_bad_schema(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from dso_import_spark.sources.wkt_source import register_wkt_source

    register_wkt_source(spark)
    df2 = spark.range(3).select(
        F.col("id").cast("string"), F.lit("POINT(0 0)").alias("wkt")
    )
    with pytest.raises(Exception, match="overwrite"):
        df2.write.format("wkt").mode("append").save(str(tmp_path / "a"))
    df3 = df2.withColumn("extra", F.lit(1))
    with pytest.raises(Exception, match="id, wkt"):
        df3.write.format("wkt").mode("overwrite").save(str(tmp_path / "b"))
