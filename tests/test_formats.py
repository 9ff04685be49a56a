"""JSONL / ORC format round-trips and the JSONL rejected-row channel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dso_import_spark.sources.formats import (
    read_jsonl,
    read_orc,
    write_jsonl,
    write_orc,
)
from dso_import_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_jsonl_roundtrip_exact(spark, orders, tmp_path):
    p = str(tmp_path / "orders_jsonl")
    write_jsonl(orders, p)
    valid, rejected = read_jsonl(spark, p, orders.schema)
    assert rejected.count() == 0
    assert _rows(valid.select(*orders.columns)) == _rows(orders)


def test_orc_roundtrip_exact_with_pushdown(spark, orders, tmp_path):
    p = str(tmp_path / "orders_orc")
    write_orc(orders, p)
    back = read_orc(spark, p)
    assert _rows(back.select(*orders.columns)) == _rows(orders)
    # ORC scans take predicate pushdown like parquet
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.filter(F.col("o_orderkey") == 42).explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan
    assert "o_orderkey" in plan.split("PushedFilters", 1)[1][:200]


def test_jsonl_corrupt_lines_quarantined(spark, orders, tmp_path):
    import os

    p = str(tmp_path / "mixed_jsonl")
    write_jsonl(orders.limit(10), p)
    # land a malformed file next to the good parts (a fresh file, not an
    # append — appending would invalidate Hadoop's local-FS .crc)
    with open(os.path.join(p, "bad-batch.json"), "w") as fh:
        fh.write('{"o_orderkey": broken\nnot json at all\n')
    valid, rejected = read_jsonl(spark, p, orders.schema)
    assert valid.count() == 10
    assert rejected.count() == 2
    bad = {r[0] for r in rejected.collect()}
    assert any("broken" in b for b in bad)


def test_xml_roundtrip_exact(spark, orders, tmp_path):
    from dso_import_spark.sources.formats import read_xml, write_xml

    p = str(tmp_path / "orders_xml")
    write_xml(orders, p)
    valid, rejected = read_xml(spark, p, orders.schema)
    assert rejected.count() == 0
    assert _rows(valid.select(*orders.columns)) == _rows(orders)


def test_xml_corrupt_records_quarantined(spark, orders, tmp_path):
    import os

    from dso_import_spark.sources.formats import read_xml, write_xml

    p = str(tmp_path / "mixed_xml")
    write_xml(orders.limit(5), p)
    with open(os.path.join(p, "bad-batch.xml"), "w") as fh:
        fh.write(
            "<rows><row><o_orderkey>not_a_number</o_orderkey></row></rows>\n"
        )
    valid, rejected = read_xml(spark, p, orders.schema)
    assert valid.count() == 5
    assert rejected.count() == 1
