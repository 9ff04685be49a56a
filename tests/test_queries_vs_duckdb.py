"""Differential harness mirroring the driver: every registered query's
Spark result must match its DuckDB oracle on the same parquet tables
(row count + column names + order-insensitive value multiset)."""

from __future__ import annotations

import math

import duckdb
import pytest

from dso_import_spark.queries import REGISTRY
from dso_import_spark.sources.registry import FIXTURE_TABLES


def _duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0/0.0 and format stably
        return f"{v + 0.0:.9g}"
    if isinstance(v, bool):
        return f"b:{v}"
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)
NO_ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = REGISTRY[name]
    sdf = spec.spark(spark, sf_dir)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    con = _duck_con(sf_dir)
    res = con.sql(spec.oracle)
    d_cols = [c.lower() for c in res.columns]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    sn, dn = _norm_rows(s_cols, s_rows), _norm_rows(d_cols, d_rows)
    if sn != dn:
        diff = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


@pytest.mark.parametrize("name", NO_ORACLE_QUERIES)
def test_rows_only_queries_run(spark, sf_dir, name):
    spec = REGISTRY[name]
    sdf = spec.spark(spark, sf_dir)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
