"""Dev-loop differential check for a subset of queries (mirrors
tests/test_queries_vs_duckdb.py). Usage: python tools/dev_check.py name1 name2
(runnable from anywhere — the repo root is inserted into sys.path below).
"""
import math
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb
from pyspark.sql import SparkSession

from dso_import_spark.queries import REGISTRY
from dso_import_spark.sources.registry import FIXTURE_TABLES
SF_DIR = os.environ.get("DEV_SF_DIR", "/root/testdata/sf0.001")


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v + 0.0:.9g}"
    if isinstance(v, bool):
        return f"b:{v}"
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def main(names):
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    fail = 0
    for name in names:
        spec = REGISTRY[name]
        sdf = spec.spark(spark, SF_DIR)
        s_cols = [c.lower() for c in sdf.columns]
        s_rows = [tuple(r) for r in sdf.collect()]
        res = con.sql(spec.oracle)
        d_cols = [c.lower() for c in res.columns]
        d_rows = res.fetchall()
        ok_cols = sorted(s_cols) == sorted(d_cols)
        ok_n = len(s_rows) == len(d_rows)
        sn, dn = _norm_rows(s_cols, s_rows), _norm_rows(d_cols, d_rows)
        ok_v = sn == dn
        print(f"{name}: cols={ok_cols} rows={ok_n}({len(s_rows)}/{len(d_rows)}) values={ok_v}")
        if not ok_cols:
            print("  spark:", sorted(s_cols), "\n  duck:", sorted(d_cols))
        if ok_cols and not ok_v:
            diff = [(x, y) for x, y in zip(sn, dn) if x != y][:3]
            print("  first diffs:", diff)
        fail += not (ok_cols and ok_n and ok_v)
    spark.stop()
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main(sys.argv[1:])
