"""Contract tests for queries_pkg/placement.py (z-order layout +
cluster-aware split). Cross-engine value equality is covered by the
differential suite; these pin the semantic invariants the numbers
must exhibit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dso_import_spark.queries import REGISTRY
from dso_import_spark.queries_pkg.placement import _BITS, _zvalue


def _py_morton(x: int, y: int, bits: int = _BITS) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_python_reference(spark):
    cases = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 678), (42, 601)]
    df = spark.createDataFrame(cases, "x long, y long").select(
        "x", "y", _zvalue(F.col("x"), F.col("y")).alias("z")
    )
    for x, y, z in df.collect():
        assert z == _py_morton(x, y), (x, y)


def test_zorder_bounds_both_dimensions(spark, sf_dir):
    rows = {
        r["layout"]: r
        for r in REGISTRY["zorder_layout_stats"].spark(spark, sf_dir).collect()
    }
    zo, ins, ds = rows["zorder"], rows["insertion"], rows["date_sorted"]
    # z-order tiles bound BOTH dims far below the insertion layout
    assert zo["avg_custkey_span"] < ins["avg_custkey_span"] / 2
    assert zo["avg_date_span"] < ins["avg_date_span"] / 2
    # date-sort bounds only its own dim; custkey span stays ~full
    assert ds["avg_date_span"] < zo["avg_date_span"]
    assert ds["avg_custkey_span"] > zo["avg_custkey_span"]
    # pruning: both probes skip most buckets under z-order (a 16x16
    # grid touches one 16-tile row/column per 1-D probe); insertion
    # order prunes little for the date range (at sf0.001 a bucket
    # holds only ~6 rows, so some miss the probe month by chance —
    # hence 0.6, not ~1.0)
    assert zo["key_hit_buckets"] / zo["n_buckets"] < 0.2
    assert zo["range_hit_buckets"] / zo["n_buckets"] < 0.2
    assert ins["range_hit_buckets"] / ins["n_buckets"] > 0.6


def test_split_bucket_never_overflows_large_ids(spark):
    # ids past 2^31 used to overflow the signed-64 Knuth multiply under
    # ANSI mode; the mod-2^31 mask bounds the product for any id
    from dso_import_spark.queries_pkg.placement import _split_bucket

    big = [(2**31,), (2**40 + 7,), (2**62 - 1,), (3_470_000_000,), (0,)]
    df = spark.createDataFrame(big, "cluster_id long")
    with _ansi(spark):
        out = df.select(
            _split_bucket(F.col("cluster_id")).alias("b")
        ).collect()
    assert all(0 <= r["b"] <= 9 for r in out)


class _ansi:
    """Force spark.sql.ansi.enabled=true inside the block."""

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.ansi.enabled", None)
        self.spark.conf.set("spark.sql.ansi.enabled", "true")

    def __exit__(self, *exc):
        if self.prev is None:
            self.spark.conf.unset("spark.sql.ansi.enabled")
        else:
            self.spark.conf.set("spark.sql.ansi.enabled", self.prev)


def test_cluster_aware_split_has_no_leaks_and_partitions_sample(
    spark, sf_dir
):
    out = REGISTRY["cluster_aware_split"].spark(spark, sf_dir).collect()
    assert out, "split produced no rows"
    assert {r["split"] for r in out} <= {"train", "val", "test"}
    assert all(r["leaky_clusters"] == 0 for r in out)
    n_sampled = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 20 == 0)
        .count()
    )
    assert sum(r["n_docs"] for r in out) == n_sampled
