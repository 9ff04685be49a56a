"""Compaction and schema-evolution maintenance operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from dso_import_spark.operators.maintenance import (
    compact,
    dir_stats,
    read_evolved,
)
from dso_import_spark.sources.registry import load_table


def test_compact_reduces_files_preserves_content(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    p = str(tmp_path / "fragmented")
    orders.repartition(40).write.parquet(p)  # simulate append fragmentation
    n_before, total = dir_stats(p)
    assert n_before == 40

    n_after = compact(spark, p, target_bytes=max(total // 3, 1))
    assert n_after < n_before
    back = spark.read.parquet(p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, orders.collect()))


def test_compact_noop_when_already_compact(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    p = str(tmp_path / "tight")
    orders.coalesce(1).write.parquet(p)
    assert compact(spark, p, target_bytes=128 * 1024 * 1024) == 1


def test_read_evolved_merges_drifted_schemas(spark, tmp_path):
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    v2 = spark.createDataFrame(
        [(3, "c", 9.5)], "id int, name string, score double"
    )
    p1, p2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    v1.write.parquet(p1)
    v2.write.parquet(p2)
    merged = read_evolved(spark, p1, p2)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {tuple(r) for r in merged.collect()}
    assert rows == {(1, "a", None), (2, "b", None), (3, "c", 9.5)}
    # pre-drift rows surface NULL score; filters on the new column work
    assert merged.filter(F.col("score").isNotNull()).count() == 1


def test_cluster_write_yields_disjoint_ranges(spark, sf_dir, tmp_path):
    """Range clustering must put disjoint o_orderkey ranges in each
    file, with tight row-group min/max stats — that's what lets the
    parquet reader skip row groups on point/range predicates."""
    import os

    import pyarrow.parquet as pq

    from dso_import_spark.operators.maintenance import cluster_write

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    p = str(tmp_path / "clustered")
    cluster_write(orders, p, "o_orderkey", n_files=4)

    spans = []
    for f in os.listdir(p):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(p, f)).metadata
        lo = min(
            md.row_group(i).column(0).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(0).statistics.max
            for i in range(md.num_row_groups)
        )
        spans.append((lo, hi))
    spans.sort()
    assert len(spans) == 4
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev < lo_next  # disjoint: skipping can eliminate files

    # content survives clustering
    back = spark.read.parquet(p)
    assert back.count() == orders.count()
    # and a point predicate is pushed to the scan
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.filter(F.col("o_orderkey") == 7).explain("formatted")
    assert "PushedFilters" in buf.getvalue()


def test_compact_partitioned_preserves_layout(spark, sf_dir, tmp_path):
    """Partition-aware compaction: each dt= directory collapses toward
    one file, the hive layout and content survive."""
    import os

    from dso_import_spark.operators.maintenance import compact

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.to_date("ts").alias("dt")
    )
    p = str(tmp_path / "part_frag")
    ev.repartition(8).write.partitionBy("dt").parquet(p)  # 8 files per day
    n_before, _ = dir_stats(p)
    days_before = {d for d in os.listdir(p) if d.startswith("dt=")}

    n_after = compact(spark, p, partition_by=["dt"])
    assert n_after < n_before
    days_after = {d for d in os.listdir(p) if d.startswith("dt=")}
    assert days_after == days_before  # layout preserved
    back = spark.read.parquet(p)
    assert back.count() == ev.count()
    assert dict(back.dtypes)["dt"] == "date"
