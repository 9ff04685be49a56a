"""Storage-layout scale posture: partition pruning on the
hive-partitioned events copy, and runtime Bloom-filter join pruning.

Both are planner behaviors, not result behaviors — the differential
harness already proves the results match; these prove the scan work
shrinks the way it must at 100 TB.
"""

from __future__ import annotations

import contextlib
import io
import shutil

import pytest
from pyspark.sql import functions as F

from dso_import_spark.queries_pkg.layout import (
    partitioned_events,
    partitioned_events_path,
)
from dso_import_spark.sources.registry import load_table


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def part_events(spark, sf_dir):
    shutil.rmtree(partitioned_events_path(sf_dir), ignore_errors=True)
    df = partitioned_events(spark, sf_dir)
    yield df
    shutil.rmtree(partitioned_events_path(sf_dir), ignore_errors=True)


def test_week_filter_prunes_partitions(spark, sf_dir, part_events):
    week = part_events.filter(F.col("dt").between("2024-01-08", "2024-01-14"))
    plan = plan_of(week)
    # the dt predicate must be a partition filter, not a data filter
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1][:300]
    assert "dt" in pf
    # planning-time directory pruning: 7 of 30 day-directories survive
    files = week.select(F.input_file_name()).distinct().collect()
    days = {f[0].split("dt=")[1][:10] for f in files}
    assert days == {f"2024-01-{d:02d}" for d in range(8, 15)}


def test_partitioned_copy_is_lossless(spark, sf_dir, part_events):
    orig = load_table(spark, sf_dir, "events")
    assert part_events.count() == orig.count()
    # the partition column is derived, everything else round-trips
    rowhash = F.xxhash64("event_id", "user_id", "event_type").cast("decimal(38,0)")
    a = orig.select(F.sum(rowhash)).first()[0]
    b = part_events.select(F.sum(rowhash)).first()[0]
    assert a == b


def test_one_file_per_day_partition(part_events):
    # repartition("dt") before write → each day directory holds one file,
    # not one file per shuffle task (small-files problem at scale)
    files = part_events.select(F.input_file_name()).distinct().collect()
    days = [f[0].split("dt=")[1][:10] for f in files]
    assert len(days) == len(set(days)) == 30


def test_runtime_bloom_filter_prunes_shuffle_join(spark, sf_dir):
    """With broadcast off (a 100 TB fact never broadcasts), Spark's
    InjectRuntimeFilter should add a bloom_filter_agg on the selective
    dimension side and probe it on the fact side before the shuffle."""
    conf = spark.conf
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
    ]
    saved = {k: conf.get(k) for k in keys}
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = plan_of(j, "simple")
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan
        # and the result is unaffected by the runtime filter
        rows = {tuple(r) for r in j.collect()}
        expected = {
            tuple(r)
            for r in li.join(
                load_table(spark, sf_dir, "orders").filter(
                    F.col("o_orderpriority") == "1-URGENT"
                ),
                li.l_orderkey == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert rows == expected
    finally:
        # restore EVERY touched key — a leaked
        # applicationSideScanSizeThreshold=0 injects single-partition
        # bloom aggregates into every later test's join plans
        for k, v in saved.items():
            conf.set(k, v)


def test_scd2_change_feed_shares_key_shuffle(spark, sf_dir):
    """The CDC diff costs ONE o_custkey shuffle: the interval window and
    the per-key conditional agg reuse the same hash partitioning. Only
    the final tiny change_type rollup adds a second exchange."""
    from dso_import_spark.queries_pkg.layout import scd2_change_feed

    plan = plan_of(scd2_change_feed(spark, sf_dir))
    shuffles = plan.count("Exchange (") - plan.count("BroadcastExchange (")
    assert shuffles == 2, plan
    assert "CartesianProduct" not in plan
