"""Bucketed co-located join: the 100 TB strategy for repeated fact-fact
joins (SURVEY.md §7 M6).

Writing both join sides bucketed by the join key lets every subsequent
join run shuffle-free — at cluster scale this converts the dominant
repeated cost (full-fact shuffle per join) into a one-time write cost.
The assertions prove the property from the physical plan, not timing:
the bucketed join has NO Exchange on either side, the plain join has
shuffles (or broadcasts only because local data is tiny).
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from dso_import_spark.queries_pkg.util import tables


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("bucketed_wh"))
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    orders, li = tables(spark, sf_dir, "orders", "lineitem")
    for name, df, key in [("orders_b", orders, "o_orderkey"), ("lineitem_b", li, "l_orderkey")]:
        spark.sql(f"DROP TABLE IF EXISTS bktest.{name}")
        (
            df.write.mode("overwrite")
            .option("path", f"{wh}/{name}")  # external: warehouse.dir is static
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(f"bktest.{name}")
        )
    yield spark.table("bktest.orders_b"), spark.table("bktest.lineitem_b")
    spark.sql("DROP TABLE IF EXISTS bktest.orders_b")
    spark.sql("DROP TABLE IF EXISTS bktest.lineitem_b")
    spark.sql("DROP DATABASE IF EXISTS bktest")


def test_bucketed_join_is_shuffle_free(spark, bucketed):
    orders_b, li_b = bucketed
    # disable broadcast so the join strategy is decided by distribution,
    # as it would be when both sides are far beyond the broadcast limit
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = li_b.join(orders_b, li_b.l_orderkey == orders_b.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        # both scans read bucketed layout...
        assert plan.count("Bucketed: true") == 2
        # ...and the ONLY Exchange is the post-join group-by; neither join
        # input is shuffled (no hashpartitioning on the join keys)
        assert plan.count("Exchange (") == 1
        assert "hashpartitioning(l_orderkey" not in plan
        assert "hashpartitioning(o_orderkey" not in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed):
    orders_b, li_b = bucketed
    orders, li = tables(spark, sf_dir, "orders", "lineitem")
    bucketed_res = (
        li_b.join(orders_b, li_b.l_orderkey == orders_b.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    plain_res = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted(map(tuple, bucketed_res)) == sorted(map(tuple, plain_res))
