"""Property and plan tests for the stats_ops module (equi-depth
histogram, compaction planner, pivot, skyline, Theil-Sen).

The differential suite proves oracle equality; these pin the
semantic invariants the oracle comparison alone would not localize
(dominance-freeness, byte conservation, row conservation) and the
physical-plan posture of each operator.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from dso_import_spark.queries import REGISTRY


def _plan(df, mode: str = "simple") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def skyline_rows(spark, sf_dir):
    return REGISTRY["skyline_pareto_frontier"].spark(spark, sf_dir).collect()


def test_skyline_output_is_mutually_non_dominated(skyline_rows):
    pts = [(r.price, r.psize) for r in skyline_rows]
    assert pts, "skyline must be non-empty"
    for p in pts:
        for q in pts:
            dominated = (
                q[0] <= p[0]
                and q[1] >= p[1]
                and (q[0] < p[0] or q[1] > p[1])
            )
            assert not dominated, f"{q} dominates {p} inside the skyline"


def test_skyline_is_a_proper_frontier(spark, sf_dir, skyline_rows):
    # every non-skyline point must be dominated by some skyline point
    # (2-D specific: the frontier is a staircase — price strictly
    # increasing implies size strictly increasing along it)
    stair = sorted((r.price, r.psize) for r in skyline_rows)
    sizes = [s for _, s in stair]
    assert sizes == sorted(sizes), "frontier must be a staircase"
    assert len(set(p for p, _ in stair)) == len(stair)


def test_histogram_bins_are_equal_height(spark, sf_dir):
    rows = REGISTRY["equi_depth_histogram"].spark(spark, sf_dir).collect()
    assert len(rows) == 16
    counts = [r.n_rows for r in rows]
    # equi-depth: bin populations within interpolation slack of n/16
    assert max(counts) - min(counts) <= max(2, sum(counts) // 100)
    by_bin = {r.bin: r for r in rows}
    for b in range(1, 16):
        assert by_bin[b].hi_price <= by_bin[b + 1].lo_price + 0.01


def test_compaction_conserves_bytes_and_orders_files(spark, sf_dir):
    from dso_import_spark.queries_pkg.util import tables
    from pyspark.sql import functions as F

    rows = REGISTRY["compaction_bin_packing"].spark(spark, sf_dir).collect()
    (events,) = tables(spark, sf_dir, "events")
    total = events.count() * 48
    assert sum(r.total_bytes for r in rows) == total
    # output file ids are dense-ish and non-negative per day
    for r in rows:
        assert r.out_file >= 0 and r.n_inputs >= 1


def test_pivot_conserves_rows(spark, sf_dir):
    from dso_import_spark.queries_pkg.util import tables

    rows = REGISTRY["pivot_event_matrix"].spark(spark, sf_dir).collect()
    (events,) = tables(spark, sf_dir, "events")
    n_cols = [c for c in rows[0].asDict() if c.endswith("_n")]
    assert sorted(n_cols) == [
        "click_n", "error_n", "purchase_n", "signup_n", "view_n"
    ]
    assert sum(sum(r[c] for c in n_cols) for r in rows) == events.count()


def test_compaction_plan_is_day_partitioned_no_global_window(spark, sf_dir):
    df = REGISTRY["compaction_bin_packing"].spark(spark, sf_dir)
    plan = _plan(df)
    assert "Exchange SinglePartition" not in plan
    assert "Window" in plan


def test_pivot_fills_absent_cells_with_zero_not_null(spark):
    # a cohort that never sees a type must report 0/0.0 (the oracle's
    # CASE aggregation semantics), not the NULL a bare pivot emits
    from dso_import_spark.queries_pkg.stats_ops import _pivot_wide

    events = spark.createDataFrame(
        [(1, "click", 2.0), (1, "view", 3.0), (2, "purchase", 5.0)],
        "user_id long, event_type string, value double",
    )
    rows = {r["cohort"]: r for r in _pivot_wide(events).collect()}
    assert rows[1]["purchase_n"] == 0 and rows[1]["purchase_val"] == 0.0
    assert rows[2]["click_n"] == 0 and rows[2]["click_val"] == 0.0
    assert rows[1]["click_n"] == 1 and rows[1]["click_val"] == 2.0


def test_pivot_plan_is_one_hash_agg_pair_no_distinct_scan(spark, sf_dir):
    # explicit pivot values: no extra job to collect distinct types,
    # one partial+final agg pair over cohort
    df = REGISTRY["pivot_event_matrix"].spark(spark, sf_dir)
    plan = _plan(df)
    assert plan.count("HashAggregate") >= 2
    assert "Exchange SinglePartition" not in plan


def test_theil_sen_joins_equi_on_user_never_nested_loop(spark, sf_dir):
    df = REGISTRY["theil_sen_trend"].spark(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "user_id" in plan
