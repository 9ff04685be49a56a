"""Bloom-filter join pruning (operators/bloom.py): the contract is
(1) NO false negatives — pruned-then-joined equals plain join exactly;
(2) the filter state is bounded by geometry, not build cardinality;
(3) the pruning actually removes rows on a selective probe;
(4) the probe side is never shuffled by the prune step.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from dso_import_spark.operators.bloom import (
    bloom_build,
    bloom_prune,
    bloom_pruned_join,
)
from dso_import_spark.queries_pkg.util import tables


def _build_probe(spark, sf_dir):
    events, customer = tables(spark, sf_dir, "events", "customer")
    build = customer.where(F.col("c_acctbal") > 7000)
    return events, build


def test_no_false_negatives_join_identical(spark, sf_dir):
    probe, build = _build_probe(spark, sf_dir)
    plain = (
        probe.join(build, probe.user_id == build.c_custkey)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("v"))
    )
    pruned = (
        bloom_pruned_join(probe, build, "user_id", "c_custkey")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("v"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, pruned.collect())
    )


def test_bitmap_state_bounded_by_geometry(spark, sf_dir):
    _, build = _build_probe(spark, sf_dir)
    for m in (256, 4096):
        row = bloom_build(build, "c_custkey", m=m).collect()
        assert len(row) == 1
        words = row[0]["__bloom_words"]
        assert len(words) == (m + 63) // 64  # fixed by geometry alone


def test_prune_drops_nonmatching_keeps_all_matching(spark, sf_dir):
    probe, build = _build_probe(spark, sf_dir)
    bl = bloom_build(build, "c_custkey")
    kept = bloom_prune(probe, bl, "user_id")
    n_total = probe.count()
    n_kept = kept.count()
    n_true = probe.join(
        build, probe.user_id == build.c_custkey, "left_semi"
    ).count()
    # superset of true matches (no false negatives), strict subset of
    # the probe (pruning does something on this selective build side)
    assert n_true <= n_kept < n_total
    # every true-matching row survived
    missed = (
        probe.join(build, probe.user_id == build.c_custkey, "left_semi")
        .join(kept.select("event_id"), "event_id", "left_anti")
        .count()
    )
    assert missed == 0


def test_prune_never_shuffles_the_probe(spark, sf_dir):
    probe, build = _build_probe(spark, sf_dir)
    bl = bloom_build(build, "c_custkey")
    pruned = bloom_prune(probe, bl, "user_id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    # the 1-row bitmap rides a broadcast nested-loop append; the only
    # exchanges in the whole plan belong to building that single-row
    # side (aggregations over the build keys), never the probe scan:
    # the probe branch is scan -> filter -> BNLJ with zero exchanges.
    assert "BroadcastNestedLoopJoin" in plan
    # In the tree diagram the BNLJ's left (probe) branch lines are
    # ':'-prefixed; the probe must be scan -> filter with no Exchange.
    tree = plan.split("\n\n")[0].splitlines()
    probe_branch = [ln for ln in tree if ln.lstrip().startswith(":")]
    assert any("Scan parquet" in ln for ln in probe_branch)
    assert not any("Exchange" in ln for ln in probe_branch)


def test_null_probe_keys_dropped(spark, sf_dir):
    probe, build = _build_probe(spark, sf_dir)
    with_nulls = probe.withColumn(
        "user_id",
        F.when(F.col("event_id") % 3 == 0, None).otherwise(F.col("user_id")),
    )
    bl = bloom_build(build, "c_custkey")
    kept = bloom_prune(with_nulls, bl, "user_id")
    assert kept.where(F.col("user_id").isNull()).count() == 0
