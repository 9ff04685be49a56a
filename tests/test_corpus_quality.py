"""Plan + semantics contracts for the corpus-quality module: each
query's doc makes a scale claim (narrow shingling, no per-doc window
shuffle, broadcast gate table) — pin them to the physical plan."""

from __future__ import annotations

import contextlib
import io

from dso_import_spark.queries import REGISTRY


def _plan(spark, sf_dir, name):
    df = REGISTRY[name].spark(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    return buf.getvalue()


def test_boilerplate_shingling_is_narrow(spark, sf_dir):
    plan = _plan(spark, sf_dir, "boilerplate_ngram_mass")
    # shingles come from an array transform, never a per-doc window
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bpe_pairs_single_count_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "bpe_pair_merge_counts")
    # the pair count is the only hash exchange; the global top-k
    # ranks the collapsed vocabulary-squared table (a SinglePartition
    # exchange over |vocab|^2 rows, not over raw pairs)
    n_hash = sum(
        1 for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    )
    assert n_hash == 1


def test_length_gates_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "length_quantile_filter")
    assert "BroadcastHashJoin" in plan


def test_boilerplate_fraction_bounds(spark, sf_dir):
    rows = REGISTRY["boilerplate_ngram_mass"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.dup_fraction <= 1.0
        assert r.n_shingles > 0
