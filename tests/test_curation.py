"""Plan + semantics contracts for the curation module: every docstring
scale claim (no UDF in the entropy path, single-chain gate aggregate,
broadcast quantization scales, dims-bounded results) is pinned to the
physical plan or to an invariant of the output."""

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


def test_char_entropy_no_udf_no_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "char_entropy_quality")
    # the log2(n) - sum(c log2 c)/n identity removes the p-per-row
    # normalization join; everything is built-in Column arithmetic
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_gopher_gate_single_chain(spark, sf_dir):
    plan = _plan(spark, sf_dir, "gopher_quality_gate")
    # one explode feeds stacked aggregates: no joins, no windows
    assert "Join" not in plan
    assert "Window" not in plan


def test_gopher_gate_funnel_consistent(spark, sf_dir):
    row = REGISTRY["gopher_quality_gate"].spark(spark, sf_dir).collect()[0]
    assert row.n_docs > 0
    # pass-all can never exceed docs minus the largest single-rule drop
    worst = max(
        row.n_fail_length,
        row.n_fail_word_length,
        row.n_fail_stopwords,
        row.n_fail_repetition,
    )
    assert row.n_pass <= row.n_docs - worst
    # the gate must actually discriminate on the fixture
    assert 0 < row.n_pass < row.n_docs


def test_novelty_window_on_per_doc_aggregate(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ngram_novelty_decay")
    # exactly one window (the decile ntile) and it runs after the
    # per-doc aggregate, never over the shingle relation
    assert plan.count("Window") == 1
    rows = REGISTRY["ngram_novelty_decay"].spark(spark, sf_dir).collect()
    # the first ingestion decile must be the most novel one
    by_bucket = {r.bucket: r.avg_novelty for r in rows}
    assert by_bucket[1] == max(by_bucket.values())


def test_zipf_slope_negative(spark, sf_dir):
    rows = REGISTRY["word_zipf_slope"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # frequency falls with rank on any natural-ish corpus
        assert r.zipf_slope < 0


def test_embedding_dim_stats_bounded(spark, sf_dir):
    rows = REGISTRY["embedding_dim_stats"].spark(spark, sf_dir).collect()
    # result cardinality is the dimensionality, not the corpus size
    assert len(rows) == 64
    n = {r.n for r in rows}
    assert len(n) == 1  # every dim sees every vector


def test_quantize_scales_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "embedding_quantize_int8")
    # the dims-row scale table must come back as a broadcast, never a
    # shuffle of the exploded values
    assert "BroadcastHashJoin" in plan
    rows = REGISTRY["embedding_quantize_int8"].spark(spark, sf_dir).collect()
    for r in rows:
        # int8 with per-dim absmax scale: worst-case error is half a
        # quantization step (1e-6 slack: both sides are round(x, 6))
        assert r.max_abs_err <= r.scale / 127.0 / 2.0 + 1e-6
