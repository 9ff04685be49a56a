"""The external driver verifies registry entries front-to-back within
a per-round budget (~50). The front block is therefore a deliberate,
rotated choice (the explicit ROUND4_FRONT reorder in queries.py) — and
a new @query appended anywhere can no longer silently land inside the
window, but a front-block edit still must be deliberate. This test
pins the current front-50: when rotating (or deliberately front-
loading a new query), update this list in the same commit and say so.
"""

from __future__ import annotations

from dso_import_spark.queries import REGISTRY, ROUND4_FRONT, ROUND5_QUEUE

FRONT_50 = [
    "wkt_write_roundtrip", "stream_interval_full_outer",
    "stream_session_dynamic_gap", "multimodal_wav_decode",
    "lm_bigram_quality",
    "semdedup_prune", "ann_pq_topk", "ann_ivf_pq_topk", "ann_recall_report",
    "embedding_covariance",
    "decimal_money_totals", "cdc_apply_changes", "schema_evolution_scan",
    "partition_overwrite_merge",
    "dedup_cluster_canonical", "source_overlap_matrix",
    "quality_classifier_score", "priority_sample_topk",
    "dsir_importance_scores", "diversity_distinct_ngrams",
    "cms_frequency_estimate", "bpe_regex_token_count", "vocab_oov_rates",
    "temperature_mix_weights", "hopping_window_counts", "stream_hopping_hour",
    "stream_static_enrich", "funnel_conversion", "gapfill_locf_hourly",
    "char_entropy_quality", "gopher_quality_gate", "ngram_novelty_decay",
    "word_zipf_slope", "embedding_dim_stats", "embedding_quantize_int8",
    "k_anonymity_audit", "join_key_skew_profile",
    "boilerplate_ngram_mass", "bpe_pair_merge_counts",
    "length_quantile_filter",
    "rfm_segmentation", "bitmap_exact_distinct",
    "seasonal_baseline_residuals",
    "did_difference_in_differences", "srm_sample_ratio_check",
    "spatial_knn_radius", "arrival_anomaly_days", "funnel_time_to_convert",
    "event_transition_matrix", "rendezvous_sharding",
]


def test_driver_front_block_is_deliberate():
    assert list(REGISTRY)[:50] == FRONT_50
    assert ROUND4_FRONT == FRONT_50


def test_round5_queue_is_staged():
    # every queued name is real, and none is already in the front block
    assert set(ROUND5_QUEUE) <= set(REGISTRY)
    assert not set(ROUND5_QUEUE) & set(FRONT_50)
    # the staged surplus sits directly behind the front block so extra
    # driver budget lands on it, never on random import order
    assert list(REGISTRY)[50:50 + len(ROUND5_QUEUE)] == ROUND5_QUEUE
