"""The external driver verifies registry entries front-to-back within
a per-round budget (~50). The front block is therefore a deliberate,
rotated choice (the explicit ROUND8_FRONT reorder in queries.py) — and
a new @query appended anywhere can no longer silently land inside the
window, but a front-block edit still must be deliberate. This test
pins the current front-50: when rotating (or deliberately front-
loading a new query), update this list in the same commit and say so.
"""

from __future__ import annotations

from dso_import_spark.queries import REGISTRY, ROUND8_FRONT, ROUND9_QUEUE

FRONT_50 = [
    # never-verified first (the r4 rule): the round-7 mlops3 batch,
    # staged at the old ROUND8_QUEUE head
    "mrr_at_k", "cohens_kappa", "chi_square_independence",
    "decision_stump_split", "quantile_normalize_sources",
    "robust_outlier_mad",
    "t_closeness_audit", "brier_decomposition", "f1_threshold_sweep",
    "stratified_ate",
    "mann_kendall_trend", "flesch_readability", "bootstrap_mean_ci",
    # the ENTIRE stale backlog, registry order (33)
    "spatial_bbox_join",
    "stream_tail_ingest", "scd2_point_in_time", "scd2_change_feed",
    "partitioned_events_scan", "stratified_sample_lang", "seq_packing_bins",
    "decontam_ngram_overlap", "corpus_pipeline_stats", "bloom_join_prune",
    "basket_pair_affinity", "record_linkage_fuzzy", "pagerank_shipments",
    "incremental_agg_refresh", "feature_scale_normalize",
    "notin_null_semantics", "ewma_fixed_lags", "drift_psi_periods",
    "benford_first_digit", "triangle_count_parts",
    "dedup_prefix_filter_pairs", "capped_running_balance",
    "incremental_distinct_sketch", "attribution_first_last_touch",
    "exact_quota_sample", "twap_time_weighted", "ohlc_hourly_bars",
    "table_content_checksum", "event_path_trigrams", "ab_test_welch_t",
    "revenue_gini", "drift_ks_statistic", "cuped_variance_reduction",
    # refresh picks filling to 50: the round-8 prefix verify re-shape
    # (FORCE_REVERIFY), the two oldest greens (r1 rows), and
    # lang_id_heuristic (its plan changed this round — spread gate)
    "shingle_containment_prefix",
    "pii_redaction_stats", "repetition_quality_flags",
    "lang_id_heuristic",
]


def test_driver_front_block_is_deliberate():
    assert list(REGISTRY)[:50] == FRONT_50
    assert ROUND8_FRONT == FRONT_50


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
    assert set(beyond) == set(ROUND9_QUEUE[: len(beyond)]), beyond


def test_round9_queue_is_staged():
    # every queued name is real, and none is already in the front block
    assert set(ROUND9_QUEUE) <= set(REGISTRY)
    assert not set(ROUND9_QUEUE) & set(FRONT_50)
    # the staged surplus sits directly behind the front block so extra
    # driver budget lands on it, never on random import order
    assert list(REGISTRY)[50:50 + len(ROUND9_QUEUE)] == ROUND9_QUEUE
    # front + queue covers the whole stale backlog: together with the
    # front's never-verified coverage, registry order is fully pinned
    from dso_import_spark.rotation import stale_green

    assert set(stale_green()) <= set(ROUND9_QUEUE) | set(FRONT_50)


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
