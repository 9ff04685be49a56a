"""The external driver verifies registry entries front-to-back within
a per-round budget (~50). The front block is therefore a deliberate,
rotated choice (the explicit ROUND5_FRONT reorder in queries.py) — and
a new @query appended anywhere can no longer silently land inside the
window, but a front-block edit still must be deliberate. This test
pins the current front-50: when rotating (or deliberately front-
loading a new query), update this list in the same commit and say so.
"""

from __future__ import annotations

from dso_import_spark.queries import REGISTRY, ROUND5_FRONT, ROUND6_QUEUE

FRONT_50 = [
    # never-verified stats_ops module (r4 verdict top priority)
    "equi_depth_histogram", "compaction_bin_packing", "pivot_event_matrix",
    "skyline_pareto_frontier", "theil_sen_trend",
    # rest of the never-verified pool
    "semdedup_prune_autok", "zorder_layout_stats", "cluster_aware_split",
    "cohort_retention", "sliding_distinct_users", "activity_streaks",
    "mode_event_type", "value_outliers_mad", "winsorized_variant_means",
    "weekly_growth_rates", "abc_pareto_classes", "session_duration_stats",
    "daily_retention_d1_d7",
    # new round-5 queries (mlops + approx histogram)
    "semdedup_autok_kernel", "equi_depth_histogram_approx",
    "shingle_containment", "stratified_sample_exact",
    "woe_feature_binning", "l_diversity_audit", "cusum_changepoint",
    # semantics-changed staleys
    "set_ops_nations", "date_parse_variants", "merge_insert_update",
    # re-staled greens (hint-drop-touched joins first)
    "dedup_minhash_lsh", "sparse_tfidf_topk", "hard_negative_mining",
    "q02_min_cost_supplier", "q05_nation_revenue", "q07_volume_shipping",
    "q08_market_share", "q09_product_type_profit",
    "q15_top_supplier", "q17_small_quantity_revenue",
    "q19_disjunctive_revenue", "q20_part_promotion_suppliers",
    "q21_waiting_suppliers",
    # second + third mlops batches (displaced nine posture-only
    # staleys to ROUND6_QUEUE)
    "weighted_sample_es", "bm25_scoring", "decile_lift_table",
    "auc_mann_whitney", "minhash_recall_cert",
    "theil_sen_capped", "join_cardinality_estimate",
    "wasserstein_drift", "source_quality_blocklist",
]


def test_driver_front_block_is_deliberate():
    assert list(REGISTRY)[:50] == FRONT_50
    assert ROUND5_FRONT == FRONT_50


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
    assert set(beyond) == set(ROUND6_QUEUE[: len(beyond)]), beyond


def test_round6_queue_is_staged():
    # every queued name is real, and none is already in the front block
    assert set(ROUND6_QUEUE) <= set(REGISTRY)
    assert not set(ROUND6_QUEUE) & set(FRONT_50)
    # the staged surplus sits directly behind the front block so extra
    # driver budget lands on it, never on random import order
    assert list(REGISTRY)[50:50 + len(ROUND6_QUEUE)] == ROUND6_QUEUE
    # front + queue covers the whole stale backlog: together with the
    # front's never-verified coverage, registry order is fully pinned
    from dso_import_spark.rotation import stale_green

    assert set(stale_green()) <= set(ROUND6_QUEUE) | set(FRONT_50)
