"""The external driver verifies registry entries front-to-back within
a per-round budget (~50). The front block is therefore a deliberate,
rotated choice (the explicit ROUND7_FRONT reorder in queries.py) — and
a new @query appended anywhere can no longer silently land inside the
window, but a front-block edit still must be deliberate. This test
pins the current front-50: when rotating (or deliberately front-
loading a new query), update this list in the same commit and say so.
"""

from __future__ import annotations

from dso_import_spark.queries import REGISTRY, ROUND7_FRONT, ROUND8_QUEUE

FRONT_50 = [
    # ALL four never-verified queries first (the r4 rule): the second
    # mlops2 batch (staged at the old ROUND7_QUEUE head in r6) and the
    # round-7 prefix-containment composition (VERDICT r6 weak-item fix)
    "ndcg_at_k", "conformal_coverage_cert", "smd_balance_check",
    "shingle_containment_prefix",
    # re-staled by this round's verdict-mandated edits (conformal
    # calibration cap in mlops2.py; banding-cert shuffle trim in
    # compositions.py) — deliberate re-verification
    "calibration_ece_bins", "js_divergence_sources",
    "pmi_collocations", "purged_timeseries_cv",
    "shingle_containment_banded", "banding_estimator_cert",
    # stale backlog in staged priority order: text module (oldest r2)
    "text_token_stats", "text_quality_scores", "lang_id_heuristic",
    "doc_fingerprints", "text_tfidf_top_terms", "doc_chunking",
    # multimodal module
    "multimodal_metadata", "multimodal_decode_stats",
    "multimodal_frame_sample", "multimodal_features",
    # salting / sketches / grouping sets
    "salted_heavy_hitters", "salted_join_revenue",
    "approx_distinct_sketch", "approx_quantile_sketch",
    "grouping_sets_revenue",
    # streaming module
    "stream_tumbling_hour", "stream_session_windows",
    "stream_dedup_delivery", "stream_user_totals", "stream_interval_join",
    "stream_upsert_state",
    # modern-sql / stats
    "variant_json_events", "sql_pipe_syntax", "histogram_width_bucket",
    "regression_stats",
    # dedup family
    "dedup_exact_stats", "dedup_prefix_groups", "dedup_ngram_jaccard",
    "dedup_simhash_fingerprints", "dedup_minhash_banded",
    "incremental_corpus_dedup", "dedup_substring_spans",
    # remaining staleys in registry order
    "wkt_coerce_geometries", "hash_split_train_test",
    "dedup_cluster_components",
    "sql_entry_point", "udaf_geometric_mean", "udtf_sentence_split",
    "unpivot_melt_measures", "table_profile",
]


def test_driver_front_block_is_deliberate():
    assert list(REGISTRY)[:50] == FRONT_50
    assert ROUND7_FRONT == FRONT_50


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
    assert set(beyond) == set(ROUND8_QUEUE[: len(beyond)]), beyond


def test_round8_queue_is_staged():
    # every queued name is real, and none is already in the front block
    assert set(ROUND8_QUEUE) <= set(REGISTRY)
    assert not set(ROUND8_QUEUE) & set(FRONT_50)
    # the staged surplus sits directly behind the front block so extra
    # driver budget lands on it, never on random import order
    assert list(REGISTRY)[50:50 + len(ROUND8_QUEUE)] == ROUND8_QUEUE
    # front + queue covers the whole stale backlog: together with the
    # front's never-verified coverage, registry order is fully pinned
    from dso_import_spark.rotation import stale_green

    assert set(stale_green()) <= set(ROUND8_QUEUE) | set(FRONT_50)
