"""Physical-plan quality assertions.

Correctness tests prove the right rows come out; these prove the right
PLAN produces them — pushed filters, pruned scans, broadcast joins,
partial aggregation, whole-stage codegen. A regression here is a
100 TB problem long before it is a local failure.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from dso_import_spark.queries import spark_queries


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def qs():
    return spark_queries()


def test_q06_pushes_filters_and_prunes_columns(spark, sf_dir, qs):
    plan = plan_of(qs["q06_forecast_revenue"](spark, sf_dir))
    assert "PushedFilters" in plan
    assert "l_discount" in plan.split("PushedFilters", 1)[1][:400]
    # scan reads only the three needed columns, not the full table
    read = plan.split("ReadSchema", 1)[1][:300]
    assert "l_extendedprice" in read and "l_shipdate" not in read


def test_q01_has_partial_aggregation_and_codegen(spark, sf_dir, qs):
    df = qs["q01_pricing_summary"](spark, sf_dir)
    plan = plan_of(df)
    # map-side partial + final: two HashAggregate nodes around the shuffle
    assert plan.count("HashAggregate") >= 2
    # AQE finalizes the plan only on execution; codegen is visible after
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    # "*(n)" marks whole-stage-codegen stages; partial_sum proves
    # map-side combine before the shuffle
    assert "*(1)" in executed and "partial_sum" in executed


def test_fk_validation_uses_broadcast_semi_join(spark, sf_dir, qs):
    plan = plan_of(qs["fk_validation"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan


def test_anti_join_is_broadcast(spark, sf_dir, qs):
    plan = plan_of(qs["anti_join_no_orders"](spark, sf_dir))
    assert "LeftAnti" in plan


def test_doc_chunking_has_no_shuffle(spark, sf_dir, qs):
    # chunking is embarrassingly parallel: explode must not repartition
    plan = plan_of(qs["doc_chunking"](spark, sf_dir))
    assert "Generate" in plan  # posexplode
    assert "Exchange" not in plan


def test_q05_broadcasts_all_dimensions(spark, sf_dir, qs):
    plan = plan_of(qs["q05_nation_revenue"](spark, sf_dir))
    # supplier, nation, region all broadcast — no shuffle join for dims
    assert plan.count("BroadcastHashJoin") >= 3


def test_topk_uses_take_ordered(spark, sf_dir, qs):
    plan = plan_of(qs["q03_top_revenue_orders"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # and no single-partition window for the global top-k
    assert "Window" not in plan


def test_tfidf_df_side_is_broadcast(spark, sf_dir, qs):
    plan = plan_of(qs["text_tfidf_top_terms"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_q10_topk_uses_take_ordered(spark, sf_dir, qs):
    plan = plan_of(qs["q10_returned_items"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_q14_pushes_shipdate_filter(spark, sf_dir, qs):
    plan = plan_of(qs["q14_promo_revenue"](spark, sf_dir))
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters", 1)[1][:400]
    assert "BroadcastHashJoin" in plan  # part side broadcast


def test_q02_window_is_partitioned_by_group(spark, sf_dir, qs):
    # the arg-max window must partition by p_partkey, never a global sort
    plan = plan_of(qs["q02_min_cost_supplier"](spark, sf_dir))
    assert "Window" in plan
    assert "hashpartitioning(p_partkey" in plan


def test_q21_aggregates_before_final_join(spark, sf_dir, qs):
    # multi/sole-late sides reduce to per-order counts before joining back
    plan = plan_of(qs["q21_waiting_suppliers"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 4  # two partial+final agg pairs
    assert "BroadcastHashJoin" in plan  # supplier dim broadcast


def test_hash_split_is_single_stage(spark, sf_dir, qs):
    # stateless map + one aggregation: exactly one shuffle
    plan = plan_of(qs["hash_split_train_test"](spark, sf_dir))
    # one Exchange node in the plan tree ("Exchange (n)"); the formatted
    # detail section repeats the name as "(n) Exchange"
    assert plan.count("Exchange (") == 1


def test_decontam_broadcasts_benchmark_grams(spark, sf_dir, qs):
    # the benchmark gram set is small by construction: its distinct must
    # broadcast so the flat-mapped training side never shuffles pre-join
    plan = plan_of(qs["decontam_ngram_overlap"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # three non-broadcast shuffles: bench-side distinct, then the
    # two-phase distinct-count — both of which run on the post-join
    # (matched-grams-only) side, so the full training gram stream is
    # never shuffled
    assert plan.count("Exchange (") - plan.count("BroadcastExchange (") == 3


def test_stratified_sample_is_single_stage(spark, sf_dir, qs):
    # keep/drop is a stateless map; only the reporting agg shuffles
    plan = plan_of(qs["stratified_sample_lang"](spark, sf_dir))
    assert plan.count("Exchange (") == 1
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_seq_packing_single_shuffle_reused(spark, sf_dir, qs):
    # window partitioning (lang) and the bin agg share a key: the agg
    # must reuse the window's hashpartitioning, not re-shuffle
    plan = plan_of(qs["seq_packing_bins"](spark, sf_dir))
    assert "Window" in plan
    assert plan.count("Exchange (") == 1


def test_merge_counts_narrow_shuffles_fingerprints(spark, sf_dir, qs):
    # both merge sides must reduce to (key, xxhash64 fingerprint)
    # BEFORE the join shuffle — the full row width never crosses the wire
    plan = plan_of(qs["merge_counts_scale"](spark, sf_dir))
    assert "xxhash64" in plan
    assert "FullOuter" in plan
    # every pre-join Exchange carries exactly two columns,
    # (key, fingerprint) — the full row width never crosses the wire
    fp_exchanges = [
        blk
        for blk in plan.split("\n\n")
        if blk.strip().split("\n")[0].endswith("Exchange")
        and "__fp_" in blk
    ]
    assert len(fp_exchanges) == 2
    for blk in fp_exchanges:
        assert "Input [2]:" in blk, blk


def test_unpivot_is_narrow_expand(spark, sf_dir, qs):
    """The melt is an Expand over the aggregate — no extra shuffle."""
    plan = plan_of(qs["unpivot_melt_measures"](spark, sf_dir))
    assert "Expand" in plan
    assert plan.count("Exchange (") == 1  # only the groupBy's shuffle


def test_ntile_window_is_partitioned(spark, sf_dir, qs):
    """Analytics window sorts per priority class, never globally."""
    plan = plan_of(qs["ntile_rank_analytics"](spark, sf_dir))
    assert "hashpartitioning(o_orderpriority" in plan
    assert "SinglePartition" not in plan


def test_scd2_snapshot_two_shuffles_no_global_sort(spark, sf_dir, qs):
    """Window-lead formulation: one shuffle for the per-key window, one
    for the final agg — never a global sort or self-join."""
    plan = plan_of(qs["scd2_point_in_time"](spark, sf_dir))
    assert plan.count("Exchange (") == 2
    assert "hashpartitioning(o_custkey" in plan
    assert "SinglePartition" not in plan
    assert "SortMergeJoin" not in plan  # the self-join alternative


def test_lsh_topk_kernel_corpus_never_shuffles(spark, sf_dir, qs):
    """ann_lsh_topk is on the broadcast-workload Arrow kernel since
    round 11: the corpus-side bucket is a narrow Column fused into the
    scan, the bucketed queries are collected/broadcast at build time,
    and the plan is scan -> MapInPandas -> per-query window — no join
    node at all, one hash shuffle for the final window, partial top-k
    already applied per batch inside the kernel."""
    plan = plan_of(qs["ann_lsh_topk"](spark, sf_dir))
    assert "MapInPandas" in plan
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange (") - plan.count("BroadcastExchange (") == 1
    assert "hashpartitioning(query_id" in plan
    assert "SinglePartition" not in plan


def test_lsh_topk_hof_pin_corpus_never_shuffles_before_join(spark, sf_dir):
    """The HOF-form lsh_topk operator stays as the correctness pin:
    tiny query side broadcasts; the corpus-side bucket is a narrow map
    fused into the scan. Top-k runs as WindowGroupLimit (partial rank
    pushdown) before the only hash shuffle."""
    from dso_import_spark.operators.similarity import lsh_topk
    from dso_import_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 101 == 0)
    plan = plan_of(lsh_topk(queries, emb, k=5, n_bits=6))
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
    # only the post-join per-query window shuffle; corpus scan → join is
    # narrow ("Exchange (" alone would also match "BroadcastExchange (")
    assert plan.count("Exchange (") - plan.count("BroadcastExchange (") == 1
    assert "SinglePartition" not in plan


def test_lsh_topk_large_query_side_keys_both_sides_on_bucket(spark, sf_dir):
    """broadcast_queries=False (queries ≈ corpus, e.g. all-pairs kNN):
    no forced broadcast of the query side — with the auto-broadcast
    threshold off (emulating sides too big to broadcast, what plan
    statistics would decide at real scale) both sides hash-shuffle on
    the bucket key, the shape that survives a query set too large for
    one executor's memory. At tiny SF the optimizer still broadcasts
    from its own size stats, which is the intended stats-driven pick."""
    from dso_import_spark.operators.similarity import lsh_topk
    from dso_import_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = lsh_topk(emb, emb, k=5, broadcast_queries=False)
        plan = plan_of(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastHashJoin" not in plan
    assert "hashpartitioning(bucket" in plan


# Queries whose RESULT is a global scalar (or a scalar-subquery
# threshold): a map-side partial aggregate followed by a 1-row combine
# is the correct plan — the SinglePartition exchange carries partial
# states, not data.
_SCALAR_RESULT_QUERIES = {
    "approx_distinct_sketch",
    "table_profile",
    "approx_quantile_sketch",
    "dedup_exact_stats",
    "merge_counts_scale",
    "merge_insert_update",
    "q06_forecast_revenue",
    "q11_important_balances",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q22_idle_customers",
    # global-window normalization over the per-LANGUAGE aggregate — the
    # SinglePartition exchange carries #languages rows (a bounded
    # dimension), not data
    "temperature_mix_weights",
    # Bloom bitmap build: the SinglePartition exchange carries at most
    # m/64 longs (filter geometry, ~512 bytes) — bounded state by
    # construction, never build-side data (operators/bloom.py)
    "bloom_join_prune",
    # scalar N (node count) + three scalar-subquery counts
    "pagerank_shipments",
    "notin_null_semantics",
    # scalar grand-total broadcast over the 9-row digit aggregate
    "benford_first_digit",
    # scalar smoothing-vocabulary count broadcast into the score join
    "dsir_importance_scores",
    # single-row scalar result (global attribution totals)
    "attribution_first_last_touch",
    # largest-remainder seat assignment: global window over |strata|
    # rows (bounded dimension, same class as temperature_mix_weights)
    "exact_quota_sample",
    # single-row scalar checksum (partial sums merge map-side)
    "table_content_checksum",
    # exact Gini needs a global rank — over the per-customer
    # AGGREGATE (|customers| rows), never raw orders; the query doc
    # names the percentile_approx Lorenz approximation for when even
    # that is too large
    "revenue_gini",
    # scalar expectation counters (one conditional-agg row + FK count)
    "dq_expectations_report",
    # scalar theta (one moment row) broadcast into the variant readout
    "cuped_variance_reduction",
    # scalar chi-square over two counters
    "srm_sample_ratio_check",
    # global trailing window over the per-DAY aggregate (|days| rows,
    # bounded dimension — same class as temperature_mix_weights)
    "arrival_anomaly_days",
    # scalar percentile over per-user conversion deltas
    "funnel_time_to_convert",
    # scalar percentile over per-session stats
    "session_duration_stats",
    # single-row retention counters
    "daily_retention_d1_d7",
    # global cumulative-share window over the per-customer AGGREGATE
    # (same class as revenue_gini)
    "abc_pareto_classes",
    # single-row rule-funnel result (partial states merge map-side)
    "gopher_quality_gate",
    # single-row audit/profile summaries over a bounded-cardinality
    # per-group aggregate (QI domain / join-key cardinality)
    "k_anonymity_audit",
    "join_key_skew_profile",
    # 1-row per-dimension means table (a dims-row aggregate collapsed
    # to one broadcast row — same class as temperature_mix_weights)
    "embedding_covariance",
    # 1-row quantile-edge aggregate over the per-CUSTOMER relation
    # (three numeric columns into one exact-percentile combine; the
    # doc names percentile_approx as the 100 TB swap-in)
    "rfm_segmentation",
    # global ntile over the per-DOCUMENT aggregate (corpus/1000-sized;
    # the query doc names range-bucketing on the id domain as the
    # window-free form at 100 TB) — same class as revenue_gini
    "ngram_novelty_decay",
    # per-layout scalar rollup of the per-BUCKET (file-count-sized)
    # min/max relation — hundreds of rows into a 1-row combine
    "zorder_layout_stats",
    # 1-row leak-invariant count over the per-CLUSTER aggregate,
    # broadcast back onto the 3-row per-split result
    "cluster_aware_split",
    # 1-row exact-percentile boundary aggregate (15 doubles) broadcast
    # back for bin assignment; the doc names approx_percentile as the
    # 100 TB swap-in — same class as rfm_segmentation
    "equi_depth_histogram",
    # 1-row price-bounds aggregate + the 64-row block-max relation's
    # running window (bounded block dimension, broadcast back) — the
    # cross-block pruning state of the distributed skyline, never data
    "skyline_pareto_frontier",
    # 1-row sketch-boundary aggregate + the 16-row per-bin ranks window
    # (bounded bin dimension) — the rank-error certification state,
    # never data; same class as skyline_pareto_frontier
    "equi_depth_histogram_approx",
    # 1-row decile-boundary + 1-row class-totals aggregates broadcast
    # back — same class as equi_depth_histogram
    "woe_feature_binning",
    # two 1-row corpus scalars (N, avgdl) broadcast into the per-doc
    # score — the idf/normalization constants every BM25 needs
    "bm25_scoring",
    # 1-row boundary + totals aggregates and the 10-row cumulative-
    # capture window (bounded decile dimension)
    "decile_lift_table",
    # 1-row (P, N) totals + the <=17-row cross-bucket prefix window of
    # the two-phase rank (bounded bucket dimension); the per-score
    # prefix itself is bucket-partitioned, never SinglePartition
    "auc_mann_whitney",
    # 1-row key-bounds aggregate, the 64-row histogram-estimate
    # combine, and the 1-row exact-count certification input — all
    # bounded certification state, never data
    "join_cardinality_estimate",
    # the 9-value normal-equation moment combine (training IS one
    # scalar aggregate here; the solve is expression arithmetic)
    "ridge_regression_normal_eq",
    # 1-row boundary/total aggregates + the 16-row per-bin relation's
    # estimate combine — histogram certification state, never data
    "selectivity_estimate_cert",
    # 1-row score min/max + 1-row bin-total aggregates broadcast back
    # — same class as equi_depth_histogram
    "calibration_ece_bins",
    # 1-row corpus-total aggregate + the top-V vocabulary cut
    # (ORDER BY + LIMIT over per-token counts — <= 200 rows through
    # the limit's exchange, vocabulary-bounded by construction)
    "js_divergence_sources",
    # two 1-row grand-total aggregates (token and bigram counts); the
    # top-k itself is TakeOrderedAndProject, never a global window
    "pmi_collocations",
    # 1-row epoch min/max aggregate exploded into the 5-row broadcast
    # fold table — bounded split state, never data
    "purged_timeseries_cv",
    # the conformal order statistics pull k ~ alpha/2·n_cal rows
    # through a sort+limit: bounded by the CALIBRATION SAMPLE, which
    # is statistically fixed-size at any corpus scale (coverage
    # precision saturates at ~1/sqrt(n_cal) — thousands suffice; the
    # cert's scale knob is the sample, same posture as
    # minhash_recall_cert)
    "conformal_coverage_cert",
    # 1-row global MRR aggregate over the <=|groups| per-group
    # reciprocal-rank relation — scalar result, never data
    "mrr_at_k",
    # ONE 1-row confusion-matrix aggregate; the whole query is the
    # scalar combine
    "cohens_kappa",
    # 1-row grand-total and category-count aggregates + the
    # |types|x|arms|-bounded contribution combine — contingency state,
    # never data
    "chi_square_independence",
    # 1-row percentile-candidate aggregate (15 thresholds broadcast
    # back) + the 15-row argmax ORDER BY/LIMIT — bounded candidate
    # state, the equi_depth_histogram class
    "decision_stump_split",
    # 1-row pooled-representative percentile aggregate (16 slots)
    # broadcast back onto source-partitioned ranks — bounded
    # calibration state, never data
    "quantile_normalize_sources",
    # 1-row grand-total aggregate + the |groups|x|statuses|-bounded
    # completed contingency matrix (both broadcast) — audit state,
    # never data
    "t_closeness_audit",
    # 1-row totals aggregate + the 10-row per-bin relation's weighted
    # combine — decomposition state, never data
    "brier_decomposition",
    # 1-row percentile-candidate aggregate (7 thresholds broadcast
    # back) — the decision_stump_split class
    "f1_threshold_sweep",
    # 1-row weighted-combine total over the <=24-row strata relation —
    # scalar result, never data
    "stratified_ate",
    # ONE aggregation pass computes all 2B replicate sums as columns
    # (no row replication); the only SinglePartition consumers are the
    # 1-row combine and the 32-row replicate-mean rank window —
    # B-bounded bootstrap state, never data
    "bootstrap_mean_ci",
    # the BH rank/step-up windows run over the |event types| p-value
    # relation (5 rows); the KS stage itself is type-partitioned —
    # bounded multiple-testing state, never data
    "bh_fdr_correction",
    # 1-row method-of-moments prior (exact BIGINT S1/S2 combine over
    # the |strata| relation) broadcast back — bounded prior state
    "eb_shrunken_rates",
    # 1-row grand-total + the |types|x|arms|-bounded contingency
    # combine — the chi_square_independence class
    "mutual_information_cols",
    # cumulative/cut windows over the |languages| caps relation
    # (5 rows) + 1-row totals — bounded allocation state, never data
    "budget_water_filling",
    # the end-to-end curation composition reuses the water-filling
    # shape verbatim: its only SinglePartition consumers are the
    # |languages| allocation windows + 1-row budget total (the
    # corpus-wide stages — exact-hash groupBy, shingle join, gate,
    # stratified-sample window — are all hash/stratum-partitioned)
    "corpus_curation_pipeline",
    # ONE 1-row integer confusion aggregate; the whole query is the
    # scalar combine — the cohens_kappa class
    "randomized_response_debias",
    # all KM windows (at-risk desc-cumsum, survival asc-cumsum) run
    # over the |distinct durations| relation — calendar-bounded
    # state; the per-user lifetime agg is partitioned
    "kaplan_meier_interarrival",
    # the ONLY single-partition consumers are the |buckets| offset
    # window and the |distinct basket sizes| y-rank window — the
    # whole point of the bucket-offset design is that the O(n)
    # distinct-value rank windows are PARTITIONed by bucket
    "spearman_rank_correlation",
    # 128-row permutation-diff relation + 1-row observed scalar —
    # B-bounded resampling state, never data (bootstrap_mean_ci class)
    "permutation_test_signflip",
    # 1-row (N, V) vocab-total scalar broadcast back onto the vocab
    # relation; the token join itself is shuffle-partitioned
    "unigram_perplexity_heldout",
    # 1-row distortion certificate — scalar result, never data
    "jl_projection_distortion_cert",
    # ONE 1-row integer disagreement aggregate — the cohens_kappa class
    "mcnemar_paired_test",
    # the pooled-times dense grid and the 1-row (O-E)²/V combine run
    # over the |distinct gap values| x 2 relation — horizon-bounded
    # survival state, never data; the per-user lead window and the
    # per-(time,arm) counts are partitioned
    "logrank_two_arm",
}


def test_no_query_plans_a_cartesian_or_rogue_single_partition(
    spark, sf_dir, qs
):
    """Engine-wide guardrail: no registered query may plan a
    CartesianProduct (unbounded pair blowup) or funnel non-scalar data
    through a SinglePartition exchange (a one-task bottleneck at any
    scale). Streaming queries drain sinks and are covered by their own
    parity tests."""
    offenders_cart, offenders_single = [], []
    for name, fn in qs.items():
        if name.startswith("stream_"):
            continue
        plan = plan_of(fn(spark, sf_dir), "simple")
        if "CartesianProduct" in plan:
            offenders_cart.append(name)
        if (
            "Exchange SinglePartition" in plan
            and name not in _SCALAR_RESULT_QUERIES
        ):
            offenders_single.append(name)
    assert not offenders_cart, offenders_cart
    assert not offenders_single, offenders_single


# Queries whose SEMANTIC row filter genuinely references a computed
# array (short-document length gates): the triple-evaluation cost is a
# deliberate, bounded trade there (one tokenize in a filter vs a wider
# shuffle), documented at each site. Everything else must keep
# higher-order-function expressions OUT of Filter nodes — the round-6
# lesson: a Filter carrying a tokenize/shingle lambda gets pushed
# below the spread exchange and serializes the pipeline into the scan
# stage's split count (SCALING.md round-6, measured 8-21× at ×100).
_HOF_FILTER_QUERIES = {
    "boilerplate_ngram_mass",   # corpus_quality.py: size(ws) >= n gate
    "bpe_pair_merge_counts",    # corpus_quality.py: size(ws) >= 2 gate
    "ngram_novelty_decay",      # curation.py: size(ws) >= 2 gate
    # semantic row filter on the composite quality score (stopword
    # ratio is a lambda over the token array) — the gate IS the query
    "corpus_pipeline_stats",
    # InferFiltersFromConstraints adds isnotnull(<cluster expr>) for
    # the cluster-blocked pair join; in the literal-centroid regime
    # the expr is a k<=4 argmin (bounded double-eval), and the kernel
    # regime (k >= 64) routes assignment through MapInPandas, a plan
    # barrier constraint inference cannot inline
    "semdedup_prune",
    "semdedup_prune_autok",
}


def test_no_query_filters_on_a_higher_order_expression(spark, sf_dir, qs):
    """Engine-wide guardrail for the round-6 pathology class: no
    registered query may carry a lambda-function (higher-order array)
    expression inside a Filter node — explicit or optimizer-inferred.
    Such filters get predicate-pushed below repartition exchanges with
    the array pipeline INLINED, evaluating it up to 3× per row inside
    the scan stage whose parallelism is the input split count."""
    offenders = []
    for name, fn in qs.items():
        if name.startswith("stream_") or name in _HOF_FILTER_QUERIES:
            continue
        plan = plan_of(fn(spark, sf_dir), "simple")
        for line in plan.splitlines():
            stripped = line.lstrip(" :+-*")
            # isnotnull(size(: the InferFiltersFromConstraints variant
            # of the same class (round 11) — a synthesized null gate
            # on an aliased array size inlines the whole array
            # pipeline scan-side even when the lambda itself is
            # hidden behind another alias
            if stripped.startswith("Filter ") and (
                "lambdafunction(" in stripped
                or "isnotnull(size(" in stripped
            ):
                offenders.append(name)
                break
    assert not offenders, offenders


def test_pii_redaction_is_one_narrow_stage_plus_agg(spark, sf_dir, qs):
    """All regex work must stay in the narrow map stage: the only
    shuffle is the per-language aggregate (with map-side partial), and
    the scan reads just the two needed columns."""
    plan = plan_of(qs["pii_redaction_stats"](spark, sf_dir))
    assert plan.count("Exchange (") - plan.count("BroadcastExchange (") == 1
    assert plan.count("HashAggregate") >= 2  # partial + final
    read = plan.split("ReadSchema", 1)[1][:300]
    assert "text" in read and "lang" in read and "n_chars" not in read


def test_repetition_flags_aggregate_exploded_tokens_map_side(spark, sf_dir, qs):
    """Token/bigram counting shuffles per-doc partial counts, never raw
    exploded tokens: every (doc_id, term) groupBy must have a partial
    HashAggregate below its exchange."""
    df = qs["repetition_quality_flags"](spark, sf_dir)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in executed
    plan = plan_of(df)
    # array explode, not a UDF (formatted mode separates the Generate
    # node name from its explode(...) argument detail)
    assert "Generate" in plan and "explode" in plan
    assert "CartesianProduct" not in plan


def test_incremental_dedup_joins_on_fingerprint_no_broadcast_of_corpus(
    spark, sf_dir, qs
):
    """The corpus fingerprint index joins the batch on fp. At test scale
    Spark may broadcast it, but the plan must keep the join keyed on fp
    (hashable, co-partitionable at 100 TB) and never cartesian."""
    plan = plan_of(qs["incremental_corpus_dedup"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "fp" in plan
    assert "Window" in plan  # within-batch rn dedup stays distributed


def test_spatial_join_is_grid_blocked_equi_join(spark, sf_dir, qs):
    """The containment join must execute as a hash-partitionable
    equi-join on grid cells — never a nested-loop/cartesian pairing,
    which is what a naive theta join would plan."""
    plan = plan_of(qs["spatial_bbox_join"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "cx" in plan and "cy" in plan  # join keyed on cell ids


def test_asof_cogroup_shuffles_each_side_exactly_once(spark, sf_dir, qs):
    """The cogrouped as-of join must shuffle each input exactly once on
    the cogroup key, with the event-type filters pushed into the scans.
    A Spark-side pre-aggregation on (key, ts) would add a third
    exchange — the timestamp-tie dedup belongs inside the per-group
    pandas merge."""
    plan = plan_of(qs["asof_tolerance_cogroup"](spark, sf_dir), "simple")
    assert "FlatMapCoGroupsInPandas" in plan
    assert plan.count("Exchange hashpartitioning") == 2
    assert "BroadcastExchange" not in plan
    assert plan.count("EqualTo(event_type,") == 2  # pushed to parquet


def test_funnel_conversion_shuffles_once(spark, sf_dir, qs):
    """The ordered funnel is three stacked whole-partition window
    minima plus a per-user dedup, all on the user_id partitioning:
    exactly ONE hash exchange (round 14 — the previous three keyed
    aggregations + joins paid 8 jobs for the same result). A second
    exchange means a window or the dedup stopped reusing the
    partitioning."""
    plan = plan_of(qs["funnel_conversion"](spark, sf_dir), "simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") >= 3
    assert "Join" not in plan


def test_substring_span_dedup_consumes_dup_positions_once(spark, sf_dir, qs):
    """Spark does not share subplans: per-doc stats and coverage must
    come from ONE aggregation over the duplicated-position stream, or
    the whole shingle pipeline (scan → explode → semi-join) runs twice.
    Three document scans are inherent (doc sizes, shingles, dup-shingle
    build side); a fourth means the tree regressed to double-compute."""
    plan = plan_of(qs["dedup_substring_spans"](spark, sf_dir), "simple")
    assert plan.count("FileScan parquet") == 3
    assert plan.count("LeftSemi") == 1


def test_kmeans_final_assignment_is_shuffle_free(spark, sf_dir, qs):
    """Lloyd's assignment embeds the centroids as literal arrays, so
    the returned (final-iteration) plan is a pure narrow map over the
    embeddings scan — no exchange, no join. The per-iteration centroid
    updates shuffle internally, but what downstream consumes must be
    scan → project."""
    plan = plan_of(qs["ivf_kmeans_train"](spark, sf_dir), "simple")
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert plan.count("FileScan parquet") == 1


def test_semdedup_pair_join_is_salted(spark, sf_dir, qs):
    """The SemDeDup pair join must key on (cluster, salt-bucket), not
    cluster alone: k can be far below the core count, and an
    unsalted join would put the entire quadratic pair workload on k
    tasks. Result-identical salting is the fix (operator docstring);
    this pins it in the plan."""
    import re

    plan = plan_of(qs["semdedup_prune"](spark, sf_dir), "simple")
    salted_exchanges = re.findall(
        r"hashpartitioning\(cluster#\d+L?, (?:cast\(probe#\d+|bucket#\d+)",
        plan,
    )
    assert len(salted_exchanges) >= 2, (
        "pair join no longer keys on (cluster, salt):\n" + plan
    )


def test_sparse_tfidf_topk_window_partitions_by_query(spark, sf_dir, qs):
    """The top-k window must partition by query_id (parallel per
    query), never a global sort / single partition."""
    import re

    plan = plan_of(qs["sparse_tfidf_topk"](spark, sf_dir), "simple")
    # the window spec itself partitions by query_id...
    assert re.search(r"Window \[row_number\(\).*\], \[query_id#\d+", plan), plan
    # ...and its distribution comes from a hash partitioning — either a
    # dedicated query_id exchange, or (since the round-3 spread) the
    # upstream repartition on doc_id (the same column pre-alias), which
    # Catalyst recognizes and elides the extra exchange for. Never a
    # global single-partition sort.
    assert re.search(r"hashpartitioning\((query_id|doc_id)#\d+", plan), plan
    assert "Exchange SinglePartition" not in plan


def test_cdc_apply_is_argmax_aggregate_not_window(spark, sf_dir, qs):
    """Last-writer-wins must stay a combine-able max_by aggregate: a
    Window formulation would sort whole partitions per key."""
    df = qs["cdc_apply_changes"](spark, sf_dir)
    plan = plan_of(df, "simple")
    assert "Window" not in plan
    assert "max_by" in plan
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "partial_max_by" in executed  # arg-max states merge map-side


def test_bitmap_distinct_combines_map_side(spark, sf_dir, qs):
    """The bitmap aggregate must emit partial bitmaps below the
    exchange — the wire carries segments, never (type, user) rows."""
    df = qs["bitmap_exact_distinct"](spark, sf_dir)
    plan = plan_of(df, "simple")
    assert "partial_bitmap_construct_agg" in plan
    assert "bitmapCount" in plan


def test_rfm_is_window_free(spark, sf_dir, qs):
    """Quintile scores come from broadcast quantile edges, never a
    global ntile window."""
    plan = plan_of(qs["rfm_segmentation"](spark, sf_dir), "simple")
    assert "Window" not in plan
    assert "percentile" in plan


def test_funnel_pair_tier_keeps_hofs_out_of_filters(spark, sf_dir):
    """Round-12 static guard for the round-11 regression class
    (VERDICT r11 #5): a bare null-intolerant comparison over columns
    whose alias chain reaches the shingle transform lets
    InferFiltersFromConstraints synthesize
    isnotnull(size(transform(...))) into scan-side Filters on both
    pair-join branches (8x on the stage, caught by the bench, not the
    suite — the final funnel plan hides the stage behind eager
    checkpoints). This inspects the pair tier's FULL lineage via the
    module-level _funnel_pair_tier, in BOTH dispatch tiers, and also
    re-creates the dc9a6ef bare-gate shape to prove the matcher would
    have caught it."""
    from pyspark.sql import functions as F

    from dso_import_spark.queries_pkg.compositions import _funnel_pair_tier

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ex0 = docs.groupBy("lang", F.md5("text").alias("h")).agg(
        F.max("text").alias("text"),
        F.min("doc_id").alias("doc_id"),
        F.min("n_chars").alias("n_chars"),
    )

    def hof_filters(df):
        hits = []
        for line in plan_of(df, "simple").splitlines():
            stripped = line.lstrip(" :+-*")
            if stripped.startswith("Filter ") and (
                "lambdafunction(" in stripped
                or "isnotnull(size(" in stripped
            ):
                hits.append(stripped[:160])
        return hits

    # all dispatch outcomes of the shipped gate: clean (exact via
    # both-gates-pass; banded via the count gate; banded via the r13
    # max-df gate). materialize=False keeps the full pre-checkpoint
    # lineage inspectable (the r13 shingle-relation checkpoint would
    # otherwise truncate exactly the expressions this lint reads;
    # in production that same checkpoint also BLOCKS the regression
    # class — constraints cannot cross an RDD scan boundary)
    assert hof_filters(
        _funnel_pair_tier(ex0, 10, 100, materialize=False)
    ) == []
    assert hof_filters(
        _funnel_pair_tier(ex0, 100, 10, materialize=False)
    ) == []
    assert hof_filters(
        _funnel_pair_tier(ex0, 10, 100, 0, materialize=False)
    ) == []

    # companion assertion on the SHIPPED materialize=True exact tier
    # (r13 advisory): the production protection against the scan-side
    # HOF regression is the eager shingle checkpoint itself
    # (constraints cannot cross an RDD scan boundary) — pin that the
    # exact-tier plan actually contains that boundary, so silently
    # removing the checkpoint re-exposes this lint instead of passing
    # on the materialize=False proxy alone
    shipped = _funnel_pair_tier(ex0, 10, 100)
    assert "ExistingRDD" in plan_of(shipped, "simple")
    assert hof_filters(shipped) == []

    # the dc9a6ef shape (bare integer gate, no coalesce armor) MUST
    # trip the matcher — guard-of-the-guard: if Spark ever stops
    # inlining the synthesized isnotnull into a Filter this assert
    # goes red and the guard needs a new matcher, not deletion
    ex = ex0.select(
        "doc_id",
        "lang",
        F.size(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(F.split("text", r"\s+")) - 2),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(F.split("text", r"\s+"), i),
                        F.element_at(F.split("text", r"\s+"), i + 1),
                    ),
                )
            )
        ).cast("long").alias("n_sh"),
        F.explode(
            F.array_distinct(F.split("text", r"\s+"))
        ).alias("shingle"),
    )
    a, b = ex.alias("a"), ex.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    bare = shared.filter(
        F.col("n_shared") * 3 >= F.col("n_a") + F.col("n_b")
    ).select("id_a", "id_b")
    assert hof_filters(bare), "matcher no longer trips on the bare gate"
