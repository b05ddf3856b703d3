"""Query registry: one named entry per implemented operator/query.

Every operator from SURVEY.md §2 (plus the north-star extensions)
lands here as a ``QuerySpec``: a PySpark callable ``(spark, sf_dir) ->
DataFrame`` paired (where SQL-expressible) with an ANSI-SQL oracle
string that DuckDB runs on the same Parquet tables. The driver's
correctness gate compares the two per query.

Convention: every computed/aggregate column is aliased identically in
the Spark code and the oracle SQL; floating aggregates are rounded
(money sums to 2 decimals, ratios/averages to 4) on BOTH sides so the
order-insensitive value hash is stable under reordered float addition.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def _family(name: str) -> str:
    """Family key for interleaving: the name prefix before the first
    underscore (``dedup_minhash_lsh`` -> ``dedup``)."""
    return name.split("_", 1)[0]


# Queries that already earned a full rows+schema+hash green row in a
# driver correctness gate (union of CORRECTNESS_r01..r10 — r10 landed
# 50/50 green, so every query registered through round 10 has been
# driver-certified at least once).
# The driver checks only a ~50-entry prefix of the registry per
# round, so entries in this set yield no new information if they
# lead; the interleave demotes them to a second tier so every
# never-driver-checked query gets a driver-issued row first.
#
# Round-13 rotation (the per-round discipline): the 50 round-12
# driver greens fold in; rotated OUT (demoted to tier 0 so they lead
# the r13 prefix — r12 verdict #3) are the 56 longest-stale rows,
# last externally checked r01–r05: tpch_q21/tpch_q22 (r01 — the one
# gap in the r12 rotation), the r04 block (multimodal_ingest,
# pandas_udf_scalar, pandas_udf_grouped_agg, sample_train_val_test,
# similarity_topk_bruteforce, streaming_tumbling_counts,
# subquery_not_in, text_language_id, tpch_q1, tpch_q3,
# union_distinct, window_distribution_ranks), and the full r05 block
# (agg_collect_sorted/corr_covar/cube/grouping_sets/having/
# minmax_dates/percentiles/stats, dedup_contamination_check/
# embedding_cosine/incremental/levenshtein, events_gap_fill/hopping/
# retention_cohorts/rollup_multires/session_window,
# multimodal_frame_sample, sample_domain_mixture/quality_*,
# similarity_ivf/pairs_above_threshold, streaming_hopping_counts/
# session_window, subquery_scalar, text_chunk_documents/fingerprint/
# length_buckets/ngram_topk/pack_sequences/pii_scrub/regex_tokens/
# repetition_ratio, tpch_q2/q11/q16/q20, window_lag_lead/moving_avg/
# range_frame/share_of_group). The judge pre-verified 31 of these
# green this session (r12 verdict); the rotation gets them fresh
# external CORRECTNESS_r13 rows. Also out (code path changed this
# round — the ADVICE-r12 discipline): events_ab_sequential (nullif
# degenerate-variance guard), join_skew_salted and
# join_skew_salted_demo (hot-key probe now collects once),
# dedup_lsh_bucket_stats and text_shingle_novelty (session-cached
# relation reuse, r12 verdict #4).
_DRIVER_GREEN: frozenset[str] = frozenset({
    "agg_approx_distinct", "agg_approx_percentiles", "agg_arg_extremes",
    "agg_bool_aggs", "agg_count_min_sketch", "agg_decimal_money_exact",
    "agg_distinct", "agg_filter_clause", "agg_group_by_all", "agg_grouped",
    "agg_hll_intersection", "agg_hll_mergeable", "agg_median_mad",
    "agg_mode_per_group", "agg_multi_distinct", "agg_rollup",
    "agg_string_agg", "agg_ungrouped", "agg_weighted_median",
    "basket_brand_pairs", "case_when", "csv_corrupt_records",
    "csv_source_roundtrip", "customer_ltv_deciles", "date_dim_generate",
    "date_expressions", "dedup_connected_components", "dedup_exact_docs",
    "dedup_image_phash", "dedup_minhash_bbit", "dedup_minhash_calibration",
    "dedup_minhash_clusters", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_semdedup", "dedup_shingle_containment", "dedup_simhash",
    "dedup_simhash_candidate_histogram", "dedup_simhash_hamming_histogram",
    "dedup_span_exact", "dedup_substring_exact",
    "dedup_substring_removal_stats", "dedup_survivors_weighted",
    "dedup_threshold_sweep", "dedup_tier_report",
    "dedup_winnowing_incremental", "dedup_winnowing_pairs",
    "distinct_values", "embeddings_centroid_drift",
    "embeddings_cosine_histogram", "embeddings_gram_matrix",
    "embeddings_hard_negative_mining", "embeddings_int8_quantize",
    "embeddings_jl_projection", "embeddings_kcenter_coreset",
    "embeddings_knn_vote", "embeddings_label_centroids",
    "embeddings_matryoshka_energy", "embeddings_norm_outliers",
    "embeddings_pc1_projection", "embeddings_power_iteration",
    "events_ab_funnel", "events_ab_lift", "events_ab_mde",
    "events_anomaly_zscore", "events_attribution_first_touch",
    "events_attribution_last_touch", "events_attribution_linear",
    "events_attribution_positional", "events_autocorr_weekly",
    "events_bitmap_retention", "events_bootstrap_ci",
    "events_change_point_cusum", "events_cohort_ltv",
    "events_concurrent_sessions", "events_concurrent_sessions_segmented",
    "events_cuped", "events_daily_trend", "events_dau_stickiness",
    "events_decay_score", "events_diff_in_diff", "events_dow_seasonality",
    "events_ewma_smoothing", "events_funnel", "events_funnel_windowed",
    "events_hourly_profile", "events_interevent_gaps",
    "events_markov_transitions", "events_new_vs_returning",
    "events_pareto_activity", "events_pattern_match",
    "events_power_law_alpha", "events_rfm_segments",
    "events_seasonal_naive_backtest", "events_session_paths",
    "events_sessionize", "events_srm_check", "events_survival_curve",
    "events_time_to_conversion", "events_tumbling",
    "events_user_burstiness", "events_user_type_entropy",
    "events_value_log_histogram", "except_all_keys", "except_keys",
    "explode_token_counts", "filter_predicates", "functions_array",
    "functions_bitwise", "functions_conditional", "functions_datetime",
    "functions_json", "functions_math", "functions_string",
    "functions_try_arith", "functions_variant", "graph_adamic_adar",
    "graph_assortativity", "graph_clustering_coefficient",
    "graph_degree_distribution", "graph_kcore", "graph_khop_reach",
    "graph_label_propagation", "graph_link_prediction", "graph_modularity",
    "graph_pagerank", "graph_triangle_count", "graph_triangle_count_lsh",
    "intersect_all_keys", "intersect_keys", "join_anti", "join_asof",
    "join_asof_nearest", "join_asof_tolerance", "join_bloom_pruned",
    "join_broadcast_dim", "join_bucketed_colocated", "join_cross",
    "join_full_outer", "join_inner_equi", "join_lateral",
    "join_left_outer", "join_non_equi", "join_null_safe",
    "join_range_binned", "join_self", "join_semi", "join_star_schema",
    "json_source_roundtrip", "maintenance_column_histogram",
    "maintenance_compact_small_files", "maintenance_drift_psi",
    "maintenance_incremental_stats", "maintenance_referential_audit",
    "maintenance_skew_report", "maintenance_table_stats",
    "maintenance_table_stats_sketch", "multimodal_audio_energy",
    "multimodal_decode", "multimodal_features", "multimodal_image_resize",
    "multimodal_phash_clusters", "orc_source_roundtrip",
    "orders_open_backlog", "pandas_udf_grouped_map",
    "pandas_udf_scalar_iter", "pipeline_dataset_card",
    "pipeline_dynamic_partition_overwrite",
    "pipeline_mv_incremental_refresh", "pipeline_pack_efficiency_curve",
    "pipeline_quality_funnel", "pipeline_scd2_dimension",
    "pipeline_snapshot_diff", "pipeline_snapshot_time_travel",
    "pipeline_snapshot_vacuum", "pipeline_token_budget_mixture",
    "pipeline_training_manifest", "pipeline_upsert_snapshot",
    "pivot_event_type", "project_expressions", "retrieval_hybrid_rrf",
    "sample_coverage_greedy", "sample_deterministic_hash",
    "sample_dsir_importance", "sample_epoch_shuffle",
    "sample_kfold_assignment", "sample_lang_temperature",
    "sample_leakage_safe_split", "sample_per_group_cap",
    "sample_reservoir_exact_k", "sample_split_by_time",
    "sample_stratified_fixed_n", "scan_dynamic_partition_pruning",
    "scan_metadata_count", "scan_partition_pruned", "scan_point_lookup",
    "scan_project", "scan_schema_merge", "scan_zorder_skipping",
    "similarity_ivf_kmeans", "similarity_ivf_pq", "similarity_ivf_recall",
    "similarity_kmeans_parallel_init", "similarity_lsh_ann",
    "similarity_lsh_recall", "similarity_pq", "similarity_range_search",
    "similarity_rerank_mmr", "sort_limit_topk", "source_python_datasource",
    "sql_create_function_udf", "sql_create_table_function",
    "sql_pipe_syntax", "streaming_dedup", "streaming_foreachbatch_upsert",
    "streaming_late_data_metrics", "streaming_python_source",
    "streaming_stateful_user_totals", "streaming_static_enrich",
    "streaming_stream_stream_join", "streaming_stream_stream_outer_join",
    "streaming_transform_with_state", "subquery_exists_correlated",
    "subquery_from", "subquery_in", "subquery_recursive_cte",
    "text_bigram_logprob", "text_bm25_search", "text_bpe_apply_encode",
    "text_bpe_merge_pairs", "text_bpe_train_merges", "text_c4_rules",
    "text_char_entropy", "text_gopher_rules", "text_heaps_law",
    "text_js_divergence", "text_keyword_tfidf", "text_langid_agreement",
    "text_naive_bayes_source", "text_nb_class_metrics",
    "text_nb_margin_calibration", "text_quality_score", "text_readability",
    "text_source_signature_terms", "text_term_pmi", "text_token_count",
    "text_token_entropy", "text_unigram_logprob", "text_vocab_induction",
    "text_zipf_fit", "tpch_q10", "tpch_q12", "tpch_q13", "tpch_q14",
    "tpch_q15", "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q4", "tpch_q5",
    "tpch_q6", "tpch_q7", "tpch_q8", "tpch_q9", "udtf_word_windows",
    "union_all", "union_by_name", "unpivot_order_measures",
    "window_gaps_islands", "window_nulls_ordering", "window_rank_dense",
    "window_rolling_median", "window_running_distinct",
    "window_running_revenue", "window_time_range_rolling",
    "window_topn_per_group", "window_value_functions"
})

# Round 7: empty. The six round-6 deferrals rotated into tier 0 and
# lead the r7 prefix (the round-5/6 playbook); new round-7 additions
# land in tier 0 directly while it stays under the ~50-row prefix.
_TIER1_DEFER: frozenset[str] = frozenset()

# Within-family ordering for the interleave: each family's
# highest-signal queries lead (the scale-path / most-complex member,
# not whatever happened to register first), so the driver's ~50-row
# prefix — which takes roughly the first two of every family —
# maximizes information. Unlisted members keep registration order.
_FLAGSHIPS: dict[str, list[str]] = {
    # lsh_bucket_stats first: rides the session-cached minhash
    # relation as of round 13 (r12 verdict #4) — recertify first
    "dedup": ["dedup_lsh_bucket_stats", "dedup_minhash_lsh", "dedup_simhash",
              "dedup_levenshtein"],
    "similarity": ["similarity_lsh_ann", "similarity_topk_bruteforce"],
    "streaming": ["streaming_stateful_user_totals", "streaming_tumbling_counts"],
    "multimodal": ["multimodal_decode", "multimodal_ingest"],
    "join": ["join_skew_salted", "join_asof"],
    "agg": ["agg_grouped", "agg_rollup"],
    "window": ["window_running_revenue", "window_distribution_ranks"],
    "text": ["text_shingle_novelty", "text_language_id",
             "text_quality_score", "text_pack_sequences"],
    # ab_sequential first: its mSPRT derivation gained the
    # degenerate-variance nullif guard this round (ADVICE r12)
    "events": ["events_ab_sequential", "events_sessionize", "events_funnel"],
    "sample": ["sample_per_group_cap", "sample_train_val_test", "sample_domain_mixture"],
    "subquery": ["subquery_exists_correlated", "subquery_not_in"],
    "pandas": ["pandas_udf_grouped_map", "pandas_udf_scalar"],
    # q21/q22 first: the only r01-stale rows in the registry (r12
    # verdict #3 names them explicitly); then the r04-stale q1/q3.
    "tpch": ["tpch_q21", "tpch_q22", "tpch_q1", "tpch_q3"],
    "pipeline": ["pipeline_training_manifest", "pipeline_upsert_snapshot"],
    # round-6 families: scale-path members lead future regression
    # prefixes once certified
    "graph": ["graph_triangle_count_lsh", "graph_triangle_count", "graph_pagerank"],
    "maintenance": ["maintenance_table_stats", "maintenance_drift_psi"],
    "embeddings": ["embeddings_gram_matrix", "embeddings_label_centroids"],
    "scan": ["scan_zorder_skipping", "scan_partition_pruned", "scan_metadata_count"],
    "functions": ["functions_variant", "functions_array"],
}


def _interleaved(registry: dict[str, "QuerySpec"]) -> dict[str, "QuerySpec"]:
    """Round-robin the registry across families in two tiers.

    The driver's correctness gate checks a prefix of the registry (50
    entries per round, and the prefix has been nearly identical every
    round), so whatever leads is what gets driver-certified. Tier 0 is
    every query WITHOUT a full driver-green row in any prior round
    (``_DRIVER_GREEN``) — round-8 additions only, since CORRECTNESS_r07
    certified all 222 prior queries. The rest of the 50-entry prefix
    is tier 1: the already-certified rest, flagships first, for
    regression coverage in any longer prefix. Both tiers
    are round-robined across families so every prefix stays
    family-balanced.
    """
    buckets: dict[str, list[QuerySpec]] = {}
    for spec in registry.values():
        buckets.setdefault(_family(spec.name), []).append(spec)
    for fam, names in _FLAGSHIPS.items():
        if fam in buckets:
            pri = {n: i for i, n in enumerate(names)}
            buckets[fam].sort(key=lambda s: pri.get(s.name, len(names)))

    def round_robin(buckets: dict[str, list[QuerySpec]]) -> list[QuerySpec]:
        ordered: list[QuerySpec] = []
        queues = [q for q in buckets.values() if q]
        while queues:
            next_queues = []
            for q in queues:
                ordered.append(q.pop(0))
                if q:
                    next_queues.append(q)
            queues = next_queues
        return ordered

    tier0: dict[str, list[QuerySpec]] = {}
    tier1: dict[str, list[QuerySpec]] = {}
    for fam, specs in buckets.items():
        for spec in specs:
            demote = spec.name in _DRIVER_GREEN or spec.name in _TIER1_DEFER
            tier = tier1 if demote else tier0
            tier.setdefault(fam, []).append(spec)
    ordered = round_robin(tier0) + round_robin(tier1)
    return {spec.name: spec for spec in ordered}


def all_queries() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration) and
    return the full registry, interleaved across query families."""
    # Imports are deferred so `import rdbms_scala_spark` stays cheap.
    from rdbms_scala_spark.queries import tpch, tpch_ext, tpch_ps  # noqa: F401
    from rdbms_scala_spark.queries import behavior, sql_surface  # noqa: F401
    from rdbms_scala_spark.functions import scalar, semi_structured, udfs  # noqa: F401
    from rdbms_scala_spark.operators import (  # noqa: F401
        relational,
        joins,
        aggregates,
        setops,
        subqueries,
        windows,
    )
    from rdbms_scala_spark.pipeline import (  # noqa: F401
        chunking,
        dedup,
        retrieval,
        similarity,
        snapshot,
        text,
        multimodal,
        sampling,
    )
    from rdbms_scala_spark.sources import files as _files  # noqa: F401
    from rdbms_scala_spark.sources import stats as _stats  # noqa: F401
    from rdbms_scala_spark.streaming import events as _events  # noqa: F401
    from rdbms_scala_spark.streaming import jobs as _jobs  # noqa: F401

    return _interleaved(_REGISTRY)
