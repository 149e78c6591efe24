"""Driver-checkable query registry.

Every implemented operator from SURVEY.md §2 registers one named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL can
express the same semantics) a DuckDB oracle SQL string.  The driver runs
both at sf0.01 and compares row-count + schema + order-insensitive
value hash, so:

- every computed column is aliased identically on both sides
- double-valued outputs that could drift by summation order are rounded
  on BOTH sides (integers and deterministic single-op doubles are exact)
- all randomness goes through the engine-portable ``mix()`` so even
  shuffle/sample ORDER is oracle-checked
"""

from scdataset_spark.queries.registry import REGISTRY, QuerySpec, query  # noqa: F401

# importing the modules populates the registry
from scdataset_spark.queries import sampling  # noqa: F401,E402
from scdataset_spark.queries import relational  # noqa: F401,E402
from scdataset_spark.queries import llm  # noqa: F401,E402
from scdataset_spark.queries import streaming_batch  # noqa: F401,E402
from scdataset_spark.queries import metrics  # noqa: F401,E402
from scdataset_spark.queries import extended  # noqa: F401,E402
from scdataset_spark.queries import quality  # noqa: F401,E402

# External sweeps sample the registry in REGISTRATION ORDER (typically the
# first 50 entries), so ordering is part of the verification contract, not
# cosmetics.  Round-15 priority (VERDICT r14 task 2, rotated as the FIRST
# commit of the round): (a) queries NEW or SQL-changed this round lead
# (never externally checked / check invalidated), then (b) the 23 entries
# whose most recent external check is round 11 (at the three-round
# staleness floor), then rounds 12/13 by staleness, with the 50 entries
# checked in round 14 at the back (freshest).
#
# Staleness floor (codified per VERDICT r10 task 7): with 171+ entries
# and a ~50-slot external sweep, the worst-case age of any entry's
# latest check is ceil(171/50) = 4 rounds — i.e. "≤3 rounds stale" is
# the steady-state bound this rotation maintains, and one extra round
# for spillover when a round adds new entries.  Every entry still runs
# LOCALLY every round via tests/test_oracle_parity.py (the full
# parametrized DuckDB mirror), so external staleness bounds re-CHECK
# latency, not untested surface.
# Names and semantics are frozen; only iteration order changes.
_SWEEP_PRIORITY = [
    # --- new or SQL-changed in round 15 (prepend as added) ---
    "o26_unimax_budget",  # r15: new — UniMax water-filled source budgets
    "tx_gopher_rules",  # r15: new — Gopher quality rule set
    "sim_mmr_topk",  # r15: new — MMR diversified top-k
    "dq_embedding_drift",  # r15: new — embedding-space PSI drift monitor
    "tx_curriculum_order",  # r15: new — easy-to-hard curriculum schedule
    "tx_distinct_ngrams",  # r15: new — per-source distinct-n diversity
    "tx_dsir_select",  # r15: new — DSIR importance selection
    "q5_local_supplier_volume",  # r15: adopted the pre-restricted join order (A/B)
    # --- last externally checked in round 11 (3-round floor; MUST lead r15) ---
    "s1_streaming_scan",
    "s2_subset_split",
    "o9_epoch_reshuffle",
    "o12_exact_len",
    "o1_block_shuffle",
    "o3_weighted_replace",
    "g7_approx_sketches",
    "q21_waiting_supplier",
    "tx_quality_score",
    "dd_exact_groups",
    "dd_minhash_lsh",
    "dd_simhash_pairs",
    "dd_decontamination",
    "dd_components",
    "dd_dedup_corpus",
    "dd_embed_cosine",
    "dd_embed_components",
    "sim_topk_cosine",
    "sim_lsh_ann",
    "sim_ivf_ann",
    "mm_multimodal_zip",
    "tx_normalize",
    "tx_pii_scrub",
    # --- last externally checked in round 12 (sweep tail fills from here) ---
    "tx_token_budget_per_source_bucketed",
    "sim_ivf_index_stats",
    "sim_ivf_index_rebuild",
    "sim_ivf_recall",
    "tx_quality_rank_by_source",
    "tx_quality_rank_by_source_bucketed",
    "pipe_curation",
    "ev_tumbling_window",
    "dd_components_star",
    "o18_fetch_shuffle",
    "dd_incremental_novel",
    "t_hook_pipeline",
    "src_custom_datasource",
    "s4_sparse_densify",
    "s3_anndata_ingest",
    "ml_label_encode",
    "dq_foreign_key",
    "dq_constraints",
    "dd_remove_spans",
    "o24_mixture_plan",
    "tx_chunk_documents",
    "sim_random_projection",
    "sim_projected_ann",
    "dq_volume_anomalies",
    "ml_tfidf",
    "mm_binary_decode",
    "mm_feature_extract",
    "ev_sliding_window",
    "ev_session_window",
    "ev_stream_stream_join",
    "ev_first_event_dedup",
    "g5_sample_size_estimate",
    "g6_batch_normalize",
    "g7_cube",
    "g7_grouping_sets",
    "sq_scalar_subquery",
    "sq_in_subquery",
    "dt_date_functions",
    "str_functions",
    "arr_functions",
    "dd_ngram_jaccard",
    "dd_lsh_verified",
    "dd_simhash",
    "o2_buffer_shuffle",
    "o4_weighted_noreplace",
    "o5_subset_weighted",
    "o6_class_balanced",
    "o7_smoothed_weights",
    "o10_batch_plan",
    "o11_drop_last_batches",
    # --- last externally checked in round 13 ---
    "sim_ivf_index_compacted",
    "sim_pq_adc_agreement",
    "sim_ann_ingest_consistency",
    "dd_incremental_ingest",
    "o13_ddp_partition",
    "o15_block_shuffle_droplast",
    "o16_mixture_sample",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_revenue",
    "q12_shipmode_priority",
    "q13_customer_distribution",
    "q14_promo_share",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q18_large_orders",
    "q19_disjunctive_predicates",
    "q22_idle_wealthy_customers",
    "w5_running_revenue",
    "pipe_curation_gated",
    "sim_pq_encode",
    "sim_pq_ann",
    "dd_edit_verified",
    "o22_component_split",
    "dq_profile_drift",
    "dd_contamination_report",
    "dq_profile",
    "dq_outliers",
    "ts_gap_fill",
    "w5_distribution",
    "o20_per_source_cap",
    "tx_bm25",
    "dd_duplicate_spans",
    "dd_semantic_dedup",
    "o19_stratified_sample",
    "dd_incremental_verified",
    "o5_positional_weights",
    "w5_top3_orders_per_customer",
    "w5_lag_lead_gaps",
    "w5_range_frame",
    "g3_batch_entropy",
    "g7_rollup_lineitem",
    "g7_pivot_status_by_flag",
    "g7_distinct_aggregates",
    "g7_percentiles",
    "g7_correlation",
    "j_semi_active_customers",
    "j_anti_customers_without_orders",
    # --- externally checked in round 14 (freshest) ---
    "sim_semantic_ingest",
    "dq_snapshot_diff",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q6_revenue_forecast",
    "q9_product_profit",
    "q11_important_stock",
    "q20_potential_promotion",
    "g7_unpivot_flag_metrics",
    "tx_unigram_logprob",
    "ev_user_stats",
    "setops_union_distinct",
    "setops_repeat_customers",
    "setops_lapsed_customers",
    "sq_correlated_group_max",
    "null_handling",
    "scalar_functions_events",
    "ev_session_capped",
    "ev_session_funnel",
    "tx_token_stats",
    "tx_langid",
    "tx_fingerprint",
    "tx_sequence_pack",
    "tx_token_budget",
    "j4_asof_join",
    "dd_winnowing",
    "dd_winnowing_pairs",
    "tx_bpe_count",
    "g4_shuffle_quality",
    "mm_frame_sample",
    "skew_salted_count",
    "q17_small_quantity",
    "sim_ivf_index",
    "sim_pq_index",
    "tx_token_budget_per_source",
    "q2_min_cost_supplier",
    "tx_repetition",
    "emb_quantize",
    "dd_embed_exact",
    "o17_temperature_mixture",
    "dd_embed_cosine_fast",
    "dd_keep_best",
    "tx_vocabulary",
    "o21_split_assign",
    "dq_drift",
    "o23_interleave",
    "dd_ngram_decontam",
    "j_full_outer_nation_activity",
    "tx_length_buckets",
]

def _apply_sweep_priority() -> None:
    if len(set(_SWEEP_PRIORITY)) != len(_SWEEP_PRIORITY):
        dupes = sorted({n for n in _SWEEP_PRIORITY if _SWEEP_PRIORITY.count(n) > 1})
        raise ValueError(f"_SWEEP_PRIORITY has duplicate names: {dupes}")
    missing = [n for n in _SWEEP_PRIORITY if n not in REGISTRY]
    if missing:  # a renamed query must update the priority list too
        raise ValueError(f"_SWEEP_PRIORITY names not in REGISTRY: {missing}")
    ordered = {n: REGISTRY[n] for n in _SWEEP_PRIORITY}
    for n, spec in REGISTRY.items():
        if n not in ordered:
            ordered[n] = spec
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_sweep_priority()


def queries():
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql():
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


def headline_queries():
    return {name: spec.fn for name, spec in REGISTRY.items() if spec.headline}
