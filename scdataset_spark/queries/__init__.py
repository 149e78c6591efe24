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

# External sweeps sample the registry in REGISTRATION ORDER (typically the
# first 50 entries), so ordering is part of the verification contract, not
# cosmetics.  Round-5 priority: (a) the TWENTY queries new this round
# (never externally checked), then (b) staleness of the most recent
# external check — the six round-2-only queries, then the 45-query round-3
# cohort (everything round 4 did not re-check).  121 registered > 50 per
# sweep, so a 50-slot sweep reaches 20 + 6 + the first 24 of the round-3
# cohort; the remaining 21 round-3 entries (from ev_sliding_window on,
# ordered cheapest-and-historically-stable last) age to three rounds and
# MUST lead the round-6 rotation.  Names and semantics are frozen; only
# iteration order changes.
_SWEEP_PRIORITY = [
    # --- new in round 5: first external check ---
    "j4_asof_join",
    "dd_winnowing",
    "dd_winnowing_pairs",
    "tx_bpe_count",
    "g4_shuffle_quality",
    "mm_frame_sample",
    "skew_salted_count",
    "q17_small_quantity",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q20_potential_promotion",
    "tx_repetition",
    "emb_quantize",
    "dd_embed_exact",
    "o17_temperature_mixture",
    "dd_ngram_decontam",
    "ev_user_stats",
    "j_full_outer_nation_activity",
    "g7_unpivot_flag_metrics",
    "tx_length_buckets",
    # --- last externally checked in round 2 ---
    "s1_streaming_scan",
    "s2_subset_split",
    "o9_epoch_reshuffle",
    "o12_exact_len",
    "q3_shipping_priority",
    "q6_revenue_forecast",
    # --- last externally checked in round 3 ---
    "o1_block_shuffle",
    "o3_weighted_replace",
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "g7_approx_sketches",
    "q9_product_profit",
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
    "pipe_curation",
    "ev_tumbling_window",
    "ev_sliding_window",
    "ev_session_window",
    "ev_stream_stream_join",
    "ev_first_event_dedup",
    "g5_sample_size_estimate",
    "g6_batch_normalize",
    "t_hook_pipeline",
    "src_custom_datasource",
    "mm_binary_decode",
    "mm_feature_extract",
    "s4_sparse_densify",
    "s3_anndata_ingest",
    "ml_label_encode",
    "ml_tfidf",
    "g7_grouping_sets",
    # --- round-3 cohort tail: cheap, historically stable — may wait to r6 ---
    "g7_cube",
    "sq_scalar_subquery",
    "sq_in_subquery",
    "dt_date_functions",
    "str_functions",
    "arr_functions",
]


def _apply_sweep_priority() -> None:
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
