"""Query registry — every operator from SURVEY.md §2 (+ §2.13 extensions)
as a named (PySpark builder, DuckDB oracle SQL) pair.

The driver contract (/root/repo/__spark_entry__.py) runs each Spark
builder at sf0.01 and hash-compares against the oracle SQL executed by
DuckDB over the same parquet. Column names are aliased identically on
both sides; float outputs are rounded identically on both sides so the
order-insensitive value hash is stable across engines.
"""

from __future__ import annotations

from crypto_etl_pipeline_spark.queries.base import REGISTRY, QuerySpec, register  # noqa: F401

# Importing the submodules populates REGISTRY.
from crypto_etl_pipeline_spark.queries import relational  # noqa: F401, E402
from crypto_etl_pipeline_spark.queries import cleaning  # noqa: F401, E402
from crypto_etl_pipeline_spark.queries import text  # noqa: F401, E402
from crypto_etl_pipeline_spark.queries import vector  # noqa: F401, E402
from crypto_etl_pipeline_spark.queries import streaming  # noqa: F401, E402
from crypto_etl_pipeline_spark.queries import analytics  # noqa: F401, E402
from crypto_etl_pipeline_spark.queries import pipelines  # noqa: F401, E402
from crypto_etl_pipeline_spark.queries import timeseries  # noqa: F401, E402
from crypto_etl_pipeline_spark.queries import quality  # noqa: F401, E402
from crypto_etl_pipeline_spark.queries import tpch_extra  # noqa: F401, E402
from crypto_etl_pipeline_spark.queries import market  # noqa: F401, E402
from crypto_etl_pipeline_spark.queries import behavior  # noqa: F401, E402
from crypto_etl_pipeline_spark.queries import retrieval  # noqa: F401, E402
from crypto_etl_pipeline_spark.queries import selection  # noqa: F401, E402


# The driver's correctness gate samples the FIRST entries of queries(),
# so ordering is rotated each round to cycle coverage. Union of the
# r1-r7 samples = 110 distinct names; this round leads with the four
# new round-8 skew-guard queries and then draws EXCLUSIVELY from the
# 171-query never-sampled pool (VERDICT r7 residual gap #1 / task #3):
# the de-hinted star stragglers, the sampling family, exact-money /
# ANSI / null-semantics suites, the as-of/range/SCD2 join family, the
# pair-feed exact queries, and two streaming drains.
_GATE_FIRST = (
    # round-8 skew-guard wave (new this round)
    "kcenter_sampled_assign",
    "dedup_simhash_banded_pairs",
    "dedup_paragraph_first_wins",
    "dedup_cascade_report",
    "orc_roundtrip_documents",
    "dedup_paragraph_excise",
    "dedup_simhash_hamming_calibration",
    "dedup_semantic_threshold_sweep",
    "dedup_token_savings_by_source",
    "dedup_cluster_source_purity",
    "ann_ivf_recall_at_k",
    "dedup_ngram_jaccard_pairs_capped",
    "dedup_hot_shingle_spill",
    "split_leakage_audit_capped",
    "source_overlap_matrix_capped",
    # never-sampled: joins and stars
    "asof_join_purchase_click",
    "bucketed_join_colocated",
    "range_join_click_before_purchase",
    "scd2_point_in_time_join",
    "dpp_partitioned_star_probe",
    "fuzzy_match_suppliers",
    "skew_salted_join",
    "skew_two_phase_distinct",
    "join_skew_profile",
    "join_cardinality_estimate",
    "q6_forecast_revenue",
    "q11_important_suppliers",
    "q12_linestatus_priority",
    "scalar_subquery_rich_suppliers",
    # never-sampled: sampling / splits
    "sample_pps_documents",
    "sample_stratified_exact",
    "sample_weighted_ares",
    "sample_by_key",
    "stratified_fixed_k_sample",
    "consistent_universe_sample",
    "corpus_hash_split",
    "corpus_mix_sample",
    "cap_docs_per_source",
    # never-sampled: typed/ANSI/null semantics
    "decimal_exact_money_agg",
    "ansi_try_arithmetic",
    "null_semantics_suite",
    "csv_corrupt_record_audit",
    "cube_order_status_priority",
    "grouping_sets_status_priority",
    "cdc_apply_changeset",
    "ab_welch_t_test",
    # never-sampled: dedup/text exact family
    "dedup_containment_pairs",
    "dedup_prefix_filter_pairs",
    "dedup_semantic_clusters",
    "dedup_canonical_by_quality",
    "dedup_cluster_size_histogram",
    "decontaminate_eval_overlap",
    "text_duplicated_spans",
    "text_excise_duplicated_spans",
    "text_boilerplate_ngram_prune",
    "inverted_index_postings",
    "tfidf_top_terms",
    "text_lr_score_fixed",
    "text_gopher_filters",
    "text_entropy_signals",
    "text_chi2_source_quality",
    "vocab_coverage_curve",
    # never-sampled: vectors
    "ann_ivf_refined_topk",
    "ann_ivf_persisted_probe",
    "ann_mmr_diversified_topk",
    "embedding_int8_quantize",
    "embedding_norm_stats",
    # never-sampled: semi-structured / window / quality
    "pivot_user_event_values",
    "unpivot_customer_metrics",
    "map_type_event_counts",
    "json_extract_props_stats",
    "semistructured_props_paths",
    "window_rank_suite",
    "window_ntile_quartiles",
    "window_rolling_7d_spend",
    "rolling_zscore_anomaly",
    "profile_events_table",
    "quality_rule_report",
    "reconcile_checksum_events",
    "partitioned_write_prune_read",
    "zorder_layout_events",
    "multimodal_real_decode_ppm",
    "pipeline_training_prep",
    "pipeline_curation_v2",
    # never-sampled: streaming drains (two — they are the slow rows)
    "stream_hourly_rollup",
    "stream_dedup_within_watermark",
)


def _gate_ordered():
    missing = [n for n in _GATE_FIRST if n not in REGISTRY]
    assert not missing, f"_GATE_FIRST names not registered: {missing}"
    rest = [n for n in REGISTRY if n not in set(_GATE_FIRST)]
    return list(_GATE_FIRST) + rest


def queries():
    return {name: REGISTRY[name].fn for name in _gate_ordered()}


def oracle_sql():
    return {
        name: REGISTRY[name].oracle
        for name in _gate_ordered()
        if REGISTRY[name].oracle is not None
    }
