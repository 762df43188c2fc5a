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


# The driver's correctness gate samples the FIRST 50 entries of
# queries(), so ordering is rotated each round to cycle coverage.
# Union of the r1-r10 samples = 256 distinct names; never-sampled pool
# after r10 = 69 (registry 325 minus the union — VERDICT r10 task #2
# lists it in full). Round 11 leads with the round's new queries
# (gated at birth so they never join the pool) plus ONE deliberate
# re-inclusion — fuzzy_match_suppliers, whose blocking changed from
# the degenerate prefix-14 scheme to sorted-neighborhood this round
# (VERDICT r10 task #1), so the fix gets an official green row — and
# fills every remaining slot from the never-sampled pool in
# alphabetical order. Pool after r11 = 28 names
# (regexp_extract_entity_ids .. zorder_layout_events, the quality/
# timeseries/sql/layout tail); r12 drains them all (28 < 50 slots).
_GATE_FIRST = (
    # NEW this round — gated at birth
    "dedup_exact_substrings",
    "dedup_exact_substrings_excise",
    "pipeline_pretrain_corpus_v1",
    "fuzzy_match_suppliers_multipass",
    "decontaminate_excise_spans",
    "survival_km_repeat_purchase",
    "dedup_exact_substrings_incremental",
    "stats_bh_fdr_segments",
    # deliberate re-inclusion: blocking scheme replaced this round
    "fuzzy_match_suppliers",
    # never-sampled pool, alphabetical (41 of 69)
    "active_learning_margin_topk",
    "approx_distinct_users",
    "approx_percentile_value",
    "argmax_user_events",
    "benford_first_digit_audit",
    "cohort_weekly_retention",
    "corpus_mix_temperature",
    "corpus_source_stats",
    "corr_lineitem_price_qty",
    "curriculum_phase_schedule",
    "decayed_user_value",
    "dedup_soft_weights_by_source",
    "degree_distribution_trade_graph",
    "event_transition_matrix",
    "event_type_cooccurrence",
    "ewma_user_purchase_value",
    "explode_doc_tokens",
    "global_sequence_ids",
    "grouped_map_zscore",
    "histogram_quantile_rollup",
    "hybrid_rrf_retrieval",
    "inter_event_gap_profile",
    "json_extract_props_stats",
    "json_roundtrip_documents",
    "late_data_profile",
    "layout_skipping_audit",
    "map_type_event_counts",
    "model_eval_suite",
    "model_pr_curve",
    "multimodal_audio_resample",
    "multimodal_features",
    "ndjson_sink_roundtrip",
    "ohlc_hourly_bars",
    "partitioned_write_prune_read",
    "pipeline_curation_v2",
    "quality_completeness_events",
    "quality_percentile_normalize",
    "quality_referential_audit",
    "quality_rule_report",
    "quality_violations_orders",
    "reconcile_checksum_events",
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
