"""Opt-in sf0.1 parity spot-sweep (round-2 verdict ask #8).

The driver gates at sf0.01 and the default local sweep runs at
sf0.001; SF-dependent edges (quantile interpolation points, rounding
boundaries, window frame sizes crossing data extents) can hide two
decades below where they first bite. This module re-runs the most
expensive oracled queries one decade ABOVE the gate.

Opt in with::

    SPARK_GRAFT_SLOW=1 python -m pytest tests/test_sf01_spot.py -q

Skipped by default: the sweep costs several minutes at sf0.1.
"""

from __future__ import annotations

import math
import os

import pytest

from crypto_etl_pipeline_spark.queries import REGISTRY

SF01 = "/root/testdata/sf0.1"

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SLOW") != "1",
    reason="sf0.1 spot-sweep is opt-in: set SPARK_GRAFT_SLOW=1",
)

# The wall-clock-heaviest oracled queries (BENCH ordering) plus the
# round-3 additions whose semantics are most SF-sensitive (window
# frames, O(n^2) oracle unrolls, grid fills).
SPOT_QUERIES = [
    "pagerank_trade_graph",
    "pipeline_dedup_corpus",
    "dedup_clusters_minhash",
    "dedup_minhash_lsh",
    "ann_ivf_topk",
    "tfidf_top_terms",
    "q1_pricing_summary",
    "iqr_outlier_flag",
    "events_hourly_rollup",
    "window_rolling_7d_spend",
    "ewma_user_purchase_value",
    "rolling_zscore_anomaly",
    "resample_ffill_hourly",
    "ohlc_hourly_bars",
    "cohort_weekly_retention",
    "text_bigram_lm_score",
    "event_type_cooccurrence",
    "quality_rule_report",
    "json_roundtrip_documents",
    "q11_important_suppliers",
    "embedding_norm_stats",
    "set_multiset_buyer_sessions",
    "window_dense_rank_lead",
    "histogram_quantile_rollup",
    "pack_training_sequences",
    # round-6 rotation: the new sampling/normalization ops. The
    # posting-join Jaccard family is deliberately NOT here: its
    # exactness is pinned at sf0.01, and at sf0.1 the DUCKDB side (the
    # n² list-intersect oracle, the form the Spark plan no longer has)
    # needs ~20+ min for one query — the oracle is the bottleneck, not
    # the engine (Spark side measured 2.2 s; SCALE.md r6).
    "sample_stratified_exact",
    "vocab_coverage_curve",
    "corpus_mix_temperature",
    "cap_docs_per_source",
    "quality_percentile_normalize",
    # round-6 second wave
    "text_gopher_filters",
    "embedding_random_projection",
    "sql_recursive_hierarchy_rollup",
    "variant_props_shred",
    "ann_jl_projected_topk",
    "embedding_pca_top_component",
    "sketch_kmv_audience_overlap",
    "bucketed_join_colocated",
    "decontaminate_bloom_prefilter",
    "kcore_trade_graph",
    "ab_ks_test",
    "embedding_pca_by_label",
    "embedding_pca_residual_outliers",
]


@pytest.fixture(scope="module")
def duck01():
    import duckdb

    from crypto_etl_pipeline_spark.sources.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF01}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else round(v, 9)
            elif hasattr(v, "__float__") and not isinstance(v, (int, bool)):
                v = round(float(v), 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


@pytest.mark.parametrize("name", [q for q in SPOT_QUERIES if q in REGISTRY])
def test_sf01_parity(name, spark, duck01):
    spec = REGISTRY[name]
    assert spec.oracle is not None, f"{name} has no oracle"
    sdf = spec.fn(spark, SF01)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = duck01.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rows spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns = _normalize(spark_rows, spark_cols)
    nd = _normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} mismatches; first: {mismatches[:2]}"
