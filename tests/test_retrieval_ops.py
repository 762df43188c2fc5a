"""Semantic checks for the round-7 retrieval / data-selection family.

Oracle parity (exact value match vs DuckDB) is covered by
tests/test_oracle_parity.py — these tests pin the SEMANTICS the parity
hash can't see: ranking sanity, smoothing behavior, and the
domain-separation property each selector exists to provide.
"""

from __future__ import annotations

import math

import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def retrieval_rows(spark):
    """Collect all three query outputs once for the module."""
    from crypto_etl_pipeline_spark.queries import REGISTRY

    return {
        name: [tuple(r) for r in REGISTRY[name].fn(spark, SF).collect()]
        for name in (
            "bm25_topk_retrieval",
            "text_bigram_lm_perplexity",
            "dsir_importance_weights",
        )
    }


def test_bm25_topk_sorted_and_positive(retrieval_rows):
    rows = retrieval_rows["bm25_topk_retrieval"]
    assert len(rows) == 15
    scores = [s for _, s in rows]
    assert scores == sorted(scores, reverse=True)
    # IDF uses ln(1 + ...) >= ln(1) so every matched doc scores > 0
    assert all(s > 0 for s in scores)


def test_bm25_docs_contain_a_query_term(spark, retrieval_rows):
    """Every retrieved doc actually contains >= 1 query term."""
    from pyspark.sql import functions as F

    from crypto_etl_pipeline_spark.queries.retrieval import _BM25_TERMS
    from crypto_etl_pipeline_spark.sources.tables import load_table

    ids = [doc_id for doc_id, _ in retrieval_rows["bm25_topk_retrieval"]]
    docs = (
        load_table(spark, SF, "documents")
        .where(F.col("doc_id").isin(ids))
        .select("doc_id", "text")
        .collect()
    )
    assert len(docs) == len(ids)
    for r in docs:
        toks = set(r["text"].split())
        assert toks & set(_BM25_TERMS), r["doc_id"]


def test_perplexity_in_domain_lower_than_out_of_domain(spark, retrieval_rows):
    """The LM is trained on lang='en': mean in-domain ppl must be lower
    than mean out-of-domain ppl, and every ppl is finite and > 1."""
    langs = {
        r["doc_id"]: r["lang"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    rows = retrieval_rows["text_bigram_lm_perplexity"]
    assert len(rows) == len(langs)
    by_domain: dict[bool, list[float]] = {True: [], False: []}
    for doc_id, _avg_logp, ppl in rows:
        assert math.isfinite(ppl) and ppl > 1.0
        by_domain[langs[doc_id] == "en"].append(ppl)
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    assert mean(by_domain[True]) < mean(by_domain[False])


def test_dsir_weights_separate_target_domain(spark, retrieval_rows):
    """Importance weights must rank the target domain (lang='en') above
    raw on average — that is the entire point of DSIR — and weights are
    finite (smoothing removes zeros) with corpus-level mass ~balanced."""
    langs = {
        r["doc_id"]: r["lang"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    rows = retrieval_rows["dsir_importance_weights"]
    assert len(rows) == len(langs)
    tgt, raw = [], []
    for doc_id, lw in rows:
        assert math.isfinite(lw)
        (tgt if langs[doc_id] == "en" else raw).append(lw)
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    assert mean(tgt) > mean(raw)
