"""Semantic checks for the round-7 second-wave queries (privacy audit,
split-leakage audit, hard-negative mining, token-budget allocation).

Oracle parity is covered by tests/test_oracle_parity.py — these pin the
properties the parity hash can't see: flag consistency, gate membership,
label separation, and the temperature-flattening direction.
"""

from __future__ import annotations

import hashlib

import pytest

SF = "/root/testdata/sf0.01"


def _gate(key: int, salt: str) -> int:
    """Python twin of operators/sampling.hash_gate (md5_long 15 % 1e6)."""
    h = hashlib.md5(f"{key}{salt}".encode()).hexdigest()
    return int(h[:15], 16) % 1_000_000


@pytest.fixture(scope="module")
def rows(spark):
    from crypto_etl_pipeline_spark.queries import REGISTRY

    return {
        name: [tuple(r) for r in REGISTRY[name].fn(spark, SF).collect()]
        for name in (
            "quality_kanonymity_audit",
            "split_leakage_audit",
            "ann_hard_negative_topk",
            "token_budget_epoch_allocation",
        )
    }


def test_kanonymity_partition_and_flags(spark, rows):
    from crypto_etl_pipeline_spark.queries.quality import KANON_K, KANON_L
    from crypto_etl_pipeline_spark.sources.tables import load_table

    out = rows["quality_kanonymity_audit"]
    n_cust = load_table(spark, SF, "customer").count()
    # groups partition the table: every customer in exactly one group
    assert sum(r[2] for r in out) == n_cust
    assert len({(r[0], r[1]) for r in out}) == len(out)
    for _, _, group_n, n_bands, k_anon, l_div in out:
        assert k_anon == (group_n >= KANON_K)
        assert l_div == (n_bands >= KANON_L)
        assert 1 <= n_bands <= group_n
    # non-vacuous both ways at the gate SF
    assert any(not r[4] for r in out) and any(r[4] for r in out)


def test_split_leakage_docs_really_straddle(rows):
    from crypto_etl_pipeline_spark.queries.text import (
        LEAK_EVAL_RATE,
        LEAK_SALT,
        LEAK_TAU,
    )

    out = rows["split_leakage_audit"]
    assert out, "leakage audit is vacuous at the gate SF"
    cut = int(LEAK_EVAL_RATE * 1_000_000)
    for eval_id, train_id, jac in out:
        assert _gate(eval_id, LEAK_SALT) < cut, "eval_doc_id not in eval split"
        assert _gate(train_id, LEAK_SALT) >= cut, "train_doc_id not in train split"
        assert jac >= LEAK_TAU


def test_split_leakage_pairs_are_near_dups(spark, rows):
    """Every leaked pair must appear in the independent exact-Jaccard
    pair query (threshold 0.05 there, so >= tau pairs are a subset)."""
    from crypto_etl_pipeline_spark.queries import REGISTRY

    all_pairs = {
        (min(a, b), max(a, b)): j
        for a, b, j in REGISTRY["dedup_ngram_jaccard_pairs"].fn(spark, SF).collect()
    }
    for eval_id, train_id, jac in rows["split_leakage_audit"]:
        key = (min(eval_id, train_id), max(eval_id, train_id))
        # lang-blocked pair feed: cross-lang leaks won't appear there
        if key in all_pairs:
            assert abs(all_pairs[key] - jac) < 1e-6


def test_hard_negatives_labels_differ(spark, rows):
    from crypto_etl_pipeline_spark.queries.vector import HARD_NEG_K, N_QUERIES
    from crypto_etl_pipeline_spark.sources.tables import load_table

    out = rows["ann_hard_negative_topk"]
    assert len(out) == N_QUERIES * HARD_NEG_K
    labels = dict(
        load_table(spark, SF, "embeddings").select("vec_id", "label").collect()
    )
    per_q: dict[int, list[float]] = {}
    for qid, nid, neg_label, cos, rank in out:
        assert labels[nid] == neg_label != labels[qid]
        per_q.setdefault(qid, []).append(cos)
    for sims in per_q.values():
        assert sims == sorted(sims, reverse=True)
        assert len(sims) == HARD_NEG_K


def test_token_budget_allocation_properties(rows):
    from crypto_etl_pipeline_spark.queries.retrieval import BUDGET_FRAC

    out = rows["token_budget_epoch_allocation"]
    shares = [r[2] for r in out]
    assert abs(sum(shares) - 1.0) < 1e-4
    total_avail = sum(r[1] for r in out)
    budget = int(total_avail * BUDGET_FRAC)
    # integer rounding leaves at most one token per source of drift
    assert abs(sum(r[3] for r in out) - budget) <= len(out)
    for _, avail, share, tgt, epochs in out:
        assert abs(epochs - tgt / avail) < 1e-3
    # temperature alpha < 1 flattens the mixture: the smallest source is
    # upweighted relative to its raw share, the largest downweighted
    by_avail = sorted(out, key=lambda r: r[1])
    small, large = by_avail[0], by_avail[-1]
    assert small[2] > small[1] / total_avail
    assert large[2] < large[1] / total_avail


def test_lpa_communities_shape(spark):
    import re

    from crypto_etl_pipeline_spark.queries import REGISTRY

    out = [tuple(r) for r in REGISTRY["label_propagation_communities"].fn(spark, SF).collect()]
    assert 0 < len(out) <= 20
    sizes = [n for _, n in out]
    assert sizes == sorted(sizes, reverse=True)
    assert all(re.fullmatch(r"[CS]\d+", c) for c, _ in out)
    # communities partition the node set: top-20 sizes can't exceed it
    from crypto_etl_pipeline_spark.sources.tables import load_table

    n_cust = load_table(spark, SF, "customer").count()
    n_supp = load_table(spark, SF, "supplier").count()
    assert sum(sizes) <= n_cust + n_supp


def test_fertility_consistent_with_bpe_encode(spark):
    from crypto_etl_pipeline_spark.queries import REGISTRY

    fert = [tuple(r) for r in REGISTRY["tokenizer_fertility_by_lang"].fn(spark, SF).collect()]
    assert fert
    for _, n_words, n_tokens, tpw, cpt in fert:
        assert n_tokens >= n_words >= 1  # every word costs >= 1 token
        assert tpw >= 1.0 and cpt >= 1.0  # ...and every token >= 1 char
        assert abs(tpw - n_tokens / n_words) < 1e-5
    # cross-query invariant: per-lang totals == per-doc totals globally
    enc = [tuple(r) for r in REGISTRY["bpe_encode_token_counts"].fn(spark, SF).collect()]
    assert sum(r[2] for r in fert) == sum(r[2] for r in enc)
