"""Semantic checks for the round-7 fourth-wave queries (truncation-loss
audit, quality-filter funnel, embedding anisotropy).

Oracle parity is covered by tests/test_oracle_parity.py — these pin the
properties the parity hash can't see: monotonicity in the context
length, funnel monotonicity and consistency with the gopher keep flag,
and the directional-statistics identities behind the anisotropy
estimator.
"""

from __future__ import annotations

import math

import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def rows(spark):
    from crypto_etl_pipeline_spark.queries import REGISTRY

    return {
        name: [tuple(r) for r in REGISTRY[name].fn(spark, SF).collect()]
        for name in (
            "truncation_loss_by_context",
            "quality_filter_funnel",
            "embedding_anisotropy_by_label",
        )
    }


def test_truncation_monotone_in_context(rows):
    out = sorted(rows["truncation_loss_by_context"])
    assert [r[0] for r in out] == [128, 256, 512, 1024]
    n_docs = {r[1] for r in out}
    tok_tot = {r[4] for r in out}
    assert len(n_docs) == 1 and len(tok_tot) == 1  # corpus constants
    # a longer window never truncates more docs or loses more tokens
    for a, b in zip(out, out[1:]):
        assert a[2] >= b[2] and a[5] >= b[5]
    for _, n, tr, fd, tot, lost, fl in out:
        assert 0 <= tr <= n and 0 <= lost <= tot
        assert abs(fd - tr / n) < 1e-5 and abs(fl - lost / tot) < 1e-5


def test_funnel_monotone_and_matches_keep_flag(rows, spark):
    out = sorted(rows["quality_filter_funnel"])
    assert [r[0] for r in out] == [1, 2, 3, 4, 5, 6]
    passes = [r[2] for r in out]
    assert passes == sorted(passes, reverse=True)  # survival only shrinks
    # the last stage's survivors ARE the gopher_keep docs
    from crypto_etl_pipeline_spark.queries import REGISTRY

    keep = (
        REGISTRY["text_gopher_filters"]
        .fn(spark, SF)
        .where("gopher_keep")
        .count()
    )
    assert passes[-1] == keep
    # stage-on-stage retention composes back to the corpus fraction
    frac = 1.0
    for _, _, _, frac_corpus, frac_prev in out:
        assert frac_prev is None or 0 <= frac_prev <= 1
        if frac_prev is not None:
            frac *= frac_prev
            assert abs(frac - frac_corpus) < 1e-4


def test_anisotropy_directional_identities(rows):
    out = rows["embedding_anisotropy_by_label"]
    assert len(out) == 10
    for _, n, mean_norm, cos_mean, pair_cos in out:
        assert n > 1 and mean_norm > 0
        # resultant length |S|/n lives in [0, 1]
        assert 0 <= cos_mean <= 1 + 1e-9
        # mean pairwise cos in [-1/(n-1), 1], and consistent with |S|:
        # (|S|^2 - n) / (n(n-1)) where |S| = n * cos_mean
        assert -1.0 / (n - 1) - 1e-9 <= pair_cos <= 1 + 1e-9
        s2 = (n * cos_mean) ** 2
        assert abs(pair_cos - (s2 - n) / (n * (n - 1))) < 5e-5
        # random float embeddings with positive-mean components are
        # mildly anisotropic, not degenerate
        assert not math.isnan(pair_cos)


def test_oov_rates_bounded_and_consistent(spark):
    from crypto_etl_pipeline_spark.queries import REGISTRY

    out = [tuple(r) for r in REGISTRY["oov_rate_by_lang"].fn(spark, SF).collect()]
    assert len(out) == 5
    for _, n_tok, n_oov, tr, n_ty, n_oty, tyr in out:
        assert 0 <= n_oov <= n_tok and 0 <= n_oty <= n_ty
        assert abs(tr - n_oov / n_tok) < 1e-5
        assert abs(tyr - n_oty / n_ty) < 1e-5
        # K=16 vocab over a ~31-type corpus: both regimes non-degenerate
        assert 0 < tr < 1
    # in-vocab type count == K when every vocab word occurs in the lang
    # (not asserted per-lang; globally the type ceiling binds)
    assert all(n_ty - n_oty <= 16 for _, _, _, _, n_ty, n_oty, _ in out)


def test_source_overlap_consistent_with_pair_feed(spark):
    from crypto_etl_pipeline_spark.queries import REGISTRY

    cells = [tuple(r) for r in REGISTRY["source_overlap_matrix"].fn(spark, SF).collect()]
    assert cells
    for sa, sb, within, n, mj in cells:
        assert sa <= sb and within == (sa == sb)
        assert n >= 1 and 0.05 <= mj <= 1.0
    # cell totals == total near-dup pairs
    n_pairs = REGISTRY["dedup_ngram_jaccard_pairs"].fn(spark, SF).count()
    assert sum(c[3] for c in cells) == n_pairs


def test_pq_recall_vs_exact_l2(spark):
    """PQ is an approximation: the oracle pins the algorithm, this pins
    its quality — recall@10 of the ADC-shortlist + exact-re-rank chain
    against the exact L2 top-10 (measured 0.85-0.90; uniform random
    embeddings are PQ's worst case)."""
    import numpy as np
    import pyarrow.parquet as pq

    from crypto_etl_pipeline_spark.queries import REGISTRY

    got = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["ann_pq_adc_topk"].fn(spark, SF).collect()
    }
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pydict()
    ids = np.asarray(t["vec_id"])
    X = np.asarray([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
    exact = set()
    for qid in range(10):
        qi = int(np.where(ids == qid)[0][0])
        d = ((X[qi] - X) ** 2).sum(axis=1)
        order = np.lexsort((ids, d))
        picked = 0
        for j in order:
            if ids[j] == qid:
                continue
            exact.add((qid, int(ids[j])))
            picked += 1
            if picked == 10:
                break
    assert len(got) == len(exact) == 100
    assert len(got & exact) / len(exact) >= 0.75


def test_layout_skipping_zorder_beats_time(spark):
    from crypto_etl_pipeline_spark.queries import REGISTRY

    rows = {
        (r.layout, r.probe_user): r
        for r in REGISTRY["layout_skipping_audit"].fn(spark, SF).collect()
    }
    assert len(rows) == 10
    for (layout, _), r in rows.items():
        assert 0 <= r.n_scan <= r.n_files
        assert abs(r.skip_frac - (1 - r.n_scan / r.n_files)) < 1e-5
    # the audit's point: hour-range files never skip a user predicate,
    # Morton files skip the vast majority
    for p in (7, 42, 77, 99, 123):
        assert rows[("time", p)].skip_frac == 0.0
        assert rows[("zorder", p)].skip_frac >= 0.8


def test_cluster_histogram_and_soft_weights_consistent(spark):
    from crypto_etl_pipeline_spark.queries import REGISTRY

    hist = [
        tuple(r)
        for r in REGISTRY["dedup_cluster_size_histogram"].fn(spark, SF).collect()
    ]
    soft = [
        tuple(r)
        for r in REGISTRY["dedup_soft_weights_by_source"].fn(spark, SF).collect()
    ]
    n_docs_total = sum(r[2] for r in hist)
    n_clusters_total = sum(r[1] for r in hist)
    # histogram partitions the corpus; excess = docs - clusters
    assert sum(r[3] for r in hist) == n_docs_total - n_clusters_total
    # soft weights: every cluster contributes unit mass, so the summed
    # effective size equals the cluster count; per-source rows bounded
    assert sum(r[1] for r in soft) == n_docs_total
    assert abs(sum(r[2] for r in soft) - n_clusters_total) < 1e-3
    for _, n, eff, ratio in soft:
        assert 0 < eff <= n and abs(ratio - (1 - eff / n)) < 1e-5


def test_active_learning_and_curriculum_consistent(spark):
    from crypto_etl_pipeline_spark.queries import REGISTRY

    batch = [
        tuple(r)
        for r in REGISTRY["active_learning_margin_topk"].fn(spark, SF).collect()
    ]
    assert len(batch) == 20
    abs_margins = [r[3] for r in batch]
    assert abs_margins == sorted(abs_margins)  # most uncertain first
    for _, _, margin, am in batch:
        assert abs(am - abs(margin)) < 1e-9

    phases = sorted(
        tuple(r)
        for r in REGISTRY["curriculum_phase_schedule"].fn(spark, SF).collect()
    )
    assert [p[0] for p in phases] == [1, 2, 3]
    n_docs = sum(p[1] for p in phases)
    assert n_docs == 500  # partitions the corpus
    # phase 1 is the high-margin (cleanest) third: mean margins decrease
    means = [p[3] for p in phases]
    assert means[0] > means[1] > means[2]
    # ECDF terciles are balanced up to margin-grid ties
    assert max(p[1] for p in phases) - min(p[1] for p in phases) <= 50


def test_rrf_fusion_consistent_with_rankers(spark):
    from crypto_etl_pipeline_spark.queries import REGISTRY

    fused = [
        tuple(r) for r in REGISTRY["hybrid_rrf_retrieval"].fn(spark, SF).collect()
    ]
    assert len(fused) == 10
    scores = [r[3] for r in fused]
    assert scores == sorted(scores, reverse=True)
    for _, br, qr, s in fused:
        assert br is not None or qr is not None  # came from some pool
        expect = (1 / (60 + br) if br else 0) + (1 / (60 + qr) if qr else 0)
        assert abs(s - expect) < 1e-5
    # BM25's #1 must appear in the fused ranking's pool contribution
    bm25_top = REGISTRY["bm25_topk_retrieval"].fn(spark, SF).collect()[0]
    assert any(r[0] == bm25_top.doc_id and r[1] == 1 for r in fused) or all(
        r[3] >= 1 / 61 for r in fused if r[1] == 1
    )
