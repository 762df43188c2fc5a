"""Property tests for the Misra-Gries guarantee (round-4 VERDICT #8).

The docstrings in operators/sketch.py claim the classic MG bound
    count(t) - n/k  <=  w(t)  <=  count(t)
per partition summary AND after mergeable-summaries merging (Agarwal
et al., PODS'12). Until now that bound was exercised only via the
end-to-end oracle equality of heavy_hitters_exact; here it is asserted
directly over >= 100 seeded random streams, with random partitioning,
random Arrow-batch splits, and random merge orders — plus one
Spark-side pin that the real mapInPandas partials + DataFrame merge
satisfy the same bounds on the events table.
"""

from __future__ import annotations

import random

import pytest

from crypto_etl_pipeline_spark.operators.sketch import _mg_add_and_prune


def _merge_prune(a: dict, b: dict, k: int) -> dict:
    """Pure-python mirror of merge_mg_summaries: sum weights, subtract
    the k-th largest, drop non-positive."""
    m = dict(a)
    for t, w in b.items():
        m[t] = m.get(t, 0) + w
    if len(m) > k - 1:
        ws = sorted(m.values(), reverse=True)
        thresh = ws[k - 1]
        m = {t: w - thresh for t, w in m.items() if w > thresh}
    return m


def _fold_stream(stream, k: int, rng: random.Random) -> dict:
    """Fold a term stream through _mg_add_and_prune in random-sized
    batches (mirroring Arrow batch boundaries, which the bound must be
    insensitive to)."""
    counts: dict = {}
    i = 0
    while i < len(stream):
        step = rng.randint(1, max(1, len(stream) // 3))
        batch = stream[i : i + step]
        vc: dict = {}
        for t in batch:
            vc[t] = vc.get(t, 0) + 1
        counts = _mg_add_and_prune(counts, vc.items(), k - 1)
        i += step
    return counts


@pytest.mark.parametrize("seed", range(120))
def test_mg_bound_per_partition_and_post_merge(seed):
    rng = random.Random(seed)
    k = rng.randint(2, 10)
    n_terms = rng.randint(2, 30)
    n = rng.randint(50, 500)
    # Skewed draw: squaring the uniform pick concentrates mass on low
    # ids, so real heavy hitters exist at most seeds.
    stream = [f"t{int(n_terms * rng.random() ** 2)}" for _ in range(n)]
    n_parts = rng.randint(1, 8)
    parts: list[list] = [[] for _ in range(n_parts)]
    for t in stream:
        parts[rng.randrange(n_parts)].append(t)

    partials = []
    for part in parts:
        w = _fold_stream(part, k, rng)
        cnt: dict = {}
        for t in part:
            cnt[t] = cnt.get(t, 0) + 1
        n_p = len(part)
        # per-partition bound: count_p(t) - n_p/k <= w(t) <= count_p(t)
        for t, c in cnt.items():
            wt = w.get(t, 0)
            assert wt >= c - n_p / k, (seed, t, wt, c, n_p, k)
            assert wt <= c, (seed, t, wt, c)
        for t in w:
            assert t in cnt, (seed, t)
        assert len(w) <= k - 1, (seed, len(w), k)
        partials.append(w)

    # merge in random order; errors add but stay bounded by n/k total
    rng.shuffle(partials)
    merged = partials[0]
    for p in partials[1:]:
        merged = _merge_prune(merged, p, k)
    assert len(merged) <= k - 1
    cnt_all: dict = {}
    for t in stream:
        cnt_all[t] = cnt_all.get(t, 0) + 1
    for t, c in cnt_all.items():
        wt = merged.get(t, 0)
        assert wt >= c - n / k, (seed, t, wt, c, n, k)
        assert wt <= c, (seed, t, wt, c)
    # superset property: any true heavy hitter survives with w > 0
    for t, c in cnt_all.items():
        if c * k > n:
            assert merged.get(t, 0) > 0, (seed, t, c, n, k)


def test_mg_spark_partials_and_merge_satisfy_bound(spark):
    """The real operators — mapInPandas partials folded through the
    DataFrame merge — must satisfy the same global bound and superset
    property on the events table (k=3 over 5 event types forces
    evictions in every partition summary)."""
    from pyspark.sql import functions as F

    from crypto_etl_pipeline_spark.operators.sketch import (
        merge_mg_summaries,
        misra_gries_partials,
    )
    from crypto_etl_pipeline_spark.sources.tables import load_table
    from tests.conftest import SF_ORACLE as SF_SMALL

    k = 3
    ev = load_table(spark, SF_SMALL, "events")
    exact = {r["event_type"]: r["c"] for r in
             ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("c")).collect()}
    n = sum(exact.values())

    partials_df = misra_gries_partials(ev, "event_type", k)
    union_terms = {r["term"] for r in partials_df.collect()}
    # candidate-superset property over the raw union of partials
    for t, c in exact.items():
        if c * k > n:
            assert t in union_terms, (t, c, n)

    # One-shot merge of all per-partition summaries is a valid merge
    # sequence (the prune threshold is charged to >= k counters, so the
    # summed thresholds stay <= n/k regardless of merge arity/order).
    empty = spark.createDataFrame([], "term string, w long")
    merged = {r["term"]: r["w"]
              for r in merge_mg_summaries(empty, partials_df, k).collect()}
    assert len(merged) <= k - 1
    for t, c in exact.items():
        wt = merged.get(t, 0)
        assert wt <= c, (t, wt, c)
        assert wt >= c - n / k, (t, wt, c, n, k)
