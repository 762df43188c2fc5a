"""Semantic checks for the round-7 fifth-wave queries (k-center
coreset, exact histogram quantile, calibration bins, random walks).

Oracle parity is covered by tests/test_oracle_parity.py — these pin
the properties the parity hash can't see: the greedy k-center
trajectory's monotone radius and 2-approximation witness, the exact
quantile's agreement with a direct sort, calibration-bin mass/ordering
invariants, and walk well-formedness (alternating bipartite layers,
edges actually in the graph).
"""

from __future__ import annotations

import math

import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def registry():
    from crypto_etl_pipeline_spark.queries import REGISTRY

    return REGISTRY


def test_kcenter_radius_monotone_and_valid(registry, spark):
    rows = sorted(
        tuple(r) for r in registry["kcenter_coreset_selection"].fn(spark, SF).collect()
    )
    assert [r[0] for r in rows] == list(range(8))
    assert rows[0][2] is None  # seed has no prior centers
    ids = [r[1] for r in rows]
    assert len(set(ids)) == 8  # no re-selection
    d2 = [r[2] for r in rows[1:]]
    assert all(d > 0 for d in d2)
    # farthest-point traversal: the selection distance never increases
    assert d2 == sorted(d2, reverse=True)


def test_kcenter_matches_numpy_greedy(registry, spark):
    """Differential: replay the greedy trajectory densely in numpy
    using the same floor-quantized integer distances."""
    import numpy as np
    import pyarrow.parquet as pq

    from crypto_etl_pipeline_spark.operators.similarity import LSH_SCALE

    t = pq.read_table(f"{SF}/embeddings.parquet").to_pydict()
    ids = np.asarray(t["vec_id"])
    X = np.floor(
        np.asarray([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
        * LSH_SCALE
    )
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    picks = [0]  # lowest vec_id sits at index 0 after the sort
    d = ((X - X[0]) ** 2).sum(axis=1)
    expect = [(0, int(ids[0]), None)]
    for i in range(1, 8):
        j = int(np.lexsort((ids, -d))[0])
        expect.append((i, int(ids[j]), int(d[j])))
        picks.append(j)
        d = np.minimum(d, ((X - X[j]) ** 2).sum(axis=1))
    got = sorted(
        tuple(r) for r in registry["kcenter_coreset_selection"].fn(spark, SF).collect()
    )
    assert got == expect


def test_quantile_matches_direct_sort(registry, spark):
    import duckdb

    rows = {
        r["p"]: r
        for r in registry["quantile_exact_histogram"].fn(spark, SF).collect()
    }
    assert set(rows) == {0.5, 0.9, 0.99}
    con = duckdb.connect()
    cents = [
        c[0]
        for c in con.sql(
            f"SELECT CAST(round(l_extendedprice*100,0) AS BIGINT) AS c "
            f"FROM '{SF}/lineitem.parquet' ORDER BY c"
        ).fetchall()
    ]
    n = len(cents)
    for p, r in rows.items():
        k = math.ceil(p * n)
        assert r["n_rows"] == n and r["rank_k"] == k
        assert r["value_cents"] == cents[k - 1]
        assert abs(r["value"] - cents[k - 1] / 100.0) < 0.005
    # p50 <= p90 <= p99
    assert rows[0.5]["value_cents"] <= rows[0.9]["value_cents"] <= rows[0.99]["value_cents"]


def test_calibration_bins_partition_corpus(registry, spark):
    out = sorted(
        tuple(r) for r in registry["model_calibration_bins"].fn(spark, SF).collect()
    )
    assert out  # non-vacuous
    n_total = sum(r[2] for r in out)
    assert n_total == 500  # every doc lands in exactly one bin
    bins = [r[0] for r in out]
    assert len(set(bins)) == len(bins)
    for bin_, margin_lo, n, ms, pr, gap in out:
        assert n >= 1
        assert 0.0 <= ms <= 1.0 and 0.0 <= pr <= 1.0
        assert abs(gap - abs(ms - pr)) < 1e-9
        assert abs(margin_lo - (bin_ * 2000 - 100000) / 1000.0) < 1e-9
    # mean predicted score increases with the margin bin (sigmoid is
    # monotone and bins are disjoint margin ranges)
    scores = [r[3] for r in out]
    assert scores == sorted(scores)


def test_walks_are_valid_paths(registry, spark):
    from pyspark.sql import functions as F

    from crypto_etl_pipeline_spark.sources.tables import load_table

    out = [
        tuple(r) for r in registry["graph_random_walks"].fn(spark, SF).collect()
    ]
    assert len(out) == 50  # 10 starts x 5 positions, no dead ends
    by_walk = {}
    for start, step, node in out:
        by_walk.setdefault(start, {})[step] = node
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    pairs = {
        (r["o_custkey"], r["l_suppkey"])
        for r in li.join(
            orders.select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .select("o_custkey", "l_suppkey")
        .distinct()
        .collect()
    }
    edges = {("C%d" % c, "S%d" % s) for c, s in pairs} | {
        ("S%d" % s, "C%d" % c) for c, s in pairs
    }
    for start, path in by_walk.items():
        assert sorted(path) == [0, 1, 2, 3, 4]
        assert path[0] == start and start.startswith("C")
        for t in range(1, 5):
            # bipartite alternation C -> S -> C -> S -> C
            assert path[t][0] == ("S" if t % 2 else "C")
            assert (path[t - 1], path[t]) in edges
