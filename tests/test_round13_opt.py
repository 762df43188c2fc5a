"""Round-13 OPTIMIZATION tests: the connected-components fast paths.

The r13 optimization round rewired ``connected_components`` around a
partition-local union-find contraction (one map-only Arrow pass) plus
a threshold-gated single-task exact finish, with the r5 min-label loop
as the above-cap fallback. These tests pin the one thing that must
never drift: ALL THREE paths produce byte-identical labels.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

from crypto_etl_pipeline_spark.operators import cluster
from crypto_etl_pipeline_spark.operators.cluster import (
    _contract_edges,
    connected_components,
)


def _labels(df):
    return sorted((r["id"], r["component"]) for r in df.collect())


class TestContractionEquivalence:
    """Fast path vs forced-loop path vs hand-derived truth."""

    def _graph_long(self, spark):
        # one 30-node chain spread across many partitions (the shape
        # that defeated plain min-label propagation), a 4-clique, one
        # 2-node component, singletons
        chain = [(i, i + 1) for i in range(100, 130)]
        clique = [(a, b) for a in range(200, 204) for b in range(a + 1, 204)]
        pair = [(300, 301)]
        edges = spark.createDataFrame(
            chain + clique + pair, "src long, dst long"
        ).repartition(16)  # force cross-partition chains
        node_ids = {x for e in chain + clique + pair for x in e} | {400, 401}
        nodes = spark.createDataFrame([(i,) for i in sorted(node_ids)], "id long")
        expected = (
            [(i, 100) for i in range(100, 131)]
            + [(i, 200) for i in range(200, 204)]
            + [(300, 300), (301, 300), (400, 400), (401, 401)]
        )
        return nodes, edges, sorted(expected)

    def test_single_task_path_matches_truth(self, spark):
        nodes, edges, expected = self._graph_long(spark)
        assert _labels(connected_components(nodes, edges)) == expected

    def test_loop_path_matches_truth(self, spark, monkeypatch):
        monkeypatch.setattr(cluster, "_SINGLE_TASK_EDGE_CAP", 0)
        nodes, edges, expected = self._graph_long(spark)
        assert _labels(connected_components(nodes, edges)) == expected

    def test_string_ids_fast_path_matches_truth(self, spark):
        # string node ids ('C<custkey>'/'S<suppkey>' shapes):
        # contraction's Python `<` must rank them like Spark's F.min
        # (binary/code-point order — identical for ASCII). Loop-path
        # comparison is deliberately absent: the loop's sum-based
        # convergence check predates this round and only supports
        # numeric ids (no registered caller feeds it strings).
        edges = spark.createDataFrame(
            [("C10", "S2"), ("S2", "C2"), ("C2", "S7"), ("X1", "X2")],
            "src string, dst string",
        ).repartition(8)
        nodes = spark.createDataFrame(
            [(x,) for x in ["C10", "C2", "S2", "S7", "X1", "X2", "Z9"]],
            "id string",
        )
        fast = _labels(connected_components(nodes, edges))
        assert fast == [
            ("C10", "C10"), ("C2", "C10"), ("S2", "C10"), ("S7", "C10"),
            ("X1", "X1"), ("X2", "X1"), ("Z9", "Z9"),
        ]

    def test_self_loops_only_graph_is_all_singletons(self, spark):
        edges = spark.createDataFrame([(5, 5), (7, 7)], "src long, dst long")
        nodes = spark.createDataFrame([(5,), (7,), (9,)], "id long")
        assert _labels(connected_components(nodes, edges)) == [
            (5, 5), (7, 7), (9, 9),
        ]

    def test_empty_edges_all_singletons(self, spark):
        edges = spark.createDataFrame([], "src long, dst long")
        nodes = spark.createDataFrame([(1,), (2,)], "id long")
        assert _labels(connected_components(nodes, edges)) == [(1, 1), (2, 2)]


class TestContractEdgesOperator:
    def test_contraction_preserves_connectivity_and_drops_roots(self, spark):
        # a path in ONE partition contracts to a star on the min id
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4)], "src long, dst long"
        ).coalesce(1)
        star = sorted(
            (r["src"], r["dst"]) for r in _contract_edges(edges, "src", "dst").collect()
        )
        assert star == [(2, 1), (3, 1), (4, 1)]

    def test_contraction_emits_nothing_for_empty_partitions(self, spark):
        edges = spark.createDataFrame([], "src long, dst long").repartition(4)
        assert _contract_edges(edges, "src", "dst").count() == 0
