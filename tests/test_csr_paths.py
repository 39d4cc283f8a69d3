"""Tier A / Tier B equivalence for SSSP: sssp_csr must match the DataFrame
implementation bit-for-bit (same float64 addends, order-independent min)."""

from __future__ import annotations

from neo4j_graph_algorithms_spark.csr.paths import sssp_csr
from neo4j_graph_algorithms_spark.operators.paths import sssp
from tests.conftest import edge_df


def _dists(df):
    return {r.vid: r.dist for r in df.collect()}


def test_csr_matches_tier_a_weighted_chains(spark):
    # the delta-stepping fixture shape: three parallel chains S→X
    pairs = [(0, 1), (1, 4), (0, 2), (2, 4), (0, 3), (3, 4), (4, 5)]
    weights = [1.0, 7.0, 3.0, 5.0, 5.0, 3.0, 2.0]
    edges = edge_df(spark, pairs, weights)
    a = _dists(sssp(spark, edges, source=0))
    b = _dists(sssp_csr(spark, edges, source=0, num_buckets=3))
    assert a == b
    assert b[4] == 8.0 and b[5] == 10.0


def test_csr_multi_edges_and_directions(spark):
    pairs = [(0, 1), (0, 1), (1, 2), (2, 0)]
    weights = [5.0, 2.0, 1.0, 1.0]
    edges = edge_df(spark, pairs, weights)
    for direction in ("OUTGOING", "INCOMING", "BOTH"):
        a = _dists(sssp(spark, edges, source=0, direction=direction))
        b = _dists(sssp_csr(spark, edges, source=0, direction=direction, num_buckets=2))
        assert a == b, direction


def test_csr_unreachable_absent(spark):
    edges = edge_df(spark, [(0, 1), (5, 6)], [1.0, 1.0])
    got = _dists(sssp_csr(spark, edges, source=0, num_buckets=2))
    assert got == {0: 0.0, 1: 1.0}
