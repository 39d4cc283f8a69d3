"""Degree centrality (operators/degrees.py)."""

from __future__ import annotations

import pytest

from neo4j_graph_algorithms_spark.operators.degrees import degree_centrality
from tests.conftest import edge_df


def test_degree_hand_values(spark):
    # multigraph: parallel edge 0→1 twice, plus 1→0 (reverse), 1→2, self 2→2
    pairs = [(0, 1), (0, 1), (1, 0), (1, 2), (2, 2)]
    got = {r["vid"]: (r["out_deg"], r["in_deg"], r["deg"]) for r in
           degree_centrality(spark, edge_df(spark, pairs)).collect()}
    # out/in count parallel edges and self-loops; deg is undirected-simple
    assert got[0] == (2, 1, 1)   # distinct neighbors of 0: {1}
    assert got[1] == (2, 2, 2)   # {0, 2}
    assert got[2] == (1, 2, 1)   # {1} (self-loop dropped in simple view)


def test_degree_isolated_vertex_zero(spark):
    verts = None
    edges = edge_df(spark, [(0, 1)])
    verts = edges.sparkSession.createDataFrame([(0,), (1,), (7,)], "vid long")
    got = {r["vid"]: (r["out_deg"], r["in_deg"], r["deg"]) for r in
           degree_centrality(spark, edges, vertices=verts).collect()}
    assert got[7] == (0, 0, 0)
    assert got[0] == (1, 0, 1)


def test_degree_assortativity_signs(spark):
    from neo4j_graph_algorithms_spark.operators.degrees import degree_assortativity
    from tests.conftest import edge_df

    # star = maximally disassortative (r = -1)
    star = [(0, i) for i in range(1, 6)]
    r = degree_assortativity(spark, edge_df(spark, star)).collect()[0]["assortativity"]
    assert r == pytest.approx(-1.0)
    # two disjoint cliques of different sizes: every endpoint pair has equal
    # degrees -> r = 1
    k3 = [(a, b) for a in range(3) for b in range(3) if a < b]
    k4 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    r2 = degree_assortativity(spark, edge_df(spark, k3 + k4)).collect()[0]["assortativity"]
    assert r2 == pytest.approx(1.0)
