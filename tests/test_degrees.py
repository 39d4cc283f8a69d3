"""Degree centrality (operators/degrees.py)."""

from __future__ import annotations

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
