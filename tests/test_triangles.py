import pytest
"""Triangles vs reference fixtures (TriangleProcTest.java:62-147,
ClusteringCoefficientWikiTest.java:58-102)."""

import math

from neo4j_graph_algorithms_spark.operators.triangles import (
    average_clustering_coefficient,
    clustering_coefficients,
    triangle_count,
    triangle_stream,
)
from tests.conftest import collect_map, edge_df, names_to_ids, parse_edges

# F4: 9 nodes a..i, 3 triangles (abc, def, ghi), every node count 1
F4_NODES = "abcdefghi"
F4_EDGES = "a>b, b>c, c>a, c>h, d>e, e>f, f>d, b>d, g>h, h>i, i>g"

# F5: 4 nodes, undirected a-b, a-c, a-d, b-d
F5_NODES = "abcd"
F5_EDGES = "a>b, a>c, a>d, b>d"


def test_triangle_count_fixture(spark):
    ids = names_to_ids(F4_NODES)
    edges = edge_df(spark, parse_edges(F4_EDGES, ids))
    per_node, total = triangle_count(spark, edges)
    assert total == 3
    counts = collect_map(per_node, "vid", "triangles")
    assert counts == {i: 1 for i in range(9)}


def test_triangle_stream_fixture(spark):
    ids = names_to_ids(F4_NODES)
    edges = edge_df(spark, parse_edges(F4_EDGES, ids))
    tris = {(r.a, r.b, r.c) for r in triangle_stream(spark, edges).collect()}
    expect = {
        tuple(sorted((ids["a"], ids["b"], ids["c"]))),
        tuple(sorted((ids["d"], ids["e"], ids["f"]))),
        tuple(sorted((ids["g"], ids["h"], ids["i"]))),
    }
    assert tris == expect


def test_triangle_reverse_duplicate_edges_collapse(spark):
    """Directed duplicates / reverse edges / self-loops must not create
    extra triangles (Direction.BOTH simple-graph semantics)."""
    edges = edge_df(
        spark,
        [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2), (2, 2)],
    )
    _, total = triangle_count(spark, edges)
    assert total == 1


def test_clustering_coefficients_fixture(spark):
    ids = names_to_ids(F5_NODES)
    edges = edge_df(spark, parse_edges(F5_EDGES, ids))
    coeffs = clustering_coefficients(spark, edges)
    m = collect_map(coeffs, "vid", "coefficient")
    assert math.isclose(m[ids["a"]], 1 / 3, abs_tol=0.1)
    assert math.isclose(m[ids["b"]], 1.0, abs_tol=1e-9)
    assert math.isclose(m[ids["c"]], 0.0, abs_tol=1e-9)
    assert math.isclose(m[ids["d"]], 1.0, abs_tol=1e-9)
    assert math.isclose(average_clustering_coefficient(coeffs), 0.583, abs_tol=0.01)


def test_triangle_count_includes_zero_nodes(spark):
    # isolated vertex via explicit vertices frame
    edges = edge_df(spark, [(0, 1), (1, 2), (2, 0)])
    verts = spark.createDataFrame([(i,) for i in range(4)], "vid long")
    per_node, total = triangle_count(spark, edges, vertices=verts)
    counts = collect_map(per_node, "vid", "triangles")
    assert total == 1
    assert counts == {0: 1, 1: 1, 2: 1, 3: 0}


def test_transitivity_known_values(spark):
    from neo4j_graph_algorithms_spark.operators.triangles import transitivity
    from tests.conftest import edge_df

    # triangle: 3 wedges, 1 triangle -> 3*1/3 = 1
    tri = [(0, 1), (1, 2), (0, 2)]
    assert transitivity(spark, edge_df(spark, tri)).collect()[0]["transitivity"] == 1.0
    # path 0-1-2: 1 wedge, 0 triangles -> 0
    path = [(0, 1), (1, 2)]
    assert transitivity(spark, edge_df(spark, path)).collect()[0]["transitivity"] == 0.0
    # triangle + pendant at 2: wedges = 1+1+3 = 5 -> 3/5
    pend = tri + [(2, 3)]
    assert transitivity(spark, edge_df(spark, pend)).collect()[0]["transitivity"] == 0.6
