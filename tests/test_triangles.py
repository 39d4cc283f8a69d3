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


# ---- DOULION sampled estimator ---------------------------------------------


def _keep(src, dst, seed, num, den):
    from neo4j_graph_algorithms_spark.operators.triangles import (
        DOULION_A,
        DOULION_B,
        DOULION_M,
    )

    h = ((src % DOULION_M) * DOULION_A + (dst % DOULION_M) * DOULION_B + seed) % DOULION_M
    return h % den < num


def test_doulion_keep_all_equals_exact(spark):
    from neo4j_graph_algorithms_spark.operators.triangles import triangle_count_sampled

    ids = names_to_ids(F4_NODES)
    edges = edge_df(spark, parse_edges(F4_EDGES, ids))
    row = triangle_count_sampled(spark, edges, p_num=1, p_den=1).collect()[0]
    assert row.n_edges_kept == 11
    assert row.tri_sampled == 3
    assert row.est_triangles == 3.0


def test_doulion_matches_python_replay_and_is_deterministic(spark):
    from neo4j_graph_algorithms_spark.operators.triangles import triangle_count_sampled

    # K6 on vids 0..5: 15 edges, 20 triangles — dense enough that p=1/2
    # keeps a nontrivial subgraph
    pairs = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    kept = [(s, d) for s, d in pairs if _keep(s, d, 7, 1, 2)]
    exp_tris = sum(
        1
        for i in range(6)
        for j in range(i + 1, 6)
        for k in range(j + 1, 6)
        if ((i, j) in kept and (j, k) in kept and (i, k) in kept)
    )
    got = triangle_count_sampled(spark, edge_df(spark, pairs), p_num=1, p_den=2, seed=7)
    r1, r2 = got.collect()[0], got.collect()[0]
    assert r1 == r2  # deterministic coin: identical on re-execution
    assert r1.n_edges_kept == len(kept)
    assert r1.tri_sampled == exp_tris
    assert r1.est_triangles == pytest.approx(exp_tris * 8.0)


def test_doulion_coin_is_per_undirected_edge(spark):
    from neo4j_graph_algorithms_spark.operators.triangles import triangle_count_sampled

    # both orientations + a parallel duplicate of the same edge collapse to
    # ONE canonical pair before the coin, so kept-count is 0 or 1, never 2
    pairs = [(3, 9), (9, 3), (3, 9)]
    row = triangle_count_sampled(spark, edge_df(spark, pairs), p_num=1, p_den=2, seed=7).collect()[0]
    assert row.n_edges_kept == (1 if _keep(3, 9, 7, 1, 2) else 0)


def test_doulion_rejects_bad_rate(spark):
    from neo4j_graph_algorithms_spark.operators.triangles import triangle_count_sampled

    with pytest.raises(ValueError):
        triangle_count_sampled(spark, edge_df(spark, [(0, 1)]), p_num=3, p_den=2)


# ---- edge embeddedness / neighborhood overlap ------------------------------


def test_edge_embeddedness_known_answer(spark):
    from neo4j_graph_algorithms_spark.operators.triangles import edge_embeddedness

    # triangle {0,1,2} + pendant 2-3: edge (0,1) has common={2},
    # overlap = 1/(2+2-2-1) = 1; edge (1,2) common={0}, deg2=3 →
    # 1/(2+3-2-1) = 0.5; bridge (2,3): common 0, overlap 0
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3)]
    got = {
        (r.src, r.dst): (r.common, r.overlap)
        for r in edge_embeddedness(spark, edge_df(spark, pairs)).collect()
    }
    assert got == {
        (0, 1): (1, 1.0),
        (1, 2): (1, 0.5),
        (0, 2): (1, 0.5),
        (2, 3): (0, 0.0),
    }


def test_edge_embeddedness_python_replay(spark):
    from neo4j_graph_algorithms_spark.operators.triangles import edge_embeddedness

    pairs = sorted({((i * 5 + 2) % 12, (i * i + 1) % 12) for i in range(40)})
    pairs = [(s, d) for s, d in pairs if s != d]
    und = sorted({(min(s, d), max(s, d)) for s, d in pairs})
    nbr = {}
    for s, d in und:
        nbr.setdefault(s, set()).add(d)
        nbr.setdefault(d, set()).add(s)
    exp = {}
    for s, d in und:
        c = len(nbr[s] & nbr[d])
        den = len(nbr[s]) + len(nbr[d]) - 2 - c
        exp[(s, d)] = (c, round(c / den, 6) if den > 0 else 0.0)
    got = {
        (r.src, r.dst): (r.common, r.overlap)
        for r in edge_embeddedness(spark, edge_df(spark, pairs)).collect()
    }
    assert got == exp


def test_edge_embeddedness_isolated_dyad(spark):
    from neo4j_graph_algorithms_spark.operators.triangles import edge_embeddedness

    # two deg-1 endpoints: empty other-neighbor union → overlap 0.0, not NaN
    got = edge_embeddedness(spark, edge_df(spark, [(5, 9)])).collect()
    assert [(r.src, r.dst, r.common, r.overlap) for r in got] == [(5, 9, 0, 0.0)]
