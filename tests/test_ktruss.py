"""k-truss peel: known-answer graphs, fixpoint behavior, stats."""

import pytest

from neo4j_graph_algorithms_spark.operators.ktruss import ktruss, truss_stats
from tests.conftest import edge_df


def test_k4_keeps_only_the_clique(spark):
    # K4 on {0,1,2,3} (every edge in 2 triangles) + a pendant triangle 3-4-5
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    extra = [(3, 4), (4, 5), (3, 5)]
    out = sorted(map(tuple, ktruss(spark, edge_df(spark, k4 + extra), k=4).collect()))
    assert out == sorted(k4)


def test_k3_keeps_triangle_drops_tail(spark):
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
    out = sorted(map(tuple, ktruss(spark, edge_df(spark, pairs), k=3).collect()))
    assert out == [(0, 1), (0, 2), (1, 2)]


def test_cascading_peel(spark):
    # two triangles sharing edge (1,2): each edge is in exactly 1 triangle
    # except (1,2) with 2 — k=4 first drops the outer edges, then (1,2):
    # the fixpoint is empty, requiring >1 round (exercises the loop)
    pairs = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    out = ktruss(spark, edge_df(spark, pairs), k=4).collect()
    assert out == []


def test_k_below_3_rejected_and_stats(spark):
    with pytest.raises(ValueError):
        ktruss(spark, edge_df(spark, [(0, 1)]), k=2)
    tri = edge_df(spark, [(0, 1), (1, 2), (0, 2)])
    stats = truss_stats(spark, ktruss(spark, tri, k=3)).collect()[0]
    assert (stats["n_edges"], stats["n_vertices"]) == (3, 3)


def test_max_rounds_cap_warns(spark):
    pairs = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    with pytest.warns(RuntimeWarning):
        ktruss(spark, edge_df(spark, pairs), k=4, max_rounds=1)
