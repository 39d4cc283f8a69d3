"""Directed triad census: one known-answer fixture per motif class, plus the
sum-equals-undirected-triangle-total and direction-collapse invariants."""

from __future__ import annotations

import pytest

from neo4j_graph_algorithms_spark.operators.motifs import MOTIFS, triad_census
from neo4j_graph_algorithms_spark.operators.triangles import triangle_count
from tests.conftest import edge_df


def census(spark, pairs):
    got = {r.motif: r.n for r in triad_census(spark, edge_df(spark, pairs)).collect()}
    assert sorted(got) == MOTIFS  # zero-filled, stable 7-row contract
    return {k: v for k, v in got.items() if v}


@pytest.mark.parametrize(
    "pairs,expected",
    [
        # transitive: 0->1->2, 0->2
        ([(0, 1), (1, 2), (0, 2)], {"030T": 1}),
        # cycle: 0->1->2->0
        ([(0, 1), (1, 2), (2, 0)], {"030C": 1}),
        # dyad {0,1} mutual, both -> 2
        ([(0, 1), (1, 0), (0, 2), (1, 2)], {"120D": 1}),
        # dyad {0,1} mutual, 2 -> both
        ([(0, 1), (1, 0), (2, 0), (2, 1)], {"120U": 1}),
        # dyad {0,1} mutual, 0->2, 2->1 (cycle through the dyad)
        ([(0, 1), (1, 0), (0, 2), (2, 1)], {"120C": 1}),
        # two mutual pairs, one asymmetric
        ([(0, 1), (1, 0), (1, 2), (2, 1), (0, 2)], {"210": 1}),
        # all mutual
        ([(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0)], {"300": 1}),
    ],
)
def test_each_motif_class(spark, pairs, expected):
    assert census(spark, pairs) == expected


def test_rotations_and_relabelings_classify_identically(spark):
    # 030C under the other rotation (0<-1<-2<-0) and 030T under a
    # different linear order both land in the same classes
    assert census(spark, [(1, 0), (2, 1), (0, 2)]) == {"030C": 1}
    assert census(spark, [(2, 0), (0, 1), (2, 1)]) == {"030T": 1}
    # 120D with the mutual dyad on the (b,c) and (a,c) vid-pairs instead
    assert census(spark, [(1, 2), (2, 1), (1, 0), (2, 0)]) == {"120D": 1}
    assert census(spark, [(0, 2), (2, 0), (0, 1), (2, 1)]) == {"120D": 1}


def test_parallel_edges_and_self_loops_collapse(spark):
    pairs = [(0, 1), (0, 1), (1, 2), (2, 0), (1, 1)]
    assert census(spark, pairs) == {"030C": 1}


def test_census_total_equals_undirected_triangle_count(spark):
    # pseudo-random directed graph on 14 vertices
    pairs = sorted({((i * 7 + 3) % 14, (i * i + 5 * i) % 14) for i in range(60)})
    pairs = [(s, d) for s, d in pairs if s != d]
    got = {r.motif: r.n for r in triad_census(spark, edge_df(spark, pairs)).collect()}
    _, total = triangle_count(spark, edge_df(spark, pairs))
    assert sum(got.values()) == total > 0
