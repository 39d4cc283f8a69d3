"""Tier A / Tier B equivalence for triangle counting: the adjacency-array
intersection kernel must match the wedge+semi-join plan exactly (integer
counts — no float tolerance needed)."""

from __future__ import annotations

import itertools

import hypothesis.strategies as st
from hypothesis import given, settings

from neo4j_graph_algorithms_spark.csr.triangles import triangle_count_csr
from neo4j_graph_algorithms_spark.operators.triangles import triangle_count

from tests.conftest import edge_df


def _compare(spark, pairs, num_buckets=4):
    a_nodes, a_total = triangle_count(spark, edge_df(spark, pairs))
    b_nodes, b_total = triangle_count_csr(
        spark, edge_df(spark, pairs), num_buckets=num_buckets
    )
    assert a_total == b_total
    a = {r.vid: r.triangles for r in a_nodes.collect()}
    b = {r.vid: r.triangles for r in b_nodes.collect()}
    assert a == b
    return a_total


def test_csr_triangles_k5(spark):
    pairs = list(itertools.combinations(range(5), 2))
    assert _compare(spark, pairs) == 10  # C(5,3)


def test_csr_triangles_fixture(spark):
    # two triangles sharing an edge + a pendant + an isolated-from-triangles path
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (0, 3), (3, 4), (5, 6)]
    assert _compare(spark, pairs) == 2


def test_csr_triangles_triangle_free(spark):
    pairs = [(i, i + 1) for i in range(10)]
    assert _compare(spark, pairs) == 0


def test_csr_triangles_parallel_and_self_loops(spark):
    # duplicates / reverses / self-loops collapse identically in both tiers
    pairs = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2), (2, 2), (0, 1)]
    assert _compare(spark, pairs) == 1


@settings(max_examples=8, deadline=None)
@given(
    st.sets(
        st.tuples(st.integers(0, 13), st.integers(0, 13)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=40,
    )
)
def test_csr_triangles_random_equivalence(spark, pairs):
    _compare(spark, sorted(pairs), num_buckets=3)
