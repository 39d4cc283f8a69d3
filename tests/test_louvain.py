"""Louvain phase-1 tests: planted two-clique graph, modularity values."""

from __future__ import annotations

import itertools

import pytest

from neo4j_graph_algorithms_spark.operators.louvain import louvain, modularity_df

from tests.conftest import edge_df


def _two_cliques(spark):
    """K4 on {0..3} + K4 on {4..7} + one bridge 3-4."""
    pairs = (
        list(itertools.combinations(range(4), 2))
        + list(itertools.combinations(range(4, 8), 2))
        + [(3, 4)]
    )
    return edge_df(spark, pairs)


def test_louvain_finds_planted_cliques(spark):
    edges = _two_cliques(spark)
    got = {r.vid: r.community for r in louvain(spark, edges).collect()}
    assert got[0] == got[1] == got[2] == got[3]
    assert got[4] == got[5] == got[6] == got[7]
    assert got[0] != got[4]
    assert got[0] == 0 and got[4] == 4  # canonical min-member ids


def test_modularity_of_planted_partition(spark):
    edges = _two_cliques(spark)
    assign = spark.createDataFrame(
        [(i, 0 if i < 4 else 4) for i in range(8)], "vid long, community long"
    )
    q = modularity_df(spark, edges, assign).collect()[0].modularity
    # m=13; w_in=6 each; deg(c)=13 each: Q = 2*(6/13 - (13/26)^2) = 12/13 - 1/2
    assert q == pytest.approx(round(12 / 13 - 0.5, 6))


def test_modularity_singleton_partition_negative(spark):
    edges = edge_df(spark, [(0, 1), (1, 2)])
    assign = spark.createDataFrame([(i, i) for i in range(3)], "vid long, community long")
    q = modularity_df(spark, edges, assign).collect()[0].modularity
    # all edges cross communities: Q = -Σ (deg_c/2m)^2 = -(1/16 + 4/16 + 1/16)
    assert q == pytest.approx(-6 / 16)


def test_louvain_improves_modularity_over_singletons(spark):
    edges = _two_cliques(spark)
    assign = louvain(spark, edges)
    q = modularity_df(spark, edges, assign).collect()[0].modularity
    assert q == pytest.approx(round(12 / 13 - 0.5, 6))


def test_louvain_empty(spark):
    empty = edge_df(spark, [])
    assert louvain(spark, empty).count() == 0
