"""Greedy maximal matching (operators/matching.py)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.operators.matching import maximal_matching
from tests.conftest import edge_df


def _check_matching(edges, out_rows):
    """Valid matching + maximality, engine-free."""
    canon = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    got = {(r.src, r.dst) for r in out_rows}
    assert got <= canon  # only real edges
    used = [v for e in got for v in e]
    assert len(used) == len(set(used))  # each vertex matched at most once
    matched_v = set(used)
    for a, b in canon:  # maximal: no edge with both endpoints free
        assert a in matched_v or b in matched_v, f"augmentable edge ({a},{b})"


def test_matching_path_graph(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    out = maximal_matching(spark, edge_df(spark, edges)).collect()
    _check_matching(edges, out)
    assert len(out) == 2  # any maximal matching of P5 has exactly 2 edges


def test_matching_star_graph(spark):
    edges = [(0, i) for i in range(1, 9)]
    out = maximal_matching(spark, edge_df(spark, edges)).collect()
    _check_matching(edges, out)
    assert len(out) == 1  # the hub can match only once


def test_matching_self_loops_and_parallel_edges(spark):
    edges = [(0, 1), (1, 0), (2, 2), (0, 1)]
    out = maximal_matching(spark, edge_df(spark, edges)).collect()
    assert [(r.src, r.dst, r.round) for r in out] == [(0, 1, 1)]


def test_matching_empty_graph(spark):
    empty = spark.createDataFrame([], "src long, dst long, weight double")
    assert maximal_matching(spark, empty).count() == 0


def test_matching_random_graphs_properties_and_reshard(spark):
    rng = random.Random(31)
    for _ in range(3):
        n = 30
        edges = sorted(
            {(rng.randrange(n), rng.randrange(n)) for _ in range(70)}
        )
        edges = [(a, b) for a, b in edges if a != b]
        df = edge_df(spark, edges)
        out = maximal_matching(spark, df).collect()
        _check_matching(edges, out)
        out2 = maximal_matching(spark, df.repartition(13)).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_matching_round_cap_raises(spark):
    edges = [(i, i + 1) for i in range(40)]
    with pytest.raises(RuntimeError, match="max_iterations"):
        maximal_matching(spark, edge_df(spark, edges), max_iterations=1)
