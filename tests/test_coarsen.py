"""Matching-contraction coarsening (operators/coarsen.py)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.operators.coarsen import coarsen_by_matching
from neo4j_graph_algorithms_spark.operators.matching import maximal_matching
from tests.conftest import edge_df


def _expected_coarse(edges, pairs):
    """Engine-free contraction of the canonical simple base graph."""
    base = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    rep = {}
    for s, d in pairs:
        rep[s] = s
        rep[d] = s
    out = {}
    for a, b in base:
        s, d = rep.get(a, a), rep.get(b, b)
        if s == d:
            continue
        key = (min(s, d), max(s, d))
        out[key] = out.get(key, 0) + 1
    return out


def test_coarsen_k4_contracts_to_single_weighted_edge(spark):
    edges = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    df = edge_df(spark, edges)
    pairs = [(r.src, r.dst) for r in maximal_matching(spark, df).collect()]
    assert len(pairs) == 2  # K4 has a perfect matching
    got = {(r.src, r.dst): r.weight for r in coarsen_by_matching(spark, df).collect()}
    assert got == _expected_coarse(edges, pairs)
    assert sum(got.values()) == 4  # 6 base edges - 2 intra-pair


def test_coarsen_star_drops_only_the_matched_spoke(spark):
    edges = [(0, i) for i in range(1, 6)]
    df = edge_df(spark, edges)
    pairs = [(r.src, r.dst) for r in maximal_matching(spark, df).collect()]
    assert len(pairs) == 1  # a star admits exactly one matched edge
    got = {(r.src, r.dst): r.weight for r in coarsen_by_matching(spark, df).collect()}
    assert got == _expected_coarse(edges, pairs)
    assert len(got) == 4 and all(w == 1 for w in got.values())


def test_coarsen_explicit_matching_and_self_loops(spark):
    # self-loop (4,4) ignored; explicit matching overrides the greedy one
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 4), (4, 0)]
    df = edge_df(spark, edges)
    matching = spark.createDataFrame([(0, 1), (2, 3)], "src long, dst long")
    got = {
        (r.src, r.dst): r.weight
        for r in coarsen_by_matching(spark, df, matching=matching).collect()
    }
    assert got == _expected_coarse(edges, [(0, 1), (2, 3)])
    assert got == {(0, 2): 2, (0, 4): 1}


def test_coarsen_random_graphs_vs_python_and_reshard(spark):
    rng = random.Random(23)
    for _ in range(2):
        n = 25
        edges = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(60)})
        df = edge_df(spark, edges)
        pairs = [(r.src, r.dst) for r in maximal_matching(spark, df).collect()]
        got = {
            (r.src, r.dst): r.weight for r in coarsen_by_matching(spark, df).collect()
        }
        assert got == _expected_coarse(edges, pairs)
        # no self-loops, canonical order, coarse graph smaller
        assert all(s < d for s, d in got)
        got2 = {
            (r.src, r.dst): r.weight
            for r in coarsen_by_matching(spark, df.repartition(13)).collect()
        }
        assert got2 == got
