"""Luby maximal independent set (operators/mis.py)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.operators.mis import maximal_independent_set
from tests.conftest import edge_df


def _check_mis(edges, out_rows):
    """Independence + maximality + total coverage, engine-free."""
    und = set()
    for a, b in edges:
        if a != b:
            und.add((a, b))
            und.add((b, a))
    verts = {a for a, _ in und} | {b for _, b in und} | {
        v for e in edges for v in e
    }
    mis = {r.vid for r in out_rows if r.in_mis}
    decided = {r.vid for r in out_rows}
    assert decided == verts  # every vertex gets a row
    for a, b in und:
        assert not (a in mis and b in mis), f"edge ({a},{b}) inside MIS"
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
    for v in verts - mis:
        assert nbrs.get(v, set()) & mis, f"non-MIS vertex {v} uncovered"


def test_mis_path_graph_hand_check(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    out = maximal_independent_set(spark, edge_df(spark, edges)).collect()
    _check_mis(edges, out)
    assert all(r.round >= 1 for r in out)


def test_mis_star_graph(spark):
    # hub 0 vs 8 leaves: either the hub alone or all leaves
    edges = [(0, i) for i in range(1, 9)]
    out = maximal_independent_set(spark, edge_df(spark, edges)).collect()
    _check_mis(edges, out)
    mis = {r.vid for r in out if r.in_mis}
    assert mis == {0} or mis == set(range(1, 9))


def test_mis_isolated_and_self_loop_vertices(spark):
    # 5--5 self loop only; 9 isolated via explicit vertex in an edge to itself
    edges = [(0, 1), (5, 5), (9, 9)]
    out = maximal_independent_set(spark, edge_df(spark, edges)).collect()
    by = {r.vid: r for r in out}
    # self-loop-only vertices have no distinct neighbors -> in the set, round 1
    assert by[5].in_mis and by[5].round == 1
    assert by[9].in_mis and by[9].round == 1
    assert by[0].in_mis != by[1].in_mis


def test_mis_random_graphs_properties_and_reshard(spark):
    rng = random.Random(23)
    for _ in range(3):
        n = 30
        edges = sorted(
            {
                (rng.randrange(n), rng.randrange(n))
                for _ in range(70)
            }
        )
        edges = [(a, b) for a, b in edges if a != b]
        df = edge_df(spark, edges)
        out = maximal_independent_set(spark, df).collect()
        _check_mis(edges, out)
        # re-shard invariance: identical decisions AND rounds
        out2 = maximal_independent_set(spark, df.repartition(13)).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_mis_round_cap_raises(spark):
    edges = [(i, i + 1) for i in range(20)]
    with pytest.raises(RuntimeError, match="max_iterations"):
        maximal_independent_set(spark, edge_df(spark, edges), max_iterations=1)
