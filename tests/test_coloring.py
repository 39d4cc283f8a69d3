"""Jones-Plassmann greedy coloring (operators/coloring.py)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.operators.coloring import greedy_coloring
from tests.conftest import edge_df


def _check_coloring(edges, out_rows):
    """Proper + complete + within max-degree+1 colors, engine-free."""
    und = {}
    verts = set()
    for a, b in edges:
        verts |= {a, b}
        if a != b:
            und.setdefault(a, set()).add(b)
            und.setdefault(b, set()).add(a)
    col = {r.vid: r.color for r in out_rows}
    assert set(col) == verts
    for v, nbrs in und.items():
        for u in nbrs:
            assert col[v] != col[u], f"edge ({v},{u}) monochromatic"
    max_deg = max((len(n) for n in und.values()), default=0)
    assert max(col.values(), default=0) <= max_deg
    assert all(c >= 0 for c in col.values())


def test_coloring_path_graph(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    out = greedy_coloring(spark, edge_df(spark, edges)).collect()
    _check_coloring(edges, out)
    assert max(r.color for r in out) <= 2  # paths are 2-colorable; greedy <= 2


def test_coloring_complete_graph(spark):
    # K5 needs exactly 5 colors under any proper coloring
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    out = greedy_coloring(spark, edge_df(spark, edges)).collect()
    _check_coloring(edges, out)
    assert sorted(r.color for r in out) == [0, 1, 2, 3, 4]


def test_coloring_star_and_isolated(spark):
    edges = [(0, i) for i in range(1, 9)] + [(9, 9)]
    out = greedy_coloring(spark, edge_df(spark, edges)).collect()
    _check_coloring(edges, out)
    by = {r.vid: r for r in out}
    assert {by[i].color for i in range(1, 9)} == {by[1].color}  # leaves share
    assert by[0].color != by[1].color
    assert by[9].color == 0 and by[9].round == 1  # self-loop-only vertex


def test_coloring_random_graphs_properties_and_reshard(spark):
    rng = random.Random(47)
    for _ in range(3):
        n = 30
        edges = sorted(
            {(rng.randrange(n), rng.randrange(n)) for _ in range(80)}
        )
        edges = [(a, b) for a, b in edges if a != b]
        df = edge_df(spark, edges)
        out = greedy_coloring(spark, df).collect()
        _check_coloring(edges, out)
        out2 = greedy_coloring(spark, df.repartition(13)).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_coloring_hub_warning_and_round_cap(spark):
    edges = [(0, i) for i in range(1, 30)]
    with pytest.warns(RuntimeWarning, match="exceed degree"):
        out = greedy_coloring(
            spark, edge_df(spark, edges), max_degree_warn=10
        ).collect()
    _check_coloring(edges, out)
    with pytest.raises(RuntimeError, match="max_iterations"):
        greedy_coloring(spark, edge_df(spark, edges), max_iterations=0)
