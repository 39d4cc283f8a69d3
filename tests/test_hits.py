"""HITS operator: known-answer fixed points + plan-shape conventions."""

from __future__ import annotations

import math

import pytest

from neo4j_graph_algorithms_spark.operators.hits import hits
from tests.conftest import edge_df


def test_hits_star_fixed_point(spark):
    # 1,2,3 all point at 0: auth concentrates on 0, hubs split evenly
    res = hits(spark, edge_df(spark, [(1, 0), (2, 0), (3, 0)]), max_iterations=3)
    got = {r.vid: (r.auth, r.hub) for r in res.state.collect()}
    assert got[0][0] == pytest.approx(1.0)
    assert got[0][1] == pytest.approx(0.0)
    for v in (1, 2, 3):
        assert got[v][0] == pytest.approx(0.0)
        assert got[v][1] == pytest.approx(1 / math.sqrt(3))


def test_hits_chain_asymmetry(spark):
    # 0->1->2: vertex 1 is both hub and authority; 0 pure hub; 2 pure auth
    res = hits(spark, edge_df(spark, [(0, 1), (1, 2)]), max_iterations=20)
    got = {r.vid: (r.auth, r.hub) for r in res.state.collect()}
    assert got[0][0] == pytest.approx(0.0)
    assert got[2][1] == pytest.approx(0.0)
    assert got[1][0] > 0 and got[1][1] > 0
    # L2 norms are 1
    assert sum(a * a for a, _ in got.values()) == pytest.approx(1.0)
    assert sum(h * h for _, h in got.values()) == pytest.approx(1.0)


def test_hits_edgeless_graph_zero_scores(spark):
    verts = spark.createDataFrame([(0,), (1,)], "vid long")
    empty = spark.createDataFrame([], "src long, dst long")
    res = hits(spark, empty, vertices=verts, max_iterations=2)
    got = {r.vid: (r.auth, r.hub) for r in res.state.collect()}
    assert got == {0: (0.0, 0.0), 1: (0.0, 0.0)}


def test_hits_superstep_never_broadcasts_state(spark):
    pairs = [(i, (i + 1) % 12) for i in range(12)] + [(0, 5), (3, 9)]
    res = hits(spark, edge_df(spark, pairs), max_iterations=2)
    plan = res.first_plan
    assert plan is not None
    # scalar norm fold is a broadcast nested-loop cross join (1 row — fine);
    # vertex-state joins must stay shuffle-based
    assert "BroadcastHashJoin" not in plan, plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan, plan
