"""SALSA operator: analytic fixed point + plan-shape conventions.

The load-bearing test is the closed form: on a connected support where
every vertex has both in- and out-edges, the SALSA chain's stationary
authority distribution is indeg(v)/|E| and the hub distribution
outdeg(u)/|E| (Lempel & Moran 2000, §3.1) — an ITERATIVE superstep run
whose fixpoint is analytic, cross-checking the whole runner stack.
"""

from __future__ import annotations

import pytest

from neo4j_graph_algorithms_spark.operators.salsa import salsa
from tests.conftest import edge_df


def test_salsa_closed_form_on_connected_support(spark):
    # directed cycle 0→1→2→3→0 plus chords; every vertex has in+out edges,
    # and the bipartite support is connected
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (2, 0), (1, 3)]
    res = salsa(spark, edge_df(spark, pairs), max_iterations=60)
    got = {r.vid: (r.auth, r.hub) for r in res.state.collect()}
    m = len(pairs)
    indeg = {v: sum(1 for _, d in pairs if d == v) for v in range(4)}
    outdeg = {v: sum(1 for s, _ in pairs if s == v) for v in range(4)}
    # convergence is geometric (rate = the chain's |lambda_2|, ~0.8 on this
    # fixture), so 60 iterations land ~3e-7 from the fixpoint — assert 1e-6
    for v in range(4):
        assert got[v][0] == pytest.approx(indeg[v] / m, abs=1e-6)
        assert got[v][1] == pytest.approx(outdeg[v] / m, abs=1e-6)


def test_salsa_multigraph_parallel_edges_count(spark):
    # parallel edge 0→1 lifts 1's in-mass: indeg(1)=3 of m=7 (a dedup bug
    # would give 2 of 6).  Both chains are connected AND aperiodic here
    # (0 co-cites 1 twice → authority self-loop), so the closed form holds;
    # the [(0,1),(0,1),(1,0),(1,2),(2,0)] fixture it replaces had TWO
    # closed recurrent classes ({1} absorbing) and no unique fixpoint.
    pairs = [(0, 1), (0, 1), (0, 2), (1, 0), (2, 0), (1, 2), (2, 1)]
    res = salsa(spark, edge_df(spark, pairs), max_iterations=60)
    got = {r.vid: (r.auth, r.hub) for r in res.state.collect()}
    m = len(pairs)
    assert got[1][0] == pytest.approx(3 / m, abs=1e-6)
    assert got[0][1] == pytest.approx(3 / m, abs=1e-6)


def test_salsa_star_sinks_hold_zero_hub(spark):
    # 1,2,3 → 0: 0 has no out-edges (hub 0); 1,2,3 no in-edges (auth 0);
    # L1 normalization keeps each half-step a probability distribution
    res = salsa(spark, edge_df(spark, [(1, 0), (2, 0), (3, 0)]), max_iterations=3)
    got = {r.vid: (r.auth, r.hub) for r in res.state.collect()}
    assert got[0][0] == pytest.approx(1.0)
    assert got[0][1] == pytest.approx(0.0)
    for v in (1, 2, 3):
        assert got[v][0] == pytest.approx(0.0)
        assert got[v][1] == pytest.approx(1 / 3)
    assert sum(a for a, _ in got.values()) == pytest.approx(1.0)
    assert sum(h for _, h in got.values()) == pytest.approx(1.0)


def test_salsa_edgeless_graph_zero_scores(spark):
    verts = spark.createDataFrame([(0,), (1,)], "vid long")
    empty = spark.createDataFrame([], "src long, dst long")
    res = salsa(spark, empty, vertices=verts, max_iterations=2)
    got = {r.vid: (r.auth, r.hub) for r in res.state.collect()}
    assert got == {0: (0.0, 0.0), 1: (0.0, 0.0)}


def test_salsa_superstep_never_broadcasts_state(spark):
    pairs = [(i, (i + 1) % 12) for i in range(12)] + [(0, 5), (3, 9)]
    res = salsa(spark, edge_df(spark, pairs), max_iterations=2)
    plan = res.first_plan
    assert plan is not None
    # scalar norm fold is a broadcast nested-loop cross join (1 row — fine);
    # vertex-state joins must stay shuffle-based
    assert "BroadcastHashJoin" not in plan, plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan, plan
