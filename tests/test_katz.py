"""Katz centrality: hand values, tolerance stop, plan shape."""

import pytest

from neo4j_graph_algorithms_spark.operators.katz import katz
from tests.conftest import edge_df


def test_chain_hand_values(spark):
    # 0 -> 1 -> 2, alpha=0.5, beta=1: katz = beta + sum over incoming walks
    # score(0)=1; score(1)=1+0.5; score(2)=1+0.5+0.25
    res = katz(spark, edge_df(spark, [(0, 1), (1, 2)]), alpha=0.5, max_iterations=10)
    got = {r["vid"]: r["score"] for r in res.state.collect()}
    assert got[0] == pytest.approx(1.0)
    assert got[1] == pytest.approx(1.5)
    assert got[2] == pytest.approx(1.75)


def test_parallel_edges_count_twice(spark):
    # multigraph: two parallel 0->1 edges double the walk count
    res = katz(spark, edge_df(spark, [(0, 1), (0, 1)]), alpha=0.5, max_iterations=5)
    got = {r["vid"]: r["score"] for r in res.state.collect()}
    assert got[1] == pytest.approx(1.0 + 2 * 0.5)


def test_tolerance_stops_early_and_matches_fixed(spark):
    pairs = [(i, (i + 1) % 6) for i in range(6)]
    fixed = katz(spark, edge_df(spark, pairs), alpha=0.1, max_iterations=40)
    tol = katz(spark, edge_df(spark, pairs), alpha=0.1, max_iterations=40,
               tolerance=1e-9)
    assert tol.iterations < 40
    a = {r["vid"]: r["score"] for r in fixed.state.collect()}
    b = {r["vid"]: r["score"] for r in tol.state.collect()}
    assert all(abs(a[k] - b[k]) < 1e-6 for k in a)


def test_superstep_never_broadcasts_state(spark):
    res = katz(spark, edge_df(spark, [(i, (i + 1) % 8) for i in range(8)]),
               max_iterations=2)
    assert "BroadcastHashJoin" not in res.first_plan


def test_katz_checkpoint_resume(spark, tmp_path):
    pairs = [(i, (i + 1) % 10) for i in range(10)]
    cold = katz(spark, edge_df(spark, pairs), alpha=0.2, max_iterations=12)
    ck = str(tmp_path / "katz")
    katz(spark, edge_df(spark, pairs), alpha=0.2, max_iterations=12,
         checkpoint_dir=ck)
    resumed = katz(spark, edge_df(spark, pairs), alpha=0.2, max_iterations=12,
                   checkpoint_dir=ck, resume=True)
    a = {r["vid"]: r["score"] for r in cold.state.collect()}
    b = {r["vid"]: r["score"] for r in resumed.state.collect()}
    assert all(abs(a[k] - b[k]) < 1e-12 for k in a)
