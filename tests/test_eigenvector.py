"""Eigenvector centrality (operators/eigenvector.py) vs a numpy mirror."""

from __future__ import annotations

import numpy as np
import pytest

from neo4j_graph_algorithms_spark.operators.eigenvector import eigenvector
from tests.conftest import edge_df

TRI_PENDANT = [(0, 1), (1, 2), (2, 0), (0, 3), (3, 4)]


def _numpy_power(pairs, n_vertices, iterations):
    A = np.zeros((n_vertices, n_vertices))
    for s, d in pairs:
        if s != d:
            A[s, d] = A[d, s] = 1.0
    x = np.ones(n_vertices)
    for _ in range(iterations):
        x = A @ x
        n = np.linalg.norm(x)
        x = x / (n if n > 0 else 1.0)
    return x


def test_matches_numpy_mirror(spark):
    res = eigenvector(spark, edge_df(spark, TRI_PENDANT), max_iterations=20)
    got = {r["vid"]: r["score"] for r in res.state.collect()}
    want = _numpy_power(TRI_PENDANT, 5, 20)
    for v in range(5):
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_l2_norm_and_symmetry(spark):
    res = eigenvector(spark, edge_df(spark, TRI_PENDANT), max_iterations=20)
    got = {r["vid"]: r["score"] for r in res.state.collect()}
    assert sum(v * v for v in got.values()) == pytest.approx(1.0, abs=1e-9)
    # 1 and 2 are automorphic; 0 is the most central, 4 the least
    assert got[1] == pytest.approx(got[2], abs=1e-12)
    assert got[0] > got[1] > got[3] > got[4] > 0


def test_isolated_vertex_scores_zero(spark):
    verts = edge_df(spark, TRI_PENDANT).sparkSession.createDataFrame(
        [(i,) for i in range(6)], "vid long"
    )
    res = eigenvector(
        spark, edge_df(spark, TRI_PENDANT), vertices=verts, max_iterations=5
    )
    got = {r["vid"]: r["score"] for r in res.state.collect()}
    assert got[5] == 0.0


def test_edgeless_graph_all_zero(spark):
    empty = spark.createDataFrame([], "src long, dst long, weight double")
    verts = spark.createDataFrame([(0,), (1,)], "vid long")
    res = eigenvector(spark, empty, vertices=verts, max_iterations=3)
    assert {r["score"] for r in res.state.collect()} == {0.0}


def test_resume(spark, tmp_path):
    ckpt = str(tmp_path / "eig")
    cold = eigenvector(
        spark, edge_df(spark, TRI_PENDANT), max_iterations=10,
        checkpoint_dir=ckpt, checkpoint_interval=2,
    )
    warm = eigenvector(
        spark, edge_df(spark, TRI_PENDANT), max_iterations=10,
        checkpoint_dir=ckpt, resume=True,
    )
    a = sorted(map(tuple, cold.state.collect()))
    b = sorted(map(tuple, warm.state.collect()))
    assert a == pytest.approx(b)
