"""Betweenness (Brandes/RA-Brandes) and MST (Borůvka) tests — fixtures from
BetweennessCentralityTest.java:57-163 and MSTPrimTest.java:38-75, plus a
pure-Python Brandes oracle on a random-ish small graph."""

from __future__ import annotations

from collections import defaultdict, deque

import pytest

from neo4j_graph_algorithms_spark.operators.betweenness import (
    betweenness,
    betweenness_sampled,
)
from neo4j_graph_algorithms_spark.operators.mst import mst, mst_stats

from tests.conftest import edge_df


def py_brandes(n_nodes, edges, sources=None):
    """Textbook Brandes on adjacency lists (directed, unweighted)."""
    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    bc = defaultdict(float)
    srcs = sources if sources is not None else range(n_nodes)
    for s in srcs:
        sigma = defaultdict(int)
        dist = {s: 0}
        sigma[s] = 1
        preds = defaultdict(list)
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = defaultdict(float)
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return dict(bc)


def test_betweenness_line_graph(spark):
    # a->b->c->d->e: expected b=3, c=4, d=3 (BetweennessCentralityTest:159-163)
    edges = edge_df(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    got = {r.vid: r.centrality for r in betweenness(spark, edges).collect()}
    assert got == {0: 0.0, 1: 3.0, 2: 4.0, 3: 3.0, 4: 0.0}


def test_betweenness_matches_python_oracle(spark):
    pairs = [
        (0, 1), (1, 2), (2, 0), (1, 3), (3, 4), (4, 5), (5, 3), (2, 4),
        (0, 5), (5, 6), (6, 7), (7, 0), (3, 7),
    ]
    edges = edge_df(spark, pairs)
    got = {r.vid: r.centrality for r in betweenness(spark, edges).collect()}
    want = py_brandes(8, pairs)
    for v in range(8):
        assert got[v] == pytest.approx(want.get(v, 0.0)), v


def test_betweenness_sampled_scaling(spark):
    # sample = ALL vertices -> exact result, f = 1
    edges = edge_df(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    verts = spark.createDataFrame([(i,) for i in range(5)], "vid long")
    got = {
        r.vid: r.centrality
        for r in betweenness(spark, edges, sources=verts).collect()
    }
    assert got[2] == 4.0
    # sample = {0} -> only source 0's dependencies, scaled by 5/1
    s0 = spark.createDataFrame([(0,)], "vid long")
    got0 = {
        r.vid: r.centrality
        for r in betweenness(spark, edges, sources=s0).collect()
    }
    # from source 0: delta(b)=3, delta(c)=2, delta(d)=1 -> x5
    assert got0[1] == pytest.approx(15.0)
    assert got0[3] == pytest.approx(5.0)


def test_betweenness_degree_strategy(spark):
    edges = edge_df(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    got = betweenness_sampled(spark, edges, strategy="degree", k=5)
    vals = {r.vid: r.centrality for r in got.collect()}
    assert vals[2] == pytest.approx(4.0)  # k=5 covers all sources -> exact


def test_betweenness_resume_forward_phase(spark, tmp_path):
    """North rule: betweenness resumes mid-algorithm. Run 1 caps the forward
    BFS at depth 2 (levels 0-2 committed, no _COMPLETE marker); run 2 resumes
    the forward phase from the committed levels and produces exact values."""
    import os

    pairs = [(0, 1), (1, 2), (2, 3), (3, 4)]
    ck = str(tmp_path / "bc-ck")
    partial = betweenness(
        spark, edge_df(spark, pairs), max_depth=2, checkpoint_dir=ck
    )
    partial.collect()  # materialize so every checkpoint file commits
    assert os.path.exists(os.path.join(ck, "levels", "d=2", "_SUCCESS"))
    assert not os.path.exists(os.path.join(ck, "levels", "_COMPLETE"))

    got = {
        r.vid: r.centrality
        for r in betweenness(
            spark, edge_df(spark, pairs), checkpoint_dir=ck, resume=True
        ).collect()
    }
    assert got == {0: 0.0, 1: 3.0, 2: 4.0, 3: 3.0, 4: 0.0}
    assert os.path.exists(os.path.join(ck, "levels", "_COMPLETE"))


def test_betweenness_resume_backward_phase(spark, tmp_path):
    """Backward δ-sweep resume: wipe the shallow delta checkpoints of a
    complete run; resume trusts the consecutive-from-the-top committed
    prefix (d=4,3) and recomputes only d=2..0."""
    import os
    import shutil

    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]
    ck = str(tmp_path / "bc-ck2")
    edges = edge_df(spark, pairs)
    want = {r.vid: r.centrality for r in betweenness(spark, edges, checkpoint_dir=ck).collect()}
    for d in (0, 1, 2):
        shutil.rmtree(os.path.join(ck, "deltas", f"d={d}"))
    got = {
        r.vid: r.centrality
        for r in betweenness(spark, edges, checkpoint_dir=ck, resume=True).collect()
    }
    assert got == want
    assert os.path.exists(os.path.join(ck, "deltas", "d=0", "_SUCCESS"))


def test_mst_prim_fixture(spark):
    # a-b:1 a-c:2 b-c:3 b-d:4 c-e:5 d-e:6 -> tree {ab,ac,bd,ce}, weight 12
    pairs = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 4), (3, 4)]
    weights = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    tree = mst(spark, edge_df(spark, pairs, weights))
    got = {(r.src, r.dst) for r in tree.collect()}
    assert got == {(0, 1), (0, 2), (1, 3), (2, 4)}
    stats = mst_stats(tree).collect()[0]
    assert stats.total_weight == 12.0 and stats.edge_count == 4


def test_mst_forest_disconnected(spark):
    pairs = [(0, 1), (1, 2), (0, 2), (10, 11)]
    weights = [1.0, 2.0, 5.0, 7.0]
    tree = mst(spark, edge_df(spark, pairs, weights))
    got = {(r.src, r.dst): r.weight for r in tree.collect()}
    assert got == {(0, 1): 1.0, (1, 2): 2.0, (10, 11): 7.0}


def test_mst_deterministic_ties(spark):
    # equal weights: tie-break by (weight, src, dst) -> stable output
    pairs = [(0, 1), (1, 2), (0, 2)]
    weights = [1.0, 1.0, 1.0]
    t1 = {(r.src, r.dst) for r in mst(spark, edge_df(spark, pairs, weights)).collect()}
    t2 = {(r.src, r.dst) for r in mst(spark, edge_df(spark, pairs, weights)).collect()}
    assert t1 == t2 == {(0, 1), (0, 2)}


def test_mst_resume_from_checkpoint(spark, tmp_path):
    """North rule: mst resumes mid-algorithm from durable checkpoints.
    A weighted path needs several Borůvka rounds; run 1 stops after one
    committed round, run 2 resumes past it (resumed_round recorded) and
    still returns the full spanning tree."""
    from neo4j_graph_algorithms_spark.operators.mst import mst

    n = 16
    pairs = [(i, i + 1) for i in range(n)]
    # alternating cheap/expensive so round 1 only merges adjacent pairs
    # (both endpoints of a cheap edge pick it), forcing ≥2 Borůvka rounds
    weights = [1.0 + i * 0.001 if i % 2 == 0 else 100.0 + i for i in range(n)]
    edges = edge_df(spark, pairs, weights)
    ck = str(tmp_path / "mst-ck")

    mx1: dict = {}
    partial = mst(spark, edge_df(spark, pairs, weights), max_rounds=1,
                  checkpoint_dir=ck, metrics=mx1)
    assert mx1["boruvka_rounds"] == 1
    assert partial.count() < n  # genuinely incomplete

    mx2: dict = {}
    full = mst(spark, edges, checkpoint_dir=ck, resume=True, metrics=mx2)
    assert mx2["resumed_round"] == 0
    got = {(r.src, r.dst) for r in full.collect()}
    assert got == set(pairs)  # a path's MST is the path itself
