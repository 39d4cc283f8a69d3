"""PPR sweep cut: planted-community recovery + cut/vol replay invariants."""

from __future__ import annotations

import pytest

from neo4j_graph_algorithms_spark.operators.sweep import ppr_sweep
from tests.conftest import edge_df


def _curve(spark, pairs, seeds, **kw):
    edges = edge_df(spark, pairs)
    src = spark.createDataFrame([(v,) for v in seeds], "vid long")
    rows = ppr_sweep(spark, edges, src, **kw).collect()
    return sorted(rows, key=lambda r: r.k)


def test_sweep_recovers_planted_community(spark):
    # two 5-cliques joined by a single bridge edge; seed inside clique A.
    # the min-conductance prefix is exactly clique A (cut 1).
    a = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    b = [(i, j) for i in range(5, 10) for j in range(i + 1, 10)]
    pairs = a + b + [(4, 5)]
    # make the walk mix: undirected-ize by adding both directions
    pairs = pairs + [(d, s) for s, d in pairs]
    rows = _curve(spark, pairs, [0], max_iterations=30, top_k=10)
    assert rows[-1].phi is None  # all-of-G prefix: conductance undefined
    best = min((r for r in rows if r.phi is not None), key=lambda r: (r.phi, r.k))
    assert best.k == 5
    assert best.cut == 1
    assert {r.vid for r in rows[:5]} == {0, 1, 2, 3, 4}
    assert best.phi == pytest.approx(1 / 21, abs=1e-6)  # vol(A)=4*5+1


def test_sweep_cut_vol_replay(spark):
    # pseudo-random directed graph; replay cut/vol per prefix in python
    pairs = sorted({((i * 11 + 2) % 16, (i * 3 + 5) % 16) for i in range(70)})
    pairs = [(s, d) for s, d in pairs if s != d]
    rows = _curve(spark, pairs, [1, 8], max_iterations=20, top_k=12)
    und = sorted({(min(s, d), max(s, d)) for s, d in pairs})
    deg = {}
    for s, d in und:
        deg[s] = deg.get(s, 0) + 1
        deg[d] = deg.get(d, 0) + 1
    vol_all = sum(deg.values())
    prefix: set[int] = set()
    for r in rows:
        prefix.add(r.vid)
        assert r.k == len(prefix)
        cut = sum(1 for s, d in und if (s in prefix) != (d in prefix))
        vol = sum(deg[v] for v in prefix)
        assert (r.cut, r.vol) == (cut, vol), (r.k, r.cut, cut, r.vol, vol)
        mn = min(vol, vol_all - vol)
        if mn > 0:
            assert r.phi == pytest.approx(round(cut / mn, 6))
        else:
            assert r.phi is None


def test_sweep_top_k_caps_curve_length(spark):
    pairs = [(i, i + 1) for i in range(30)] + [(i + 1, i) for i in range(30)]
    rows = _curve(spark, pairs, [15], max_iterations=10, top_k=7)
    assert [r.k for r in rows] == list(range(1, 8))


def test_sweep_seed_outside_graph_empty_curve(spark):
    pairs = [(0, 1), (1, 0)]
    rows = _curve(spark, pairs, [99], max_iterations=5, top_k=5)
    # teleport set empty within the graph: no positive scores, empty curve
    assert rows == []
