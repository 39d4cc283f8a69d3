"""k-core peel + coreness sweep (operators/kcore.py).

Fixture: triangle {0,1,2} + pendant path 0-3-4.
    2-core = the triangle (peel 4 then 3); coreness = {0:2,1:2,2:2,3:1,4:1}.
"""

from __future__ import annotations

import random

import pytest

from neo4j_graph_algorithms_spark.operators.kcore import coreness, kcore
from tests.conftest import edge_df

TRI_PENDANT = [(0, 1), (1, 2), (2, 0), (0, 3), (3, 4)]


def _python_coreness(pairs):
    """Sequential peel oracle."""
    adj: dict[int, set[int]] = {}
    for s, d in pairs:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    core = {v: 0 for v in adj}
    k = 1
    alive = dict(adj)
    while alive:
        changed = True
        while changed:
            drop = [v for v, ns in alive.items() if len(ns) < k]
            changed = bool(drop)
            for v in drop:
                for u in alive[v]:
                    alive[u].discard(v)
                del alive[v]
        for v in alive:
            core[v] = k
        k += 1
    return core


def test_kcore_hand_values(spark):
    res = kcore(spark, edge_df(spark, TRI_PENDANT), k=2)
    rows = {r["vid"]: r["deg"] for r in res.state.collect()}
    assert rows == {0: 2, 1: 2, 2: 2}
    assert res.converged


def test_kcore_empty_when_k_too_large(spark):
    res = kcore(spark, edge_df(spark, TRI_PENDANT), k=3)
    assert res.state.collect() == []


def test_kcore_k1_keeps_everything_connected(spark):
    res = kcore(spark, edge_df(spark, TRI_PENDANT), k=1)
    assert {r["vid"] for r in res.state.collect()} == {0, 1, 2, 3, 4}


def test_kcore_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        kcore(spark, edge_df(spark, TRI_PENDANT), k=0)


def test_coreness_hand_values(spark):
    out = {r["vid"]: r["core"] for r in coreness(spark, edge_df(spark, TRI_PENDANT)).collect()}
    assert out == {0: 2, 1: 2, 2: 2, 3: 1, 4: 1}


def test_coreness_clique_plus_isolated_selfloop(spark):
    # 4-clique has coreness 3 everywhere; a self-loop-only vertex is core 0
    pairs = [(a, b) for a in range(4) for b in range(a + 1, 4)] + [(9, 9)]
    out = {r["vid"]: r["core"] for r in coreness(spark, edge_df(spark, pairs)).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3, 9: 0}


def test_coreness_matches_python_oracle_random(spark):
    rng = random.Random(7)
    pairs = list({(rng.randrange(30), rng.randrange(30)) for _ in range(120)})
    want = _python_coreness([p for p in pairs if p[0] != p[1]])
    got = {r["vid"]: r["core"] for r in coreness(spark, edge_df(spark, pairs)).collect()}
    for v, c in want.items():
        assert got[v] == c, (v, c, got[v])


def test_kcore_resume(spark, tmp_path):
    ckpt = str(tmp_path / "kcore")
    cold = kcore(spark, edge_df(spark, TRI_PENDANT), k=2, checkpoint_dir=ckpt,
                 checkpoint_interval=1)
    resumed = kcore(spark, edge_df(spark, TRI_PENDANT), k=2, checkpoint_dir=ckpt,
                    resume=True)
    assert sorted(map(tuple, resumed.state.collect())) == sorted(
        map(tuple, cold.state.collect())
    )


def test_coreness_max_k_clamps_survivors(spark):
    # 4-clique (true coreness 3) + pendant 0-7: with max_k=2 the sweep is
    # cut off and clique survivors are CLAMPED to core 2 (not dropped to 0)
    pairs = [(a, b) for a in range(4) for b in range(a + 1, 4)] + [(0, 7)]
    out = {r["vid"]: r["core"]
           for r in coreness(spark, edge_df(spark, pairs), max_k=2).collect()}
    assert out == {0: 2, 1: 2, 2: 2, 3: 2, 7: 1}


# ---- h-index coreness iteration --------------------------------------------


def test_hindex_coreness_fixture(spark):
    from neo4j_graph_algorithms_spark.operators.kcore import coreness_hindex

    res = coreness_hindex(spark, edge_df(spark, TRI_PENDANT))
    got = {r.vid: r.core for r in res.state.collect()}
    assert got == {0: 2, 1: 2, 2: 2, 3: 1, 4: 1}


def test_hindex_equals_peel_sweep_on_random_graph(spark):
    from neo4j_graph_algorithms_spark.operators.kcore import coreness_hindex

    rng = random.Random(11)
    pairs = sorted({(rng.randrange(30), rng.randrange(30)) for _ in range(140)})
    pairs = [(s, d) for s, d in pairs if s != d]
    exp = _python_coreness(pairs)
    res = coreness_hindex(spark, edge_df(spark, pairs))
    got = {r.vid: r.core for r in res.state.collect()}
    assert got == exp
    # the sweep operator agrees too — three independent paths, one answer
    sweep = {r.vid: r.core for r in coreness(spark, edge_df(spark, pairs)).collect()}
    assert sweep == exp


def test_hindex_fixed_iterations_monotone_upper_bound(spark):
    from neo4j_graph_algorithms_spark.operators.kcore import coreness_hindex

    # truncated runs are pointwise >= the fixpoint and non-increasing in t
    pairs = TRI_PENDANT + [(4, 5), (5, 0), (1, 3)]
    exact = _python_coreness(pairs)
    prev = None
    for t in (1, 2, 4):
        res = coreness_hindex(
            spark, edge_df(spark, pairs), max_iterations=t, fixed_iterations=True
        )
        got = {r.vid: r.core for r in res.state.collect()}
        assert all(got[v] >= exact[v] for v in exact)
        if prev is not None:
            assert all(got[v] <= prev[v] for v in prev)
        prev = got


def test_hindex_isolated_and_selfloop_vertices_core_zero(spark):
    from neo4j_graph_algorithms_spark.operators.kcore import coreness_hindex

    verts = spark.createDataFrame([(9,), (0,), (1,), (2,)], "vid long")
    edges = spark.createDataFrame([(0, 1), (2, 2)], "src long, dst long")
    ef_res = coreness_hindex(spark, edges, max_iterations=4)
    # vertices() of the edge frame: 0,1,2 (2 via its self-loop) — 2 has no
    # simple-graph neighbors, so core 0; explicit vertices add isolated 9
    from neo4j_graph_algorithms_spark.graph import EdgeFrame

    got = {r.vid: r.core for r in ef_res.state.collect()}
    assert got == {0: 1, 1: 1, 2: 0}


# -- s-core (weighted k-core) -------------------------------------------------


def _python_score(pairs, weights, s):
    """Sequential weighted peel oracle."""
    adj: dict[int, dict[int, float]] = {}
    for (a, b), w in zip(pairs, weights):
        if a == b:
            continue
        lo, hi = min(a, b), max(a, b)
        adj.setdefault(lo, {})[hi] = adj.setdefault(lo, {}).get(hi, 0) + w
    und: dict[int, dict[int, float]] = {}
    for a, ns in adj.items():
        for b, w in ns.items():
            und.setdefault(a, {})[b] = w
            und.setdefault(b, {})[a] = w
    alive = set(und)
    strength = {v: sum(und[v].values()) for v in alive}
    while True:
        drop = [v for v in alive if strength[v] < s]
        if not drop:
            break
        for v in drop:
            alive.discard(v)
            for u, w in und[v].items():
                if u in alive:
                    strength[u] -= w
    return {v: int(strength[v]) for v in alive}


def test_score_weighted_triangle_pendant(spark):
    from neo4j_graph_algorithms_spark.operators.kcore import s_core

    pairs = TRI_PENDANT
    weights = [3.0, 3.0, 3.0, 2.0, 1.0]
    res = s_core(spark, edge_df(spark, pairs, weights), s=4)
    got = {r.vid: r.strength for r in res.state.collect()}
    assert got == {0: 6, 1: 6, 2: 6}
    assert res.did_converge
    # s high enough to peel everything (cascade through the triangle)
    res7 = s_core(spark, edge_df(spark, pairs, weights), s=7)
    assert res7.state.count() == 0


def test_score_matches_python_oracle_random(spark):
    import random

    from neo4j_graph_algorithms_spark.operators.kcore import s_core

    rng = random.Random(13)
    pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(120)]
    weights = [float(rng.randrange(1, 6)) for _ in pairs]
    clean = [(p, w) for p, w in zip(pairs, weights) if p[0] != p[1]]
    pairs, weights = [p for p, _ in clean], [w for _, w in clean]
    for s in (5, 12, 20):
        res = s_core(spark, edge_df(spark, pairs, weights), s=s)
        got = {r.vid: r.strength for r in res.state.collect()}
        assert got == _python_score(pairs, weights, s)


def test_score_unit_weights_equal_kcore(spark):
    from neo4j_graph_algorithms_spark.operators.kcore import kcore, s_core

    pairs = TRI_PENDANT + [(4, 5), (5, 0), (1, 3)]
    sres = {r.vid: r.strength for r in s_core(spark, edge_df(spark, pairs), s=2).state.collect()}
    kres = {r.vid: r.deg for r in kcore(spark, edge_df(spark, pairs), k=2).state.collect()}
    assert sres == kres
