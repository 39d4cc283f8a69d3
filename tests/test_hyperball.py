"""HyperBall HLL sketches: register exactness vs a Python mirror, estimate
accuracy vs true ball sizes, harmonic ranking sanity."""

from __future__ import annotations

import math

import pytest

from neo4j_graph_algorithms_spark.operators.hyperball import (
    A1,
    A2,
    B1,
    B2,
    HB_P,
    RHO_W,
    hll_alpha,
    hyperball,
    hyperball_estimates,
    hyperball_harmonic,
)
from tests.conftest import edge_df


def _bucket(v, m):
    return ((v % HB_P) * A1 + B1) % HB_P % m


def _rho_py(v):
    z = ((v % HB_P) * A2 + B2) % HB_P % (2**RHO_W)
    return RHO_W + 1 if z == 0 else RHO_W - z.bit_length() + 1


def _ball_out(edges, v, t):
    cur, seen = {v}, {v}
    for _ in range(t):
        cur = {d for s, d in edges if s in cur}
        seen |= cur
    return seen


def _py_registers(edges, verts, t, m):
    regs = {}
    for v in verts:
        r = [0] * m
        for u in _ball_out(edges, v, t):
            b = _bucket(u, m)
            r[b] = max(r[b], _rho_py(u))
        regs[v] = r
    return regs


def test_registers_match_python_mirror(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (4, 0)]
    verts = range(5)
    res = hyperball(spark, edge_df(spark, edges), radius=2, m=8)
    got = {}
    for r in res.state.collect():
        got.setdefault(r.vid, [0] * 8)[r.bucket] = max(
            got.setdefault(r.vid, [0] * 8)[r.bucket], r.reg
        )
    expect = _py_registers(edges, verts, 2, 8)
    assert got == expect


def test_estimates_track_true_ball_sizes(spark):
    # 200-cycle: every radius-r out-ball has exactly r+1 members; with m=64
    # the HLL relative error is ~13%, and the sketch is deterministic so
    # the tolerance check is stable
    n = 200
    edges = [(i, (i + 1) % n) for i in range(n)]
    res = hyperball(spark, edge_df(spark, edges), radius=4, m=64)
    est = {r.vid: r.est for r in hyperball_estimates(res.state, m=64).collect()}
    assert len(est) == n
    for v in (0, 57, 123):
        assert est[v] == pytest.approx(5.0, rel=0.35)


def test_converges_at_graph_diameter(spark):
    # path 0->1->2: registers stop changing after 2 supersteps; the checksum
    # convergence must fire before the radius cap
    res = hyperball(spark, edge_df(spark, [(0, 1), (1, 2)]), radius=10, m=8)
    assert res.converged and res.iterations <= 4


def test_harmonic_ranks_star_center_highest(spark):
    # star: 1..6 all point at 0 -> 0 has the largest incoming ball
    edges = [(i, 0) for i in range(1, 7)]
    got = {
        r.vid: r.approx_harmonic
        for r in hyperball_harmonic(
            spark, edge_df(spark, edges), radius=2, m=64
        ).collect()
    }
    assert got[0] == max(got.values())
    assert got[0] > 2.0  # true value 6; HLL error keeps it well above the leaves


def test_effective_diameter_path_graph(spark):
    from neo4j_graph_algorithms_spark.operators.hyperball import effective_diameter
    from tests.conftest import edge_df

    # directed path 0->1->...->9: ball mass grows linearly with radius, so
    # the 9/10 threshold lands near radius 8 on the exact neighborhood
    # function; the HLL estimate (m=16) is noisy per-vertex but the
    # MONOTONICITY + determinism properties must hold exactly
    pairs = [(i, i + 1) for i in range(9)]
    row = effective_diameter(spark, edge_df(spark, pairs), max_radius=9,
                             m=16).collect()[0]
    assert 0 < row["effective_diameter"] <= 9
    # deterministic under re-run (hash registers, no RNG)
    row2 = effective_diameter(spark, edge_df(spark, pairs), max_radius=9,
                              m=16).collect()[0]
    assert row.asDict() == row2.asDict()


def test_effective_diameter_star_is_one(spark):
    from neo4j_graph_algorithms_spark.operators.hyperball import effective_diameter
    from tests.conftest import edge_df

    # hub -> all leaves: every OUTGOING ball saturates at radius 1
    pairs = [(0, i) for i in range(1, 30)]
    row = effective_diameter(spark, edge_df(spark, pairs), max_radius=3,
                             m=16).collect()[0]
    assert row["effective_diameter"] <= 1


def test_effective_diameter_validates_fraction(spark):
    from neo4j_graph_algorithms_spark.operators.hyperball import effective_diameter
    from tests.conftest import edge_df

    with pytest.raises(ValueError, match="rational"):
        effective_diameter(spark, edge_df(spark, [(0, 1)]), fraction=(3, 2))
