"""Who-to-Follow personalized SALSA (operators/wtf.py).

Cross-checked against a sequential Python replay of the same composed
contract (delta-push PPR -> 1e-6-grid top-C circle -> induced SALSA with
per-half-step L1 normalization -> non-circle top-N authorities).
Membership/ordering asserted exactly; scores to 1e-9 relative (tiny-sum
reassociation only).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.operators.wtf import who_to_follow
from tests.conftest import edge_df


def _python_wtf(pairs, seeds, circle_size, n_recs, ppr_iters=20, d=0.85, salsa_iters=10):
    verts = sorted({v for e in pairs for v in e})
    out = {}
    for s, t in pairs:
        out.setdefault(s, []).append(t)
    rank = {v: (0.15 if v in seeds else 0.0) for v in verts}
    delta = dict(rank)
    for _ in range(ppr_iters):
        push = {}
        for u, targets in out.items():
            if delta.get(u, 0.0) > 0:
                w = delta[u] / len(targets)
                for t in targets:
                    push[t] = push.get(t, 0.0) + w
        delta = {v: d * push.get(v, 0.0) for v in verts}
        for v in verts:
            rank[v] += delta[v]
    scored = sorted(
        ((round(rank[v], 6), v) for v in verts if round(rank[v], 6) > 0),
        key=lambda t: (-t[0], t[1]),
    )
    circle = {v for _, v in scored[:circle_size]}
    ie = [(s, t) for s, t in pairs if s in circle]
    iverts = sorted({v for e in ie for v in e})
    outdeg = {}
    indeg = {}
    for s, t in ie:
        outdeg[s] = outdeg.get(s, 0) + 1
        indeg[t] = indeg.get(t, 0) + 1
    auth = {v: 1.0 for v in iverts}
    hub = {v: 1.0 for v in iverts}
    for _ in range(salsa_iters):
        a_raw = {}
        for s, t in ie:
            a_raw[t] = a_raw.get(t, 0.0) + hub[s] / outdeg[s]
        an = sum(a_raw.values())
        auth = {v: (a_raw.get(v, 0.0) / an if an > 0 else 0.0) for v in iverts}
        h_raw = {}
        for s, t in ie:
            h_raw[s] = h_raw.get(s, 0.0) + auth[t] / indeg[t]
        hn = sum(h_raw.values())
        hub = {v: (h_raw.get(v, 0.0) / hn if hn > 0 else 0.0) for v in iverts}
    recs = sorted(
        ((round(auth[v], 6), v) for v in iverts if v not in circle and round(auth[v], 6) > 0),
        key=lambda t: (-t[0], t[1]),
    )[:n_recs]
    return [(i + 1, v, a) for i, (a, v) in enumerate(recs)]


PAIRS = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 0), (3, 4), (4, 5), (2, 5)]


def _run(spark, pairs, seeds, circle_size, n_recs):
    edges = edge_df(spark, pairs)
    src = spark.createDataFrame([(int(s),) for s in seeds], "vid long")
    return [
        (r["rank"], r["vid"], r["auth"])
        for r in who_to_follow(
            spark, edges, src, circle_size=circle_size, n_recs=n_recs
        ).collect()
    ]


def test_matches_python_replay(spark):
    got = _run(spark, PAIRS, {0}, circle_size=3, n_recs=5)
    want = _python_wtf(PAIRS, {0}, 3, 5)
    assert [(r, v) for r, v, _ in got] == [(r, v) for r, v, _ in want]
    for (_, _, ga), (_, _, wa) in zip(got, want):
        assert ga == pytest.approx(wa, rel=1e-9, abs=1e-9)


def test_random_graph_membership(spark):
    rng = random.Random(11)
    pairs = sorted({(rng.randrange(25), rng.randrange(25)) for _ in range(90)})
    pairs = [(s, d) for s, d in pairs if s != d]
    seeds = {0, 5}
    got = _run(spark, pairs, seeds, circle_size=6, n_recs=8)
    want = _python_wtf(pairs, seeds, 6, 8)
    assert [(r, v) for r, v, _ in got] == [(r, v) for r, v, _ in want]


def test_recs_exclude_circle(spark):
    # with a circle covering everything reachable, no recommendations remain
    got = _run(spark, [(0, 1), (1, 0)], {0}, circle_size=10, n_recs=5)
    assert got == []
