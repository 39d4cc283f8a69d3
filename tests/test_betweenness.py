"""Edge betweenness (Girvan-Newman edge importance) vs a brute-force
pair-sum python oracle."""

from __future__ import annotations

import pytest

from tests.conftest import edge_df

# ---- edge betweenness -------------------------------------------------------


def _python_edge_betweenness(pairs, sources=None):
    """Brute-force pair-sum oracle over all (s, t) shortest paths."""
    from collections import defaultdict, deque

    adj = defaultdict(list)
    verts = set()
    for s, d in pairs:
        adj[s].append(d)
        verts.update((s, d))
    verts = sorted(verts)
    S = sources if sources is not None else verts
    f = len(verts) / len(S)

    def bfs(s):
        dist = {s: 0}
        sig = {s: 1.0}
        order = []
        dq = deque([s])
        while dq:
            u = dq.popleft()
            order.append(u)
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    sig[w] = 0.0
                    dq.append(w)
                if dist[w] == dist[u] + 1:
                    sig[w] += sig[u]
        return dist, sig, order

    eb = defaultdict(int)
    for s in S:
        dist, sig, order = bfs(s)
        delta = defaultdict(int)  # BIGINT micro-units, the operator contract
        for w in reversed(order):
            for u in [x for x in verts if w in adj[x]]:
                if u in dist and dist.get(w) == dist[u] + 1:
                    # floor(x+0.5) = HALF_UP on nonneg, matching the
                    # engines (python round() is half-to-even)
                    c6 = int(sig[u] / sig[w] * (1_000_000 + delta[w]) + 0.5)
                    eb[(u, w)] += c6
                    delta[u] += c6
    return {e: round(f * v / 1_000_000.0, 9) for e, v in eb.items()}


def test_edge_betweenness_line_graph(spark):
    from neo4j_graph_algorithms_spark.operators.betweenness import edge_betweenness

    # directed line a->b->c->d: edge (b,c) carries paths a-c,a-d,b-c,b-d... :
    # c(a,b)=3 (a->{b,c,d}), c(b,c)=4 (a,b ->{c,d}... a->c,a->d,b->c,b->d),
    # c(c,d)=3
    pairs = [(0, 1), (1, 2), (2, 3)]
    got = {
        (r.src, r.dst): r.centrality
        for r in edge_betweenness(spark, edge_df(spark, pairs)).collect()
    }
    assert got == {(0, 1): 3.0, (1, 2): 4.0, (2, 3): 3.0}


def test_edge_betweenness_matches_python_oracle(spark):
    from neo4j_graph_algorithms_spark.operators.betweenness import edge_betweenness

    pairs = sorted({((i * 7 + 1) % 13, (i * 5 + 3) % 13) for i in range(45)})
    pairs = [(s, d) for s, d in pairs if s != d]
    exp = _python_edge_betweenness(pairs)
    got = {
        (r.src, r.dst): round(r.centrality, 9)
        for r in edge_betweenness(spark, edge_df(spark, pairs)).collect()
    }
    got_nz = {e: v for e, v in got.items() if v}
    assert got_nz == pytest.approx(exp)
    assert set(got) == {(s, d) for s, d in pairs}  # every edge present, zeros kept


def test_edge_betweenness_sampled_scaling(spark):
    from neo4j_graph_algorithms_spark.operators.betweenness import edge_betweenness

    pairs = [(0, 1), (1, 2), (2, 3), (3, 4)]
    src = spark.createDataFrame([(0,)], "vid long")
    exp = _python_edge_betweenness(pairs, sources=[0])
    got = {
        (r.src, r.dst): round(r.centrality, 9)
        for r in edge_betweenness(spark, edge_df(spark, pairs), sources=src).collect()
    }
    assert {e: v for e, v in got.items() if v} == pytest.approx(exp)
