"""Bow-tie decomposition (operators/bowtie.py).

Hand fixture covering all seven Broder classes, plus random digraphs vs a
sequential Kosaraju + BFS replay of the same set algebra.
"""

from __future__ import annotations

import collections
import random

from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.operators.bowtie import (
    bowtie_census,
    bowtie_decomposition,
    reach_set,
)
from tests.conftest import edge_df

# core {0,1,9}; 2 -> in; 3 -> out; 4 tendril_in; 5 tendril_out; 6 tube;
# 7<->8 a smaller SCC, unreachable either way -> disconnected
BOWTIE = [
    (0, 1), (1, 9), (9, 0),
    (2, 0), (1, 3),
    (2, 4), (5, 3),
    (2, 6), (6, 3),
    (7, 8), (8, 7),
]
EXPECTED = {
    0: "core", 1: "core", 9: "core",
    2: "in", 3: "out",
    4: "tendril_in", 5: "tendril_out",
    6: "tube", 7: "disconnected", 8: "disconnected",
}


def _python_bowtie(pairs):
    V = sorted({v for e in pairs for v in e})
    adj = collections.defaultdict(list)
    radj = collections.defaultdict(list)
    for s, d in set(pairs):
        if s != d:
            adj[s].append(d)
            radj[d].append(s)
    visited, order = set(), []
    for v in V:
        if v in visited:
            continue
        visited.add(v)
        stack = [(v, iter(adj[v]))]
        while stack:
            node, it = stack[-1]
            for w in it:
                if w not in visited:
                    visited.add(w)
                    stack.append((w, iter(adj[w])))
                    break
            else:
                order.append(node)
                stack.pop()
    comp = {}
    for v in reversed(order):
        if v in comp:
            continue
        st = [v]
        comp[v] = v
        while st:
            x = st.pop()
            for w in radj[x]:
                if w not in comp:
                    comp[w] = v
                    st.append(w)
    # component id as min member (matches operators/scc.py contract)
    members = collections.defaultdict(list)
    for v, c in comp.items():
        members[c].append(v)
    comp = {v: min(members[c]) for v, c in comp.items()}
    sizes = collections.Counter(comp.values())
    core_id = max(sizes, key=lambda c: (sizes[c], -c))
    core = {v for v, c in comp.items() if c == core_id}

    def reach(seeds, g):
        seen = set(seeds)
        st = list(seeds)
        while st:
            x = st.pop()
            for w in g[x]:
                if w not in seen:
                    seen.add(w)
                    st.append(w)
        return seen

    out_ = reach(core, adj) - core
    in_ = reach(core, radj) - core
    fi = reach(in_, adj) if in_ else set()
    to = reach(out_, radj) if out_ else set()
    res = {}
    for v in V:
        if v in core:
            res[v] = "core"
        elif v in in_:
            res[v] = "in"
        elif v in out_:
            res[v] = "out"
        elif v in fi and v in to:
            res[v] = "tube"
        elif v in fi:
            res[v] = "tendril_in"
        elif v in to:
            res[v] = "tendril_out"
        else:
            res[v] = "disconnected"
    return res


def test_hand_fixture_all_classes(spark):
    got = {
        r["vid"]: r["bowtie_class"]
        for r in bowtie_decomposition(spark, edge_df(spark, BOWTIE)).collect()
    }
    assert got == EXPECTED
    census = {
        r["bowtie_class"]: r["n"]
        for r in bowtie_census(
            bowtie_decomposition(spark, edge_df(spark, BOWTIE))
        ).collect()
    }
    assert census["core"] == 3 and census["disconnected"] == 2


def test_matches_python_replay_random(spark):
    rng = random.Random(23)
    pairs = sorted({(rng.randrange(30), rng.randrange(30)) for _ in range(55)})
    pairs = [(s, d) for s, d in pairs if s != d]
    got = {
        r["vid"]: r["bowtie_class"]
        for r in bowtie_decomposition(spark, edge_df(spark, pairs)).collect()
    }
    assert got == _python_bowtie(pairs)


def test_reach_set_forward_backward(spark):
    edges = edge_df(spark, [(0, 1), (1, 2), (3, 2)]).select("src", "dst")
    seeds = spark.createDataFrame([(0,)], "vid long")
    fwd = {r["vid"] for r in reach_set(spark, edges, seeds).collect()}
    assert fwd == {0, 1, 2}
    bwd = {
        r["vid"]
        for r in reach_set(
            spark, edges, spark.createDataFrame([(2,)], "vid long"), reverse=True
        ).collect()
    }
    assert bwd == {2, 1, 0, 3}
