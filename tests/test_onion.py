"""Onion decomposition (operators/onion.py).

Fixtures:
  * triangle {0,1,2} + pendant path 0-3-4 — hand-computed layers:
      round 1: k rises to 1 (min degree, vertex 4); removes 4 AND 3?  No:
      degrees are {0:3, 1:2, 2:2, 3:2, 4:1}; k=1 removes only 4.
      round 2: degrees {0:3,1:2,2:2,3:1}; k stays 1; removes 3.
      round 3: triangle degrees all 2; k rises to 2; removes 0,1,2.
  * random Gnp graphs — properties vs a sequential Python peel oracle:
    layers partition the vertex set, onion_core == coreness (the kcore
    test's oracle), layers are monotone in core value.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.operators.onion import (
    onion_decomposition,
    onion_spectrum,
)
from tests.conftest import edge_df

TRI_PENDANT = [(0, 1), (1, 2), (2, 0), (0, 3), (3, 4)]


def _python_onion(pairs):
    adj: dict[int, set[int]] = {}
    for s, d in pairs:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    alive = {v: set(ns) for v, ns in adj.items()}
    k, rnd, out = 0, 0, {}
    while alive:
        rnd += 1
        k = max(k, min(len(ns) for ns in alive.values()))
        drop = [v for v, ns in alive.items() if len(ns) <= k]
        for v in drop:
            out[v] = (rnd, k)
            for u in alive[v]:
                alive[u].discard(v)
            del alive[v]
    return out


def test_tri_pendant_layers(spark):
    res = {
        r["vid"]: (r["layer"], r["onion_core"])
        for r in onion_decomposition(spark, edge_df(spark, TRI_PENDANT)).collect()
    }
    assert res == {4: (1, 1), 3: (2, 1), 0: (3, 2), 1: (3, 2), 2: (3, 2)}


def test_matches_python_oracle_random(spark):
    rng = random.Random(7)
    pairs = [(rng.randrange(40), rng.randrange(40)) for _ in range(160)]
    pairs = [(s, d) for s, d in pairs if s != d]
    res = {
        r["vid"]: (r["layer"], r["onion_core"])
        for r in onion_decomposition(spark, edge_df(spark, pairs)).collect()
    }
    assert res == _python_onion(pairs)


def test_spectrum_partitions_vertices(spark):
    layers = onion_decomposition(spark, edge_df(spark, TRI_PENDANT))
    spec = onion_spectrum(layers)
    assert spec.agg(F.sum("n")).first()[0] == layers.count() == 5
    # cores are non-decreasing in layer
    rows = sorted((r["layer"], r["onion_core"]) for r in spec.collect())
    cores = [c for _, c in rows]
    assert cores == sorted(cores)
