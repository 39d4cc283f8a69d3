"""FastRP embeddings: determinism, structure sensitivity, norms."""

import math

from neo4j_graph_algorithms_spark.operators.fastrp import SCALE, fastrp
from tests.conftest import edge_df


def _emb(spark, pairs, **kw):
    return {r["vid"]: r["embedding"] for r in fastrp(spark, edge_df(spark, pairs), **kw).collect()}


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return num / (na * nb) if na and nb else 0.0


def test_deterministic_and_seed_sensitive(spark):
    pairs = [(i, j) for i in range(10) for j in range(10) if (i + j) % 3 == 0 and i < j]
    a = _emb(spark, pairs, dim=8, seed=1)
    b = _emb(spark, pairs, dim=8, seed=1)
    c = _emb(spark, pairs, dim=8, seed=2)
    assert a == b
    assert a != c


def test_structural_twins_get_identical_embeddings(spark):
    # 1 and 2 have identical neighborhoods {0, 3}: after one averaging
    # round their states coincide exactly (integer state -> exactly)
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3)]
    out = _emb(spark, pairs, dim=8, iteration_weights=(1.0,), seed=5)
    assert out[1] == out[2]


def test_clique_members_more_similar_than_strangers(spark):
    k5 = [(a, b) for a in range(5) for b in range(5) if a < b]
    k5b = [(a, b) for a in range(10, 15) for b in range(10, 15) if a < b]
    out = _emb(spark, k5 + k5b + [(4, 10)], dim=16, iteration_weights=(1.0, 1.0), seed=3)
    within = _cos(out[0], out[1])
    across = _cos(out[0], out[12])
    assert within > across


def test_unit_norm_per_iteration_state(spark):
    # single-iteration embedding with weight 1 IS the normalized state:
    # integer norm should be SCALE within rounding slack
    pairs = [(0, 1), (1, 2), (2, 0)]
    rows = {r["vid"]: r["embedding_q6"] for r in
            fastrp(spark, edge_df(spark, pairs), dim=8, iteration_weights=(1.0,)).collect()}
    for vec in rows.values():
        nrm = math.sqrt(sum(v * v for v in vec))
        assert abs(nrm - SCALE) < 8  # one ulp of rounding per component
