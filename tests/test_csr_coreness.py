"""Tier B h-index coreness: exact equivalence with Tier A + fixture pins."""

from __future__ import annotations

import random

from neo4j_graph_algorithms_spark.csr.coreness import coreness_hindex_csr
from neo4j_graph_algorithms_spark.operators.kcore import coreness_hindex
from tests.conftest import edge_df

TRI_PENDANT = [(0, 1), (1, 2), (2, 0), (0, 3), (3, 4)]


def test_csr_coreness_fixture(spark):
    res = coreness_hindex_csr(spark, edge_df(spark, TRI_PENDANT))
    got = {r.vid: r.core for r in res.state.collect()}
    assert got == {0: 2, 1: 2, 2: 2, 3: 1, 4: 1}


def test_csr_equals_tier_a_exactly(spark):
    rng = random.Random(23)
    pairs = sorted({(rng.randrange(40), rng.randrange(40)) for _ in range(200)})
    pairs = [(s, d) for s, d in pairs if s != d]
    a = {r.vid: r.core for r in coreness_hindex(spark, edge_df(spark, pairs)).state.collect()}
    b = {
        r.vid: r.core
        for r in coreness_hindex_csr(spark, edge_df(spark, pairs)).state.collect()
    }
    assert a == b  # integer state: bit-identical across tiers


def test_csr_truncated_rounds_match_tier_a(spark):
    # intermediate (pre-convergence) states are part of the contract too —
    # the driver gate runs both tiers at the same fixed round count
    pairs = TRI_PENDANT + [(4, 5), (5, 0), (1, 3), (5, 2)]
    for t in (1, 3):
        a = {
            r.vid: r.core
            for r in coreness_hindex(
                spark, edge_df(spark, pairs), max_iterations=t, fixed_iterations=True
            ).state.collect()
        }
        b = {
            r.vid: r.core
            for r in coreness_hindex_csr(
                spark, edge_df(spark, pairs), max_iterations=t, fixed_iterations=True
            ).state.collect()
        }
        assert a == b, t
