"""Tier B WCC equivalence tests."""

from __future__ import annotations

from neo4j_graph_algorithms_spark.csr.wcc import wcc_csr
from neo4j_graph_algorithms_spark.operators.wcc import wcc

from tests.conftest import edge_df


def test_wcc_csr_matches_tier_a_components(spark):
    pairs = [(0, 1), (1, 2), (5, 6), (6, 7), (7, 5), (10, 11), (3, 4), (4, 0)]
    edges = edge_df(spark, pairs)
    a = {r.vid: r.comp for r in wcc(spark, edges).state.collect()}
    b = {r.vid: r.comp for r in wcc_csr(spark, edges, num_buckets=4).collect()}
    assert a == b
    assert b[2] == 0 and b[7] == 5 and b[11] == 10


def test_wcc_csr_long_chain(spark):
    # 200-node path: exercises cross-bucket merging over multiple rounds
    pairs = [(i, i + 1) for i in range(200)]
    edges = edge_df(spark, pairs)
    got = {r.vid: r.comp for r in wcc_csr(spark, edges, num_buckets=8).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 201


def test_wcc_csr_isolated_vertices(spark):
    edges = edge_df(spark, [(0, 1)])
    verts = spark.createDataFrame([(0,), (1,), (9,)], "vid long")
    got = {r.vid: r.comp for r in wcc_csr(spark, edges, vertices=verts).collect()}
    assert got == {0: 0, 1: 0, 9: 9}
