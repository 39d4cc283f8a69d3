"""Tier A / Tier B equivalence: pagerank_csr must match the DataFrame
implementation on the reference fixtures (bit-compatible up to float
summation order, asserted to 1e-9)."""

from __future__ import annotations

import math

import pytest

from neo4j_graph_algorithms_spark.csr.pagerank import pagerank_csr
from neo4j_graph_algorithms_spark.operators.pagerank import pagerank

from tests.conftest import F1_EDGES, F1_NODES, edge_df, names_to_ids, parse_edges


def _wiki(spark):
    ids = names_to_ids(F1_NODES)
    edges = edge_df(spark, parse_edges(F1_EDGES, ids))
    verts = spark.createDataFrame([(i,) for i in ids.values()], "vid long")
    return edges, verts


def test_csr_matches_tier_a_fixed_iterations(spark):
    edges, verts = _wiki(spark)
    a = {r.vid: r.rank for r in pagerank(spark, edges, vertices=verts, max_iterations=20).state.collect()}
    b = {
        r.vid: r.rank
        for r in pagerank_csr(
            spark, edges, vertices=verts, max_iterations=20, num_buckets=4
        ).state.collect()
    }
    assert set(a) == set(b)
    for v in a:
        assert math.isclose(a[v], b[v], rel_tol=0, abs_tol=1e-9), v


def test_csr_convergence_contract(spark):
    edges, verts = _wiki(spark)
    res = pagerank_csr(
        spark, edges, vertices=verts, tolerance=1e-6, max_iterations=100, num_buckets=4
    )
    assert res.converged
    a = pagerank(spark, edges, vertices=verts, tolerance=1e-6, max_iterations=100)
    assert a.iterations == res.iterations  # same convergence trajectory
    ra = {r.vid: r.rank for r in a.state.collect()}
    rb = {r.vid: r.rank for r in res.state.collect()}
    for v in ra:
        assert math.isclose(ra[v], rb[v], rel_tol=0, abs_tol=1e-9), v


def test_csr_empty_frontier_bucket(spark):
    # bucket with edges but no active sources: kernel returns empty cleanly
    edges = edge_df(spark, [(0, 1), (8, 9)])
    res = pagerank_csr(spark, edges, max_iterations=3, num_buckets=8)
    got = {r.vid: r.rank for r in res.state.collect()}
    assert set(got) == {0, 1, 8, 9}
    assert got[0] == pytest.approx(0.15)
