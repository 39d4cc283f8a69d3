"""Tier A / Tier B equivalence for the MS-BFS family: bitwise OR is
order-independent, so depth tables and centralities match exactly."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.csr.msbfs import (
    closeness_csr,
    harmonic_csr,
    msbfs_depths_csr,
)
from neo4j_graph_algorithms_spark.operators.msbfs import (
    closeness,
    harmonic,
    msbfs_depths,
)
from tests.conftest import edge_df

# ring + chords + a detached pair: multi-depth frontiers across buckets
_PAIRS = [(i, (i + 1) % 10) for i in range(10)] + [(0, 5), (2, 7), (11, 12)]


def test_depths_match_tier_a(spark):
    edges = edge_df(spark, _PAIRS)
    a = {
        (r.vid, r.depth): r.n_sources
        for r in msbfs_depths(spark, edges, max_depth=8).collect()
    }
    b = {
        (r.vid, r.depth): r.n_sources
        for r in msbfs_depths_csr(spark, edges, max_depth=8, num_buckets=3).collect()
    }
    assert a == b


def test_depths_match_multi_group(spark):
    # force >1 source group with n_words=1 (64 BFS/group) — 70 sources
    pairs = [(i, i + 1) for i in range(70)]
    edges = edge_df(spark, pairs)
    a = {
        (r.vid, r.depth): r.n_sources
        for r in msbfs_depths(spark, edges, max_depth=3, n_words=1).collect()
    }
    b = {
        (r.vid, r.depth): r.n_sources
        for r in msbfs_depths_csr(
            spark, edges, max_depth=3, n_words=1, num_buckets=4
        ).collect()
    }
    assert a == b


def test_closeness_harmonic_match_tier_a(spark):
    edges = edge_df(spark, _PAIRS)
    srcs = edge_df(spark, _PAIRS).select(F.col("src").alias("vid")).distinct()
    for tier_a, tier_b in ((closeness, closeness_csr), (harmonic, harmonic_csr)):
        a = {r.vid: r.centrality for r in tier_a(spark, edges, sources=srcs, max_depth=8).collect()}
        b = {
            r.vid: r.centrality
            for r in tier_b(spark, edges, sources=srcs, max_depth=8).collect()
        }
        assert set(a) == set(b)
        for v in a:
            assert math.isclose(a[v], b[v], rel_tol=0, abs_tol=1e-12), (tier_a, v)
