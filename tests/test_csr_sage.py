"""Tier B SAGE aggregation (csr/sage.py) — bit-exact equivalence with
pipeline/sage.sage_aggregate."""

from __future__ import annotations

import random

from neo4j_graph_algorithms_spark.csr.sage import sage_aggregate_csr
from neo4j_graph_algorithms_spark.pipeline.sage import sage_aggregate
from tests.conftest import edge_df


def _emb_df(spark, feats):
    return spark.createDataFrame(
        [(v, [float(x) for x in xs]) for v, xs in feats.items()],
        "vec_id long, embedding array<float>",
    )


def _collect(df):
    return sorted(
        (r["vid"], r["pos"], r["sum1"], r["d1"], r["sum2"], r["d2"])
        for r in df.collect()
    )


def test_csr_equals_tier_a_path(spark):
    edges = edge_df(spark, [(0, 1), (1, 2), (2, 3)])
    feats = {0: [1.0, -0.5], 1: [0.25, 0.0000005], 2: [-1.0, 2.0]}
    a = _collect(sage_aggregate(edges, _emb_df(spark, feats)))
    b = _collect(sage_aggregate_csr(spark, edges, _emb_df(spark, feats)))
    assert a == b and len(a) > 0


def test_csr_equals_tier_a_random(spark):
    rng = random.Random(41)
    pairs = sorted({(rng.randrange(30), rng.randrange(30)) for _ in range(80)})
    pairs = [(a, b) for a, b in pairs if a != b]
    # partial coverage: features on ~half the vertices, dim 5
    feats = {
        v: [rng.uniform(-2, 2) for _ in range(5)]
        for v in range(30)
        if rng.random() < 0.5
    }
    edges = edge_df(spark, pairs)
    a = _collect(sage_aggregate(edges, _emb_df(spark, feats)))
    b = _collect(sage_aggregate_csr(spark, edges, _emb_df(spark, feats), num_buckets=3))
    assert a == b and len(a) > 0


def test_csr_no_features_empty(spark):
    edges = edge_df(spark, [(0, 1)])
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert sage_aggregate_csr(spark, edges, empty).count() == 0
