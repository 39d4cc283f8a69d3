"""Tier B FastRP (csr/fastrp.py): exact equivalence with Tier A.

The integer-scaled state contract makes the equivalence EXACT (not 1e-9):
bucket-local int64 partial sums + JVM final sum == Tier A's single
groupBy sum, and the per-row float chain reuses Tier A's expressions.
"""

from __future__ import annotations

import random

from neo4j_graph_algorithms_spark.csr.fastrp import fastrp_csr
from neo4j_graph_algorithms_spark.operators.fastrp import fastrp
from tests.conftest import edge_df


def _q6(df):
    return sorted(
        (r["vid"], tuple(r["embedding_q6"])) for r in df.collect()
    )


def test_exact_equivalence_random_graph(spark):
    rng = random.Random(11)
    pairs = list({(rng.randrange(60), rng.randrange(60)) for _ in range(240)})
    a = fastrp(spark, edge_df(spark, pairs), dim=8,
               iteration_weights=(1.0, 0.7), seed=3)
    b = fastrp_csr(spark, edge_df(spark, pairs), dim=8,
                   iteration_weights=(1.0, 0.7), seed=3)
    assert _q6(a) == _q6(b)


def test_exact_equivalence_bucket_count_invariant(spark):
    # partial-sum bucketing must not change values: 2 vs 16 buckets
    pairs = [(i, (i * 7 + 1) % 40) for i in range(40)] + [(0, 1), (2, 3)]
    a = fastrp_csr(spark, edge_df(spark, pairs), dim=4, seed=9, num_buckets=2)
    b = fastrp_csr(spark, edge_df(spark, pairs), dim=4, seed=9, num_buckets=16)
    assert _q6(a) == _q6(b)
