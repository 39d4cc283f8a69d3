"""Tier A / Tier B equivalence for label propagation: lpa_csr must match
the DataFrame implementation exactly (labels are integers; the vote sums on
the fixtures are integer-valued doubles, so no float-tolerance is needed)."""

from __future__ import annotations

from neo4j_graph_algorithms_spark.csr.lpa import lpa_csr
from neo4j_graph_algorithms_spark.operators.lpa import lpa
from tests.conftest import collect_map, edge_df

from tests.test_lpa import _f6a


def _labels(res):
    return collect_map(res.state, "vid", "label")


def test_csr_matches_tier_a_f6a_seeded(spark):
    edges, seeds = _f6a(spark)
    for direction in ("OUTGOING", "INCOMING", "BOTH"):
        a = _labels(lpa(spark, edges, seeds=seeds, direction=direction, max_iterations=3))
        b = _labels(
            lpa_csr(
                spark,
                edges,
                seeds=seeds,
                direction=direction,
                max_iterations=3,
                num_buckets=4,
            )
        )
        assert a == b, direction


def test_csr_matches_tier_a_id_seeds_multi_iter(spark):
    # ring + chain: multi-superstep propagation exercises the cogroup kernel
    # across buckets with re-keyed state every round
    pairs = [(i, (i + 1) % 8) for i in range(8)] + [(8, 9), (9, 10)]
    edges = edge_df(spark, pairs)
    a = _labels(lpa(spark, edges, direction="BOTH", max_iterations=5))
    b = _labels(lpa_csr(spark, edges, direction="BOTH", max_iterations=5, num_buckets=3))
    assert a == b


def test_csr_convergence_contract(spark):
    edges, seeds = _f6a(spark)
    a = lpa(spark, edges, seeds=seeds, max_iterations=10)
    b = lpa_csr(spark, edges, seeds=seeds, max_iterations=10, num_buckets=4)
    assert a.did_converge and b.did_converge
    assert a.iterations == b.iterations
    assert _labels(a) == _labels(b)


def test_csr_node_weights(spark):
    edges, seeds = _f6a(spark)
    nw = spark.createDataFrame([(3, 10.0)], "vid long, nweight double")
    a = _labels(lpa(spark, edges, seeds=seeds, node_weights=nw, max_iterations=1))
    b = _labels(
        lpa_csr(spark, edges, seeds=seeds, node_weights=nw, max_iterations=1, num_buckets=4)
    )
    assert a == b


def test_csr_metric_every_same_result(spark):
    edges, seeds = _f6a(spark)
    a = _labels(lpa_csr(spark, edges, seeds=seeds, max_iterations=4))
    b = _labels(lpa_csr(spark, edges, seeds=seeds, max_iterations=4, metric_every=3))
    assert a == b
