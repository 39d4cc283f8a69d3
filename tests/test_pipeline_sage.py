"""GraphSAGE neighborhood feature aggregation (pipeline/sage.py).

Fixture: path 0-1-2-3 with 2-dim features on vertices 0..2 (vertex 3 has
none — partial coverage).  Hand-computed micro-unit sums, including the
half-up grid rounding of the layer-1 mean feeding layer 2.
"""

from __future__ import annotations

from neo4j_graph_algorithms_spark.pipeline.sage import (
    MICRO,
    features_micro,
    sage_aggregate,
)
from tests.conftest import edge_df

PATH = [(0, 1), (1, 2), (2, 3)]
# vid -> feature vector; 0.0000005 probes the half-unit grid boundary
# (float32 rounds it just below 5e-7)
FEATS = {0: [1.0, -0.5], 1: [0.25, 0.0000005], 2: [-1.0, 2.0]}


def _emb_df(spark):
    rows = [(v, [float(x) for x in xs]) for v, xs in FEATS.items()]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_features_micro_half_up(spark):
    m = {
        (r["vid"], r["pos"]): r["m"]
        for r in features_micro(_emb_df(spark)).collect()
    }
    assert m[(0, 0)] == MICRO and m[(0, 1)] == -500_000
    # float32(0.0000005) is slightly BELOW 5e-7, so half-up stays at 0 —
    # the grid is defined on the float32-rounded value, same in every engine
    assert m[(1, 1)] == 0
    assert m[(2, 0)] == -MICRO and m[(2, 1)] == 2 * MICRO


def test_two_layer_sums(spark):
    out = {
        (r["vid"], r["pos"]): (r["sum1"], r["d1"], r["sum2"], r["d2"])
        for r in sage_aggregate(edge_df(spark, PATH), _emb_df(spark)).collect()
    }
    # vertex 0: neighbor {1} -> sum1 = feats[1]; vertex 3: neighbor {2}
    assert out[(0, 0)] == (250_000, 1, out[(0, 0)][2], out[(0, 0)][3])
    assert out[(3, 0)][:2] == (-MICRO, 1)
    # vertex 1: neighbors {0, 2} -> sum over both, d1 = 2
    assert out[(1, 0)][:2] == (0, 2)
    assert out[(1, 1)][:2] == (1_500_000, 2)
    # vertex 2: neighbors {1, 3}, only 1 has features
    assert out[(2, 0)][:2] == (250_000, 1)
    # layer 2 for vertex 0: neighbor 1's layer-1 mean = round(0/2), round(1.5M/2)
    assert out[(0, 0)][2:] == (0, 1)
    assert out[(0, 1)][2:] == (750_000, 1)
    # layer 2 for vertex 1: means of 0 and 2; mean1(0)=feats[1] grid, mean1(2)=feats[1]
    assert out[(1, 0)][2:] == (250_000 + 250_000, 2)
    # vertex 3 has a layer-1 row and neighbor 2 has one -> d2 = 1
    assert out[(3, 0)][2:] == (250_000, 1)


def test_half_up_mean_rounding(spark):
    # two neighbors with m = 0 and 1 -> mean 0.5 -> half-up 1
    edges = edge_df(spark, [(10, 11), (10, 12)])
    embs = spark.createDataFrame(
        [(11, [0.0]), (12, [0.000001])], "vec_id long, embedding array<float>"
    )
    out = sage_aggregate(edges, embs).collect()
    row = {(r["vid"], r["pos"]): r for r in out}[(10, 0)]
    assert (row["sum1"], row["d1"]) == (1, 2)
    # vertices 11/12: their only neighbor 10 has no features -> no sum1 row,
    # but 10's layer-2 aggregates over neighbors WITH layer-1 rows: none
    assert row["sum2"] is None and row["d2"] is None
