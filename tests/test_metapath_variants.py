"""Metapath variant tests: between-instances, high-degree precompute +
reload, schema-full enumeration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.operators.metapath import (
    compute_all_metapaths,
    compute_metapaths_schema_full,
    metapath_between,
    precompute_high_degree_metapaths,
    read_precomputed_metapaths,
)


@pytest.fixture(scope="module")
def hetero(spark):
    """0(l0)-1(l1)-2(l0)-3(l2) path, edge types 0,1,0."""
    edges = spark.createDataFrame(
        [(0, 1, 0), (1, 2, 1), (2, 3, 0)], "src long, dst long, type int"
    )
    labels = spark.createDataFrame(
        [(0, [0]), (1, [1]), (2, [0]), (3, [2])], "vid long, labels array<int>"
    )
    return edges, labels


def test_metapath_between_instances(spark, hetero):
    edges, labels = hetero
    got = {r.path: r.cnt for r in metapath_between(spark, edges, labels, 0, 2, 3).collect()}
    # 0 -> 1 -> 2: labels 0|0|1|1|0, one walk
    assert got == {"0|0|1|1|0": 1}
    # start==end with length 1: the trivial label path
    got2 = {r.path: r.cnt for r in metapath_between(spark, edges, labels, 0, 0, 1).collect()}
    assert got2 == {"0": 1}


def test_precompute_high_degree_and_reload(spark, hetero, tmp_path):
    edges, labels = hetero
    out = str(tmp_path / "mp")
    df = precompute_high_degree_metapaths(
        spark, edges, labels, length=2, ratio=0.5, output_path=out
    )
    want = {(r.start, r.path, r.end) for r in df.collect()}
    # top-2 degree nodes are 1 and 2 (degree 2 each); per-start-node index:
    # start -> (type|label expansion) -> end node (reference result shape
    # HashMap<start, HashMap<path, HashSet<end>>>)
    assert want == {
        (1, "0|0", 0),
        (1, "1|0", 2),
        (2, "1|1", 1),
        (2, "0|2", 3),
    }
    reloaded = {
        (r.start, r.path, r.end) for r in read_precomputed_metapaths(spark, out).collect()
    }
    assert reloaded == want


def test_schema_full_weights(spark, hetero):
    from neo4j_graph_algorithms_spark.operators.metapath import (
        compute_metapaths_schema_full_weights,
    )

    edges, labels = hetero
    got = {
        r.path: r.weight
        for r in compute_metapaths_schema_full_weights(spark, edges, labels, 2).collect()
    }
    # 3 instance edges, distinct label pairs → 6 ordered segments, cnt 1
    # each, total 6; single-label seeds are NOT emitted (reference
    # ComputeAllMetaPathsSchemaFullWeights adds only expansions)
    assert set(got) == {"0|0|1", "0|1|1", "0|0|2", "1|0|0", "1|1|0", "2|0|0"}
    assert all(abs(w - 1 / 6) < 1e-12 for w in got.values())
    got3 = {
        r.path: r.weight
        for r in compute_metapaths_schema_full_weights(spark, edges, labels, 3).collect()
    }
    assert abs(got3["0|0|1|1|0"] - 1 / 36) < 1e-12
    assert all(p in got3 for p in got)  # shorter paths still present


def test_schema_full_enumeration(spark, hetero):
    edges, labels = hetero
    got = {r.path for r in compute_metapaths_schema_full(spark, edges, labels, 2).collect()}
    # schema edges: (0,0,1) [x2 canonicalized], (0,1,1)? l1-l0 via type1 -> (0,1,1)? 2(l0)-3(l2) type0 -> (0,0,2)
    assert "0" in got and "1" in got and "2" in got
    assert "0|0|1" in got  # l0 -type0- l1
    assert "0|0|2" in got or "2|0|0" in got  # l0 -type0- l2 schema edge


def test_schema_full_consistent_with_instances(spark, hetero):
    """Every instance path of length<=2 appears in the schema enumeration."""
    edges, labels = hetero
    inst = {r.path for r in compute_all_metapaths(spark, edges, labels, 2).collect()}
    schema = {
        r.path for r in compute_metapaths_schema_full(spark, edges, labels, 2).collect()
    }
    assert inst <= schema
