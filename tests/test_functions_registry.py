"""Scalar functions, named-graph registry, graph reducer, MSColoring tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.functions import (
    combine_sorted,
    infinity,
    is_finite,
    is_infinite,
    register_sql_functions,
)
from neo4j_graph_algorithms_spark.operators.reducer import graph_reducer, label_dictionary
from neo4j_graph_algorithms_spark.operators.wcc import wcc
from neo4j_graph_algorithms_spark.registry import GraphRegistry, list_procedures

from tests.conftest import edge_df


def test_is_finite_infinite(spark):
    df = spark.createDataFrame(
        [(1.0,), (float("inf",),), (float("-inf"),), (float("nan"),), (None,)],
        "x double",
    )
    got = df.select(
        is_finite("x").alias("fin"), is_infinite("x").alias("inf")
    ).collect()
    assert [(r.fin, r.inf) for r in got] == [
        (True, False),
        (False, True),
        (False, True),
        (False, False),
        (False, False),
    ]


def test_infinity_and_sql_registration(spark):
    assert spark.range(1).select(infinity().alias("v")).collect()[0].v == float("inf")
    register_sql_functions(spark)
    row = spark.sql(
        "SELECT algo_isFinite(1.0) a, algo_isInfinite(algo_Infinity()) b"
    ).collect()[0]
    assert row.a is True and row.b is True


def test_combine_sorted_direction_agnostic(spark):
    df = spark.createDataFrame([(3, 7), (7, 3)], "a int, b int")
    keys = [r.k for r in df.select(combine_sorted("a", "b").alias("k")).collect()]
    assert keys[0] == keys[1] == 3 * 2**32 + 7


def test_graph_registry_lifecycle(spark):
    reg = GraphRegistry()
    edges = edge_df(spark, [(0, 1), (1, 2)])
    stats = reg.load("g1", edges)
    assert stats == {"name": "g1", "nodes": 3, "relationships": 2}
    assert reg.info("g1")["exists"] is True
    # algorithms resolve the cached graph by name
    res = wcc(spark, reg.get("g1"))
    assert res.state.count() == 3
    assert reg.remove("g1") is True
    assert reg.info("g1") == {"name": "g1", "exists": False}
    assert reg.remove("g1") is False
    with pytest.raises(KeyError):
        reg.get("g1")


def test_list_procedures(spark):
    procs = list_procedures()
    names = {p["name"] for p in procs}
    assert "algo.pageRank" in names and "algo.computeAllMetaPaths" in names
    assert all("implementation" in p for p in procs)
    assert [p["name"] for p in list_procedures("unionFind")] == [
        "algo.unionFind",
        "algo.unionFind.forkJoin",
        "algo.unionFind.forkJoinMerge",
        "algo.unionFind.mscoloring",
        "algo.unionFind.queue",
    ]


def test_graph_reducer(spark):
    edges = spark.createDataFrame(
        [(0, 1, 0), (1, 2, 1), (2, 3, 0)], "src long, dst long, type int"
    )
    labels = spark.createDataFrame(
        [(0, [0]), (1, [0, 1]), (2, [1]), (3, [2])],
        "vid long, labels array<int>",
    )
    e2, l2 = graph_reducer(edges, labels, keep_labels=[0, 1], keep_types=[0])
    assert {r.vid for r in l2.collect()} == {0, 1, 2}
    assert [(r.src, r.dst) for r in e2.collect()] == [(0, 1)]  # 2->3 loses node 3; type 1 dropped
    # label filter trims multi-label arrays
    got = {r.vid: r.labels for r in l2.collect()}
    assert got[1] == [0, 1] and got[2] == [1]


def test_label_dictionary(spark):
    names = spark.createDataFrame(
        [("Person",), ("Repo",), ("Person",)], "label_name string"
    )
    got = {r.label_name: r.label_id for r in label_dictionary(names).collect()}
    assert got == {"Person": 0, "Repo": 1}


def test_wcc_mscoloring_max_variant(spark):
    edges = edge_df(spark, [(0, 1), (1, 2), (5, 6)])
    res = {r.vid: r.comp for r in wcc(spark, edges, extremum="max").state.collect()}
    assert res == {0: 2, 1: 2, 2: 2, 5: 6, 6: 6}
