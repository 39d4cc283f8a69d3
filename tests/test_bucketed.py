"""Bucketed edge tables: the stored partitioning must eliminate the
exchange on bucket-keyed joins and aggregations."""

import uuid

from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.sources.bucketed import (
    read_edges_bucketed,
    save_edges_bucketed,
)
from tests.conftest import edge_df


def _tbl():
    return "t_" + uuid.uuid4().hex[:10]


def test_bucketed_join_has_no_exchange(spark):
    pairs = [(i % 50, (i * 7) % 50) for i in range(400)]
    name_a, name_b = _tbl(), _tbl()
    try:
        save_edges_bucketed(edge_df(spark, pairs), name_a, buckets=8)
        save_edges_bucketed(edge_df(spark, pairs), name_b, buckets=8)
        a = read_edges_bucketed(spark, name_a)
        b = read_edges_bucketed(spark, name_b).select(
            F.col("src"), F.col("dst").alias("dst2")
        )
        # tiny fixtures auto-broadcast (which sidesteps bucketing); force the
        # shuffle-based planner path the way a 10^12-row table would take
        plan = (
            a.hint("merge")
            .join(b, on="src")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        # round-trip fidelity
        assert read_edges_bucketed(spark, name_a).count() == len(pairs)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name_a}")
        spark.sql(f"DROP TABLE IF EXISTS {name_b}")


def test_bucketed_aggregation_has_no_exchange(spark):
    pairs = [(i % 20, i) for i in range(200)]
    name = _tbl()
    try:
        save_edges_bucketed(edge_df(spark, pairs), name, buckets=4)
        t = read_edges_bucketed(spark, name)
        plan = (
            t.groupBy("src").count()._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, plan
        got = {r["src"]: r["count"] for r in t.groupBy("src").count().collect()}
        assert got[0] == 10
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
