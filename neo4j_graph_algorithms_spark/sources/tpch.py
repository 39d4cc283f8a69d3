"""Graphs derived from the driver's TPC-H-ish testdata tables.

The correctness gate (CORRECTNESS_r{N}.json) runs our Spark queries against
DuckDB oracles over the same parquet, so the graph derivations here are
deliberately SQL-expressible and deterministic:

  * co-order graph  — parts co-occurring in the same order (the co-commit
    analogue: orders = commits, parts = files); canonical src<dst, weight =
    number of shared orders;
  * line-seq graph  — directed part→part edges following consecutive
    l_linenumber within an order (deterministic directed multigraph for
    PageRank / LPA);
  * typed graph     — line-seq edges typed by the order's priority bucket,
    node labels = partkey % 3 (heterogeneous fixture for metapath).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def coorder_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[src, dst, weight] canonical co-order part pairs."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    pairs = a.join(b, on="l_orderkey").filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
    return (
        pairs.select(
            F.col("a.l_partkey").cast("long").alias("src"),
            F.col("b.l_partkey").cast("long").alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )


def lineseq_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[src, dst] directed part→part succession edges within each order.

    Deterministic: ordered by (l_linenumber, l_partkey); self-successions
    dropped; parallel edges kept (multigraph, like the reference loader
    before accumulateWeights)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    seq = li.withColumn("next_pk", F.lead("l_partkey").over(w))
    return (
        seq.filter(F.col("next_pk").isNotNull() & (F.col("next_pk") != F.col("l_partkey")))
        .select(
            F.col("l_partkey").cast("long").alias("src"),
            F.col("next_pk").cast("long").alias("dst"),
        )
    )


def typed_graph(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(edges [src,dst,type], node_labels [vid, labels]) for metapath.

    Edge type = order priority bucket (first digit of o_orderpriority,
    1..5 → 0..4); node label = partkey % 3."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.substring("o_orderpriority", 1, 1).cast("int") - 1).alias("type"),
    )
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    seq = li.withColumn("next_pk", F.lead("l_partkey").over(w))
    edges = (
        seq.filter(F.col("next_pk").isNotNull() & (F.col("next_pk") != F.col("l_partkey")))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("l_partkey").cast("long").alias("src"),
            F.col("next_pk").cast("long").alias("dst"),
            F.col("type"),
        )
    )
    labels = (
        read_table(spark, sf_dir, "part")
        .select(F.col("p_partkey").cast("long").alias("vid"))
        .withColumn("labels", F.array((F.col("vid") % 3).cast("int")))
    )
    return edges, labels
