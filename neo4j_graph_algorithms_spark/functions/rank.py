"""Distributed dense ranking — the scalable replacement for
`row_number()/dense_rank() over Window.orderBy(col)` (a SINGLE-PARTITION
global window: every row through one task).

Two-phase plan: range-repartition on the key (distributed sort), rank
WITHIN each partition (parallel window), then add broadcast per-partition
offsets.  One extra pass over the per-partition counts (tiny) buys a fully
partition-parallel ranking.  Deterministic for distinct keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def dense_ids(df: DataFrame, col: str, start: int = 0) -> DataFrame:
    """Append `_rk` (long, `start`-based) = global rank of `col` in
    ascending order.  `df` rows must be distinct on `col`."""
    spark = df.sparkSession
    npart = max(spark.sparkContext.defaultParallelism, 1)
    part = (
        df.repartitionByRange(npart, F.col(col))
        .withColumn("_p", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin partition ids
    )
    counts = part.groupBy("_p").agg(F.count("*").alias("_n")).collect()
    offs = []
    acc = start
    for row in sorted(counts, key=lambda r: r["_p"]):
        offs.append((row["_p"], acc))
        acc += row["_n"]
    off_df = spark.createDataFrame(offs or [(0, start)], "_p int, _off long")
    w = Window.partitionBy("_p").orderBy(col)
    return (
        part.withColumn("_r", F.row_number().over(w) - 1)
        .join(F.broadcast(off_df), on="_p")
        .withColumn("_rk", F.col("_off") + F.col("_r"))
        .drop("_p", "_r", "_off")
    )


def prefix_sums(df: DataFrame, order_col: str, value_col: str) -> DataFrame:
    """Append `_pre` (long) = EXCLUSIVE prefix sum of `value_col` over the
    global ascending order of `order_col` (rows must be distinct on it).

    Same two-phase plan as `dense_ids`: range-repartition on the order key,
    cumsum WITHIN each partition (parallel window), add broadcast
    per-partition offsets — no single-partition global window anywhere.
    """
    spark = df.sparkSession
    npart = max(spark.sparkContext.defaultParallelism, 1)
    part = (
        df.repartitionByRange(npart, F.col(order_col))
        .withColumn("_p", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin partition ids
    )
    sums = part.groupBy("_p").agg(F.sum(value_col).alias("_s")).collect()
    offs = []
    acc = 0
    for row in sorted(sums, key=lambda r: r["_p"]):
        offs.append((row["_p"], acc))
        acc += row["_s"] or 0
    off_df = spark.createDataFrame(offs or [(0, 0)], "_p int, _off long")
    w = (
        Window.partitionBy("_p")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        part.withColumn("_c", F.sum(value_col).over(w))
        .join(F.broadcast(off_df), on="_p")
        .withColumn(
            "_pre", (F.col("_off") + F.col("_c") - F.col(value_col)).cast("long")
        )
        .drop("_p", "_c", "_off")
    )
