"""Structured-Streaming heavy hitters: per-user engagement counts + top-k.

The "trending accounts" query every event feed runs continuously.  Batch
twin = one groupBy(user) count + TakeOrderedAndProject; this module keeps
the SAME counts current as a streaming aggregation so the top-k is always
readable without rescanning history.  The reference has no streaming
surface (SURVEY.md §5); conventions follow streaming/events.py.

Exactness contract: count and the integer-scaled value sum are
commutative/associative, so the drained stream equals the batch aggregate
regardless of file/micro-batch arrival order, and the final top-k rank
(n_events desc, user_id asc — total tie order) is deterministic.  One
DuckDB oracle serves both.

Scale notes: streaming state is ONE row per user (the entity cardinality,
not |events|).  For web-scale user spaces the production variant bounds
state with a count-min + per-partition candidate heap; the exact
aggregation here is the gate-grade reference implementation the sketch
would be validated against — the hyperball/two_hop_ball pairing, again.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from neo4j_graph_algorithms_spark.streaming.events import stream_events


def user_count_stream(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """[user_id, n_events, _v6] streaming per-user engagement counts
    (value summed on the integer-scaled grid — exact, order-free)."""
    scaled = F.round(F.col(value_col) * F.lit(1e6)).cast("long")
    return events.groupBy(user_col).agg(
        F.count("*").alias("n_events"), F.sum(scaled).alias("_v6")
    )


def top_k_users(counts: DataFrame, k: int, user_col: str = "user_id") -> DataFrame:
    """[rank, user_id, n_events, total_value] — top-k by (n_events desc,
    user_id asc); TakeOrderedAndProject then a k-row rank window."""
    top = counts.orderBy(F.desc("n_events"), F.asc(user_col)).limit(k)
    w = Window.orderBy(F.desc("n_events"), F.asc(user_col))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            user_col,
            "n_events",
            (F.col("_v6") / F.lit(1e6)).alias("total_value"),
        )
    )


def run_heavy_hitters(
    spark: SparkSession,
    input_dir: str,
    k: int = 50,
    max_files_per_trigger: int | None = 1,
    timeout_s: int = 600,
) -> DataFrame:
    """Drain `input_dir` with an availableNow trigger through the per-user
    aggregation in COMPLETE mode, then return the final top-k table.  The
    memory sink is materialized and its temp view dropped before returning
    (repeated gate/bench calls must not accumulate driver-side sinks)."""
    stream = stream_events(spark, input_dir, max_files_per_trigger)
    counts = user_count_stream(stream)
    name = f"heavy_hitters_{uuid.uuid4().hex[:12]}"
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"availableNow drain did not finish within {timeout_s}s — "
            "refusing to return a partial top-k"
        )
    out = top_k_users(spark.table(name), k).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out
