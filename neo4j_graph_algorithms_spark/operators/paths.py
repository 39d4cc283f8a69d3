"""Shortest-path operators (algo.shortestPath / .deltaStepping /
.shortestPaths).

The reference runs Dijkstra (impl/ShortestPathDijkstra.java, impl/
ShortestPaths.java) and parallel Δ-stepping (impl/ShortestPathDeltaStepping.
java).  Dijkstra's priority queue is sequential; the Spark-native
formulations are:

  * `sssp` — frontier relaxation (Bellman-Ford style): per superstep every
    improved vertex relaxes its out-edges; converges to the same distances
    for non-negative weights.  O(longest-shortest-path-hops) rounds, one
    shuffle each; only the improved frontier joins edges (delta/incremental
    like PageRank's `delta > 0` filter).
  * `delta_stepping` — the reference's own parallel design: process
    distance buckets [i·Δ, (i+1)·Δ) in order; within a bucket, relax until
    the bucket drains, then move on.  Identical outputs, fewer wasted
    relaxations on weighted graphs with spread-out distances.

Fixture: ShortestPathDeltaSteppingProcTest.java:46-92 (S→X = 8 over three
parallel chains).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, WEIGHT, EdgeFrame

DIST = "dist"


def sssp(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    source: int,
    direction: str = "OUTGOING",
    max_iterations: int = 200,
) -> DataFrame:
    """[vid, dist] shortest weighted distance from `source` to every
    reachable vertex (unreachable vertices are absent, matching the
    reference's stream output of touched nodes only)."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    e = ef.with_direction(direction).df.select(SRC, DST, WEIGHT)
    # multi-edges: keep the cheapest parallel edge once up front
    e = e.groupBy(SRC, DST).agg(F.min(WEIGHT).alias(WEIGHT))
    e.persist()
    e.count()

    dist = spark.createDataFrame([(int(source), 0.0)], f"{VID} long, {DIST} double")
    frontier = dist
    for _ in range(max_iterations):
        relaxed = (
            e.join(frontier.withColumnRenamed(VID, SRC), on=SRC)
            .select(F.col(DST).alias(VID), (F.col(DIST) + F.col(WEIGHT)).alias(DIST))
            .groupBy(VID)
            .agg(F.min(DIST).alias(DIST))
        )
        improved = (
            relaxed.alias("r")
            .join(dist.alias("d"), on=VID, how="left")
            .filter(F.col(f"d.{DIST}").isNull() | (F.col(f"r.{DIST}") < F.col(f"d.{DIST}")))
            .select(VID, F.col(f"r.{DIST}").alias(DIST))
            .localCheckpoint(eager=True)
        )
        if improved.rdd.isEmpty():
            break
        dist = (
            dist.join(improved, on=VID, how="left_anti")
            .unionByName(improved)
            .localCheckpoint(eager=True)
        )
        frontier = improved
    e.unpersist()
    return dist


def delta_stepping(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    source: int,
    delta: float = 3.0,
    direction: str = "OUTGOING",
    max_buckets: int = 10_000,
    max_inner: int = 200,
) -> DataFrame:
    """[vid, dist] Δ-stepping SSSP (impl/ShortestPathDeltaStepping.java).

    Buckets b = floor(dist/Δ) processed in ascending order; light/heavy
    split is unnecessary in the dataflow form — within a bucket we relax
    settled frontier vertices repeatedly until no vertex of the current
    bucket improves (covers light-edge chains), then advance.  Identical
    result to `sssp`; bucket ordering bounds wasted relaxations when Δ
    matches the weight scale.
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    e = ef.with_direction(direction).df.select(SRC, DST, WEIGHT)
    e = e.groupBy(SRC, DST).agg(F.min(WEIGHT).alias(WEIGHT))
    e.persist()
    e.count()

    dist = spark.createDataFrame([(int(source), 0.0)], f"{VID} long, {DIST} double")
    bucket = 0
    for _ in range(max_buckets):
        # frontier: members of the current bucket
        frontier = dist.filter(
            (F.col(DIST) >= bucket * delta) & (F.col(DIST) < (bucket + 1) * delta)
        ).localCheckpoint(eager=True)
        if frontier.rdd.isEmpty():
            # advance to the next non-empty bucket (or stop)
            nxt = dist.filter(F.col(DIST) >= (bucket + 1) * delta).agg(
                F.min(F.floor(F.col(DIST) / delta)).alias("b")
            ).collect()[0]["b"]
            if nxt is None:
                break
            bucket = int(nxt)
            continue
        for _i in range(max_inner):
            relaxed = (
                e.join(frontier.withColumnRenamed(VID, SRC), on=SRC)
                .select(F.col(DST).alias(VID), (F.col(DIST) + F.col(WEIGHT)).alias(DIST))
                .groupBy(VID)
                .agg(F.min(DIST).alias(DIST))
            )
            improved = (
                relaxed.alias("r")
                .join(dist.alias("d"), on=VID, how="left")
                .filter(F.col(f"d.{DIST}").isNull() | (F.col(f"r.{DIST}") < F.col(f"d.{DIST}")))
                .select(VID, F.col(f"r.{DIST}").alias(DIST))
                .localCheckpoint(eager=True)
            )
            if improved.rdd.isEmpty():
                break
            dist = (
                dist.join(improved, on=VID, how="left_anti")
                .unionByName(improved)
                .localCheckpoint(eager=True)
            )
            # re-relax only improvements still inside the current bucket;
            # later-bucket improvements wait their turn
            frontier = improved.filter(F.col(DIST) < (bucket + 1) * delta).localCheckpoint(
                eager=True
            )
            if frontier.rdd.isEmpty():
                break
        bucket += 1
    e.unpersist()
    return dist


def shortest_paths(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    source: int,
    direction: str = "OUTGOING",
) -> DataFrame:
    """algo.shortestPaths semantics: SSSP from source to every target
    (impl/ShortestPaths.java) — alias of `sssp`, stream shape [vid, dist]."""
    return sssp(spark, edges, source, direction)
