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

import warnings

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, WEIGHT, EdgeFrame
from neo4j_graph_algorithms_spark.plans.runtime import SuperstepRunner

DIST = "dist"


def sssp(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    source: int,
    direction: str = "OUTGOING",
    max_iterations: int = 200,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
    initial_dists: DataFrame | None = None,
) -> DataFrame:
    """[vid, dist] shortest weighted distance from `source` to every
    reachable vertex (unreachable vertices are absent, matching the
    reference's stream output of touched nodes only).

    Runs on SuperstepRunner: state = [vid, dist, improved] where
    `improved` marks the live frontier, so the loop gets the runtime's
    durable per-superstep checkpoints + resume + metrics like the other
    iterative operators (north rule: runs resume mid-algorithm).

    `initial_dists` ([vid, dist]) WARM-STARTS from a prior run's output
    for the SAME source — the incremental mode when edges have been ADDED
    or weights DECREASED since (prior distances remain valid upper bounds;
    relaxation only lowers them, so the fixpoint is the true new
    distances).  Every seeded vertex relaxes once in superstep 0, then the
    frontier shrinks to the chains the change actually shortened —
    one full-edge pass plus the affected depth, instead of the full
    hop-radius walk.  INVALID after edge removal or weight increase
    (stale too-small bounds); run cold then."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    e = ef.with_direction(direction).df.select(SRC, DST, WEIGHT)
    # multi-edges: keep the cheapest parallel edge once up front; cached
    # pre-partitioned on the superstep join key
    e = e.groupBy(SRC, DST).agg(F.min(WEIGHT).alias(WEIGHT)).repartition(SRC)
    e.persist()
    e.count()

    src_row = spark.createDataFrame(
        [(int(source), 0.0, True)], f"{VID} long, {DIST} double, improved boolean"
    )
    if initial_dists is None:
        state0 = src_row
    else:
        state0 = (
            initial_dists.select(VID, DIST, F.lit(True).alias("improved"))
            .unionByName(src_row)
            .groupBy(VID)
            .agg(F.min(DIST).alias(DIST), F.first("improved").alias("improved"))
        )

    def step(state: DataFrame, i: int) -> DataFrame:
        frontier = state.filter(F.col("improved")).select(VID, DIST)
        relaxed = (
            e.join(
                frontier.withColumnRenamed(VID, SRC).hint("shuffle_hash"), on=SRC
            )
            .select(F.col(DST).alias(VID), (F.col(DIST) + F.col(WEIGHT)).alias(DIST))
            .groupBy(VID)
            .agg(F.min(DIST).alias("_cand"))
        )
        return (
            state.select(VID, DIST)
            .join(relaxed, on=VID, how="full_outer")
            .select(
                VID,
                F.least(F.col(DIST), F.col("_cand")).alias(DIST),
                (
                    F.col(DIST).isNull()
                    | (F.col("_cand").isNotNull() & (F.col("_cand") < F.col(DIST)))
                ).alias("improved"),
            )
        )

    def metric(new: DataFrame, old: DataFrame, i: int) -> float:
        return float(new.filter(F.col("improved")).count())

    runner = SuperstepRunner(
        spark,
        max_iterations=max_iterations,
        metric=metric,
        converged=lambda n_improved: n_improved == 0,
        checkpoint_dir=checkpoint_dir,
        checkpoint_interval=checkpoint_interval,
        job_group="linkgraph-sssp",
    )
    result = runner.run(state0, step, resume=resume)
    e.unpersist()
    return result.state.select(VID, DIST)


def delta_stepping(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    source: int,
    delta: float = 3.0,
    direction: str = "OUTGOING",
    max_iterations: int = 10_000,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
) -> DataFrame:
    """[vid, dist] Δ-stepping SSSP (impl/ShortestPathDeltaStepping.java).

    Buckets b = floor(dist/Δ) processed in ascending order; light/heavy
    split is unnecessary in the dataflow form — within a bucket, settled
    frontier vertices relax repeatedly until no vertex of the bucket
    improves (covers light-edge chains), then the bucket advances.
    Identical result to `sssp`; bucket ordering bounds wasted relaxations
    when Δ matches the weight scale.

    Runs on SuperstepRunner as ONE flat loop (durable checkpoints + resume
    like the other iterative operators): state = [vid, dist, improved],
    and each superstep relaxes the flagged rows of the CURRENT bucket,
    where current = min bucket over flagged rows — a 1-row aggregate
    cross-joined into the plan, so bucket sequencing, in-bucket draining,
    and empty-bucket skipping all happen declaratively with no nested
    driver loop.  Non-negative weights mean relaxations never flag a bucket
    below the current one, so the min is exactly the reference's ascending
    bucket cursor.
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    e = ef.with_direction(direction).df.select(SRC, DST, WEIGHT)
    # cheapest parallel edge once up front; cached pre-partitioned on the
    # superstep join key
    e = e.groupBy(SRC, DST).agg(F.min(WEIGHT).alias(WEIGHT)).repartition(SRC)
    e.persist()
    e.count()

    state0 = spark.createDataFrame(
        [(int(source), 0.0, True)], f"{VID} long, {DIST} double, improved boolean"
    )
    bucket = F.floor(F.col(DIST) / F.lit(float(delta)))

    def step(state: DataFrame, i: int) -> DataFrame:
        # current bucket: 1-row aggregate — a scalar, not |V| state, so
        # broadcasting it is the right plan (CLAUDE.md's no-broadcast rule
        # is about vertex-state-sized frames)
        cur = state.filter(F.col("improved")).agg(F.min(bucket).alias("_b"))
        in_frontier = F.col("improved") & bucket.eqNullSafe(F.col("_b"))
        frontier = (
            state.crossJoin(F.broadcast(cur)).filter(in_frontier).select(VID, DIST)
        )
        relaxed = (
            e.join(frontier.withColumnRenamed(VID, SRC).hint("shuffle_hash"), on=SRC)
            .select(F.col(DST).alias(VID), (F.col(DIST) + F.col(WEIGHT)).alias(DIST))
            .groupBy(VID)
            .agg(F.min(DIST).alias("_cand"))
        )
        improved_now = F.col("_cand").isNotNull() & (
            F.col(DIST).isNull() | (F.col("_cand") < F.col(DIST))
        )
        return (
            state.crossJoin(F.broadcast(cur))
            .join(relaxed, on=VID, how="full_outer")
            .select(
                VID,
                F.least(F.col(DIST), F.col("_cand")).alias(DIST),
                # flag semantics = "out-edges not yet relaxed at this dist":
                # set on improvement; kept for flagged later-bucket rows;
                # cleared for just-relaxed frontier rows that didn't improve
                F.when(improved_now, F.lit(True))
                .when(F.col("improved") & ~in_frontier, F.lit(True))
                .otherwise(F.lit(False))
                .alias("improved"),
            )
        )

    def metric(new: DataFrame, old: DataFrame, i: int) -> float:
        return float(new.filter(F.col("improved")).count())

    runner = SuperstepRunner(
        spark,
        max_iterations=max_iterations,
        metric=metric,
        converged=lambda n_flagged: n_flagged == 0,
        checkpoint_dir=checkpoint_dir,
        checkpoint_interval=checkpoint_interval,
        job_group="linkgraph-delta-stepping",
    )
    result = runner.run(state0, step, resume=resume)
    if not result.converged:
        warnings.warn(
            f"delta_stepping: frontier non-empty after max_iterations="
            f"{max_iterations} supersteps; distances may be non-final",
            RuntimeWarning,
        )
    e.unpersist()
    return result.state.select(VID, DIST)


def shortest_paths(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    source: int,
    direction: str = "OUTGOING",
) -> DataFrame:
    """algo.shortestPaths semantics: SSSP from source to every target
    (impl/ShortestPaths.java) — alias of `sssp`, stream shape [vid, dist]."""
    return sssp(spark, edges, source, direction)


def shortest_path(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    source: int,
    target: int,
    direction: str = "OUTGOING",
    max_iterations: int = 200,
) -> DataFrame:
    """[step, vid, dist] — the actual node SEQUENCE of the shortest
    source→target path, matching algo.shortestPath's stream of
    (nodeId, cost) rows in path order (impl/ShortestPathDijkstra.java:47-89,
    proc ShortestPathProc.java:73-103).  Empty when target is unreachable.

    Ties are broken canonically: pred(v) = MIN u among
    {u : dist(u) + w(u,v) = dist(v)}, so the path is deterministic and
    oracle-reproducible.

    Plan: converged SSSP distances, one edge⋈dist join to derive canonical
    predecessors, then the pred-chain of `target` extracted with POINTER
    DOUBLING (chain ∪= jump(chain); jump ∘= jump) — O(log path) rounds, no
    O(path)-length driver walk.  The final ordering window touches only the
    path's own rows (bounded by path length, not graph size)."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    e = ef.with_direction(direction).df.select(SRC, DST, WEIGHT)
    e = e.groupBy(SRC, DST).agg(F.min(WEIGHT).alias(WEIGHT))
    dist = sssp(spark, e, source, "OUTGOING", max_iterations)
    return path_from_dists(spark, e, dist, source, target)


def path_from_dists(
    spark: SparkSession,
    e: DataFrame,
    dist: DataFrame,
    source: int,
    target: int,
) -> DataFrame:
    """[step, vid, dist] — canonical node sequence source→target derived
    from converged distances `dist` ([vid, dist]) over normalized edges `e`
    ([src, dst, weight], cheapest parallel edge only).  Shared by
    `shortest_path` (full SSSP) and `astar.astar_path` (goal-pruned dists —
    sound because every tight predecessor of an optimal-path vertex is
    itself on an optimal path, hence never pruned; see astar.py).

    Pred-chain extraction via pointer doubling — O(log path) rounds; the
    final ordering window touches only the path's own rows."""
    # canonical predecessor of every settled vertex (except the source)
    pred = (
        e.join(dist.withColumnRenamed(VID, SRC).withColumnRenamed(DIST, "_ds"), on=SRC)
        .join(dist.withColumnRenamed(VID, DST).withColumnRenamed(DIST, "_dd"), on=DST)
        .filter(F.col("_ds") + F.col(WEIGHT) == F.col("_dd"))
        .groupBy(F.col(DST).alias(VID))
        .agg(F.min(SRC).alias("pred"))
        .filter(F.col(VID) != int(source))
        .localCheckpoint(eager=True)
    )

    chain = dist.filter(F.col(VID) == int(target)).select(VID)
    if chain.isEmpty():
        return spark.createDataFrame([], f"step int, {VID} long, {DIST} double")
    chain = chain.localCheckpoint(eager=True)
    jump = pred.select(F.col(VID).alias("_f"), F.col("pred").alias("_t"))
    for _ in range(64):  # 2^64 ancestors — always enough
        grown = (
            chain.join(jump.withColumnRenamed("_f", VID), on=VID, how="inner")
            .select(F.col("_t").alias(VID))
            .unionByName(chain)
            .distinct()
            .localCheckpoint(eager=True)
        )
        if grown.count() == chain.count():
            chain = grown
            break
        chain = grown
        # compose the jump with itself: _f -> 2^(k+1)-th ancestor
        jump = (
            jump.alias("a")
            .join(jump.alias("b"), F.col("a._t") == F.col("b._f"), "inner")
            .select(F.col("a._f").alias("_f"), F.col("b._t").alias("_t"))
            .localCheckpoint(eager=True)
        )
        if jump.isEmpty():
            break
    from pyspark.sql import Window

    on_path = chain.join(dist, on=VID)
    # With strictly positive weights (assumed — Dijkstra's precondition,
    # shared with the reference) path distances are strictly increasing, so
    # ordering by DIST is the chain order; the VID tie-break only pins
    # determinism for degenerate zero-weight inputs.  Bounded window: the
    # chain's rows only, never graph-sized.
    return on_path.select(
        (F.row_number().over(Window.orderBy(DIST, VID)) - 1).alias("step"), VID, DIST
    )


def all_shortest_paths_weighted(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    sources: DataFrame | None = None,
    direction: str = "OUTGOING",
    max_iterations: int = 200,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
) -> DataFrame:
    """[source, vid, dist] weighted all-pairs shortest distances — the
    algo.allShortestPaths.stream WEIGHTED variant
    (impl/AllShortestPaths.java:31-218: one weighted SSSP per source node,
    streamed as (sourceNodeId, targetNodeId, distance)).

    Dataflow form: ALL sources relax together, state keyed (source, vid) —
    the sssp frontier relaxation generalized by one key column.  Each
    superstep shuffles only the improved (source, vid) frontier against the
    pre-partitioned edge cache.  `sources=None` = every vertex (O(n·m) total
    work, like the reference's n Dijkstra runs); pass a sample at scale.
    Self rows (dist 0) are included, matching the reference's stream."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    e = ef.with_direction(direction).df.select(SRC, DST, WEIGHT)
    e = e.groupBy(SRC, DST).agg(F.min(WEIGHT).alias(WEIGHT)).repartition(SRC)
    e.persist()
    e.count()

    src_df = sources.select(VID) if sources is not None else ef.vertices()
    state0 = src_df.select(
        F.col(VID).alias("source"),
        F.col(VID),
        F.lit(0.0).alias(DIST),
        F.lit(True).alias("improved"),
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        frontier = state.filter(F.col("improved")).select("source", VID, DIST)
        # shuffle_hash hint on the EDGE side: same no-broadcast-of-state
        # strategy, but hinting the checkpointed frontier side trips a
        # Catalyst NoSuchElementException in Spark 4.1 (key not found:
        # source#N) during the next localCheckpoint
        relaxed = (
            e.hint("shuffle_hash").join(frontier.withColumnRenamed(VID, SRC), on=SRC)
            .select(
                "source", F.col(DST).alias(VID), (F.col(DIST) + F.col(WEIGHT)).alias(DIST)
            )
            .groupBy("source", VID)
            .agg(F.min(DIST).alias("_cand"))
        )
        # single full-outer merge per round: new dist + improved flag in ONE
        # state frame (the runner checkpoints it)
        return (
            state.select("source", VID, DIST)
            .join(relaxed, on=["source", VID], how="full_outer")
            .select(
                "source",
                VID,
                F.least(F.col(DIST), F.col("_cand")).alias(DIST),
                (
                    F.col(DIST).isNull()
                    | (F.col("_cand").isNotNull() & (F.col("_cand") < F.col(DIST)))
                ).alias("improved"),
            )
        )

    def metric(new: DataFrame, old: DataFrame, i: int) -> float:
        return float(new.filter(F.col("improved")).count())

    runner = SuperstepRunner(
        spark,
        max_iterations=max_iterations,
        metric=metric,
        converged=lambda n_improved: n_improved == 0,
        checkpoint_dir=checkpoint_dir,
        checkpoint_interval=checkpoint_interval,
        job_group="linkgraph-apsp-weighted",
    )
    result = runner.run(state0, step, resume=resume)
    if not result.converged:
        warnings.warn(
            f"all_shortest_paths_weighted: frontier still active after "
            f"max_iterations={max_iterations}; distances may be non-final",
            RuntimeWarning,
        )
    e.unpersist()
    return result.state.select("source", VID, DIST)
