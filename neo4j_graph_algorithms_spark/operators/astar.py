"""A* / ALT goal-directed shortest path (landmark lower bounds).

The reference's point-to-point query (algo.shortestPath, impl/
ShortestPathDijkstra.java:47-89) settles vertices in distance order and
stops at the target — a goal-directed economy a frontier-relaxation SSSP
loses (it settles the whole reachable ball).  The Spark-native equivalent
of that economy is ALT (A* with Landmarks and Triangle inequality,
Goldberg & Harrelson, SODA'05): precompute exact distances from a few
landmarks, derive an admissible per-vertex lower bound h(v) ≥ 0 on the
remaining distance to the target, and PRUNE every relaxation whose
optimistic total g(v) + h(v) exceeds a proven upper bound U on d(s,t).

Exactness (why the gate can share shortest_path's oracle verbatim):
  * h is admissible: each landmark L gives d(v,t) ≥ d(L,t) − d(L,v)
    (forward dists from L) and d(v,t) ≥ d(v,L) − d(t,L) (reverse dists
    into L); max of those terms (clamped at 0) never overestimates.
  * U is a valid upper bound: min over L of d(s,L) + d(L,t) (a real s→t
    route), tightened to g(t) as soon as the target is reached.
  * pruning g + h(v) > U (STRICT) is safe: such an update's best possible
    completion g + d(v,t) ≥ g + h(v) > U ≥ d(s,t) cannot be optimal, while
    every vertex v on an optimal path keeps g*(v) + h(v) ≤ d(s,t) ≤ U and
    survives.  Hence converged g equals the true distance on every
    optimal-path vertex, every tight predecessor of an optimal-path vertex
    is itself on an optimal path (s→u→v→t is optimal when u is tight into
    on-path v), and `paths.path_from_dists` reconstructs the identical
    canonical chain a full SSSP yields.

When to use (measured, BENCH/BASELINE.md round-4 A/B): ALT pays on
point-to-point queries over graphs with real distance spread, with the
landmark cost amortized across many queries (`heuristic=`/`upper_bound=`
reuse).  A small-world link graph is its own few-hop ball — nothing to
prune (warm A* ≈ shortest_path + the h-join there).  Heavy weight-spread
inputs blow up frontier-relaxation ROUND counts for any Bellman-Ford-style
loop — use `delta_stepping` for those.

Scale shape: landmark tables are |V|-sized — NEVER broadcast (repo
convention): h is assembled once, then FOLDED INTO THE EDGE CACHE as an
h(dst) column via one shuffle-hash join (r5), so every superstep's ALT
prune is a plain column filter before the candidate aggregation — the
per-round plan is exactly the baseline SSSP's, minus the pruned rows.
Landmark precomputation is 2 SSSP runs per landmark, amortized across all
point-to-point queries on the same graph (pass `heuristic=` to reuse).
The g(t) probe that tightens U is FOLDED into the runner's metric
aggregation (one scalar job per superstep total, r5): the metric returns
(improved count, g(t)) from a single agg over the just-materialized state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, WEIGHT, EdgeFrame
from neo4j_graph_algorithms_spark.operators.paths import (
    DIST,
    path_from_dists,
    sssp,
)
from neo4j_graph_algorithms_spark.plans.runtime import SuperstepRunner

_INF = float("inf")


def pick_landmarks(e: DataFrame, n: int) -> list[int]:
    """Top-n vertices by total degree (ties by vid asc) — deterministic
    and cheap (one aggregation), but provably WEAK on hub graphs: a hub is
    close to everything, so both triangle terms d(L,t) − d(L,v) and
    d(v,L) − d(t,L) collapse toward 0.  Kept as the seed picker and for
    callers that want the no-extra-SSSP option; `astar_path` defaults to
    `pick_landmarks_farthest` (r5)."""
    deg = (
        e.select(F.col(SRC).alias(VID))
        .unionAll(e.select(F.col(DST).alias(VID)))
        .groupBy(VID)
        .agg(F.count("*").alias("_d"))
        .orderBy(F.desc("_d"), F.asc(VID))
        .limit(n)
    )
    return [int(r[VID]) for r in deg.collect()]


def pick_landmarks_farthest(
    spark: SparkSession, e: DataFrame, n: int, max_iterations: int = 200
) -> list[int]:
    """Farthest-point landmark selection (the standard ALT choice,
    Goldberg & Harrelson SODA'05 §3): seed with the highest-degree vertex,
    then greedily add the vertex maximizing its minimum UNDIRECTED
    distance to the chosen set — landmarks spread to the periphery, where
    the triangle bounds are widest.  Deterministic (max distance, ties by
    vid asc).  Costs n−1 undirected SSSPs, amortized across every
    point-to-point query on the graph like the rest of the landmark
    precompute.  Vertices unreachable from every chosen landmark never
    appear in the running min-distance table and so are never picked —
    correct: a landmark in a foreign component prunes nothing here."""
    seed = pick_landmarks(e, 1)
    if not seed or n <= 1:
        return seed[:n]
    und = (
        e.unionByName(
            e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), F.col(WEIGHT))
        )
        .groupBy(SRC, DST)
        .agg(F.min(WEIGHT).alias(WEIGHT))
    )
    lms = list(seed)
    mind: DataFrame | None = None
    for _ in range(n - 1):
        d = sssp(spark, und, lms[-1], "OUTGOING", max_iterations).select(
            VID, F.col(DIST).alias("_dn")
        )
        if mind is None:
            mind = d.withColumnRenamed("_dn", "_d")
        else:
            mind = mind.join(d, on=VID, how="full_outer").select(
                VID,
                F.least(
                    F.coalesce(F.col("_d"), F.lit(_INF)),
                    F.coalesce(F.col("_dn"), F.lit(_INF)),
                ).alias("_d"),
            )
        far = (
            mind.filter(~F.col(VID).isin([int(x) for x in lms]))
            .orderBy(F.desc("_d"), F.asc(VID))
            .limit(1)
            .collect()
        )
        if not far:
            break  # every reachable vertex is already a landmark
        lms.append(int(far[0][VID]))
    return lms


def landmark_heuristic(
    spark: SparkSession,
    e: DataFrame,
    source: int,
    target: int,
    landmarks: list[int],
    max_iterations: int = 200,
) -> tuple[DataFrame, float]:
    """Returns (h, U): `h` = [vid, h] admissible lower bounds on
    d(v, target); `U` = min over L of d(s,L) + d(L,t) (a real s→t route, or
    +inf when no landmark links them).  Two SSSP runs per landmark (fwd and
    reverse), each table read three ways — the h terms and the scalar
    d(L,t) / d(t,L) / d(s,L) probes — so nothing is computed twice.
    `e` must be normalized [src, dst, weight] (cheapest parallel edge)."""
    rev = e.select(
        F.col(DST).alias(SRC), F.col(SRC).alias(DST), F.col(WEIGHT)
    )
    terms: list[DataFrame] = []
    upper = _INF
    for lm in landmarks:
        fwd = sssp(spark, e, lm, "OUTGOING", max_iterations)  # d(L, v)
        bwd = sssp(spark, rev, lm, "OUTGOING", max_iterations)  # d(v, L)
        probes = {
            r[VID]: float(r[DIST])
            for r in fwd.filter(
                F.col(VID) == int(target)
            ).collect()
        }
        d_lt = probes.get(int(target), _INF)  # d(L, t)
        bw = {
            r[VID]: float(r[DIST])
            for r in bwd.filter(
                F.col(VID).isin([int(target), int(source)])
            ).collect()
        }
        d_tl = bw.get(int(target), _INF)  # d(t, L)
        d_sl = bw.get(int(source), _INF)  # d(s, L)
        upper = min(upper, d_sl + d_lt)
        if d_lt != _INF:
            # d(v,t) >= d(L,t) - d(L,v); rows with unknown d(L,v) give no bound
            terms.append(
                fwd.select(VID, (F.lit(d_lt) - F.col(DIST)).alias("_h"))
            )
        if d_tl != _INF:
            # d(v,t) >= d(v,L) - d(t,L)
            terms.append(
                bwd.select(VID, (F.col(DIST) - F.lit(d_tl)).alias("_h"))
            )
    if not terms:
        return spark.createDataFrame([], f"{VID} long, h double"), upper
    allb = terms[0]
    for t in terms[1:]:
        allb = allb.unionByName(t)
    h = (
        allb.groupBy(VID)
        .agg(F.greatest(F.max("_h"), F.lit(0.0)).alias("h"))
        .repartition(VID)
    )
    return h, upper


def astar_path(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    source: int,
    target: int,
    direction: str = "OUTGOING",
    landmarks: list[int] | int = 2,
    heuristic: DataFrame | None = None,
    upper_bound: float | None = None,
    max_iterations: int = 200,
) -> DataFrame:
    """[step, vid, dist] — the shortest source→target node sequence,
    row-identical to `paths.shortest_path` (same canonical min-pred ties),
    computed with ALT-pruned relaxation instead of a full SSSP.

    `landmarks`: explicit vertex ids, or an int n to pick the n highest-
    degree vertices.  `heuristic`/`upper_bound`: pass a precomputed [vid,h]
    frame + U to amortize landmark SSSPs across queries (h must be
    admissible for THIS target; U must be a real s→t path length or None).
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    e = ef.with_direction(direction).df.select(SRC, DST, WEIGHT)
    e = e.groupBy(SRC, DST).agg(F.min(WEIGHT).alias(WEIGHT)).repartition(SRC)

    cold = heuristic is None
    if cold:
        # the landmark SSSPs read e many times — worth its own cache
        e.persist()
        e.count()
        lms = (
            pick_landmarks_farthest(spark, e, landmarks, max_iterations)
            if isinstance(landmarks, int)
            else list(landmarks)
        )
        h, u_lm = landmark_heuristic(
            spark, e, source, target, lms, max_iterations
        )
        if upper_bound is None:
            upper_bound = u_lm
    else:
        h = heuristic
        if upper_bound is None:
            upper_bound = _INF
    h = h.repartition(VID)
    h.persist()
    h.count()

    # Fold the potential into the EDGE cache once (r5): each relaxation
    # then carries h(dst) as a plain column, so the per-superstep ALT prune
    # is a filter BEFORE the candidate aggregation — zero per-round joins
    # beyond the baseline SSSP's, and the pruned rows never reach the
    # groupBy exchange.  One-time cost: an edge-sized shuffle, amortized
    # over every superstep.  e_h is the ONLY edge cache the loop and the
    # path rebuild touch, so a warm query (heuristic=) materializes the
    # edge table exactly once, same as the baseline SSSP.
    e_h = (
        e.join(
            h.select(
                F.col(VID).alias(DST), F.col("h").alias("_h_dst")
            ).hint("shuffle_hash"),
            on=DST,
            how="left",
        )
        .repartition(SRC)
        .persist()
    )
    e_h.count()
    if cold:
        e.unpersist()

    state0 = spark.createDataFrame(
        [(int(source), 0.0, True)], f"{VID} long, {DIST} double, improved boolean"
    )
    bound = {"u": float(upper_bound)}

    def step(state: DataFrame, i: int) -> DataFrame:
        # bound["u"] was tightened by the PREVIOUS superstep's metric agg
        # (same information the old per-step g(t) probe read, one fewer
        # driver-blocking job per superstep); any U >= d(s,t) prunes safely,
        # so the folded timing never changes the output
        frontier = state.filter(F.col("improved")).select(VID, DIST)
        relax = e_h.join(
            frontier.withColumnRenamed(VID, SRC).hint("shuffle_hash"), on=SRC
        ).select(
            F.col(DST).alias(VID),
            (F.col(DIST) + F.col(WEIGHT)).alias(DIST),
            "_h_dst",
        )
        if bound["u"] != _INF:
            # ALT prune: g + h(v) > U can never complete below U (strict >).
            # Applied per-relaxation BEFORE the min-aggregation: the minimum
            # candidate has the smallest g, so it survives iff the
            # post-aggregation filter would have kept it — identical output,
            # smaller exchange.
            relax = relax.filter(
                F.col(DIST) + F.coalesce(F.col("_h_dst"), F.lit(0.0))
                <= F.lit(bound["u"])
            )
        relaxed = relax.groupBy(VID).agg(F.min(DIST).alias("_cand"))
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
        # ONE scalar job per superstep: improved count (convergence) AND
        # g(t) (the U tightener) from the same aggregation
        row = new.agg(
            F.coalesce(
                F.sum(F.col("improved").cast("long")), F.lit(0)
            ).alias("n"),
            F.min(F.when(F.col(VID) == int(target), F.col(DIST))).alias("gt"),
        ).collect()[0]
        if row["gt"] is not None:
            bound["u"] = min(bound["u"], float(row["gt"]))
        return float(row["n"])

    runner = SuperstepRunner(
        spark,
        max_iterations=max_iterations,
        metric=metric,
        converged=lambda n_improved: n_improved == 0,
        job_group="linkgraph-astar",
    )
    result = runner.run(state0, step)
    dist = result.state.select(VID, DIST)
    out = path_from_dists(spark, e_h.select(SRC, DST, WEIGHT), dist, source, target)
    h.unpersist()
    e_h.unpersist()
    return out
