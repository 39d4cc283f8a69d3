"""DAG operators: topological layering (longest-path levels) and cycle
detection.

Beyond the reference catalogue (its path procedures —
/root/reference/algo/src/main/java/org/neo4j/graphalgo/ShortestPathProc.java
etc. — are distance-oriented); topological levels are the scheduling view
of a dependency/link graph: level(v) = length of the longest path ending
at v, i.e. the earliest superstep at which v can run once all its
predecessors have.  Kahn layering and longest-path layering coincide.

Superstep shape (house conventions from operators/pagerank.py): the edge
table is cached pre-partitioned on src; each round joins only the CHANGED
frontier's projection (hinted `shuffle_hash` so Catalyst never broadcasts
anything state-sized) against it, max-aggregates into the targets
(map-side combine), and merges with a single state-keyed hash join.
Convergence = empty frontier, measured with one cheap aggregation — no
state-vs-state join.  Rounds = longest-path depth (the inherent bound for
unit-step layering).

A cycle makes levels grow without bound, which is exactly the detector:
in a DAG every level is < |V|, so `is_dag` runs the same loop and reports
non-convergence within |V| rounds (or any level reaching |V|) as a cycle.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame
from neo4j_graph_algorithms_spark.plans.runtime import SuperstepResult, SuperstepRunner


def topo_levels(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    max_iterations: int = 200,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
    _fail_level: int | None = None,
) -> SuperstepResult:
    """Result state is [vid, level]: longest-path-from-a-source depth of
    every vertex (sources = zero-in-degree vertices, level 0).

    Only meaningful on a DAG; on a cyclic input the loop hits
    `max_iterations` with a non-empty frontier and warns (RuntimeWarning),
    returning the partial (still-growing) levels — use `is_dag` first when
    cyclicity is unknown.
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    adj = ef.df.select(SRC, DST).distinct().repartition(SRC).persist()
    adj.count()

    init = ef.vertices().select(
        VID, F.lit(0).alias("level"), F.lit(True).alias("_chg")
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        # messages only from vertices whose level rose last round: the
        # frontier shrinks to the deep chains, everything else goes quiet
        frontier = state.filter(F.col("_chg")).select(
            F.col(VID).alias(SRC), "level"
        )
        msg = (
            adj.join(frontier.hint("shuffle_hash"), on=SRC)
            .groupBy(F.col(DST).alias(VID))
            .agg((F.max("level") + 1).alias("_m"))
        )
        return state.join(msg.hint("shuffle_hash"), on=VID, how="left").select(
            VID,
            F.greatest("level", F.coalesce("_m", F.lit(0))).alias("level"),
            (F.coalesce("_m", F.lit(0)) > F.col("level")).alias("_chg"),
        )

    def metric(new: DataFrame, old: DataFrame, i: int) -> float:
        agg = new.agg(
            F.count_if(F.col("_chg")).alias("n_chg"),
            F.max("level").alias("max_lvl"),
        ).collect()[0]
        if _fail_level is not None and (agg["max_lvl"] or 0) >= _fail_level:
            # cycle certificate: a simple path cannot reach |V| edges
            return float("inf")
        return float(agg["n_chg"])

    runner = SuperstepRunner(
        spark,
        max_iterations=max_iterations,
        metric=metric,
        converged=lambda m: m == 0.0 or m == float("inf"),
        checkpoint_dir=checkpoint_dir,
        checkpoint_interval=checkpoint_interval,
        job_group="linkgraph-topo-levels",
    )
    res = runner.run(init, step, resume=resume)
    hit_cycle_cert = bool(res.metrics) and res.metrics[-1]["metric"] == float("inf")
    if not res.converged and not hit_cycle_cert:
        warnings.warn(
            f"topo_levels: frontier still active after max_iterations="
            f"{max_iterations} — cyclic input or depth above the cap; "
            "levels are partial",
            RuntimeWarning,
        )
    adj.unpersist()
    return SuperstepResult(
        state=res.state.select(VID, "level"),
        iterations=res.iterations,
        converged=res.converged and not hit_cycle_cert,
        metrics=res.metrics,
        first_plan=res.first_plan,
    )


def is_dag(spark: SparkSession, edges: EdgeFrame | DataFrame) -> bool:
    """True iff the graph has no directed cycle.

    Runs the level loop with the |V|-round / |V|-level certificate: a DAG's
    layering converges with every level < |V|; any cycle keeps the frontier
    alive past it.  O(depth) rounds on a DAG, O(|V|) worst case on cyclic
    inputs — the inherent bound for unit-step propagation.
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    n = ef.vertices().count()
    if n == 0:
        return True
    res = topo_levels(spark, ef, max_iterations=n + 1, _fail_level=n)
    return res.converged
