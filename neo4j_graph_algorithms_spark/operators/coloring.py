"""Greedy graph coloring — Jones–Plassmann with deterministic hash
priorities (Jones & Plassmann, SIAM J. Sci. Comput. 1993).

The reference has no coloring procedure; this completes the repo's
symmetry-breaking trilogy (operators/mis.py, operators/matching.py) —
coloring is the scheduling primitive (conflict-free rounds for updates
that must not touch adjacent vertices simultaneously).

Per round, an uncolored vertex colors itself iff every UNCOLORED neighbor
has a larger (h(vid), vid) priority; its color is the smallest
non-negative integer unused by its already-colored neighbors.  Rounds =
the longest priority-decreasing path — O(log |V|) expected under the
universal hash.  The result is a proper coloring with at most
max-degree + 1 colors (each vertex sees ≤ deg colored neighbors when it
picks).

Determinism contract (oracle-crossable): the same (hash, vid)
lexicographic priority as mis.py (struct-compared in Spark, composite
integer in the unrolled DuckDB twin at oracles.py:coloring_sql), and the
smallest-missing-color rule is pure integer set logic — so every color,
every decision round, and the round count are engine- and
re-shard-invariant.

Scale shape: per round, the uncolored⋈uncolored priority check and the
uncolored⋈colored color-set gather are hash joins against SHRINKING
frames (hinted shuffle_hash — never a graph-sized broadcast).  The
smallest-missing-color step materializes each candidate's colored-
neighbor color SET — bounded by the candidate's degree.  A 10⁶-degree
hub therefore collects a 10⁶-int set exactly once (the round it colors);
`max_degree_warn` flags such hubs instead of failing silently.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame
from neo4j_graph_algorithms_spark.pipeline.text import HASH_P, hash_params
from neo4j_graph_algorithms_spark.plans.runtime import SuperstepRunner


def greedy_coloring(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    seed: int = 17,
    max_iterations: int = 100,
    max_degree_warn: int = 100_000,
) -> DataFrame:
    """[vid, color, round] for EVERY vertex of the undirected simple graph
    (parallel edges collapsed, self-loops dropped): a proper greedy
    coloring — adjacent vertices never share a color; `round` is the
    1-based superstep the vertex was colored in."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    und = (
        ef.with_direction("BOTH")
        .df.select(SRC, DST)
        .filter(F.col(SRC) != F.col(DST))
        .distinct()
        .repartition(SRC)
    )
    und.persist()
    und.count()

    hub = (
        und.groupBy(SRC).agg(F.count("*").alias("_d"))
        .filter(F.col("_d") > max_degree_warn)
        .count()
    )
    if hub:
        warnings.warn(
            f"greedy_coloring: {hub} vertices exceed degree "
            f"{max_degree_warn}; each collects its full neighbor-color set "
            "in the round it colors (bounded but large)",
            RuntimeWarning,
            stacklevel=2,
        )

    a, b = hash_params(seed)
    key = F.pmod(F.pmod(F.col(VID), F.lit(HASH_P)) * a + b, F.lit(HASH_P))
    state0 = ef.vertices().select(
        VID,
        key.alias("_k"),
        F.lit(None).cast("int").alias("color"),
        F.lit(0).alias("round"),
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        unc = state.filter(F.col("color").isNull()).select(VID, "_k")
        pr = F.struct(F.col("_k"), F.col(VID))
        # min uncolored-neighbor priority per uncolored vertex
        min_unc_nb = (
            und.join(
                unc.select(F.col(VID).alias(SRC)).hint("shuffle_hash"), on=SRC
            )
            .join(
                unc.select(
                    F.col(VID).alias(DST), F.col("_k").alias("_nk")
                ).hint("shuffle_hash"),
                on=DST,
            )
            .groupBy(F.col(SRC).alias(VID))
            .agg(
                F.min(
                    F.struct(F.col("_nk").alias("_k"), F.col(DST).alias(VID))
                ).alias("_mn")
            )
        )
        cand = (
            unc.join(min_unc_nb.hint("shuffle_hash"), on=VID, how="left")
            .filter(F.col("_mn").isNull() | (pr < F.col("_mn")))
            .select(VID)
        )
        # colored-neighbor color sets of this round's candidates
        nb_colors = (
            und.join(
                cand.select(F.col(VID).alias(SRC)).hint("shuffle_hash"), on=SRC
            )
            .join(
                # shuffle_hash on the projection: the colored set grows to
                # |V| — without the hint, once the stats guard persists and
                # Catalyst sees real sizes it may broadcast a graph-scaled
                # frame (repo convention: never broadcast vertex state).
                state.filter(F.col("color").isNotNull())
                .select(F.col(VID).alias(DST), F.col("color").alias("_nc"))
                .hint("shuffle_hash"),
                on=DST,
            )
            .groupBy(F.col(SRC).alias(VID))
            .agg(F.collect_set("_nc").alias("_used"))
        )
        picked = (
            cand.join(nb_colors.hint("shuffle_hash"), on=VID, how="left")
            .select(
                VID,
                # NULL guard is load-bearing: size(NULL) = -1 and
                # sequence(0,-1) is the DESCENDING [0,-1] (repo trap list)
                F.when(F.col("_used").isNull(), F.lit(0))
                .otherwise(
                    F.array_min(
                        F.array_except(
                            F.sequence(F.lit(0), F.size("_used")),
                            F.col("_used"),
                        )
                    )
                )
                .alias("_c"),
            )
        )
        # min_unc_nb / nb_colors / picked are all vertex-state-scaled agg
        # outputs — hint each (they are fresh plans, not checkpointed
        # frames, so hinting them directly is safe per the repo convention)
        return (
            state.join(picked.hint("shuffle_hash"), on=VID, how="left")
            .select(
                VID,
                "_k",
                F.coalesce(F.col("color"), F.col("_c")).alias("color"),
                F.when(
                    F.col("color").isNull() & F.col("_c").isNotNull(),
                    F.lit(i + 1),
                )
                .otherwise(F.col("round"))
                .alias("round"),
            )
        )

    def metric(new: DataFrame, old: DataFrame, i: int) -> float:
        return float(new.filter(F.col("color").isNull()).count())

    runner = SuperstepRunner(
        spark,
        max_iterations=max_iterations,
        metric=metric,
        converged=lambda uncolored: uncolored == 0,
        job_group="linkgraph-coloring",
    )
    try:
        result = runner.run(state0, step)
        leftover = result.state.filter(F.col("color").isNull())
        if not leftover.isEmpty():
            raise RuntimeError(
                f"greedy_coloring did not color every vertex within "
                f"{max_iterations} rounds — raise max_iterations"
            )
    finally:
        # unpersist on every exit path — the incomplete-coloring raise used
        # to leak the cached edge frame for the session lifetime
        und.unpersist()
    return result.state.select(VID, "color", "round")
