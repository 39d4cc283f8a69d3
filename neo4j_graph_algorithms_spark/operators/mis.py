"""Maximal independent set — Luby's algorithm with deterministic hash
priorities (Luby, SIAM J. Comput. 1986).

The reference has no MIS procedure; this is a beyond-catalogue distributed
primitive (the building block of parallel coloring / matching / scheduling)
in the repo's superstep shape.  Per round, an undecided vertex enters the
set iff its priority is the strict minimum among itself and all undecided
neighbors; winners' neighbors drop out; repeat until no vertex is
undecided.  Expected O(log |V|) rounds with well-mixed priorities.

Determinism contract (oracle-crossable): priority is the lexicographic
pair (h(vid), vid) with h the repo's universal hash family
(pipeline/text.py:hash_params — same (a·x+b) mod P on both engines).
Spark compares `struct(h, vid)` (exact at any id width); the DuckDB twin
compares the composite integer h·2³² + vid — identical order for test ids
< 2³², documented at oracles.py:mis_sql.  Ties are impossible (vid is
unique), so the set, the per-vertex decision round, and the round count
are all engine-independent and re-shard-invariant.

Scale shape: the undirected edge cache is pre-partitioned on src and
reused every round; per round the work is two hash joins against the
SHRINKING undecided projection (hinted shuffle_hash so Catalyst never
broadcasts a |V|-sized frame — repo convention) + one map-side-combinable
min.  State is one row per vertex; no round touches more than the still-
undecided subgraph, so rounds get cheaper as the set fills — the same
frontier-economy as sssp/wcc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame
from neo4j_graph_algorithms_spark.pipeline.text import HASH_P, hash_params
from neo4j_graph_algorithms_spark.plans.runtime import SuperstepRunner

# status codes: 0 undecided, 1 in the set, 2 knocked out by a neighbor
_UNDECIDED, _IN, _OUT = 0, 1, 2


def maximal_independent_set(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    seed: int = 17,
    max_iterations: int = 60,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
) -> DataFrame:
    """[vid, in_mis, round] for EVERY vertex: `in_mis` marks membership in
    the maximal independent set over the undirected simple graph (parallel
    edges collapsed, self-loops dropped — a self-looped vertex still
    participates; independence concerns distinct neighbors only);
    `round` is the 1-based superstep the vertex was decided in.
    """
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

    a, b = hash_params(seed)
    key = F.pmod(F.pmod(F.col(VID), F.lit(HASH_P)) * a + b, F.lit(HASH_P))
    state0 = (
        ef.vertices()
        .select(
            VID,
            key.alias("_k"),
            F.lit(_UNDECIDED).alias("status"),
            F.lit(0).alias("round"),
        )
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        und_v = state.filter(F.col("status") == _UNDECIDED).select(VID, "_k")
        # undirected edges with BOTH endpoints undecided; per-vertex min
        # neighbor priority (lexicographic (hash, vid) via struct ordering)
        live = (
            und.join(
                und_v.select(F.col(VID).alias(SRC)).hint("shuffle_hash"),
                on=SRC,
            )
            .join(
                und_v.select(
                    F.col(VID).alias(DST), F.col("_k").alias("_nk")
                ).hint("shuffle_hash"),
                on=DST,
            )
        )
        min_nb = live.groupBy(F.col(SRC).alias(VID)).agg(
            F.min(F.struct(F.col("_nk").alias("_k"), F.col(DST).alias(VID))).alias(
                "_mn"
            )
        )
        decided = (
            und_v.join(min_nb, on=VID, how="left")
            .select(
                VID,
                F.when(
                    F.col("_mn").isNull()
                    | (F.struct(F.col("_k"), F.col(VID)) < F.col("_mn")),
                    F.lit(_IN),
                ).alias("_win"),
            )
            .filter(F.col("_win").isNotNull())
            .select(VID, F.lit(_IN).alias("_new"))
        )
        knocked = (
            und.join(
                decided.select(F.col(VID).alias(SRC)).hint("shuffle_hash"),
                on=SRC,
            )
            .select(F.col(DST).alias(VID))
            .distinct()
            .join(und_v.select(VID), on=VID)  # only still-undecided drop out
            .select(VID, F.lit(_OUT).alias("_new"))
        )
        delta = decided.unionByName(knocked)
        return (
            state.join(delta, on=VID, how="left")
            .select(
                VID,
                "_k",
                F.coalesce(F.col("_new"), F.col("status")).alias("status"),
                F.when(F.col("_new").isNotNull(), F.lit(i + 1))
                .otherwise(F.col("round"))
                .alias("round"),
            )
        )

    def metric(new: DataFrame, old: DataFrame, i: int) -> float:
        return float(new.filter(F.col("status") == _UNDECIDED).count())

    runner = SuperstepRunner(
        spark,
        max_iterations=max_iterations,
        metric=metric,
        converged=lambda undecided: undecided == 0,
        checkpoint_dir=checkpoint_dir,
        checkpoint_interval=checkpoint_interval,
        job_group="linkgraph-mis",
    )
    result = runner.run(state0, step, resume=resume)
    leftover = result.state.filter(F.col("status") == _UNDECIDED)
    if not leftover.isEmpty():
        raise RuntimeError(
            f"maximal_independent_set did not decide every vertex within "
            f"{max_iterations} rounds — raise max_iterations"
        )
    und.unpersist()
    return result.state.select(
        VID, (F.col("status") == _IN).alias("in_mis"), "round"
    )
