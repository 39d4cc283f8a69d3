"""Greedy maximal matching — locally-minimal edges with deterministic hash
priorities (the Israeli–Itai / Blelloch-style parallel greedy scheme).

The reference has no matching procedure; this is a beyond-catalogue
distributed primitive (dedup pairing, load balancing, graph coarsening for
multilevel partitioners) in the repo's superstep shape, the edge-world
sibling of operators/mis.py.  Per round, a remaining edge enters the
matching iff its priority is the strict minimum among ALL remaining edges
incident to either endpoint; both endpoints are then removed; repeat until
no edge remains.  Expected O(log |E|) rounds with well-mixed priorities.

Determinism contract (oracle-crossable): priority is the lexicographic
triple (h(src) + h(dst) mod P, src, dst) over canonical src < dst pairs,
h the repo's universal hash family (pipeline/text.py:hash_params — same
on both engines).  Spark compares `struct(k, src, dst)` (exact at any id
width); the DuckDB twin compares the composite k·2⁴² + src·2²¹ + dst —
identical order while test ids stay < 2²¹ (documented at
oracles.py:matching_sql).  The triple is unique per edge (src,dst distinct
after canonicalization), so ties are impossible and the matching, each
edge's round, and the round count are engine- and re-shard-invariant.

Maximality: when the loop ends no edge has two unmatched endpoints, i.e.
the matching is maximal (and hence a 2-approximation of maximum).

Scale shape: the canonical edge cache is built once; per round the
per-vertex min-incident-priority is one map-side-combinable aggregation
over the SHRINKING remaining-edge set, and winners are the edges equal to
the min at BOTH endpoints (two hash joins against the vertex-min frame,
hinted shuffle_hash so Catalyst never broadcasts a frame that scales with
the graph — repo convention).  Remaining edges are re-filtered with an
anti-join against matched vertices; rounds get cheaper as vertices pair
off — the same frontier economy as sssp/wcc/mis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame
from neo4j_graph_algorithms_spark.pipeline.text import HASH_P, hash_params
from neo4j_graph_algorithms_spark.plans.runtime import SuperstepRunner


def maximal_matching(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    seed: int = 29,
    max_iterations: int = 60,
) -> DataFrame:
    """[src, dst, round] — the matched edges (canonical src < dst) of a
    maximal matching over the undirected simple graph (parallel edges
    collapsed, self-loops dropped), with the 1-based round each pair was
    matched in."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    a, b = hash_params(seed)

    def h(col: str):
        return F.pmod(F.pmod(F.col(col), F.lit(HASH_P)) * a + b, F.lit(HASH_P))

    canon = (
        ef.with_direction("BOTH")
        .df.select(
            F.least(SRC, DST).alias(SRC), F.greatest(SRC, DST).alias(DST)
        )
        .filter(F.col(SRC) != F.col(DST))
        .distinct()
        .select(
            SRC,
            DST,
            F.pmod(h(SRC) + h(DST), F.lit(HASH_P)).alias("_k"),
        )
    )

    # state = the remaining edge set itself (edge-world superstep); matched
    # pairs accumulate in `matched` via the runner's per-step closure
    matched: list[DataFrame] = []

    def step(state: DataFrame, i: int) -> DataFrame:
        pr = F.struct(F.col("_k"), F.col(SRC), F.col(DST))
        # per-vertex min incident priority over the remaining edges
        vmin = (
            state.select(F.col(SRC).alias(VID), pr.alias("_p"))
            .unionByName(state.select(F.col(DST).alias(VID), pr.alias("_p")))
            .groupBy(VID)
            .agg(F.min("_p").alias("_mn"))
        )
        wins = (
            state.join(
                vmin.select(F.col(VID).alias(SRC), F.col("_mn").alias("_ms")).hint(
                    "shuffle_hash"
                ),
                on=SRC,
            )
            .join(
                vmin.select(F.col(VID).alias(DST), F.col("_mn").alias("_md")).hint(
                    "shuffle_hash"
                ),
                on=DST,
            )
            .filter((pr == F.col("_ms")) & (pr == F.col("_md")))
            .select(SRC, DST, F.lit(i + 1).alias("round"))
            .localCheckpoint(eager=True)
        )
        matched.append(wins)
        gone = (
            wins.select(F.col(SRC).alias(VID))
            .unionByName(wins.select(F.col(DST).alias(VID)))
            .distinct()
        )
        return (
            state.join(
                gone.select(F.col(VID).alias(SRC)), on=SRC, how="left_anti"
            ).join(gone.select(F.col(VID).alias(DST)), on=DST, how="left_anti")
        ).select(SRC, DST, "_k")

    def metric(new: DataFrame, old: DataFrame, i: int) -> float:
        return float(new.count())

    runner = SuperstepRunner(
        spark,
        max_iterations=max_iterations,
        metric=metric,
        converged=lambda remaining: remaining == 0,
        job_group="linkgraph-matching",
    )
    result = runner.run(canon, step)
    if not result.state.isEmpty():
        raise RuntimeError(
            f"maximal_matching did not drain the edge set within "
            f"{max_iterations} rounds — raise max_iterations"
        )
    if not matched:
        return spark.createDataFrame([], f"{SRC} long, {DST} long, round int")
    out = matched[0]
    for m in matched[1:]:
        out = out.unionByName(m)
    return out
