"""Eigenvector centrality — power iteration on the undirected adjacency.

Not in the reference catalogue (its centrality family is pageRank /
betweenness / closeness / harmonic — /root/reference/algo/src/main/java/
org/neo4j/graphalgo/PageRankProc.java etc.), but its successor (Neo4j GDS
`gds.eigenvector`) ships it as a first-class centrality and it completes
this engine's family: the principal-eigenvector score PageRank approximates
with damping, computed undamped.

    x'(v) = Σ_{u ∈ N(v)} x(u),   then L2-normalize      (per iteration)

Fixed iteration count (deterministic — matches the unrolled DuckDB twin);
convergence to the principal eigenvector is geometric in λ2/λ1.

Scale conventions (same as operators/hits.py):
  * both-direction adjacency cached pre-partitioned on the gather key —
    only the |V|-sized score column shuffles per superstep;
  * `shuffle_hash` hints on score projections (never broadcast vertex
    state);
  * the L2 norm is a 1-row aggregate folded back via broadcast cross join
    (broadcasting a SCALAR is fine; |V|-sized builds are what's banned);
  * runs on SuperstepRunner: durable checkpoints + resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame
from neo4j_graph_algorithms_spark.plans.runtime import SuperstepResult, SuperstepRunner

SCORE = "score"


def eigenvector(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    vertices: DataFrame | None = None,
    max_iterations: int = 20,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
) -> SuperstepResult:
    """Return SuperstepResult whose state is [vid, score] (L2 norm 1).

    Isolated vertices score 0.  An edgeless graph keeps all scores 0 after
    the first normalization guard (norm 0 → divide by 1).
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    und = ef.canonical().df.select(SRC, DST)
    adj = (
        und.unionByName(und.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))
        .repartition(SRC)
        .persist()
    )
    adj.count()

    verts = vertices.select(VID) if vertices is not None else ef.vertices()
    state0 = verts.select(VID, F.lit(1.0).alias(SCORE))

    def step(state: DataFrame, i: int) -> DataFrame:
        scores = state.select(VID, SCORE).hint("shuffle_hash")
        raw = (
            scores.join(adj, scores[VID] == adj[SRC], "inner")
            .groupBy(F.col(DST).alias(VID))
            .agg(F.sum(SCORE).alias("s"))
        )
        norm = raw.agg(F.sqrt(F.sum(F.col("s") * F.col("s"))).alias("n"))
        return (
            state.select(VID)
            .join(raw.hint("shuffle_hash"), on=VID, how="left")
            .crossJoin(F.broadcast(norm))
            .select(
                VID,
                (
                    F.coalesce(F.col("s"), F.lit(0.0))
                    / F.when(
                        F.coalesce(F.col("n"), F.lit(0.0)) > 0, F.col("n")
                    ).otherwise(F.lit(1.0))
                ).alias(SCORE),
            )
        )

    runner = SuperstepRunner(
        spark,
        max_iterations=max_iterations,
        checkpoint_dir=checkpoint_dir,
        checkpoint_interval=checkpoint_interval,
        job_group="linkgraph-eigenvector",
    )
    result = runner.run(state0, step, resume=resume)
    adj.unpersist()
    return result
