"""Katz centrality — attenuated path counting (Katz 1953; the gds.katz
analogue of the reference's pageRank family, impl/PageRank.java for the
superstep conventions).

katz(v) = Σ_{k>=1} Σ_{u: u -k-> v} α^k · β  — every incoming walk of
length k contributes α^k.  Delta-push fixpoint: delta_{t+1}(v) =
α · Σ_{u->v} delta_t(u) with delta_0 = β, score = Σ_t delta_t.  The loop is
the PageRank push with the degree normalization replaced by the constant
attenuation α — same pre-partitioned edge cache, same hinted state
projections, same delta-filtered sends.

Convergence needs α < 1/λ_max(A); with fixed `max_iterations` the result
is the truncated Katz sum, deterministic for any α (the oracle unrolls the
same truncation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame
from neo4j_graph_algorithms_spark.plans.runtime import SuperstepResult, SuperstepRunner


def katz(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    alpha: float = 0.05,
    beta: float = 1.0,
    max_iterations: int = 20,
    tolerance: float | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
) -> SuperstepResult:
    """Result state is [vid, score, delta] — truncated Katz centrality
    after `max_iterations` push rounds (or earlier if the summed |delta|
    drops below `tolerance`).

    Multigraph semantics: parallel edges each carry a walk (matching the
    reference loader before accumulateWeights), so A is the multigraph
    adjacency count matrix.
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    adj = ef.df.select(SRC, DST).repartition(SRC).persist()
    adj.count()

    init = ef.vertices().select(
        VID,
        F.lit(float(beta)).alias("score"),
        F.lit(float(beta)).alias("delta"),
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        send = state.filter(F.col("delta") != 0).select(
            F.col(VID).alias(SRC), "delta"
        )
        msg = (
            adj.join(send.hint("shuffle_hash"), on=SRC)
            .groupBy(F.col(DST).alias(VID))
            .agg((F.lit(float(alpha)) * F.sum("delta")).alias("_m"))
        )
        return state.join(msg.hint("shuffle_hash"), on=VID, how="left").select(
            VID,
            (F.col("score") + F.coalesce("_m", F.lit(0.0))).alias("score"),
            F.coalesce("_m", F.lit(0.0)).alias("delta"),
        )

    runner = SuperstepRunner(
        spark,
        max_iterations=max_iterations,
        metric=(
            (lambda new, old, i: float(new.agg(F.sum(F.abs("delta"))).collect()[0][0] or 0.0))
            if tolerance is not None
            else None
        ),
        converged=(lambda m: m < tolerance) if tolerance is not None else None,
        checkpoint_dir=checkpoint_dir,
        checkpoint_interval=checkpoint_interval,
        job_group="linkgraph-katz",
    )
    res = runner.run(init, step, resume=resume)
    adj.unpersist()
    return res
