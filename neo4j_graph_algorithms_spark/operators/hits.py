"""HITS (hubs & authorities) — Kleinberg's link-analysis twin of PageRank.

Not in the reference catalogue (its centrality family stops at
pageRank/betweenness/closeness/harmonic — /root/reference/algo/src/main/
java/org/neo4j/graphalgo/PageRankProc.java and BetweennessCentralityProc
.java), but it is the canonical second link-graph score every production
link-analysis stack ships, and it runs on exactly the same superstep
machinery (plans/runtime.py) with the same scale conventions:

  * per iteration:  auth'(v) = Σ_{u→v} hub(u), L2-normalized;
                    hub'(u)  = Σ_{u→v} auth'(v), L2-normalized;
  * the edge table is cached TWICE, pre-partitioned on each gather key
    (src for the auth step, dst for the hub step) so only the |V|-sized
    score column shuffles per half-step;
  * `shuffle_hash` hints on the score-side projections keep Catalyst from
    broadcasting vertex state (the serial driver-side build that caps
    cluster scaling — CLAUDE.md convention, pinned by
    tests/test_superstep_plans.py);
  * the L2 norm is a 1-row aggregate folded back with a broadcast cross
    join — broadcasting a SCALAR is fine; it is |V|-sized builds that are
    banned;
  * fixed-iteration mode (no convergence metric) = one pair of
    driver-coordinated jobs per superstep, same as pagerank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame
from neo4j_graph_algorithms_spark.plans.runtime import SuperstepResult, SuperstepRunner

AUTH = "auth"
HUB = "hub"


def hits(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    vertices: DataFrame | None = None,
    max_iterations: int = 20,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
) -> SuperstepResult:
    """Return SuperstepResult whose state is [vid, auth, hub].

    Scores are L2-normalized after each half-step (the classic formulation,
    under which the iteration converges to the principal singular vectors
    of the adjacency matrix).  Vertices with no in-edges hold auth = 0;
    vertices with no out-edges hold hub = 0.  An edgeless graph keeps every
    score at its init value of 0 after the first normalization guard
    (norm 0 → divide by 1).
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)

    # two gather-key-partitioned caches: the auth step joins hub scores on
    # src, the hub step joins auth scores on dst — each half-step reuses its
    # cache's partitioning so only the score column moves
    e_src = ef.df.select(SRC, DST).repartition(SRC).persist()
    e_src.count()
    e_dst = ef.df.select(SRC, DST).repartition(DST).persist()
    e_dst.count()

    verts = vertices.select(VID) if vertices is not None else ef.vertices()
    state0 = verts.select(VID, F.lit(1.0).alias(AUTH), F.lit(1.0).alias(HUB))

    def _safe(norm_col):
        return F.when(norm_col > 0, norm_col).otherwise(F.lit(1.0))

    def step(state: DataFrame, i: int) -> DataFrame:
        hubs = state.select(VID, HUB).hint("shuffle_hash")
        a_raw = (
            hubs.join(e_src, hubs[VID] == e_src[SRC], "inner")
            .groupBy(F.col(DST).alias(VID))
            .agg(F.sum(HUB).alias("a"))
        )
        a_norm = a_raw.agg(F.sqrt(F.sum(F.col("a") * F.col("a"))).alias("an"))
        auth = (
            state.select(VID)
            .join(a_raw.hint("shuffle_hash"), on=VID, how="left")
            .crossJoin(F.broadcast(a_norm))
            .select(
                VID,
                (
                    F.coalesce(F.col("a"), F.lit(0.0))
                    / _safe(F.coalesce(F.col("an"), F.lit(0.0)))
                ).alias(AUTH),
            )
        )
        auths = auth.select(VID, AUTH).hint("shuffle_hash")
        h_raw = (
            auths.join(e_dst, auths[VID] == e_dst[DST], "inner")
            .groupBy(F.col(SRC).alias(VID))
            .agg(F.sum(AUTH).alias("h"))
        )
        h_norm = h_raw.agg(F.sqrt(F.sum(F.col("h") * F.col("h"))).alias("hn"))
        return (
            auth.join(h_raw.hint("shuffle_hash"), on=VID, how="left")
            .crossJoin(F.broadcast(h_norm))
            .select(
                VID,
                AUTH,
                (
                    F.coalesce(F.col("h"), F.lit(0.0))
                    / _safe(F.coalesce(F.col("hn"), F.lit(0.0)))
                ).alias(HUB),
            )
        )

    runner = SuperstepRunner(
        spark,
        max_iterations=max_iterations,
        checkpoint_dir=checkpoint_dir,
        checkpoint_interval=checkpoint_interval,
        job_group="linkgraph-hits",
    )
    result = runner.run(state0, step, resume=resume)
    e_src.unpersist()
    e_dst.unpersist()
    return result


def hits_scores(result: SuperstepResult) -> DataFrame:
    """[vid, auth, hub] stream-mode projection."""
    return result.state.select(VID, AUTH, HUB)
