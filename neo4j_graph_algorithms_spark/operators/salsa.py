"""SALSA (Lempel & Moran 2000) — the degree-normalized twin of HITS.

Not in the reference catalogue (its link-analysis family is
pageRank/HITS-absent — /root/reference/algo/src/main/java/org/neo4j/
graphalgo/PageRankProc.java); SALSA is the third canonical link-graph
score (Twitter's who-to-follow ran on it) and it completes the family:
PageRank (random surfer), HITS (mutual reinforcement), SALSA (the
stochastic hub/authority chain).

Power iteration on the bipartite support graph:

    auth'(v) = Σ_{u→v} hub(u)  / outdeg(u)      then L1-normalized;
    hub'(u)  = Σ_{u→v} auth'(v) / indeg(v)      then L1-normalized.

Both transitions are row-stochastic, so on a connected support the chain
converges to the CLOSED FORM  auth(v) = indeg(v)/|E|,
hub(u) = outdeg(u)/|E| — the property pytest asserts it (tests/
test_operator_salsa.py) and what makes SALSA the cheap sanity twin for
the whole superstep stack: an iterative run whose fixpoint is analytic.
The explicit L1 normalization each half-step also gives the general
(multi-component, dangling-vertex) case a defined contract: mass lost to
vertices outside the bipartite support is renormalized away, exactly as
the unrolled DuckDB oracle (oracles.salsa_sql) replays it.

Scale shape (same conventions as operators/hits.py):
  * the inverse degrees are FOLDED INTO the two edge caches once
    (inv_out on the src-partitioned cache, inv_in on the dst-partitioned
    cache), so each half-step shuffles only the |V|-sized score column —
    no per-iteration degree join;
  * `shuffle_hash` hints on the score-side projections keep Catalyst from
    broadcasting vertex state (CLAUDE.md convention, pinned by
    tests/test_superstep_plans.py);
  * the L1 norm is a 1-row aggregate folded back with a broadcast cross
    join — broadcasting a SCALAR is fine; |V|-sized builds are banned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame
from neo4j_graph_algorithms_spark.plans.runtime import SuperstepResult, SuperstepRunner

AUTH = "auth"
HUB = "hub"


def salsa(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    vertices: DataFrame | None = None,
    max_iterations: int = 20,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
) -> SuperstepResult:
    """Return SuperstepResult whose state is [vid, auth, hub].

    Scores are L1-normalized after each half-step (each is a probability
    distribution over the authority / hub side).  Parallel edges count:
    on a multigraph outdeg/indeg are edge counts, matching the random-walk
    semantics (a parallel edge doubles the transition probability).
    Vertices with no in-edges hold auth = 0; no out-edges hold hub = 0.
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)

    e = ef.df.select(SRC, DST)
    # fold the inverse degrees into the caches once — the per-iteration
    # joins then carry the normalization for free
    # |V|-sized degree frames: shuffle_hash-hint the build joins too (repo
    # convention — never let Catalyst broadcast a graph-scaled frame)
    outdeg = (
        e.groupBy(SRC).agg((F.lit(1.0) / F.count("*")).alias("inv_out")).hint("shuffle_hash")
    )
    indeg = (
        e.groupBy(DST).agg((F.lit(1.0) / F.count("*")).alias("inv_in")).hint("shuffle_hash")
    )
    e_src = e.join(outdeg, on=SRC).select(SRC, DST, "inv_out").repartition(SRC).persist()
    e_src.count()
    e_dst = e.join(indeg, on=DST).select(SRC, DST, "inv_in").repartition(DST).persist()
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
            .agg(F.sum(F.col(HUB) * F.col("inv_out")).alias("a"))
        )
        a_norm = a_raw.agg(F.sum("a").alias("an"))
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
            .agg(F.sum(F.col(AUTH) * F.col("inv_in")).alias("h"))
        )
        h_norm = h_raw.agg(F.sum("h").alias("hn"))
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
        job_group="linkgraph-salsa",
    )
    result = runner.run(state0, step, resume=resume)
    e_src.unpersist()
    e_dst.unpersist()
    return result


def salsa_scores(result: SuperstepResult) -> DataFrame:
    """[vid, auth, hub] stream-mode projection."""
    return result.state.select(VID, AUTH, HUB)
