"""PageRank (algo.pageRank) — the unnormalized Neo4j delta-push variant.

Exact semantics reproduced (reference impl/PageRank.java:416-517, see
SURVEY.md §2.12.1-2):

  * init rank = 1 - d (alpha, :416,:448-452); init delta = 1 - d;
  * each superstep, every node with delta > 0 sends delta/outDegree to its
    OUT-neighbors (:455-469);
  * receivers do rank += d·Σ and set delta = d·Σ (:505-517);
  * NO dangling-node mass redistribution, NO sum-to-1 normalization —
    dangling-pointed-only nodes keep exactly 1-d = 0.15
    (tests/.../PageRankWikiTest.java:131-141);
  * defaults d = 0.85, 20 fixed iterations (PageRankProc.java:54-55).

The reference quantizes messages to 1e-5 fixed-point (:464,:512); we keep
float64 (its own tests only assert 1e-2) and add the max|delta| < tol
convergence stop required by BASELINE.json.

Spark plan per superstep (one shuffle):
    active = state.filter(delta > 0)                       # delta/incremental
    msgs   = active ⋈ edges_with_invdeg on vid==src        # co-partitioned
    sums   = msgs.groupBy(dst).sum(contrib)                # partial+final agg
    state' = state left-outer ⋈ sums                       # rank += d·Σ
Edge table is pre-joined once with 1/outDegree and hash-partitioned by src;
vertex state is hash-partitioned by vid, so the send join reuses the edge
partitioning and only the aggregation shuffles.  Skew (hub dst) is handled
by Spark's partial aggregation (map-side combine) + AQE skew handling; an
explicit salt column can be threaded via `hub_salting` when a degree sketch
shows extreme hubs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame
from neo4j_graph_algorithms_spark.plans.runtime import SuperstepResult, SuperstepRunner

RANK = "rank"
DELTA = "delta"


def pagerank(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    vertices: DataFrame | None = None,
    damping_factor: float = 0.85,
    max_iterations: int = 20,
    tolerance: float | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
    hub_threshold: int | None = None,
    salt_buckets: int = 16,
    initial_ranks: DataFrame | None = None,
    source_vids: DataFrame | None = None,
    weighted: bool = False,
    article_rank: bool = False,
) -> SuperstepResult:
    """Return SuperstepResult whose state is [vid, rank, delta].

    `tolerance=None` reproduces the reference exactly: a fixed number of
    iterations with no convergence test (impl/PageRank.java:344-354).
    `tolerance=1e-6` adds the convergence stop on max|delta| from
    BASELINE.json's metric.

    `initial_ranks` ([vid, rank]) WARM-STARTS the iteration from a prior
    solution — the incremental mode for an evolving graph (e.g. after a
    streaming co-commit micro-batch): instead of re-pushing all the mass
    from scratch, only the RESIDUAL of the old solution on the new graph
    propagates.  With r_old the prior ranks (missing vertices ≡ 0) and
    M = d·Aᵀ_norm the new graph's push operator, the init is

        delta0 = alpha + M·r_old − r_old      (may be NEGATIVE)
        rank0  = r_old + delta0 = alpha + M·r_old

    which leaves the push fixpoint exactly the new graph's PageRank (the
    iteration adds ((I−M)⁻¹−I)·delta0 = r* − r_old − delta0 on top of
    rank0), so warm and cold runs converge to identical values, warm in
    O(log(‖residual‖)/log d) supersteps instead of O(log(n·alpha)/log d).
    Negative residual mass (removed edges) propagates with the same
    contraction — the active filter is |delta| > 0.

    `hub_threshold`: if set, destinations with in-degree >= threshold get an
    explicit salted two-phase aggregation — each superstep first sums
    contributions per (dst, salt) over `salt_buckets` reducers, then folds
    the partials per dst.  This splits a hub's reduce work across
    `salt_buckets` tasks when AQE's skew handling isn't enough (the 10^12-
    scale 'every commit touches README' vertex; reference precedent:
    high-degree precompute, impl/metapath/MetaPathPrecomputeHighDegreeNodes
    .java).  Results are identical; only the aggregation tree changes.

    `source_vids` ([vid]) switches to PERSONALIZED PageRank (beyond the
    reference — its successor GDS ships it as pageRank's sourceNodes
    option): teleport mass lands only on the source set, so scores measure
    proximity to the sources (random walk with restart).  Same unnormalized
    convention as the base variant: init rank = delta = alpha ON SOURCES,
    0 elsewhere — the push loop is IDENTICAL (the teleport vector only
    enters through the init), so all scale/hint/salting behavior carries
    over.  Vertices unreachable from the sources score exactly 0.

    `weighted=True` pushes mass proportionally to edge weight (the GDS
    relationshipWeightProperty behavior; the reference's own loader carries
    weights the same way, core/.../RawValues.java accumulateWeights):
    inv_deg becomes w(u,v)/Σ_out w(u) — the static edge-side build changes,
    the superstep loop does not.

    `article_rank=True` dampens hub influence the ArticleRank way (the GDS
    gds.articleRank twin): the push denominator becomes
    outdeg(u) + avg_outdeg, where avg_outdeg averages over ALL vertices of
    the graph (dangling vertices contribute 0).  One extra scalar
    aggregation at build time; the superstep loop is again untouched.
    Mutually exclusive with `weighted`.
    """
    if article_rank and weighted:
        raise ValueError("article_rank and weighted are mutually exclusive")
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    alpha = 1.0 - damping_factor
    from neo4j_graph_algorithms_spark.graph import WEIGHT

    # --- static side: out-degrees folded onto the edge table, built once ----
    build_edges = ef.df
    if weighted:
        # guard: an edge with NULL or non-positive weight has no well-defined
        # push fraction (w/Σw is NULL or negative) and would silently poison
        # (NULL: vanish; negative: invert) downstream ranks — drop such edges
        # up front + warn.  A source left with no positive-weight out-edge
        # then falls out of the inner build join and becomes a dangler.
        # NULL must be matched explicitly (~(w > 0) is NULL, i.e. filtered
        # OUT, under SQL three-valued logic); head(1) is an existence probe,
        # not a full count, on the common clean path.
        bad = F.col(WEIGHT).isNull() | (F.col(WEIGHT) <= 0)
        if build_edges.filter(bad).head(1):
            import warnings

            warnings.warn(
                "pagerank(weighted=True): edges with NULL or non-positive "
                "weight dropped; sources left without positive out-weight "
                "become dangling",
                stacklevel=2,
            )
            build_edges = build_edges.filter(F.col(WEIGHT) > 0)
        out_deg = build_edges.groupBy(F.col(SRC).alias(VID)).agg(
            F.sum(WEIGHT).alias("outdeg")
        )
        push_num = F.col(WEIGHT)
        cols = [SRC, DST, WEIGHT]
    else:
        out_deg = ef.df.groupBy(F.col(SRC).alias(VID)).agg(
            F.count("*").alias("outdeg")
        )
        push_num = F.lit(1.0)
        cols = [SRC, DST]
    # article_rank only changes the push DENOMINATOR (outdeg + avg_outdeg,
    # averaged over ALL vertices with danglers contributing 0) — one scalar
    # aggregation folded into the same single build join.
    denom_extra = 0.0
    if article_rank:
        n_verts = (vertices if vertices is not None else ef.vertices()).count()
        n_edges = ef.df.count()
        denom_extra = n_edges / n_verts if n_verts else 0.0
    edges_wd = (
        build_edges.select(*cols)
        # shuffle_hash: out_deg is |V|-sized — broadcasting it in the build
        # join is as wrong at scale as broadcasting state in a superstep
        .join(
            out_deg.select(F.col(VID).alias(SRC), "outdeg").hint("shuffle_hash"),
            on=SRC,
        )
        .select(
            SRC,
            DST,
            (push_num / (F.col("outdeg") + F.lit(denom_extra))).alias("inv_deg"),
        )
    )
    if hub_threshold is not None:
        # static salt column: salt = hash(src) % buckets on hub-destined
        # edges, 0 elsewhere (graph.hub_salting semantics, built once)
        from neo4j_graph_algorithms_spark.graph import hub_salting

        in_deg = ef.degrees("INCOMING")
        edges_wd = hub_salting(edges_wd, in_deg, hub_threshold, salt_buckets)
    edges_wd = edges_wd.repartition(SRC)
    edges_wd.persist()
    edges_wd.count()  # materialize once so every superstep rescans from cache

    verts = vertices.select(VID) if vertices is not None else ef.vertices()
    d = damping_factor
    if source_vids is not None and initial_ranks is not None:
        raise ValueError("source_vids and initial_ranks are mutually exclusive")
    if source_vids is not None:
        is_src = source_vids.select(VID).distinct().withColumn("_s", F.lit(1))
        state0 = verts.join(is_src.hint("shuffle_hash"), on=VID, how="left").select(
            F.col(VID),
            F.when(F.col("_s").isNotNull(), F.lit(alpha)).otherwise(F.lit(0.0)).alias(RANK),
            F.when(F.col("_s").isNotNull(), F.lit(alpha)).otherwise(F.lit(0.0)).alias(DELTA),
        )
    elif initial_ranks is None:
        state0 = verts.select(
            F.col(VID),
            F.lit(alpha).alias(RANK),
            F.lit(alpha).alias(DELTA),
        )
    else:
        # warm start: one extra push of r_old over the NEW edge table to
        # form the residual (see docstring) — same join shape as a superstep
        r_old = verts.join(
            initial_ranks.select(VID, F.col(RANK).alias("_r")), on=VID, how="left"
        ).select(VID, F.coalesce("_r", F.lit(0.0)).alias("_r"))
        pushed = (
            r_old.hint("shuffle_hash")
            .join(edges_wd, r_old[VID] == edges_wd[SRC], "inner")
            .groupBy(F.col(DST).alias(VID))
            .agg(F.sum(F.col("_r") * F.col("inv_deg")).alias("_m"))
        )
        state0 = r_old.join(pushed.hint("shuffle_hash"), on=VID, how="left").select(
            VID,
            (F.lit(alpha) + F.lit(d) * F.coalesce("_m", F.lit(0.0))).alias(RANK),
            (
                F.lit(alpha)
                + F.lit(d) * F.coalesce("_m", F.lit(0.0))
                - F.col("_r")
            ).alias(DELTA),
        )

    def step(state: DataFrame, i: int) -> DataFrame:
        # shuffle_hash hint: without it Catalyst BROADCASTS the vertex state
        # (a serial driver-side hash-relation build per superstep — the
        # non-scaling fraction at cluster sizes); with it the small state
        # side shuffles to the cached edge partitioning and builds per-task.
        # |delta|: cold-start deltas are always >= 0 (same predicate), warm
        # starts carry negative residual mass that must propagate too
        active = state.filter(F.abs(F.col(DELTA)) > 0).hint("shuffle_hash")
        if hub_threshold is not None:
            msgs = active.join(
                edges_wd, active[VID] == edges_wd[SRC], "inner"
            ).select(
                F.col(DST).alias(VID),
                F.col("salt"),
                (F.col(DELTA) * F.col("inv_deg")).alias("contrib"),
            )
            # two-phase: per-(dst, salt) partials spread a hub over
            # salt_buckets reducers, then a tiny per-dst fold
            partials = msgs.groupBy(VID, "salt").agg(F.sum("contrib").alias("ps"))
            sums = partials.groupBy(VID).agg(F.sum("ps").alias("s"))
        else:
            msgs = active.join(
                edges_wd, active[VID] == edges_wd[SRC], "inner"
            ).select(F.col(DST).alias(VID), (F.col(DELTA) * F.col("inv_deg")).alias("contrib"))
            sums = msgs.groupBy(VID).agg(F.sum("contrib").alias("s"))
        return (
            state.join(sums.hint("shuffle_hash"), on=VID, how="left")
            .select(
                VID,
                (F.col(RANK) + F.lit(d) * F.coalesce(F.col("s"), F.lit(0.0))).alias(RANK),
                (F.lit(d) * F.coalesce(F.col("s"), F.lit(0.0))).alias(DELTA),
            )
        )

    def metric(new: DataFrame, old: DataFrame, i: int) -> float:
        row = new.agg(F.max(F.abs(F.col(DELTA))).alias("m")).collect()[0]
        return float(row["m"]) if row["m"] is not None else 0.0

    runner = SuperstepRunner(
        spark,
        max_iterations=max_iterations,
        # fixed-iteration mode (the reference default) needs no convergence
        # metric — skipping it saves one driver-coordinated job per superstep
        metric=None if tolerance is None else metric,
        converged=(None if tolerance is None else (lambda m: m < tolerance)),
        checkpoint_dir=checkpoint_dir,
        checkpoint_interval=checkpoint_interval,
        job_group="linkgraph-pagerank",
        # deltas contract geometrically (×d per superstep): checking max|Δ|
        # every superstep wastes a driver job; worst case +3 supersteps
        metric_every=4 if tolerance is not None else 1,
    )
    result = runner.run(state0, step, resume=resume)
    edges_wd.unpersist()
    return result


def pagerank_scores(result: SuperstepResult) -> DataFrame:
    """[vid, rank] stream-mode projection (PageRankProc.java:112-133)."""
    return result.state.select(VID, RANK)
