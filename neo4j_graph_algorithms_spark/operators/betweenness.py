"""Betweenness centrality — Brandes and RA-Brandes sampled
(algo.betweenness / algo.betweenness.sampled,
impl/betweenness/BetweennessCentrality.java, RABrandesBetweennessCentrality.
java:154-235, selection strategies RandomSelectionStrategy /
RandomDegreeSelectionStrategy).

Semantics reproduced:
  * unweighted shortest paths over the chosen direction (default OUTGOING;
    fixture BetweennessCentralityTest.java:159-163 — line graph a..e gives
    b=3, c=4, d=3, no halving for the directed default);
  * sampled variant scales every dependency by f = nodeCount / |sample|
    (RABrandesBetweennessCentrality.java:177);
  * `max_depth` bounds the forward BFS like the reference's maxDepth task.

Dataflow form: all sampled sources run TOGETHER, state keyed (s, v) —
forward level-synchronous BFS accumulating path counts σ, then the Brandes
backward sweep level by level: δ(v) = Σ_succ σ(v)/σ(w)·(1+δ(w)).  Each
level is one join + one aggregation; levels are kept as materialized
frames so the backward sweep revisits them without recompute.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame


def _committed_seq(root: str, prefix: str = "d=") -> list[int]:
    """Committed (has _SUCCESS) partition indices, kept only while
    CONSECUTIVE from the sequence start — a gap means everything after it
    is from an aborted write and must be recomputed."""
    if not os.path.isdir(root):
        return []
    have = {
        int(name.split("=", 1)[1])
        for name in os.listdir(root)
        if name.startswith(prefix)
        and os.path.exists(os.path.join(root, name, "_SUCCESS"))
    }
    out: list[int] = []
    d = min(have) if have else 0
    while d in have:
        out.append(d)
        d += 1
    return out


def betweenness(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    sources: DataFrame | None = None,
    direction: str = "OUTGOING",
    max_depth: int = 100,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> DataFrame:
    """[vid, centrality] Brandes betweenness.

    `sources=None`: exact (every vertex a source, f=1).  Otherwise the
    RA-Brandes estimate over the given [vid] sample, scaled by n/|sample|.

    Durable checkpoints (north rule: runs resume mid-algorithm): with
    `checkpoint_dir` set, every forward BFS level commits to
    `<dir>/levels/d=<k>` (with `<dir>/levels/_COMPLETE` written on natural
    frontier exhaustion) and every backward δ sweep level to
    `<dir>/deltas/d=<k>`.  `resume=True` rebuilds `visited` from the
    committed levels and continues forward from the newest one (or, with
    the forward phase complete, continues the backward sweep below the
    deepest committed δ level).  Use a fresh dir for non-resume runs.
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    # cached pre-partitioned on the forward-join key (src): only the
    # per-level frontier shuffles, never the edge table
    e = ef.with_direction(direction).df.select(SRC, DST).distinct().repartition(SRC)
    e.persist()
    verts = ef.vertices().localCheckpoint(eager=True)
    n = verts.count()

    src_df = sources.select(VID) if sources is not None else verts
    k = src_df.count()
    f = float(n) / float(k) if k else 0.0

    def _lvl_path(d: int) -> str:
        return os.path.join(checkpoint_dir, "levels", f"d={d}")

    def _delta_path(d: int) -> str:
        return os.path.join(checkpoint_dir, "deltas", f"d={d}")

    complete_marker = (
        os.path.join(checkpoint_dir, "levels", "_COMPLETE") if checkpoint_dir else None
    )

    # ---- forward: levels[d] = (s, vid, sigma) discovered at depth d --------
    levels: list[DataFrame] = []
    forward_complete = False
    if checkpoint_dir and resume:
        for d in _committed_seq(os.path.join(checkpoint_dir, "levels")):
            levels.append(spark.read.parquet(_lvl_path(d)).localCheckpoint(eager=True))
        forward_complete = bool(levels) and os.path.exists(complete_marker)
    if not levels:
        level0 = src_df.select(
            F.col(VID).alias("s"), F.col(VID), F.lit(1).cast("double").alias("sigma")
        ).localCheckpoint(eager=True)
        levels = [level0]
        if checkpoint_dir:
            level0.write.mode("overwrite").parquet(_lvl_path(0))
    # visited is derivable state: the union of all committed levels
    visited = levels[0].select("s", VID)
    for lv in levels[1:]:
        visited = visited.unionByName(lv.select("s", VID))
    visited = visited.localCheckpoint(eager=True)
    if not forward_complete:
        for _d in range(len(levels) - 1, max_depth):
            frontier = levels[-1]
            pushed = (
                frontier.join(e.withColumnRenamed(SRC, VID), on=VID)
                .groupBy("s", F.col(DST).alias(VID))
                .agg(F.sum("sigma").alias("sigma"))
            )
            new = pushed.join(visited, on=["s", VID], how="left_anti").localCheckpoint(
                eager=True
            )
            if new.isEmpty():
                # natural exhaustion (not the max_depth cap): the level set
                # is final, so the backward sweep may trust it on resume
                if complete_marker:
                    with open(complete_marker, "w") as fh:
                        fh.write(f"{len(levels)}\n")
                break
            if checkpoint_dir:
                new.write.mode("overwrite").parquet(_lvl_path(len(levels)))
            levels.append(new)
            visited = visited.unionByName(new.select("s", VID)).localCheckpoint(eager=True)

    # ---- backward: δ sweep from the deepest level --------------------------
    delta_parts: list[DataFrame] = []
    # delta of the deepest level is 0
    delta_next = levels[-1].select("s", VID, F.lit(0.0).alias("delta"))
    start_d = len(levels) - 2
    if checkpoint_dir and resume and forward_complete:
        done_ds = [
            d
            for d in _committed_seq(os.path.join(checkpoint_dir, "deltas"))
            if d <= start_d
        ]
        # the sweep runs DOWNWARD, so the resumable prefix is the committed
        # ds consecutive from the TOP (start_d, start_d-1, ...)
        resumable = []
        d = start_d
        while d in done_ds:
            resumable.append(d)
            d -= 1
        if resumable:
            for rd in resumable:
                delta_parts.append(
                    spark.read.parquet(_delta_path(rd)).localCheckpoint(eager=True)
                )
            delta_next = delta_parts[-1]
            start_d = resumable[-1] - 1
    for d in range(start_d, -1, -1):
        succ = delta_next.join(levels[d + 1], on=["s", VID]).select(
            "s",
            F.col(VID).alias(DST),
            F.col("sigma").alias("sigma_w"),
            F.col("delta").alias("delta_w"),
        )
        contrib = (
            levels[d]
            .join(e, levels[d][VID] == e[SRC])
            .join(succ, on=["s", DST])
            .select(
                "s",
                levels[d][VID].alias(VID),
                (
                    F.col("sigma") / F.col("sigma_w") * (F.lit(1.0) + F.col("delta_w"))
                ).alias("c"),
            )
            .groupBy("s", VID)
            .agg(F.sum("c").alias("delta"))
        )
        # every member of level d gets its delta (0 when no successors)
        delta_cur = (
            levels[d]
            .select("s", VID)
            .join(contrib, on=["s", VID], how="left")
            .select("s", VID, F.coalesce("delta", F.lit(0.0)).alias("delta"))
            .localCheckpoint(eager=True)
        )
        if checkpoint_dir:
            delta_cur.write.mode("overwrite").parquet(_delta_path(d))
        delta_parts.append(delta_cur)
        delta_next = delta_cur

    if delta_parts:
        # sources don't accumulate their own dependency (Brandes s != v)
        all_delta = delta_parts[0].filter(F.col("s") != F.col(VID))
        for p in delta_parts[1:]:
            all_delta = all_delta.unionByName(p.filter(F.col("s") != F.col(VID)))
        bc = all_delta.groupBy(VID).agg((F.lit(f) * F.sum("delta")).alias("centrality"))
    else:
        bc = spark.createDataFrame([], f"{VID} long, centrality double")
    out = verts.join(bc, on=VID, how="left").select(
        VID, F.coalesce("centrality", F.lit(0.0)).alias("centrality")
    )
    e.unpersist()
    return out


def betweenness_sampled(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    strategy: str = "random",
    fraction: float = 0.3,
    k: int | None = None,
    seed: int = 42,
    direction: str = "OUTGOING",
    max_depth: int = 100,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> DataFrame:
    """RA-Brandes with the reference's two selection strategies:
    'random' (RandomSelectionStrategy: Bernoulli sample of vertices) or
    'degree' (RandomDegreeSelectionStrategy: top-k by degree — the hub-
    biased estimator)."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    verts = ef.vertices()
    if strategy == "random":
        src = verts.sample(fraction=fraction, seed=seed)
        # guarantee non-empty sample (reference falls back to >=1 node)
        if src.isEmpty():
            src = verts.orderBy(VID).limit(1)
    elif strategy == "degree":
        kk = k if k is not None else max(1, int(verts.count() * fraction))
        src = (
            ef.degrees("BOTH").orderBy(F.desc("degree"), F.asc(VID)).limit(kk).select(VID)
        )
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    return betweenness(
        spark,
        ef,
        sources=src,
        direction=direction,
        max_depth=max_depth,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
    )


def edge_betweenness(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    sources: DataFrame | None = None,
    direction: str = "OUTGOING",
    max_depth: int = 100,
) -> DataFrame:
    """[src, dst, centrality] Brandes EDGE betweenness — the Girvan-Newman
    edge importance: how many (sampled-source) shortest paths run over each
    directed edge, c(u,v) = f·Σ_s σ_su/σ_sv·(1+δ_s(v)) for v one BFS level
    below u.

    Same forward σ-BFS and backward δ sweep as `betweenness` (the per-edge
    terms are exactly what the vertex sweep sums INTO u — this variant
    materializes them per edge before the fold, one extra edge-keyed
    aggregation per level, nothing else).  `sources=None` is exact; a [vid]
    sample scales by f = n/|sample| (RA-Brandes, RABrandesBetweennessCentrality
    .java:177).  Batch estimator: no durable level checkpoints here — use
    the vertex variant when mid-algorithm resume matters.

    Cross-engine exactness: the backward sweep runs in INTEGER micro-units
    (the repo's integer-scaled 1e-6-grid contract, cf. pipeline/events.py):
    δ is a BIGINT, each term is round(σ_u/σ_w · (10^6 + δ6_w)) cast to
    BIGINT, and every accumulation is an exact integer sum — order-free and
    bit-identical to the unrolled oracle.  (Rounding DOUBLES to 6dp is NOT
    enough: 1e-6 is not a binary fraction, so "grid" doubles still sum
    inexactly, and σ ratios are often dyadic rationals sitting exactly on
    a rounding boundary — observed flipping the 6th decimal at sf0.001.)
    Per-term error ≤5e-7/10^6-unit, accumulated ≤depth·5e-7 — noise floors
    below the sampling error.

    The classic consumer is Girvan-Newman community splitting (remove the
    max-centrality edge, recompute); at link-graph scale the useful read is
    the audit: edges carrying disproportionate shortest-path mass are the
    inter-cluster bridges the sweep/embeddedness family flags structurally.
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    e = ef.with_direction(direction).df.select(SRC, DST).distinct().repartition(SRC)
    e.persist()
    verts = ef.vertices().localCheckpoint(eager=True)
    n = verts.count()
    src_df = sources.select(VID) if sources is not None else verts
    k = src_df.count()
    f = float(n) / float(k) if k else 0.0

    # ---- forward: levels[d] = (s, vid, sigma) ------------------------------
    level0 = src_df.select(
        F.col(VID).alias("s"), F.col(VID), F.lit(1).cast("double").alias("sigma")
    ).localCheckpoint(eager=True)
    levels = [level0]
    visited = level0.select("s", VID).localCheckpoint(eager=True)
    for _d in range(max_depth):
        frontier = levels[-1]
        pushed = (
            frontier.join(e.withColumnRenamed(SRC, VID), on=VID)
            .groupBy("s", F.col(DST).alias(VID))
            .agg(F.sum("sigma").alias("sigma"))
        )
        new = pushed.join(visited, on=["s", VID], how="left_anti").localCheckpoint(
            eager=True
        )
        if new.isEmpty():
            break
        levels.append(new)
        visited = visited.unionByName(new.select("s", VID)).localCheckpoint(eager=True)

    # ---- backward: δ sweep in BIGINT micro-units, per-edge terms kept ------
    edge_parts: list[DataFrame] = []
    delta_next = levels[-1].select("s", VID, F.lit(0).cast("long").alias("delta6"))
    for d in range(len(levels) - 2, -1, -1):
        succ = delta_next.join(levels[d + 1], on=["s", VID]).select(
            "s",
            F.col(VID).alias(DST),
            F.col("sigma").alias("sigma_w"),
            F.col("delta6").alias("delta6_w"),
        )
        j = (
            levels[d]
            .join(e, levels[d][VID] == e[SRC])
            .join(succ, on=["s", DST])
            .select(
                "s",
                levels[d][VID].alias("_u"),
                F.col(DST).alias("_w"),
                F.round(
                    F.col("sigma")
                    / F.col("sigma_w")
                    * (F.lit(1_000_000.0) + F.col("delta6_w")),
                    0,
                )
                .cast("long")
                .alias("c6"),
            )
            .localCheckpoint(eager=True)
        )
        edge_parts.append(j.groupBy("_u", "_w").agg(F.sum("c6").alias("c6")))
        contrib = j.groupBy("s", F.col("_u").alias(VID)).agg(
            F.sum("c6").alias("delta6")
        )
        delta_next = (
            levels[d]
            .select("s", VID)
            .join(contrib, on=["s", VID], how="left")
            .select(
                "s", VID, F.coalesce("delta6", F.lit(0)).cast("long").alias("delta6")
            )
            .localCheckpoint(eager=True)
        )

    if edge_parts:
        allc = edge_parts[0]
        for p in edge_parts[1:]:
            allc = allc.unionByName(p)
        eb = allc.groupBy(F.col("_u").alias(SRC), F.col("_w").alias(DST)).agg(
            F.sum("c6").alias("c6")
        )
    else:
        eb = spark.createDataFrame([], f"{SRC} long, {DST} long, c6 long")
    # c6 is the EXACT unscaled integer (micro-units, pre-f) — the value the
    # driver gate compares; centrality = f·c6/10^6 is the convenience double
    # (its 6dp decimal rendering can sit on a representation boundary where
    # Spark's string-based round and C-library rounds disagree — never gate
    # on it)
    out = e.join(eb, on=[SRC, DST], how="left").select(
        SRC,
        DST,
        F.coalesce("c6", F.lit(0)).cast("long").alias("c6"),
        (F.lit(f) * F.coalesce("c6", F.lit(0)) / F.lit(1_000_000.0)).alias(
            "centrality"
        ),
    )
    out = out.localCheckpoint(eager=True)
    e.unpersist()
    return out
