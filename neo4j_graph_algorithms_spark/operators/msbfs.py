"""Multi-source BFS + closeness / harmonic centrality.

The reference batches 32 concurrent BFS traversals into one bitset pass
(impl/msbfs/MultiSourceBFS.java:33-79, OMEGA=32) and derives:
  * closeness (impl/MSClosenessCentrality.java): OUTGOING BFS from every
    node; farness(v) = Σ_s d(s,v); centrality = (n-1)/farness, 0 when
    farness=0 (MSBFSCCAlgorithm.java:43-45);
  * harmonic (impl/MSHarmonicCentrality.java): BOTH-direction BFS;
    centrality(v) = Σ_s 1/d(s,v) / (n-1).

DataFrame translation of the bitset trick: per source batch of ≤64 sources,
vertex state carries two BIGINT bitmasks (visited, frontier); a superstep
pushes frontier masks along edges, `groupBy(dst).agg(bit_or)` merges them
(the shuffle IS the bitset union), newly-set bits contribute depth·popcount
to farness.  Exact centralities loop over ⌈n/64⌉ batches (inherently O(n·m)
like the reference); `sources`/`max_depth` expose the sampled/capped
variant used at scale and by the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame

OMEGA = 64  # bits per batch word (reference uses 32, impl/msbfs/MultiSourceBFS.java:79)


def _msbfs_contribs(
    spark: SparkSession,
    edges: DataFrame,
    batch_sources: DataFrame,
    max_depth: int,
    keep_mask: bool = False,
) -> DataFrame:
    """[vid, depth, n_sources] rows: how many of this batch's sources reach
    vid at BFS depth `depth` (first visit).  edges: [src, dst] directed.
    With `keep_mask`, also carries the frontier bitmask (for APSP decode)."""
    seeds = batch_sources.select(
        VID, F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))").alias("mask")
    )
    state = seeds.groupBy(VID).agg(
        F.bit_or("mask").alias("visited"), F.bit_or("mask").alias("frontier")
    ).localCheckpoint(eager=True)
    out: list[DataFrame] = []
    for depth in range(1, max_depth + 1):
        msgs = (
            edges.join(
                state.filter(F.col("frontier") != 0).withColumnRenamed(VID, SRC),
                on=SRC,
            )
            .groupBy(F.col(DST).alias(VID))
            .agg(F.bit_or("frontier").alias("incoming"))
        )
        merged = (
            state.select(VID, "visited")
            .join(msgs, on=VID, how="full_outer")
            .select(
                VID,
                F.coalesce(F.col("visited"), F.lit(0)).alias("visited"),
                F.coalesce(F.col("incoming"), F.lit(0)).alias("incoming"),
            )
            .withColumn("new", F.expr("incoming & ~visited"))
        )
        state = merged.select(
            VID,
            F.col("visited").bitwiseOR(F.col("new")).alias("visited"),
            F.col("new").alias("frontier"),
        ).localCheckpoint(eager=True)
        cols = [VID, F.lit(depth).alias("depth"), F.bit_count("frontier").alias("n_sources")]
        if keep_mask:
            cols.append(F.col("frontier").alias("mask"))
        contrib = state.filter(F.col("frontier") != 0).select(*cols)
        out.append(contrib.localCheckpoint(eager=True))
        if state.filter(F.col("frontier") != 0).rdd.isEmpty():
            break
    res = out[0]
    for c in out[1:]:
        res = res.unionByName(c)
    return res


def msbfs_depths(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    sources: DataFrame | None = None,
    direction: str = "OUTGOING",
    max_depth: int = 64,
) -> DataFrame:
    """[vid, depth, n_sources] over all source batches (64 BFS per pass)."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    e = ef.with_direction(direction).df.select(SRC, DST).distinct()
    e.persist()
    e.count()
    src_df = sources.select(VID) if sources is not None else ef.vertices()
    # deterministic batch/bit assignment by rank over source ids
    from pyspark.sql import Window

    ranked = src_df.withColumn(
        "_rk", F.row_number().over(Window.orderBy(VID)) - 1
    ).select(
        VID, (F.col("_rk") / OMEGA).cast("int").alias("batch"), (F.col("_rk") % OMEGA).alias("bit")
    )
    n_batches = ranked.agg(F.max("batch")).collect()[0][0]
    parts = []
    for b in range(int(n_batches) + 1):
        batch = ranked.filter(F.col("batch") == b).select(VID, "bit")
        parts.append(_msbfs_contribs(spark, e, batch, max_depth))
    res = parts[0]
    for p in parts[1:]:
        res = res.unionByName(p)
    res = res.groupBy(VID, "depth").agg(F.sum("n_sources").alias("n_sources"))
    e.unpersist()
    return res


def all_shortest_paths(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    sources: DataFrame | None = None,
    direction: str = "BOTH",
    max_depth: int = 64,
) -> DataFrame:
    """[source, vid, depth] unweighted shortest hop distances — the
    algo.allShortestPaths.stream MS-BFS variant
    (impl/MSBFSAllShortestPaths.java): one row per reached (source, target)
    pair, decoded from the per-batch frontier bitmasks.  Self rows (depth 0)
    are omitted, matching the reference's stream of discovered pairs."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    e = ef.with_direction(direction).df.select(SRC, DST).distinct()
    e.persist()
    e.count()
    src_df = sources.select(VID) if sources is not None else ef.vertices()
    from pyspark.sql import Window

    ranked = src_df.withColumn(
        "_rk", F.row_number().over(Window.orderBy(VID)) - 1
    ).select(
        VID, (F.col("_rk") / OMEGA).cast("int").alias("batch"), (F.col("_rk") % OMEGA).alias("bit")
    ).localCheckpoint(eager=True)
    n_batches = ranked.agg(F.max("batch")).collect()[0][0]
    parts = []
    for b in range(int(n_batches) + 1):
        batch = ranked.filter(F.col("batch") == b).select(VID, "bit")
        contribs = _msbfs_contribs(spark, e, batch, max_depth, keep_mask=True)
        # decode mask bits back to source vids via the batch's bit table
        bits = batch.select(F.col(VID).alias("source"), "bit")
        decoded = (
            contribs.join(
                F.broadcast(bits),
                F.expr("shiftrightunsigned(mask, CAST(bit AS INT)) & 1") == 1,
            )
            .select("source", VID, "depth")
        )
        parts.append(decoded)
    res = parts[0]
    for p in parts[1:]:
        res = res.unionByName(p)
    e.unpersist()
    return res


def closeness(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    sources: DataFrame | None = None,
    max_depth: int = 64,
) -> DataFrame:
    """[vid, centrality] normalized closeness (MSClosenessCentrality).

    centrality(v) = (n-1)/farness(v), farness = Σ depth·(#sources at depth),
    0 for untouched nodes; BFS direction OUTGOING (:68).  `sources` ⊂
    vertices gives the sampled variant (farness over the sample only,
    normalization unchanged — matching RA-style sampling)."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    verts = ef.vertices()
    n = verts.count()
    depths = msbfs_depths(spark, ef, sources, "OUTGOING", max_depth)
    farness = depths.groupBy(VID).agg(
        F.sum(F.col("depth") * F.col("n_sources")).alias("farness")
    )
    return (
        verts.join(farness, on=VID, how="left")
        .select(
            VID,
            F.when(
                F.coalesce(F.col("farness"), F.lit(0)) > 0,
                F.lit(float(n - 1)) / F.col("farness"),
            )
            .otherwise(F.lit(0.0))
            .alias("centrality"),
        )
    )


def harmonic(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    sources: DataFrame | None = None,
    max_depth: int = 64,
) -> DataFrame:
    """[vid, centrality] harmonic centrality (MSHarmonicCentrality):
    Σ_s 1/d(s,v) / (n-1), BFS over BOTH directions (:62)."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    verts = ef.vertices()
    n = verts.count()
    depths = msbfs_depths(spark, ef, sources, "BOTH", max_depth)
    inv = depths.groupBy(VID).agg(
        F.sum(F.col("n_sources") / F.col("depth")).alias("inv_farness")
    )
    return (
        verts.join(inv, on=VID, how="left")
        .select(
            VID,
            (F.coalesce(F.col("inv_farness"), F.lit(0.0)) / F.lit(float(n - 1))).alias(
                "centrality"
            ),
        )
    )
