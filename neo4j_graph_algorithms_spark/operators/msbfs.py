"""Multi-source BFS + closeness / harmonic centrality.

The reference batches 32 concurrent BFS traversals into one bitset pass
(impl/msbfs/MultiSourceBFS.java:33-79, OMEGA=32) and derives:
  * closeness (impl/MSClosenessCentrality.java): OUTGOING BFS from every
    node; farness(v) = Σ_s d(s,v); centrality = (n-1)/farness, 0 when
    farness=0 (MSBFSCCAlgorithm.java:43-45);
  * harmonic (impl/MSHarmonicCentrality.java): BOTH-direction BFS;
    centrality(v) = Σ_s 1/d(s,v) / (n-1).

DataFrame translation of the bitset trick: vertex state carries two
array<bigint> bitmask columns (visited, frontier) of `n_words` 64-bit words
— one superstep advances up to 64·n_words concurrent BFS traversals; a
superstep pushes frontier masks along edges, `groupBy(dst)` with per-word
`bit_or` aggregates merges them (the shuffle IS the bitset union), and
newly-set bits contribute depth·popcount to farness.  Exact centralities
loop over ⌈n/(64·n_words)⌉ batch groups (inherently O(n·m) total work like
the reference); `sources`/`max_depth` expose the sampled/capped variant
used at scale and by the correctness oracle.

Source→(group, word, bit) assignment is a DISTRIBUTED dense ranking
(per-partition row_number + broadcast partition offsets) — no
single-partition global window anywhere in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame

OMEGA = 64  # bits per mask word (reference uses 32, impl/msbfs/MultiSourceBFS.java:79)
N_WORDS = 4  # mask words per state row → 256 concurrent BFS per superstep


def _rank_sources(src_df: DataFrame, group_size: int) -> DataFrame:
    """[vid, grp, word, bit] deterministic dense assignment, distributed.

    Two-phase ranking: hash-repartition by vid, rank WITHIN each partition
    (parallel window), then add broadcast per-partition offsets — the
    scalable replacement for row_number over a global Window.orderBy
    (which funnels every source through one task).
    """
    npart = max(src_df.sparkSession.sparkContext.defaultParallelism, 1)
    part = (
        src_df.select(VID)
        .repartition(npart, VID)
        .withColumn("_p", F.spark_partition_id())
    )
    part = part.localCheckpoint(eager=True)  # pin partition ids
    counts = part.groupBy("_p").agg(F.count("*").alias("_n")).collect()
    offs: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["_p"]):
        offs[row["_p"]] = acc
        acc += row["_n"]
    spark = src_df.sparkSession
    off_df = spark.createDataFrame(
        [(p, o) for p, o in offs.items()] or [(0, 0)], "_p int, _off long"
    )
    w = Window.partitionBy("_p").orderBy(VID)
    rk = (
        part.withColumn("_r", F.row_number().over(w) - 1)
        .join(F.broadcast(off_df), on="_p")
        .select(VID, (F.col("_off") + F.col("_r")).alias("_rk"))
    )
    return rk.select(
        VID,
        (F.col("_rk") / group_size).cast("int").alias("grp"),
        ((F.col("_rk") % group_size) / OMEGA).cast("int").alias("word"),
        (F.col("_rk") % OMEGA).cast("int").alias("bit"),
    )


def _empty_masks(n_words: int):
    return F.array(*[F.lit(0).cast("long") for _ in range(n_words)])


def _msbfs_contribs(
    spark: SparkSession,
    edges: DataFrame,
    batch_sources: DataFrame,
    max_depth: int,
    n_words: int = N_WORDS,
    keep_mask: bool = False,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> DataFrame:
    """[vid, depth, n_sources] rows: how many of this group's sources reach
    vid at BFS depth `depth` (first visit).  edges: [src, dst] directed,
    cached pre-partitioned on src by the caller.  batch_sources:
    [vid, word, bit].  With `keep_mask`, also carries the frontier mask
    array (for APSP decode).

    Runs on SuperstepRunner: state = [vid, visited, frontier,
    seen: map<depth, mask>] — `seen` records each group's first-visit mask
    per depth, so ALL per-depth contributions derive from the final state
    (one explode at the end) and a durable checkpoint restores the whole
    traversal mid-algorithm, accumulated contributions included."""
    from neo4j_graph_algorithms_spark.plans.runtime import SuperstepRunner

    word_mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")
    per_word = [
        F.bit_or(F.when(F.col("word") == i, word_mask).otherwise(F.lit(0).cast("long"))).alias(
            f"_w{i}"
        )
        for i in range(n_words)
    ]
    empty_seen = F.expr("cast(map() as map<int, array<bigint>>)")
    state0 = (
        batch_sources.groupBy(VID)
        .agg(*per_word)
        .select(VID, F.array(*[f"_w{i}" for i in range(n_words)]).alias("mask"))
        .select(
            VID,
            F.col("mask").alias("visited"),
            F.col("mask").alias("frontier"),
            empty_seen.alias("seen"),
        )
    )
    nonzero = F.exists("frontier", lambda x: x != 0)

    def step(state: DataFrame, i: int) -> DataFrame:
        depth = i + 1
        word_aggs = [
            F.bit_or(F.element_at("frontier", w + 1)).alias(f"_w{w}") for w in range(n_words)
        ]
        msgs = (
            edges.join(
                state.filter(nonzero).withColumnRenamed(VID, SRC).hint("shuffle_hash"),
                on=SRC,
            )
            .groupBy(F.col(DST).alias(VID))
            .agg(*word_aggs)
            .select(VID, F.array(*[f"_w{w}" for w in range(n_words)]).alias("incoming"))
        )
        merged = (
            state.select(VID, "visited", "seen")
            .join(msgs, on=VID, how="full_outer")
            .select(
                VID,
                F.coalesce(F.col("visited"), _empty_masks(n_words)).alias("visited"),
                F.coalesce(F.col("incoming"), _empty_masks(n_words)).alias("incoming"),
                F.coalesce(F.col("seen"), empty_seen).alias("seen"),
            )
            .withColumn(
                "new",
                F.zip_with(
                    "incoming", "visited", lambda i_, v: i_.bitwiseAND(F.bitwise_not(v))
                ),
            )
        )
        return merged.select(
            VID,
            F.zip_with("visited", "new", lambda a, b: a.bitwiseOR(b)).alias("visited"),
            F.col("new").alias("frontier"),
            F.when(
                F.exists("new", lambda x: x != 0),
                F.map_concat(
                    "seen",
                    F.map_from_arrays(
                        F.array(F.lit(depth).cast("int")), F.array(F.col("new"))
                    ),
                ),
            )
            .otherwise(F.col("seen"))
            .alias("seen"),
        )

    def metric(new: DataFrame, old: DataFrame, i: int) -> float:
        return float(new.filter(nonzero).count())

    runner = SuperstepRunner(
        spark,
        max_iterations=max_depth,
        metric=metric,
        converged=lambda live: live == 0,
        checkpoint_dir=checkpoint_dir,
        job_group="linkgraph-msbfs",
    )
    final = runner.run(state0, step, resume=resume).state
    popcount_mask = F.aggregate(
        F.transform("mask", lambda x: F.bit_count(x)), F.lit(0), lambda acc, x: acc + x
    )
    cols = [VID, F.col("depth"), popcount_mask.alias("n_sources")]
    if keep_mask:
        cols.append(F.col("mask"))
    return final.select(VID, F.explode("seen").alias("depth", "mask")).select(*cols)


def _empty_depths(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], f"{VID} long, depth int, n_sources long")


def msbfs_depths(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    sources: DataFrame | None = None,
    direction: str = "OUTGOING",
    max_depth: int = 64,
    n_words: int = N_WORDS,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> DataFrame:
    """[vid, depth, n_sources] over all source groups (64·n_words BFS per
    pass).  With `checkpoint_dir`, each group's traversal checkpoints
    durably under `<dir>/grp=<g>` and `resume=True` restarts every group
    from its newest checkpoint (finished groups replay only their final
    state read)."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    # cached pre-partitioned on the superstep join key (src)
    e = ef.with_direction(direction).df.select(SRC, DST).distinct().repartition(SRC)
    e.persist()
    e.count()
    src_df = sources.select(VID) if sources is not None else ef.vertices()
    ranked = _rank_sources(src_df, OMEGA * n_words)
    groups = [r["grp"] for r in ranked.select("grp").distinct().collect()]
    if not groups:
        e.unpersist()
        return _empty_depths(spark)
    parts = []
    for g in sorted(groups):
        batch = ranked.filter(F.col("grp") == g).select(VID, "word", "bit")
        ck = f"{checkpoint_dir}/grp={g}" if checkpoint_dir else None
        parts.append(
            _msbfs_contribs(
                spark, e, batch, max_depth, n_words, checkpoint_dir=ck, resume=resume
            )
        )
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
    n_words: int = N_WORDS,
) -> DataFrame:
    """[source, vid, depth] unweighted shortest hop distances — the
    algo.allShortestPaths.stream MS-BFS variant
    (impl/MSBFSAllShortestPaths.java): one row per reached (source, target)
    pair, decoded from the per-group frontier bitmasks.  Self rows (depth 0)
    are omitted, matching the reference's stream of discovered pairs."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    e = ef.with_direction(direction).df.select(SRC, DST).distinct().repartition(SRC)
    e.persist()
    e.count()
    src_df = sources.select(VID) if sources is not None else ef.vertices()
    ranked = _rank_sources(src_df, OMEGA * n_words).localCheckpoint(eager=True)
    groups = [r["grp"] for r in ranked.select("grp").distinct().collect()]
    if not groups:
        e.unpersist()
        return spark.createDataFrame([], f"source long, {VID} long, depth int")
    parts = []
    for g in sorted(groups):
        batch = ranked.filter(F.col("grp") == g).select(VID, "word", "bit")
        contribs = _msbfs_contribs(spark, e, batch, max_depth, n_words, keep_mask=True)
        # decode mask bits back to source vids via the group's bit table
        bits = batch.select(F.col(VID).alias("source"), "word", "bit")
        decoded = (
            contribs.select(
                VID, "depth", F.posexplode("mask").alias("word", "_wmask")
            )
            .filter(F.col("_wmask") != 0)
            .join(
                F.broadcast(bits),
                on="word",
            )
            .filter(F.expr("shiftrightunsigned(_wmask, CAST(bit AS INT)) & 1") == 1)
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
    depths_fn=None,
) -> DataFrame:
    """[vid, centrality] normalized closeness (MSClosenessCentrality).

    centrality(v) = (n-1)/farness(v), farness = Σ depth·(#sources at depth),
    0 for untouched nodes; BFS direction OUTGOING (:68).  `sources` ⊂
    vertices gives the sampled variant (farness over the sample only,
    normalization unchanged — matching RA-style sampling)."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    verts = ef.vertices()
    n = verts.count()
    # depths_fn: injectable depth engine (csr/msbfs.py's Tier B kernel
    # plugs in here); same (spark, edges, sources, direction, max_depth)
    # contract as msbfs_depths
    fn = depths_fn or msbfs_depths
    depths = fn(spark, ef, sources, "OUTGOING", max_depth)
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
    depths_fn=None,
) -> DataFrame:
    """[vid, centrality] harmonic centrality (MSHarmonicCentrality):
    Σ_s 1/d(s,v) / (n-1), BFS over BOTH directions (:62)."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    verts = ef.vertices()
    n = verts.count()
    fn = depths_fn or msbfs_depths
    depths = fn(spark, ef, sources, "BOTH", max_depth)
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
