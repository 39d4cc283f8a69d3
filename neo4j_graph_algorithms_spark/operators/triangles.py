"""Triangle counting + clustering coefficients (algo.triangleCount, algo.triangle.stream).

Semantics (reference impl/TriangleCount.java:40-206, SURVEY.md §2.12.5):
  * graph treated as undirected simple (Direction.BOTH, parallel/reverse
    duplicates collapsed, self-loops ignored);
  * each triangle counted once with strict node ordering (u<v<w, :155-171);
  * per-node triangle counts (AtomicIntegerArray analogue :125-130);
  * local clustering coefficient 2T/(d(d-1)) with BOTH-degree (:132-137),
    0 when d < 2; average over ALL nodes including zeros (:109-119).

Spark plan — the standard degree-ordered triangle enumeration:
  1. simple undirected edge set `und` (src<dst, distinct);
  2. orient every edge low→high in DEGREE order (ties by vid).  Orientation
     by degree (vs the reference's vid order) enumerates the identical
     triangle set but bounds each wedge fan-out by ~sqrt(m) — the difference
     between finishing and dying on hub vertices at 10^12 scale;
  3. wedges: dag self-join on the common low vertex;
  4. closure: semi-join wedge (y,z) against dag edges.
Two shuffle joins total; the closure join's build side is the dag itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame


def _simple_undirected(edges: EdgeFrame | DataFrame) -> DataFrame:
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    return ef.canonical().df.select(SRC, DST)


def _degree_oriented_dag(und: DataFrame) -> DataFrame:
    """Orient src<dst edges into lo→hi by (degree, vid) order.

    Returns [lo, hi, hi_deg, hi_key] where *_key is the total-order struct
    used for wedge dedup."""
    deg = (
        und.select(F.col(SRC).alias(VID))
        .unionByName(und.select(F.col(DST).alias(VID)))
        .groupBy(VID)
        .agg(F.count("*").alias("degree"))
    )
    e = (
        und.join(deg.select(F.col(VID).alias(SRC), F.col("degree").alias("sdeg")), on=SRC)
        .join(deg.select(F.col(VID).alias(DST), F.col("degree").alias("ddeg")), on=DST)
    )
    src_first = (F.col("sdeg") < F.col("ddeg")) | (
        (F.col("sdeg") == F.col("ddeg")) & (F.col(SRC) < F.col(DST))
    )
    return e.select(
        F.when(src_first, F.col(SRC)).otherwise(F.col(DST)).alias("lo"),
        F.when(src_first, F.col(DST)).otherwise(F.col(SRC)).alias("hi"),
        F.when(src_first, F.struct(F.col("ddeg").alias("d"), F.col(DST).alias("v")))
        .otherwise(F.struct(F.col("sdeg").alias("d"), F.col(SRC).alias("v")))
        .alias("hi_key"),
    )


def triangle_stream(spark: SparkSession, edges: EdgeFrame | DataFrame) -> DataFrame:
    """Emit each triangle once as [a, b, c] (algo.triangle.stream,
    impl/TriangleStream.java).  a<b<c by vid (the reference's node ordering)."""
    und = _simple_undirected(edges)
    dag = _degree_oriented_dag(und).persist()
    e1 = dag.select(F.col("lo"), F.col("hi").alias("y"), F.col("hi_key").alias("y_key"))
    e2 = dag.select(F.col("lo"), F.col("hi").alias("z"), F.col("hi_key").alias("z_key"))
    wedges = e1.join(e2, on="lo").filter(
        (F.col("y_key.d") < F.col("z_key.d"))
        | ((F.col("y_key.d") == F.col("z_key.d")) & (F.col("y_key.v") < F.col("z_key.v")))
    )
    closing = dag.select(F.col("lo").alias("y"), F.col("hi").alias("z"))
    # shuffle_hash: the default sort-merge semi-join SORTS the wedge stream
    # (quadratic-ish intermediate, the big memory hog at 32 threads); a
    # shuffled hash join builds on the edge set and streams wedges through
    tris = wedges.join(
        closing.hint("shuffle_hash"), on=["y", "z"], how="left_semi"
    ).select("lo", "y", "z")
    # present with a<b<c by vid, as the reference streams them
    return tris.select(
        F.least("lo", "y", "z").alias("a"),
        F.expr("array_sort(array(lo, y, z))")[1].alias("b"),
        F.greatest("lo", "y", "z").alias("c"),
    )


def triangle_count(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    vertices: DataFrame | None = None,
) -> tuple[DataFrame, int]:
    """Per-node triangle counts [vid, triangles] (zeros included) + total."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    tris = triangle_stream(spark, ef)
    tris.persist()
    total = tris.count()
    member = (
        tris.select(F.col("a").alias(VID))
        .unionByName(tris.select(F.col("b").alias(VID)))
        .unionByName(tris.select(F.col("c").alias(VID)))
        .groupBy(VID)
        .agg(F.count("*").alias("triangles"))
    )
    verts = vertices.select(VID) if vertices is not None else ef.vertices()
    per_node = verts.join(member, on=VID, how="left").select(
        VID, F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles")
    )
    tris.unpersist()
    return per_node, total


def clustering_coefficients(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    vertices: DataFrame | None = None,
) -> DataFrame:
    """[vid, triangles, degree, coefficient] — local coefficient
    2T/(d(d-1)) with BOTH-degree on the simple graph; 0 when d<2
    (TriangleCount.java:132-137)."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    und = _simple_undirected(ef)
    per_node, _ = triangle_count(spark, ef, vertices=vertices)
    deg = (
        und.select(F.col(SRC).alias(VID))
        .unionByName(und.select(F.col(DST).alias(VID)))
        .groupBy(VID)
        .agg(F.count("*").alias("degree"))
    )
    return per_node.join(deg, on=VID, how="left").select(
        VID,
        "triangles",
        F.coalesce(F.col("degree"), F.lit(0)).alias("degree"),
        F.when(
            F.coalesce(F.col("degree"), F.lit(0)) >= 2,
            2.0 * F.col("triangles") / (F.col("degree") * (F.col("degree") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("coefficient"),
    )


def average_clustering_coefficient(coeffs: DataFrame) -> float:
    """Average over all nodes including zeros (TriangleCount.java:109-119)."""
    row = coeffs.agg(F.avg("coefficient").alias("avg")).collect()[0]
    return float(row["avg"]) if row["avg"] is not None else 0.0


def transitivity(spark: SparkSession, edges: EdgeFrame | DataFrame) -> DataFrame:
    """[transitivity] — the GLOBAL clustering coefficient
    3·triangles / wedges (wedges = Σ_v deg(v)·(deg(v)−1)/2 over the
    undirected simple graph).  Distinct from
    `average_clustering_coefficient` (the mean of LOCAL coefficients,
    TriangleCount.java:109-119): transitivity weights high-degree vertices
    by their wedge count instead of averaging per-vertex ratios.

    Reuses the degree-oriented triangle total (one enumeration) plus one
    degree aggregation — nothing new shuffles.
    """
    und = _simple_undirected(edges)
    n_tri = triangle_stream(spark, und).count()
    deg = (
        und.select(F.col(SRC).alias("v"))
        .unionByName(und.select(F.col(DST).alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    wedges = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).alias("w")
    ).collect()[0]["w"]
    val = (3.0 * n_tri / wedges) if wedges else 0.0
    return spark.createDataFrame([(round(val, 6),)], "transitivity double")


# ---- DOULION sampled estimator ---------------------------------------------

#: 31-bit mixing constants for the deterministic edge-sampling hash — shared
#: verbatim with the DuckDB twin (oracles.triangle_doulion_sql).  M is the
#: Mersenne prime 2^31-1; reducing src/dst mod M first bounds every product
#: below 2^62, so the arithmetic is exact (no overflow) in both engines'
#: 64-bit integers.
DOULION_M = 2_147_483_647
DOULION_A = 1_103_515_245
DOULION_B = 1_566_083_941


def _doulion_keep(seed: int, p_num: int, p_den: int):
    """Boolean column: deterministic per-edge coin over the CANONICAL pair.

    h = ((src mod M)·A + (dst mod M)·B + seed) mod M; keep iff h mod den < num.
    Sampling the canonical (src<dst) pair gives one decision per undirected
    edge — exactly DOULION's per-edge coin, but replayable by any engine."""
    m = F.lit(DOULION_M)
    srcm = ((F.col(SRC) % m) + m) % m
    dstm = ((F.col(DST) % m) + m) % m
    h = (srcm * F.lit(DOULION_A) + dstm * F.lit(DOULION_B) + F.lit(seed)) % m
    return (h % F.lit(p_den)) < F.lit(p_num)


def triangle_count_sampled(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    p_num: int = 1,
    p_den: int = 2,
    seed: int = 7,
) -> DataFrame:
    """DOULION triangle estimate (Tsourakakis et al., KDD 2009) — the scale
    path for the exact counter: sparsify the simple undirected graph with a
    per-edge coin of rate p = p_num/p_den, count triangles on the sample,
    scale by 1/p^3.  E[estimate] = exact count; variance vanishes as the
    count grows, so at 10^12-edge scale a p=1/2 coin cuts the dominant
    closure-join shuffle ~4x (wedges ~p^2) for a fraction-of-a-percent
    relative error, and smaller p buys more.

    Unlike the paper's random coin the coin here is a DETERMINISTIC hash of
    the canonical edge (constants above), making the estimate reproducible
    run-to-run and replayable by the DuckDB oracle — the same determinism
    convention every sampled operator in this repo follows (walks, splits,
    betweenness sampling).

    Returns one lazy row [n_edges_kept, tri_sampled, est_triangles] — counts
    as BIGINT, the estimate as a 6dp double (exact when p_den/p_num is an
    integer, e.g. 8·tri at p=1/2).  No reference analogue (the reference's
    TriangleCount.java:40-206 is exact-only); beyond-catalogue scale twin of
    `triangle_count`.
    """
    if not (0 < p_num <= p_den):
        raise ValueError(f"need 0 < p_num <= p_den, got {p_num}/{p_den}")
    und = _simple_undirected(edges)
    kept = und.filter(_doulion_keep(seed, p_num, p_den))
    tris = triangle_stream(spark, kept)
    scale = (p_den / p_num) ** 3
    n_e = kept.agg(F.count("*").alias("n_edges_kept"))
    n_t = tris.agg(F.count("*").alias("tri_sampled"))
    return n_e.crossJoin(n_t).select(
        "n_edges_kept",
        "tri_sampled",
        F.round(F.col("tri_sampled") * F.lit(scale), 6).alias("est_triangles"),
    )


def edge_embeddedness(
    spark: SparkSession, edges: EdgeFrame | DataFrame
) -> DataFrame:
    """[src, dst, common, overlap] per canonical undirected simple edge —
    the tie-strength audit (Granovetter; Easley & Kleinberg ch. 3).

    `common` = |N(u) ∩ N(v)| (= triangles through the edge); `overlap` =
    the neighborhood-overlap Jaccard common / (deg(u)+deg(v)-2-common),
    6dp, defined 0.0 when the union of other-neighbors is empty.  Edges
    with overlap 0 are LOCAL BRIDGES — the weak ties whose removal
    disconnects neighborhoods; in a link graph they separate template
    cliques from genuine cross-references, so this is the edge-level
    filter the dedup/community family acts on.

    No reference analogue (TriangleCount.java:40-206 aggregates per node);
    beyond-catalogue edge-level member of the triangle family.  Plan: one
    degree-ordered triangle enumeration (triangle_stream), exploded to its
    three canonical pairs and re-aggregated — the per-edge count shuffles
    |tri| rows on the pair key, never all-pairs; degrees join in
    shuffle-hash on vertex keys.
    """
    und = _simple_undirected(edges)
    tris = triangle_stream(spark, und)
    pair_counts = (
        tris.select(F.col("a").alias(SRC), F.col("b").alias(DST))
        .unionByName(tris.select(F.col("b").alias(SRC), F.col("c").alias(DST)))
        .unionByName(tris.select(F.col("a").alias(SRC), F.col("c").alias(DST)))
        .groupBy(SRC, DST)
        .agg(F.count("*").alias("common"))
    )
    deg = (
        und.select(F.col(SRC).alias(VID))
        .unionByName(und.select(F.col(DST).alias(VID)))
        .groupBy(VID)
        .agg(F.count("*").alias("_deg"))
    )
    e = (
        und.join(pair_counts.hint("shuffle_hash"), on=[SRC, DST], how="left")
        .join(deg.select(F.col(VID).alias(SRC), F.col("_deg").alias("_du")).hint("shuffle_hash"), on=SRC)
        .join(deg.select(F.col(VID).alias(DST), F.col("_deg").alias("_dv")).hint("shuffle_hash"), on=DST)
    )
    common = F.coalesce(F.col("common"), F.lit(0))
    denom = F.col("_du") + F.col("_dv") - F.lit(2) - common
    return e.select(
        SRC,
        DST,
        common.alias("common"),
        F.round(
            F.when(denom > 0, common.cast("double") / denom).otherwise(F.lit(0.0)), 6
        ).alias("overlap"),
    )
