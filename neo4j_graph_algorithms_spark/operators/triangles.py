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
