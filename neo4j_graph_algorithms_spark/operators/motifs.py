"""Directed triad census over complete triads — the motif audit.

Counts every unordered vertex triple whose underlying simple undirected
graph is a triangle, classified by its direction pattern into the seven
complete-triad isomorphism classes of the Holland-Leinhardt MAN census:

  motif  mutual pairs  pattern (dyad {x,y} mutual, t = third vertex)
  -----  ------------  ----------------------------------------------
  030T   0             transitive: a->b, b->c, a->c (any linear order)
  030C   0             cyclic: a->b, b->c, c->a (either rotation)
  120D   1             dyad dominates: x->t AND y->t ("down" out of the dyad)
  120U   1             dyad receives: t->x AND t->y ("up" into the dyad)
  120C   1             cyclic through the dyad: one arc in, one arc out
  210    2             two mutual pairs, one asymmetric
  300    3             all three pairs mutual

030T vs 030C is the feed-forward-loop vs cycle split — THE network-motif
distinction (Milo et al. 2002); the census as a whole is the directed
structure audit that `graph_reciprocity` (edge level) begins.

No reference analogue (the reference's TriangleCount.java:40-206 collapses
direction before counting); beyond-catalogue directed twin of the triangle
family.

Spark plan: parallel edges and self-loops collapse into one canonical
[lo, hi, fwd, rev] direction-bit row per undirected pair (one groupBy);
triangles are enumerated ONCE on the canonical pair set by the same
degree-ordered wedge+closure chain the exact counter uses
(operators/triangles.triangle_stream), then the three pairs' direction
bits are joined back (shuffle-hash on pair keys — the bit table is
|E|-sized, never broadcast) and the class is a pure column expression.
Sum over the seven counts equals the undirected triangle total by
construction (pytest-pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, EdgeFrame
from neo4j_graph_algorithms_spark.operators.triangles import triangle_stream

MOTIFS = ["030C", "030T", "120C", "120D", "120U", "210", "300"]


def _direction_bits(edges: EdgeFrame | DataFrame) -> DataFrame:
    """[lo, hi, fwd, rev] — one row per undirected simple pair; fwd = the
    lo->hi arc exists, rev = the hi->lo arc exists (parallel edges collapse,
    self-loops dropped)."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    d = ef.df.select(SRC, DST).filter(F.col(SRC) != F.col(DST))
    return (
        d.select(
            F.least(SRC, DST).alias("lo"),
            F.greatest(SRC, DST).alias("hi"),
            (F.col(SRC) < F.col(DST)).alias("is_fwd"),
        )
        .groupBy("lo", "hi")
        .agg(
            F.max("is_fwd").alias("fwd"),
            F.max(~F.col("is_fwd")).alias("rev"),
        )
    )


def triad_census(spark: SparkSession, edges: EdgeFrame | DataFrame) -> DataFrame:
    """[motif, n] — all seven complete-triad classes, zeros included."""
    bits = _direction_bits(edges).persist()
    tris = triangle_stream(spark, bits.select(F.col("lo").alias(SRC), F.col("hi").alias(DST)))

    def pair_bits(x: str, y: str, tag: str) -> DataFrame:
        return bits.select(
            F.col("lo").alias(x),
            F.col("hi").alias(y),
            F.col("fwd").alias(f"f_{tag}"),
            F.col("rev").alias(f"r_{tag}"),
        ).hint("shuffle_hash")

    t = (
        tris.join(pair_bits("a", "b", "ab"), on=["a", "b"])
        .join(pair_bits("b", "c", "bc"), on=["b", "c"])
        .join(pair_bits("a", "c", "ac"), on=["a", "c"])
    )

    f_ab, r_ab = F.col("f_ab"), F.col("r_ab")
    f_bc, r_bc = F.col("f_bc"), F.col("r_bc")
    f_ac, r_ac = F.col("f_ac"), F.col("r_ac")
    mut_ab, mut_bc, mut_ac = f_ab & r_ab, f_bc & r_bc, f_ac & r_ac
    m = mut_ab.cast("int") + mut_bc.cast("int") + mut_ac.cast("int")

    cyc0 = (f_ab & f_bc & r_ac) | (r_ab & r_bc & f_ac)
    motif = (
        F.when(m == 3, F.lit("300"))
        .when(m == 2, F.lit("210"))
        .when(
            m == 1,
            # t = the vertex outside the mutual dyad; classify the two
            # asymmetric arcs relative to the dyad
            F.when(
                mut_ab,
                F.when(f_ac & f_bc, "120D").when(r_ac & r_bc, "120U").otherwise("120C"),
            )
            .when(
                mut_bc,
                F.when(r_ab & r_ac, "120D").when(f_ab & f_ac, "120U").otherwise("120C"),
            )
            .otherwise(  # mut_ac
                F.when(f_ab & r_bc, "120D").when(r_ab & f_bc, "120U").otherwise("120C")
            ),
        )
        .otherwise(F.when(cyc0, F.lit("030C")).otherwise(F.lit("030T")))
    )

    counts = t.select(motif.alias("motif")).groupBy("motif").agg(F.count("*").alias("n"))
    allm = spark.createDataFrame([(x,) for x in MOTIFS], "motif string")
    out = allm.join(counts, on="motif", how="left").select(
        "motif", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    out = out.localCheckpoint(eager=True)
    bits.unpersist()
    return out
