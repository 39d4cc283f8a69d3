"""k-truss decomposition — the triangle-density community relaxation
(Cohen 2008, "Trusses: cohesive subgraphs for social network analysis").

Complements the reference's triangleCount/clusteringCoefficient procedures
(/root/reference/algo/src/main/java/org/neo4j/graphalgo/TriangleProc.java):
the k-truss is the maximal subgraph where every edge closes >= k-2
triangles, the standard dense-core extraction one notch stronger than
k-core (operators/kcore.py).

Distributed shape per peel round (the MapReduce k-truss of Cohen 2009,
re-expressed declaratively): one degree-oriented triangle enumeration over
the surviving edge set (reusing operators/triangles.py — wedges stream
through a hash semi-join, never sorted), one explode + hash aggregation to
per-edge support, one hash join to filter.  Edge set shrinks monotonically;
rounds are O(max peel depth), convergence via a cheap count() — both the
count and the checkpoint cadence match the SuperstepRunner conventions.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, EdgeFrame
from neo4j_graph_algorithms_spark.operators.triangles import (
    _simple_undirected,
    triangle_stream,
)


def ktruss(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    k: int = 4,
    max_rounds: int = 50,
) -> DataFrame:
    """[src, dst] — canonical (src < dst) edges of the k-truss: the maximal
    subgraph in which every edge participates in >= k-2 triangles.

    Peels to fixpoint (at most `max_rounds`; warns if the cap is hit before
    convergence, matching delta_stepping's drained-bucket warning).  k >= 3;
    k=3 keeps every edge that closes at least one triangle.
    """
    if k < 3:
        raise ValueError("k-truss requires k >= 3")
    # .persist() + count resets the checkpoint leaf's inherited sizeInBytes
    # ESTIMATE to the real cached size: the triangle closure references cur
    # three times, so estimates otherwise compound ×~3 per peel round and
    # Catalyst's join-selection BigInt arithmetic explodes geometrically
    # (see plans/runtime.py for the measured failure mode).
    # NB: every frame below is localCheckpoint'ed BENEATH its persist, so
    # _release() can drop the cache before returning without losing the
    # materialization — callers get an unpersisted, checkpoint-backed frame
    # and repeated ktruss calls do not accumulate cached copies.
    def _release(df: DataFrame) -> DataFrame:
        df.unpersist()
        return df

    cur = _simple_undirected(edges).localCheckpoint(eager=True).persist()
    n_prev = cur.count()
    for _round in range(max_rounds):
        if n_prev == 0:
            return _release(cur)
        tris = triangle_stream(spark, cur)
        # 3 canonical edges per triangle -> per-edge support (map-side
        # combine applies; the edge key is (src, dst), never skewed worse
        # than the triangle distribution itself)
        supp = (
            tris.select(
                F.explode(
                    F.array(
                        F.struct(F.col("a").alias(SRC), F.col("b").alias(DST)),
                        F.struct(F.col("a").alias(SRC), F.col("c").alias(DST)),
                        F.struct(F.col("b").alias(SRC), F.col("c").alias(DST)),
                    )
                ).alias("e")
            )
            .groupBy(F.col("e.src").alias(SRC), F.col("e.dst").alias(DST))
            .agg(F.count("*").alias("_supp"))
        )
        # inner join: an edge with no triangles has support 0 < k-2, drop
        prev = cur
        cur = (
            cur.join(supp.hint("shuffle_hash"), on=[SRC, DST])
            .filter(F.col("_supp") >= k - 2)
            .select(SRC, DST)
            .localCheckpoint(eager=True)
            .persist()
        )
        n = cur.count()
        prev.unpersist()
        if n == n_prev:
            return _release(cur)
        n_prev = n
    warnings.warn(
        f"ktruss: hit max_rounds={max_rounds} before the peel reached a "
        "fixpoint; returning the current (possibly non-maximal) edge set",
        RuntimeWarning,
    )
    return _release(cur)


def truss_stats(spark: SparkSession, truss_edges: DataFrame) -> DataFrame:
    """[n_edges, n_vertices] — summary row for a k-truss edge set."""
    verts = truss_edges.select(F.col(SRC).alias("v")).unionByName(
        truss_edges.select(F.col(DST).alias("v"))
    )
    return spark.createDataFrame(
        [(truss_edges.count(), verts.distinct().count())],
        "n_edges long, n_vertices long",
    )
