"""Onion decomposition: peel-layer + core value per vertex.

Beyond the reference catalogue (its k-core successor is `gds.kcore`; see
operators/kcore.py for the catalogue pointer — the reference itself ships
degree-based hub handling only,
/root/reference/algo/src/main/java/org/neo4j/graphalgo/MetaPathComputeHighDegreeNodesProc.java:1).
The onion decomposition (Hebert-Dufresne, Grochow, Allard, "Multi-scale
structure and topological anomaly detection via a new network statistic:
the onion decomposition", Scientific Reports 6:31708, 2016) refines
coreness: vertices are removed in synchronous rounds, each round deleting
every vertex whose CURRENT degree is <= the running threshold k, where k
only ever rises to the minimum surviving degree.  The round index is the
vertex's onion layer; the k at removal is its coreness.  Layers separate
tree-like periphery from dense nuclei at the same core value — the
link-graph anomaly audit (template farms and spam cliques sit in
anomalously deep layers for their core).

Spark formulation: a self-managed peel loop (the ktruss persist +
localCheckpoint discipline — operators/ktruss.py): state is the surviving
undirected adjacency plus the surviving vertex set.  Per round one
map-side-combined degree aggregation, one driver-collected (min, count)
scalar (the global threshold is a genuine sequential dependency — the
same O(depth) driver round-trips every published distributed peeling
algorithm pays), and two hash semi-joins against the shrinking survivor
projection (`shuffle_hash`-hinted; vertex-sized frames never broadcast).
Rounds = onion depth, measured 40 at sf0.01 — bounded by peel depth x
degeneracy, tens on real link graphs.  Removed-layer frames are
checkpointed per round (total rows across rounds = |V|) and unioned once.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame
from neo4j_graph_algorithms_spark.operators.kcore import _both_directions


def onion_decomposition(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    max_rounds: int = 200,
) -> DataFrame:
    """[vid, layer, onion_core] for every vertex of the undirected graph.

    `layer` is the 1-based synchronous peel round at which the vertex was
    removed; `onion_core` is the running threshold k at that round (the
    vertex's coreness — the onion decomposition computes k-core membership
    for every k as a by-product).  Deterministic: no ordering choices
    exist, every round's removal set is degree-defined.
    """
    adj = (
        _both_directions(edges)
        .repartition(SRC)
        .localCheckpoint(eager=True)
        .persist()
    )
    # round-1 vertex set: lazy distinct over the cached adjacency; later
    # rounds reuse the survivor filter of the cached degree frame
    verts = adj.select(F.col(SRC).alias(VID)).distinct()
    deg_prev: DataFrame | None = None
    k = 0
    removed_frames: list[DataFrame] = []
    converged = False
    for rnd in range(1, max_rounds + 1):
        deg = (
            verts.join(
                adj.groupBy(SRC)
                .agg(F.count("*").alias("deg"))
                .withColumnRenamed(SRC, VID)
                .hint("shuffle_hash"),
                on=VID,
                how="left",
            )
            .fillna(0, subset=["deg"])
            .localCheckpoint(eager=True)
            .persist()
        )
        row = deg.agg(F.min("deg").alias("mn"), F.count("*").alias("n")).first()
        if row["n"] == 0:
            deg.unpersist()
            converged = True
            break
        k = max(k, int(row["mn"]))
        removed_frames.append(
            deg.filter(F.col("deg") <= k)
            .select(
                VID,
                F.lit(rnd).cast("int").alias("layer"),
                F.lit(k).cast("int").alias("onion_core"),
            )
            .localCheckpoint(eager=True)
        )
        survivors = deg.filter(F.col("deg") > k).select(VID)
        new_adj = (
            adj.join(
                survivors.select(F.col(VID).alias(SRC)).hint("shuffle_hash"),
                on=SRC,
                how="left_semi",
            )
            .join(
                survivors.select(F.col(VID).alias(DST)).hint("shuffle_hash"),
                on=DST,
                how="left_semi",
            )
            .select(SRC, DST)
            .localCheckpoint(eager=True)
            .persist()
        )
        new_adj.count()
        adj.unpersist()
        if deg_prev is not None:
            deg_prev.unpersist()
        adj, verts, deg_prev = new_adj, survivors, deg
    if not converged:
        warnings.warn(
            f"onion_decomposition: hit max_rounds={max_rounds} before the "
            "peel emptied the graph; returning the layers assigned so far",
            RuntimeWarning,
        )
    adj.unpersist()
    if deg_prev is not None:
        deg_prev.unpersist()
    if not removed_frames:
        return spark.createDataFrame([], schema=f"{VID} long, layer int, onion_core int")
    out = removed_frames[0]
    for frame in removed_frames[1:]:
        out = out.unionByName(frame)
    return out


def onion_spectrum(layers: DataFrame) -> DataFrame:
    """[onion_core, layer, n] — layer-size histogram per core value, the
    paper's "onion spectrum" summary used for anomaly detection."""
    return layers.groupBy("onion_core", "layer").agg(F.count("*").alias("n"))
