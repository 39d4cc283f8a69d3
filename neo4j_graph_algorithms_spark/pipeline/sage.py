"""GraphSAGE-style neighborhood feature aggregation over a link graph.

The reference computes topology-only scores (PageRank, similarity — e.g.
/root/reference/algo/src/main/java/org/neo4j/graphalgo/PageRankProc.java:1);
GNN training-data prep additionally needs node FEATURES aggregated over
the neighborhood — the mean-aggregator of GraphSAGE (Hamilton, Ying,
Leskovec, "Inductive Representation Learning on Large Graphs", NeurIPS
2017).  This module materializes those aggregates as a table: for each
vertex, the element-wise mean of its neighbors' embedding vectors
(layer 1) and the mean of its neighbors' layer-1 means (layer 2) — the
two-hop receptive field every SAGE/GCN-style model consumes, precomputed
once so training never touches the graph.

Exactness contract (the repo's integer micro-unit discipline, see
CLAUDE.md): float32 components are mapped once to BIGINT micro-units
(floor(x * 1e6 + 0.5) — half-up, no banker's rounding), all sums run in
BIGINT (order-independent, exact), and the layer-1 mean is re-rounded to
the integer grid via floor((2*s + d) / (2*d)) computed as floor of an
IEEE double division (exact at these magnitudes in every engine).  The
gate compares pure integers.

Scale shape: one posexplode of the feature table (64x rows, but the
shuffle key (vid, pos) is maximally spread), two edge-feature hash joins
partitioned on the destination id, two map-side-combined (vid, pos)
aggregations.  Feature coverage may be partial: counts d1/d2 record how
many neighbors contributed, vertices with no contributing neighbor are
absent from that layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame
from neo4j_graph_algorithms_spark.operators.kcore import _both_directions

MICRO = 1_000_000


def features_micro(
    embs: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """[vid, pos, m]: embedding components on the exact BIGINT micro-unit
    grid — floor(x*1e6 + 0.5), half-up (identical in Spark/DuckDB/Python,
    unlike round()'s half-even)."""
    return embs.select(
        F.col(id_col).alias(VID),
        F.posexplode(vec_col).alias("pos", "_x"),
    ).select(
        VID,
        "pos",
        F.floor(F.col("_x").cast("double") * MICRO + F.lit(0.5))
        .cast("long")
        .alias("m"),
    )


def sage_aggregate(
    edges: EdgeFrame | DataFrame,
    embs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """[vid, pos, sum1, d1, sum2, d2] two-layer mean-aggregator table.

    sum1/d1: BIGINT sum of neighbor micro-unit components and contributing
    neighbor count (layer-1 mean = sum1/d1).  sum2/d2: sum of neighbors'
    grid-rounded layer-1 means and contributing neighbor count (layer-2
    mean = sum2/d2).  Inner on layer 2: a vertex appears iff it has a
    layer-1 row AND >=1 neighbor with a layer-1 row; sum2/d2 NULL when
    only the former.
    """
    und = _both_directions(edges).repartition(DST)
    feats = features_micro(embs, id_col, vec_col)
    nbr_feats = und.join(
        feats.withColumnRenamed(VID, DST).hint("shuffle_hash"), on=DST
    )
    l1 = nbr_feats.groupBy(F.col(SRC).alias(VID), "pos").agg(
        F.sum("m").alias("sum1"), F.count("*").alias("d1")
    )
    # half-up grid mean: floor((2s+d)/(2d)); IEEE double division is exact
    # to the floor at BIGINT-micro magnitudes (quotient gaps >= 1/(2d)
    # dwarf one ulp), so Spark and any SQL twin agree bit-for-bit
    mean1 = l1.select(
        VID,
        "pos",
        F.floor(
            (2 * F.col("sum1") + F.col("d1")) / (2 * F.col("d1"))
        ).cast("long").alias("m"),
    )
    nbr_means = und.join(
        mean1.withColumnRenamed(VID, DST).hint("shuffle_hash"), on=DST
    )
    l2 = nbr_means.groupBy(F.col(SRC).alias(VID), "pos").agg(
        F.sum("m").alias("sum2"), F.count("*").alias("d2")
    )
    return l1.join(l2, on=[VID, "pos"], how="left").select(
        VID, "pos", "sum1", "d1", "sum2", "d2"
    )
