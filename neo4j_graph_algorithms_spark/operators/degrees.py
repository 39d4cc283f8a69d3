"""Degree centrality (beyond the reference catalogue; GDS `gds.degree`).

The reference exposes degrees only internally (core Degrees.java feeds its
algorithms); its successor ships degree centrality as a user-facing
procedure, and it is the zeroth link-graph statistic every pipeline
computes (skew audits pick hub thresholds for `pagerank(hub_threshold=)`
and `node_similarity(max_center_degree=)` from exactly this table).

One groupBy per direction on the edge table, map-side combined — no joins
except the final assembly on vid.  At 10^12 edges this is the cheapest
whole-graph aggregation that exists; it is also the skew PROBE, so it must
not itself assume balance: the aggregation key is the vertex id (never a
composite), letting AQE split hot reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame


def degree_centrality(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    vertices: DataFrame | None = None,
) -> DataFrame:
    """[vid, out_deg, in_deg, deg] — directed out/in degree (parallel edges
    counted, multigraph semantics like the reference loader pre-dedup) and
    undirected-simple degree `deg` (distinct neighbors, the triangle/
    coefficient convention — impl/TriangleCount.java:132-137 BOTH-degree).
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    out_d = ef.df.groupBy(F.col(SRC).alias(VID)).agg(F.count("*").alias("out_deg"))
    in_d = ef.df.groupBy(F.col(DST).alias(VID)).agg(F.count("*").alias("in_deg"))
    und = ef.canonical().df.select(SRC, DST)
    both = (
        und.select(F.col(SRC).alias(VID))
        .unionByName(und.select(F.col(DST).alias(VID)))
        .groupBy(VID)
        .agg(F.count("*").alias("deg"))
    )
    verts = vertices.select(VID) if vertices is not None else ef.vertices()
    return (
        verts.join(out_d.hint("shuffle_hash"), on=VID, how="left")
        .join(in_d.hint("shuffle_hash"), on=VID, how="left")
        .join(both.hint("shuffle_hash"), on=VID, how="left")
        .select(
            VID,
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            F.coalesce("deg", F.lit(0)).alias("deg"),
        )
    )
