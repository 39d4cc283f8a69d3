"""Tier B SSSP: cogrouped pandas relaxation kernels over
source-partitioned edges.

Same semantics as operators/paths.sssp (frontier relaxation, reference
impl/ShortestPathDijkstra.java / impl/ShortestPaths.java distances);
the csr/pagerank.py physical plan applied to the paths family:

  * min-weight-deduped edges bucketed by pkey = pmod(src, P) ONCE,
    persisted;
  * relaxation = cogroup(edges_bucket, frontier_bucket).applyInPandas:
    pandas hash-join maps src→dist, numpy adds weights, pandas groupby
    takes the per-dst MIN inside the partition — the shuffle moves only
    (dst, candidate-min) rows (map-side combine in Python);
  * the global per-dst min + improved-filter + dist merge stay in the JVM.

Distances are float64 sums of the same addends in both tiers; min() is
order-independent, so Tier A and Tier B agree bit-for-bit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, WEIGHT, EdgeFrame

DIST = "dist"


def _relax_kernel(edges_pdf: pd.DataFrame, frontier_pdf: pd.DataFrame) -> pd.DataFrame:
    """(dst vid, partial min candidate distance) for one source bucket."""
    if len(edges_pdf) == 0 or len(frontier_pdf) == 0:
        return pd.DataFrame(
            {VID: pd.Series(dtype="int64"), "cand": pd.Series(dtype="float64")}
        )
    merged = edges_pdf.merge(
        frontier_pdf[[VID, DIST]], left_on=SRC, right_on=VID, how="inner", copy=False
    )
    if len(merged) == 0:
        return pd.DataFrame(
            {VID: pd.Series(dtype="int64"), "cand": pd.Series(dtype="float64")}
        )
    cand = merged[DIST].to_numpy() + merged[WEIGHT].to_numpy()
    return (
        pd.DataFrame({VID: merged[DST].to_numpy(), "cand": cand})
        .groupby(VID, sort=False, as_index=False)["cand"]
        .min()
    )


def sssp_csr(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    source: int,
    direction: str = "OUTGOING",
    max_iterations: int = 200,
    num_buckets: int | None = None,
) -> DataFrame:
    """Tier B twin of operators.paths.sssp — same [vid, dist] contract
    (touched vertices only)."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    P = num_buckets or spark.sparkContext.defaultParallelism
    e = (
        ef.with_direction(direction)
        .df.select(SRC, DST, WEIGHT)
        .groupBy(SRC, DST)
        .agg(F.min(WEIGHT).alias(WEIGHT))
        .withColumn("pkey", F.pmod(F.col(SRC), F.lit(P)))
        .repartition(P, "pkey")
    )
    e.persist()
    e.count()
    e_grouped = e.groupby("pkey")

    dist = spark.createDataFrame([(int(source), 0.0)], f"{VID} long, {DIST} double")
    frontier = dist
    for _ in range(max_iterations):
        fr = frontier.withColumn("pkey", F.pmod(F.col(VID), F.lit(P)))
        partial = e_grouped.cogroup(fr.groupby("pkey")).applyInPandas(
            lambda ep, fp: _relax_kernel(ep, fp), schema=f"{VID} long, cand double"
        )
        relaxed = partial.groupBy(VID).agg(F.min("cand").alias(DIST))
        improved = (
            relaxed.alias("r")
            .join(dist.alias("d"), on=VID, how="left")
            .filter(
                F.col(f"d.{DIST}").isNull() | (F.col(f"r.{DIST}") < F.col(f"d.{DIST}"))
            )
            .select(VID, F.col(f"r.{DIST}").alias(DIST))
            .localCheckpoint(eager=True)
        )
        if improved.isEmpty():
            break
        dist = (
            dist.join(improved, on=VID, how="left_anti")
            .unionByName(improved)
            .localCheckpoint(eager=True)
        )
        frontier = improved
    e.unpersist()
    return dist
