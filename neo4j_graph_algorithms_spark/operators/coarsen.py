"""Graph coarsening by matching contraction — one level of the multilevel
(METIS-style) pipeline: contract each matched pair to a single coarse
vertex and aggregate the surviving parallel edges into integer weights.

The reference has no coarsening procedure; this is the beyond-catalogue
consumer of operators/matching.py (the docstring there names coarsening as
the primitive's purpose).  Multilevel partitioners/clusterers repeat
(match → contract) until the graph fits a direct method, then project the
result back up — this operator is the distributed contract step.

Semantics (deterministic, oracle-crossable):
  * base graph = the undirected simple canonicalization of the input
    (least/greatest, self-loops dropped, parallel edges collapsed), the
    same normalization maximal_matching applies;
  * representative: a matched pair (src < dst) contracts to src (its min
    vid); unmatched vertices represent themselves;
  * coarse edges: re-canonicalized (least/greatest of the two reps),
    intra-pair edges (now self-loops) dropped; weight = COUNT of distinct
    base edges that collapsed onto the coarse edge — a pure integer, so
    every row is engine- and re-shard-invariant (twin:
    oracles.py:coarsen_sql, sharing the unrolled matching CTE chain).

Scale shape: the rep map has one row per MATCHED vertex (≤ |V|, ≤ 2·|M|) —
graph-scaled, so the two rep joins hash the map side into the edge set via
shuffle_hash PROJECTIONS (repo convention: never let Catalyst broadcast a
frame that scales with the graph).  One groupBy(src,dst) shuffle aggregates
weights with map-side combine.  Skew: a coarse vertex's degree is at most
the sum of two fine degrees, so contraction cannot create a hub that did
not already exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, EdgeFrame
from neo4j_graph_algorithms_spark.operators.matching import maximal_matching


def coarsen_by_matching(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    matching: DataFrame | None = None,
    seed: int = 29,
    max_iterations: int = 60,
) -> DataFrame:
    """[src, dst, weight] — the coarse graph after contracting a maximal
    matching (computed with `seed` unless an explicit [src, dst, ...]
    matching frame is supplied; src < dst canonical pairs required)."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    base = (
        ef.with_direction("BOTH")
        .df.select(F.least(SRC, DST).alias(SRC), F.greatest(SRC, DST).alias(DST))
        .filter(F.col(SRC) != F.col(DST))
        .distinct()
    )
    if matching is None:
        matching = maximal_matching(
            spark, ef, seed=seed, max_iterations=max_iterations
        )
    pairs = matching.select(SRC, DST)
    # matched vertex -> min-vid representative (canonical pairs: rep = src)
    rep = pairs.select(F.col(SRC).alias("_v"), F.col(SRC).alias("_r")).unionByName(
        pairs.select(F.col(DST).alias("_v"), F.col(SRC).alias("_r"))
    )
    contracted = (
        base.join(
            rep.select(F.col("_v").alias(SRC), F.col("_r").alias("_rs")).hint(
                "shuffle_hash"
            ),
            on=SRC,
            how="left",
        )
        .join(
            rep.select(F.col("_v").alias(DST), F.col("_r").alias("_rd")).hint(
                "shuffle_hash"
            ),
            on=DST,
            how="left",
        )
        .select(
            F.coalesce(F.col("_rs"), F.col(SRC)).alias("_s"),
            F.coalesce(F.col("_rd"), F.col(DST)).alias("_d"),
        )
    )
    return (
        contracted.select(
            F.least("_s", "_d").alias(SRC), F.greatest("_s", "_d").alias(DST)
        )
        .filter(F.col(SRC) != F.col(DST))
        .groupBy(SRC, DST)
        .agg(F.count("*").alias("weight"))
    )
