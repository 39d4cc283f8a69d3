"""Deterministic distributed graph synthesizer for scale benchmarks.

Pure column expressions over ``spark.range`` — no driver-side data, no RNG
state; the same generator produces the identical edge set at any
parallelism (the property the N-vs-4N scaling evidence depends on) and any
size from CI fixtures to cluster-scale.

Skew model: endpoint = floor(N · u^alpha) with u a hash-derived uniform in
[0,1).  alpha=1 → uniform; alpha=2 → quadratic hub skew (heavy in-degree
head, the 'every commit touches README' shape co-commit graphs exhibit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TWO31 = 2**31


def _uniform(col_seed: int):
    """Deterministic pseudo-uniform in [0,1) from the row id."""
    return (F.pmod(F.xxhash64(F.col("id"), F.lit(col_seed)), F.lit(TWO31)) / TWO31)


def synth_edges(
    spark: SparkSession,
    n_vertices: int,
    n_edges: int,
    alpha_src: float = 1.0,
    alpha_dst: float = 2.0,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """[src, dst, weight] deterministic directed multigraph, self-loops
    removed; ~n_edges rows; dst skew controlled by alpha_dst."""
    rng = spark.range(0, n_edges, numPartitions=num_partitions)
    e = rng.select(
        F.floor(F.lit(n_vertices) * F.pow(_uniform(seed), F.lit(alpha_src)))
        .cast("long")
        .alias("src"),
        F.floor(F.lit(n_vertices) * F.pow(_uniform(seed + 1), F.lit(alpha_dst)))
        .cast("long")
        .alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    return e.filter(F.col("src") != F.col("dst"))
