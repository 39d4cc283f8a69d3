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


def planted_partition_graph(
    spark: SparkSession, groups: int = 4, group_size: int = 6
) -> DataFrame:
    """[src, dst, weight] planted-partition graph: `groups` cliques of
    `group_size` nodes (ids 0..groups*group_size-1) joined in a ring by one
    bridge edge per adjacent group pair.  Unit weights; src<dst canonical.

    With the 4×6 default the edge count is 4·15+4 = 64 — a POWER OF TWO, so
    every modularity-gain division (by m and 2m²) is exact in binary
    floating point and a greedy Louvain trajectory over this graph is
    bit-identical across engines (the property the louvain_fixed2_planted
    oracle gate relies on)."""
    n = groups * group_size
    nodes = spark.range(n).select(F.col("id").alias("v"))
    intra = (
        nodes.alias("a")
        .join(nodes.alias("b"), F.col("a.v") < F.col("b.v"))
        .filter(
            F.floor(F.col("a.v") / group_size) == F.floor(F.col("b.v") / group_size)
        )
        .select(F.col("a.v").alias("src"), F.col("b.v").alias("dst"))
    )
    bridge_rows = [
        (
            min(g * group_size + group_size - 1, ((g + 1) % groups) * group_size),
            max(g * group_size + group_size - 1, ((g + 1) % groups) * group_size),
        )
        for g in range(groups)
    ]
    bridges = spark.createDataFrame(bridge_rows, "src long, dst long")
    return (
        intra.unionByName(bridges)
        .withColumn("weight", F.lit(1.0))
        .select("src", "dst", "weight")
    )
