"""Tier B multi-source BFS: cogrouped pandas bitmask kernels over
source-partitioned edges.

Same semantics as operators/msbfs.py (64·n_words concurrent BFS per pass,
reference impl/msbfs/MultiSourceBFS.java:33-79); the csr/pagerank.py
physical plan applied to the bitset superstep:

  * directed edges bucketed by pkey = pmod(src, P) ONCE, persisted;
  * superstep = cogroup(edges_bucket, frontier_bucket).applyInPandas:
    pandas hash-join maps src→frontier mask words, numpy bitwise-ORs the
    per-dst masks INSIDE the partition — the shuffle moves only
    (dst, n_words partial-OR words) rows (map-side combine in Python,
    the exact analogue of the reference's per-thread bitset unions);
  * the global per-dst bit_or + visited/new-bits merge stay in the JVM.

Masks travel as FLAT long columns (w0..w{k-1}) rather than arrays —
Arrow-native, and numpy reduces them without object boxing.  Bitwise OR is
order-independent, so Tier A and Tier B agree exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame
from neo4j_graph_algorithms_spark.operators.msbfs import (
    N_WORDS,
    OMEGA,
    _empty_depths,
    _rank_sources,
)


def _or_kernel(n_words: int):
    wcols = [f"w{i}" for i in range(n_words)]

    def kernel(edges_pdf: pd.DataFrame, fr_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(edges_pdf) == 0 or len(fr_pdf) == 0:
            return pd.DataFrame(
                {VID: pd.Series(dtype="int64")}
                | {c: pd.Series(dtype="int64") for c in wcols}
            )
        merged = edges_pdf.merge(
            fr_pdf, left_on=SRC, right_on=VID, how="inner", copy=False
        )
        if len(merged) == 0:
            return pd.DataFrame(
                {VID: pd.Series(dtype="int64")}
                | {c: pd.Series(dtype="int64") for c in wcols}
            )
        out = pd.DataFrame({VID: merged[DST].to_numpy()})
        for c in wcols:
            out[c] = merged[c].to_numpy()
        return out.groupby(VID, sort=False, as_index=False).agg(
            {c: lambda s: int(np.bitwise_or.reduce(s.to_numpy())) for c in wcols}
        )

    return kernel


def msbfs_depths_csr(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    sources: DataFrame | None = None,
    direction: str = "OUTGOING",
    max_depth: int = 64,
    n_words: int = N_WORDS,
    num_buckets: int | None = None,
) -> DataFrame:
    """Tier B twin of operators.msbfs.msbfs_depths — same
    [vid, depth, n_sources] contract."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    P = num_buckets or spark.sparkContext.defaultParallelism
    wcols = [f"w{i}" for i in range(n_words)]
    e = (
        ef.with_direction(direction)
        .df.select(SRC, DST)
        .distinct()
        .withColumn("pkey", F.pmod(F.col(SRC), F.lit(P)))
        .repartition(P, "pkey")
    )
    e.persist()
    e.count()
    e_grouped = e.groupby("pkey")

    src_df = sources.select(VID) if sources is not None else ef.vertices()
    ranked = _rank_sources(src_df, OMEGA * n_words).localCheckpoint(eager=True)
    groups = [r["grp"] for r in ranked.select("grp").distinct().collect()]
    if not groups:
        e.unpersist()
        return _empty_depths(spark)

    kernel = _or_kernel(n_words)
    kernel_schema = f"{VID} long, " + ", ".join(f"{c} long" for c in wcols)
    any_frontier = " OR ".join(f"f{i} <> 0" for i in range(n_words))

    parts: list[DataFrame] = []
    for g in sorted(groups):
        batch = ranked.filter(F.col("grp") == g).select(VID, "word", "bit")
        word_mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")
        seed_aggs = [
            F.bit_or(
                F.when(F.col("word") == i, word_mask).otherwise(F.lit(0).cast("long"))
            ).alias(f"v{i}")
            for i in range(n_words)
        ]
        state = (
            batch.groupBy(VID)
            .agg(*seed_aggs)
            .select(
                VID,
                *[F.col(f"v{i}") for i in range(n_words)],
                *[F.col(f"v{i}").alias(f"f{i}") for i in range(n_words)],
            )
            .localCheckpoint(eager=True)
        )
        for depth in range(1, max_depth + 1):
            fr = (
                state.filter(F.expr(any_frontier))
                .select(
                    VID, *[F.col(f"f{i}").alias(f"w{i}") for i in range(n_words)]
                )
                .withColumn("pkey", F.pmod(F.col(VID), F.lit(P)))
            )
            partial = e_grouped.cogroup(fr.groupby("pkey")).applyInPandas(
                lambda ep, fp: kernel(ep, fp), schema=kernel_schema
            )
            incoming = partial.groupBy(VID).agg(
                *[F.bit_or(f"w{i}").alias(f"in{i}") for i in range(n_words)]
            )
            merged = (
                state.select(VID, *[f"v{i}" for i in range(n_words)])
                .join(incoming, on=VID, how="full_outer")
                .select(
                    VID,
                    *[
                        F.coalesce(F.col(f"v{i}"), F.lit(0).cast("long")).alias(f"v{i}")
                        for i in range(n_words)
                    ],
                    *[
                        (
                            F.coalesce(F.col(f"in{i}"), F.lit(0).cast("long"))
                            .bitwiseAND(
                                F.bitwise_not(
                                    F.coalesce(F.col(f"v{i}"), F.lit(0).cast("long"))
                                )
                            )
                        ).alias(f"new{i}")
                        for i in range(n_words)
                    ],
                )
            )
            state = merged.select(
                VID,
                *[
                    F.col(f"v{i}").bitwiseOR(F.col(f"new{i}")).alias(f"v{i}")
                    for i in range(n_words)
                ],
                *[F.col(f"new{i}").alias(f"f{i}") for i in range(n_words)],
            ).localCheckpoint(eager=True)
            contrib = state.filter(F.expr(any_frontier)).select(
                VID,
                F.lit(depth).alias("depth"),
                sum(F.bit_count(F.col(f"f{i}")) for i in range(n_words)).alias(
                    "n_sources"
                ),
            )
            contrib = contrib.localCheckpoint(eager=True)
            parts.append(contrib)
            if contrib.isEmpty():
                break
    res = parts[0]
    for p in parts[1:]:
        res = res.unionByName(p)
    res = (
        res.filter(F.col("n_sources") > 0)
        .groupBy(VID, "depth")
        .agg(F.sum("n_sources").alias("n_sources"))
    )
    e.unpersist()
    return res


def closeness_csr(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    sources: DataFrame | None = None,
    max_depth: int = 64,
    num_buckets: int | None = None,
) -> DataFrame:
    """Tier B twin of operators.msbfs.closeness (same normalization)."""
    from neo4j_graph_algorithms_spark.operators.msbfs import closeness

    return closeness(
        spark,
        edges,
        sources,
        max_depth,
        depths_fn=lambda s, e, src, d, m: msbfs_depths_csr(
            s, e, src, d, m, num_buckets=num_buckets
        ),
    )


def harmonic_csr(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    sources: DataFrame | None = None,
    max_depth: int = 64,
    num_buckets: int | None = None,
) -> DataFrame:
    """Tier B twin of operators.msbfs.harmonic."""
    from neo4j_graph_algorithms_spark.operators.msbfs import harmonic

    return harmonic(
        spark,
        edges,
        sources,
        max_depth,
        depths_fn=lambda s, e, src, d, m: msbfs_depths_csr(
            s, e, src, d, m, num_buckets=num_buckets
        ),
    )
