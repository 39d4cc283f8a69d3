"""Tier B PageRank: cogrouped pandas kernels over source-partitioned edges.

Same semantics as operators/pagerank.py (the unnormalized Neo4j variant,
impl/PageRank.java:416-517); different physical plan:

  * edges pre-joined with 1/outDegree ONCE, bucketed by pkey =
    pmod(src, P), persisted — every superstep rescans cached Arrow-friendly
    blocks (the analogue of the reference's per-partition adjacency arrays,
    impl/PageRank.java:184-218);
  * superstep = cogroup(edges_bucket, state_bucket).applyInPandas:
    a pandas hash-join (C) maps src→delta, numpy multiplies by inv_deg,
    a pandas groupby (C) pre-sums per dst INSIDE the partition — the
    shuffle then moves only (dst, partial) rows, i.e. the map-side combine
    runs in Python where the CPU work is, and scales with cores;
  * the final groupBy(vid).sum + state update stays in the JVM.

This is the kernel whose throughput the N-vs-4N scaling evidence measures:
per-core Python workers do the O(E) arithmetic independently.
"""

from __future__ import annotations


import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame
from neo4j_graph_algorithms_spark.plans.runtime import SuperstepResult, SuperstepRunner

RANK = "rank"
DELTA = "delta"


def _contrib_kernel(edges_pdf: pd.DataFrame, state_pdf: pd.DataFrame) -> pd.DataFrame:
    """(dst, partial-sum of delta·inv_deg) for one source bucket."""
    active = state_pdf[state_pdf[DELTA] > 0.0]
    if len(active) == 0 or len(edges_pdf) == 0:
        return pd.DataFrame({VID: pd.Series(dtype="int64"), "s": pd.Series(dtype="float64")})
    merged = edges_pdf.merge(
        active[[VID, DELTA]], left_on=SRC, right_on=VID, how="inner", copy=False
    )
    if len(merged) == 0:
        return pd.DataFrame({VID: pd.Series(dtype="int64"), "s": pd.Series(dtype="float64")})
    contrib = merged[DELTA].to_numpy() * merged["inv_deg"].to_numpy()
    out = (
        pd.DataFrame({VID: merged[DST].to_numpy(), "s": contrib})
        .groupby(VID, sort=False, as_index=False)["s"]
        .sum()
    )
    return out


def pagerank_csr(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    vertices: DataFrame | None = None,
    damping_factor: float = 0.85,
    max_iterations: int = 20,
    tolerance: float | None = None,
    num_buckets: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
) -> SuperstepResult:
    """Tier B twin of operators.pagerank.pagerank — same state schema
    [vid, rank, delta], same convergence contract."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    alpha = 1.0 - damping_factor
    d = damping_factor
    P = num_buckets or spark.sparkContext.defaultParallelism

    out_deg = ef.df.groupBy(F.col(SRC).alias(VID)).agg(F.count("*").alias("outdeg"))
    edges_wd = (
        ef.df.select(SRC, DST)
        # shuffle_hash: |V|-sized out_deg must not broadcast (see Tier A)
        .join(
            out_deg.select(F.col(VID).alias(SRC), "outdeg").hint("shuffle_hash"),
            on=SRC,
        )
        .select(
            SRC,
            DST,
            (F.lit(1.0) / F.col("outdeg")).alias("inv_deg"),
            F.pmod(F.col(SRC), F.lit(P)).alias("pkey"),
        )
        .repartition(P, "pkey")
    )
    edges_wd.persist()
    edges_wd.count()
    edges_grouped = edges_wd.groupby("pkey")

    verts = vertices.select(VID) if vertices is not None else ef.vertices()
    state0 = verts.select(
        F.col(VID), F.lit(alpha).alias(RANK), F.lit(alpha).alias(DELTA)
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        st = state.withColumn("pkey", F.pmod(F.col(VID), F.lit(P)))
        partial = edges_grouped.cogroup(st.groupby("pkey")).applyInPandas(
            lambda e, s: _contrib_kernel(e, s), schema=f"{VID} long, s double"
        )
        sums = partial.groupBy(VID).agg(F.sum("s").alias("s"))
        return state.join(sums, on=VID, how="left").select(
            VID,
            (F.col(RANK) + F.lit(d) * F.coalesce(F.col("s"), F.lit(0.0))).alias(RANK),
            (F.lit(d) * F.coalesce(F.col("s"), F.lit(0.0))).alias(DELTA),
        )

    def metric(new: DataFrame, old: DataFrame, i: int) -> float:
        row = new.agg(F.max(F.abs(F.col(DELTA))).alias("m")).collect()[0]
        return float(row["m"]) if row["m"] is not None else 0.0

    runner = SuperstepRunner(
        spark,
        max_iterations=max_iterations,
        # fixed-iteration mode pays NO metric job: one driver-coordinated job
        # per superstep, not two (Tier A does the same, operators/pagerank.py)
        metric=(None if tolerance is None else metric),
        converged=(None if tolerance is None else (lambda m: m < tolerance)),
        checkpoint_dir=checkpoint_dir,
        checkpoint_interval=checkpoint_interval,
        job_group="linkgraph-pagerank-csr",
    )
    result = runner.run(state0, step, resume=resume)
    edges_wd.unpersist()
    return result
