"""Tier B h-index coreness: cogrouped pandas histogram kernels.

Same semantics as operators/kcore.coreness_hindex (c0 = degree, each round
every vertex takes the h-index of its neighbors' values; Lü et al. 2016) —
bit-identical integer state, gated against the SAME DuckDB oracle.  Physical
plan follows the csr/lpa.py shape:

  * undirected simple adjacency (gatherer, nbr) bucketed by
    pkey = pmod(nbr, P) once, persisted;
  * superstep = cogroup(edges_bucket, state_bucket).applyInPandas: a pandas
    hash-join maps nbr→core, then a pandas groupby pre-counts the
    (gatherer, value) histogram INSIDE the partition — the shuffle moves
    only per-bucket (gatherer, value, cnt) rows, one per distinct neighbor
    value, instead of one row per edge;
  * the h-index fold stays in the JVM via the count identity
    h = max_v min(v, |{u : c_u >= v}|): per gatherer, order distinct values
    desc, running count sum, take max(least(value, cum)).  Pure integer
    arithmetic — Tier A and Tier B agree exactly (pytest-pinned).

The histogram compression is the Tier B payoff: a hub with 10^6 neighbors
whose values collapse onto <=core_max distinct integers ships core_max rows,
not 10^6.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame
from neo4j_graph_algorithms_spark.plans.runtime import SuperstepResult, SuperstepRunner


def _hist_kernel(edges_pdf: pd.DataFrame, state_pdf: pd.DataFrame) -> pd.DataFrame:
    """(gatherer, val, cnt) neighbor-value histogram for one nbr bucket."""
    empty = pd.DataFrame(
        {
            "gatherer": pd.Series(dtype="int64"),
            "val": pd.Series(dtype="int64"),
            "cnt": pd.Series(dtype="int64"),
        }
    )
    if len(edges_pdf) == 0 or len(state_pdf) == 0:
        return empty
    merged = edges_pdf.merge(
        state_pdf[[VID, "core"]], left_on="nbr", right_on=VID, how="inner", copy=False
    )
    if len(merged) == 0:
        return empty
    out = (
        pd.DataFrame(
            {
                "gatherer": merged["gatherer"].to_numpy(),
                "val": merged["core"].to_numpy(),
            }
        )
        .groupby(["gatherer", "val"], sort=False, as_index=False)
        .size()
        .rename(columns={"size": "cnt"})
    )
    return out


def coreness_hindex_csr(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    max_iterations: int = 50,
    fixed_iterations: bool = False,
    num_buckets: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
) -> SuperstepResult:
    """Tier B twin of operators.kcore.coreness_hindex — state [vid, core]."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    P = num_buckets or spark.sparkContext.defaultParallelism

    und = ef.canonical().df.select(SRC, DST).filter(F.col(SRC) != F.col(DST))
    gather = (
        und.select(F.col(SRC).alias("gatherer"), F.col(DST).alias("nbr"))
        .unionByName(und.select(F.col(DST).alias("gatherer"), F.col(SRC).alias("nbr")))
        .withColumn("pkey", F.pmod(F.col("nbr"), F.lit(P)))
        .repartition(P, "pkey")
    )
    gather.persist()
    gather.count()
    gather_grouped = gather.groupby("pkey")

    verts = ef.vertices()
    deg = gather.groupBy(F.col("gatherer").alias(VID)).agg(F.count("*").alias("core"))
    state0 = verts.join(deg.hint("shuffle_hash"), on=VID, how="left").select(
        VID, F.coalesce(F.col("core"), F.lit(0)).alias("core")
    )

    wv = (
        Window.partitionBy("gatherer")
        .orderBy(F.col("val").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        st = state.withColumn("pkey", F.pmod(F.col(VID), F.lit(P)))
        partial = gather_grouped.cogroup(st.groupby("pkey")).applyInPandas(
            lambda e, s: _hist_kernel(e, s),
            schema="gatherer long, val long, cnt long",
        )
        hist = partial.groupBy("gatherer", "val").agg(F.sum("cnt").alias("cnt"))
        h = (
            hist.withColumn("_cum", F.sum("cnt").over(wv))
            .groupBy(F.col("gatherer").alias(VID))
            .agg(F.max(F.least(F.col("val"), F.col("_cum"))).alias("_h"))
        )
        return state.select(VID).join(h.hint("shuffle_hash"), on=VID, how="left").select(
            VID, F.coalesce(F.col("_h"), F.lit(0)).alias("core")
        )

    def changed(new: DataFrame, old: DataFrame, i: int) -> float:
        ns = new.agg(F.sum("core")).collect()[0][0] or 0
        os_ = old.agg(F.sum("core")).collect()[0][0] or 0
        return float(os_ - ns)

    runner = SuperstepRunner(
        spark,
        max_iterations=max_iterations,
        metric=None if fixed_iterations else changed,
        converged=None if fixed_iterations else (lambda m: m == 0.0),
        checkpoint_dir=checkpoint_dir,
        checkpoint_interval=checkpoint_interval,
        job_group="linkgraph-coreness-csr",
    )
    result = runner.run(state0, step, resume=resume)
    gather.unpersist()
    return result
