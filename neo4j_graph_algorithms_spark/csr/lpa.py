"""Tier B label propagation: cogrouped pandas vote kernels over
nbr-partitioned edges.

Same semantics as operators/lpa.py (synchronous supersteps, vote =
Σ nodeWeight×relWeight per neighbor label, smallest-label tie-break; spec
tests/.../LabelPropagationProcIntegrationTest.java:49-199 +
doc/label-propagation.adoc:100-137); different physical plan, the same
shape as csr/pagerank.py:

  * gather edges (gatherer, nbr, w) bucketed by pkey = pmod(nbr, P) ONCE,
    persisted — every superstep rescans cached Arrow-friendly blocks;
  * superstep = cogroup(edges_bucket, state_bucket).applyInPandas:
    a pandas hash-join maps nbr→label, a pandas groupby pre-sums the
    (gatherer, label) vote weights INSIDE the partition — the shuffle moves
    only per-bucket (gatherer, label, partial) rows, i.e. the map-side
    combine runs in Python where the CPU work is;
  * the final groupBy(gatherer, label).sum + argmax window + state update
    stays in the JVM (identical argmax contract to Tier A, so the two
    tiers agree exactly on integer-valued weights).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, WEIGHT, EdgeFrame
from neo4j_graph_algorithms_spark.plans.runtime import SuperstepResult, SuperstepRunner

LABEL = "label"


def _vote_kernel(edges_pdf: pd.DataFrame, state_pdf: pd.DataFrame) -> pd.DataFrame:
    """(gatherer, label, partial vote weight) for one nbr bucket."""
    if len(edges_pdf) == 0 or len(state_pdf) == 0:
        return pd.DataFrame(
            {
                "gatherer": pd.Series(dtype="int64"),
                LABEL: pd.Series(dtype="int64"),
                "w": pd.Series(dtype="float64"),
            }
        )
    merged = edges_pdf.merge(
        state_pdf[[VID, LABEL]], left_on="nbr", right_on=VID, how="inner", copy=False
    )
    if len(merged) == 0:
        return pd.DataFrame(
            {
                "gatherer": pd.Series(dtype="int64"),
                LABEL: pd.Series(dtype="int64"),
                "w": pd.Series(dtype="float64"),
            }
        )
    out = (
        pd.DataFrame(
            {
                "gatherer": merged["gatherer"].to_numpy(),
                LABEL: merged[LABEL].to_numpy(),
                "w": merged[WEIGHT].to_numpy(),
            }
        )
        .groupby(["gatherer", LABEL], sort=False, as_index=False)["w"]
        .sum()
    )
    return out


def lpa_csr(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    seeds: DataFrame | None = None,
    vertices: DataFrame | None = None,
    node_weights: DataFrame | None = None,
    direction: str = "OUTGOING",
    max_iterations: int = 1,
    num_buckets: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
    metric_every: int = 1,
) -> SuperstepResult:
    """Tier B twin of operators.lpa.lpa — same state schema [vid, label],
    same convergence contract (didConverge when no label changes)."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    P = num_buckets or spark.sparkContext.defaultParallelism

    d = direction.upper()
    if d == "OUTGOING":
        gather = ef.df.select(F.col(SRC).alias("gatherer"), F.col(DST).alias("nbr"), WEIGHT)
    elif d == "INCOMING":
        gather = ef.df.select(F.col(DST).alias("gatherer"), F.col(SRC).alias("nbr"), WEIGHT)
    elif d == "BOTH":
        gather = ef.as_undirected().df.select(
            F.col(SRC).alias("gatherer"), F.col(DST).alias("nbr"), WEIGHT
        )
    else:
        raise ValueError(f"unknown direction {direction!r}")
    if node_weights is not None:
        gather = gather.join(
            node_weights.select(F.col(VID).alias("nbr"), F.col("nweight")),
            on="nbr",
            how="left",
        ).select(
            "gatherer",
            "nbr",
            (F.col(WEIGHT) * F.coalesce("nweight", F.lit(1.0))).alias(WEIGHT),
        )
    gather = gather.withColumn("pkey", F.pmod(F.col("nbr"), F.lit(P))).repartition(
        P, "pkey"
    )
    gather.persist()
    gather.count()
    gather_grouped = gather.groupby("pkey")

    verts = vertices.select(VID) if vertices is not None else ef.vertices()
    if seeds is not None:
        state0 = verts.join(
            seeds.select(VID, F.col(LABEL).cast("long")), on=VID, how="left"
        ).select(VID, F.coalesce(F.col(LABEL), F.col(VID)).alias(LABEL))
    else:
        state0 = verts.select(F.col(VID), F.col(VID).alias(LABEL))

    def step(state: DataFrame, i: int) -> DataFrame:
        st = state.withColumn("pkey", F.pmod(F.col(VID), F.lit(P)))
        partial = gather_grouped.cogroup(st.groupby("pkey")).applyInPandas(
            lambda e, s: _vote_kernel(e, s),
            schema=f"gatherer long, {LABEL} long, w double",
        )
        votes = partial.groupBy("gatherer", LABEL).agg(F.sum("w").alias("wsum"))
        w = Window.partitionBy("gatherer").orderBy(
            F.col("wsum").desc(), F.col(LABEL).asc()
        )
        top = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(F.col("gatherer").alias(VID), F.col(LABEL).alias("_new"))
        )
        return state.join(top, on=VID, how="left").select(
            VID, F.coalesce(F.col("_new"), F.col(LABEL)).alias(LABEL)
        )

    def metric(new: DataFrame, old: DataFrame, i: int) -> float:
        return float(
            new.alias("n")
            .join(old.alias("o"), on=VID)
            .filter(F.col(f"n.{LABEL}") != F.col(f"o.{LABEL}"))
            .count()
        )

    runner = SuperstepRunner(
        spark,
        max_iterations=max_iterations,
        metric=metric,
        converged=lambda changed: changed == 0,
        checkpoint_dir=checkpoint_dir,
        checkpoint_interval=checkpoint_interval,
        job_group="linkgraph-lpa-csr",
        metric_every=metric_every,
    )
    result = runner.run(state0, step, resume=resume)
    gather.unpersist()
    return result
