"""Tier B GraphSAGE aggregation: cogrouped pandas array-sum kernels.

Same semantics as pipeline/sage.sage_aggregate (two-layer mean-aggregator
in exact BIGINT micro-units — see that module for the contract and the
reference pointer), gated against the SAME DuckDB oracle.  Physical plan
follows the csr/coreness.py shape:

  * undirected adjacency (gatherer, nbr) bucketed by pkey = pmod(nbr, P)
    once, persisted, reused by BOTH layers;
  * gather stage = cogroup(edges_bucket, features_bucket).applyInPandas:
    a pandas hash-join maps nbr -> int64[d] feature array, then numpy
    accumulates ONE (gatherer, partial-sum array, count) row per gatherer
    per bucket — the shuffle moves d-wide arrays, not d-exploded rows
    (Tier A ships |E|*d (vid, pos, m) rows; Tier B ships <= |V|*P rows of
    d-long arrays — the fan-out collapses into sequential numpy adds);
  * fold stage = applyInPandas over pmod(gatherer, P): element-wise int64
    sums of the per-bucket partials (exact — no float anywhere);
  * the layer-1 grid mean floor((2s+d)/(2d)) runs as a JVM array
    transform, bit-identical to Tier A's column expression;
  * the (vid, pos) output explode happens ONCE at the end, only to match
    the gate's row contract.

Integer arithmetic end-to-end => Tier A and Tier B agree exactly
(pytest-pinned, tests/test_csr_sage.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame
from neo4j_graph_algorithms_spark.operators.kcore import _both_directions
from neo4j_graph_algorithms_spark.pipeline.sage import MICRO


def _gather_kernel(edges_pdf: pd.DataFrame, feats_pdf: pd.DataFrame) -> pd.DataFrame:
    """(gatherer, sums int64[d], cnt) partial feature sums for one bucket."""
    empty = pd.DataFrame(
        {
            "gatherer": pd.Series(dtype="int64"),
            "sums": pd.Series(dtype="object"),
            "cnt": pd.Series(dtype="int64"),
        }
    )
    if len(edges_pdf) == 0 or len(feats_pdf) == 0:
        return empty
    merged = edges_pdf.merge(
        feats_pdf[[VID, "m"]], left_on="nbr", right_on=VID, how="inner", copy=False
    )
    if len(merged) == 0:
        return empty
    mat = np.stack(merged["m"].to_numpy()).astype(np.int64, copy=False)
    gat = merged["gatherer"].to_numpy()
    order = np.argsort(gat, kind="stable")
    gat, mat = gat[order], mat[order]
    uniq, starts, counts = np.unique(gat, return_index=True, return_counts=True)
    sums = np.add.reduceat(mat, starts, axis=0)
    return pd.DataFrame(
        {"gatherer": uniq, "sums": [r.tolist() for r in sums], "cnt": counts.astype(np.int64)}
    )


def _fold_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Element-wise int64 fold of per-bucket partials -> one row per vid."""
    if len(pdf) == 0:
        return pd.DataFrame(
            {
                VID: pd.Series(dtype="int64"),
                "sums": pd.Series(dtype="object"),
                "cnt": pd.Series(dtype="int64"),
            }
        )
    mat = np.stack(pdf["sums"].to_numpy()).astype(np.int64, copy=False)
    gat = pdf["gatherer"].to_numpy()
    cnt = pdf["cnt"].to_numpy()
    order = np.argsort(gat, kind="stable")
    gat, mat, cnt = gat[order], mat[order], cnt[order]
    uniq, starts = np.unique(gat, return_index=True)
    sums = np.add.reduceat(mat, starts, axis=0)
    cnts = np.add.reduceat(cnt, starts)
    return pd.DataFrame({VID: uniq, "sums": [r.tolist() for r in sums], "cnt": cnts.astype(np.int64)})


def sage_aggregate_csr(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    embs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_buckets: int | None = None,
) -> DataFrame:
    """Tier B twin of pipeline.sage.sage_aggregate —
    [vid, pos, sum1, d1, sum2, d2], bit-identical output."""
    P = num_buckets or spark.sparkContext.defaultParallelism
    gather = (
        _both_directions(edges)
        .select(F.col(SRC).alias("gatherer"), F.col(DST).alias("nbr"))
        .withColumn("pkey", F.pmod(F.col("nbr"), F.lit(P)))
        .repartition(P, "pkey")
        .persist()
    )
    gather.count()
    gather_grouped = gather.groupby("pkey")

    def layer(feats: DataFrame) -> DataFrame:
        """feats [vid, m array<long>] -> [vid, sums array<long>, cnt]."""
        fb = feats.withColumn("pkey", F.pmod(F.col(VID), F.lit(P)))
        partial = gather_grouped.cogroup(fb.groupby("pkey")).applyInPandas(
            lambda e, s: _gather_kernel(e, s),
            schema="gatherer long, sums array<long>, cnt long",
        )
        return (
            partial.withColumn("pkey", F.pmod(F.col("gatherer"), F.lit(P)))
            .groupby("pkey")
            .applyInPandas(
                lambda pdf: _fold_kernel(pdf),
                schema=f"{VID} long, sums array<long>, cnt long",
            )
        )

    feats1 = embs.select(
        F.col(id_col).alias(VID),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * MICRO + F.lit(0.5)).cast("long"),
        ).alias("m"),
    )
    l1 = layer(feats1).persist()
    l1.count()
    # grid mean as a JVM array transform — identical doubles to Tier A
    mean1 = l1.select(
        VID,
        F.transform(
            F.col("sums"),
            lambda s: F.floor((2 * s + F.col("cnt")) / (2 * F.col("cnt"))).cast(
                "long"
            ),
        ).alias("m"),
    )
    l2 = layer(mean1)
    joined = l1.join(
        l2.select(VID, F.col("sums").alias("sums2"), F.col("cnt").alias("d2")),
        on=VID,
        how="left",
    ).withColumn(
        "sums2",
        F.coalesce(
            F.col("sums2"),
            F.expr("array_repeat(CAST(NULL AS BIGINT), size(sums))"),
        ),
    )
    out = joined.select(
        VID,
        F.col("cnt").alias("d1"),
        "d2",
        F.posexplode(F.arrays_zip("sums", "sums2")).alias("pos", "z"),
    ).select(
        VID,
        "pos",
        F.col("z.sums").alias("sum1"),
        "d1",
        F.col("z.sums2").alias("sum2"),
        "d2",
    )
    gather.unpersist()
    l1.unpersist()
    return out
