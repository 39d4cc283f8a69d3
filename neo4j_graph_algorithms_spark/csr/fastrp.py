"""Tier B FastRP: cogrouped numpy kernels for the d-wide neighbor sums.

Same semantics (and BIT-identical output) as operators/fastrp.py — the
integer-scaled state contract makes that checkable exactly:

  * the O(|E|·d) work per iteration — join state onto the out-edges and
    pre-sum d int64 components per destination — runs as a pandas merge +
    numpy column sums INSIDE each source bucket (cogroup/applyInPandas,
    the csr/pagerank.py shape); the shuffle then moves only (dst,
    partial-sum) rows, so the map-side combine runs where the CPU work is
    and scales with cores;
  * integer partial sums are associative, so bucket-local pre-aggregation
    followed by the JVM's final groupBy-sum reproduces Tier A's single
    groupBy EXACTLY (this is why the state is ×10^6 int64 — see the Tier A
    module docstring);
  * the O(|V|·d) per-row float chain (mean, 1/√ renormalize, iteration
    weights) REUSES Tier A's Catalyst expressions (_half_away,
    _normalize_int), so the per-row IEEE arithmetic is the identical
    codegen on identical integer inputs.

Reference parity: the reference's paged-CSR adjacency + per-partition
compute step (core/huge/HugeGraphImpl.java:37-78) is the design this
mirrors; FastRP itself is beyond its catalogue (gds.fastRP analogue).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame
from neo4j_graph_algorithms_spark.operators.fastrp import (
    A_D,
    A_S,
    A_V,
    FASTRP_P,
    SCALE,
    _half_away,
    _normalize_int,
)


def _sum_kernel(dim: int):
    """Per-bucket kernel: exact int64 partial sums of the d state
    components per destination, plus the contributing-neighbor count."""
    vcols = [f"v{i}" for i in range(dim)]

    def empty() -> pd.DataFrame:
        return pd.DataFrame(
            {VID: pd.Series(dtype="int64")}
            | {c: pd.Series(dtype="int64") for c in vcols}
            | {"_n": pd.Series(dtype="int64")}
        )

    def kernel(edges_pdf: pd.DataFrame, state_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(edges_pdf) == 0 or len(state_pdf) == 0:
            return empty()
        merged = edges_pdf.merge(
            state_pdf[[VID] + vcols],
            left_on=SRC,
            right_on=VID,
            how="inner",
            copy=False,
        )
        if len(merged) == 0:
            return empty()
        merged["_n"] = np.int64(1)
        out = (
            merged[[DST] + vcols + ["_n"]]
            .groupby(DST, sort=False, as_index=False)
            .sum()
        )
        return out.rename(columns={DST: VID})

    return kernel


def fastrp_csr(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    dim: int = 8,
    iteration_weights: tuple[float, ...] = (1.0, 1.0),
    seed: int = 42,
    num_buckets: int | None = None,
) -> DataFrame:
    """Tier B twin of operators.fastrp.fastrp — identical output schema
    [vid, embedding array<double>, embedding_q6 array<long>] and identical
    values (exact integer state; equivalence pinned by pytest)."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    P = num_buckets or spark.sparkContext.defaultParallelism
    und = ef.canonical().df.select(SRC, DST)
    adj = (
        und.unionByName(und.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))
        .select(SRC, DST, F.pmod(F.col(SRC), F.lit(P)).alias("pkey"))
        .repartition(P, "pkey")
        .persist()
    )
    adj.count()
    adj_grouped = adj.groupby("pkey")

    # x0: identical staged hash/sign/normalize expressions as Tier A
    signs = []
    for d in range(dim):
        h = F.pmod(
            F.pmod(F.col(VID), F.lit(FASTRP_P)) * A_V
            + F.lit(d) * A_D
            + F.lit(seed) * A_S,
            F.lit(FASTRP_P),
        ) % 6
        signs.append(
            F.when(h == 0, F.lit(-1)).when(h == 5, F.lit(1)).otherwise(F.lit(0))
        )
    staged = ef.vertices().select(
        VID, *[s.alias(f"_g{d}") for d, s in enumerate(signs)]
    )
    staged = staged.select(
        VID,
        *[f"_g{d}" for d in range(dim)],
        sum(F.col(f"_g{d}") * F.col(f"_g{d}") for d in range(dim)).alias("_nnz"),
    )
    unit = _half_away(
        F.lit(float(SCALE))
        / F.sqrt(F.greatest(F.col("_nnz"), F.lit(1)).cast("double"))
    )
    # flat v0..v{d-1} long columns: the Arrow-friendly kernel layout
    x = staged.select(
        VID,
        *[(F.col(f"_g{d}") * unit).cast("long").alias(f"v{d}") for d in range(dim)],
    ).localCheckpoint(eager=True)

    vcols = [f"v{i}" for i in range(dim)]
    kernel_schema = (
        f"{VID} long, " + ", ".join(f"{c} long" for c in vcols) + ", _n long"
    )
    kernel = _sum_kernel(dim)

    emb = None
    for w in iteration_weights:
        st = x.withColumn("pkey", F.pmod(F.col(VID), F.lit(P)))
        partial = adj_grouped.cogroup(st.groupby("pkey")).applyInPandas(
            kernel, schema=kernel_schema
        )
        agg = partial.groupBy(VID).agg(
            *[F.sum(c).alias(f"_s{i}") for i, c in enumerate(vcols)],
            F.sum("_n").alias("_n"),
        )
        mean = agg.select(
            VID,
            F.array(*[
                _half_away(F.col(f"_s{i}").cast("double") / F.col("_n"))
                for i in range(dim)
            ]).alias("vec"),
        )
        xa = (
            x.select(VID)
            .join(mean.hint("shuffle_hash"), on=VID, how="left")
            .select(
                VID,
                F.coalesce(
                    F.col("vec"), F.array(*[F.lit(0).cast("long")] * dim)
                ).alias("vec"),
            )
        )
        xa = _normalize_int(xa, dim).localCheckpoint(eager=True)
        x = xa.select(
            VID, *[F.col("vec")[i].alias(f"v{i}") for i in range(dim)]
        )
        contrib = F.array(*[
            _half_away(F.col("vec")[i].cast("double") * float(w)) for i in range(dim)
        ])
        step = xa.select(VID, contrib.alias("_c"))
        if emb is None:
            emb = step.select(VID, F.col("_c").alias("emb"))
        else:
            emb = (
                emb.join(step, on=VID)
                .select(
                    VID,
                    F.array(*[
                        (F.col("emb")[i] + F.col("_c")[i]) for i in range(dim)
                    ]).alias("emb"),
                )
                .localCheckpoint(eager=True)
            )
    adj.unpersist()
    return emb.select(
        VID,
        F.array(*[
            (F.col("emb")[i].cast("double") / SCALE) for i in range(dim)
        ]).alias("embedding"),
        F.col("emb").alias("embedding_q6"),
    )
