"""Tier B WCC: per-partition CSR label propagation with local collapse.

Same output contract as operators/wcc.py (comp = min member id); the
physical plan mirrors the reference's parallel union-find family
(impl/ParallelUnionFindQueue.java:70-97 — per-chunk DSS built locally in
parallel, merged globally):

  * edges bucketed by pmod(src, P) and persisted once;
  * each superstep, a cogrouped pandas kernel runs a LOCAL min-label
    collapse inside every bucket (numpy/pandas C loops: map src→comp,
    take per-dst minima, then path-compress the bucket's mapping to its
    fixpoint) and emits only the CHANGED (vid, comp) proposals;
  * the JVM merges proposals with a per-vid min and a pointer-jump, both
    hash aggregations.

The local collapse does in one Python pass what Tier A needs several
shuffled supersteps for, so convergence takes fewer global rounds —
the 'local union-find then global fixpoint' strategy from SURVEY §2.4.
"""

from __future__ import annotations

import warnings

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame

COMP = "comp"


_EMPTY = {VID: pd.Series(dtype="int64"), COMP: pd.Series(dtype="int64")}


def _local_collapse(edges_pdf: pd.DataFrame, state_pdf: pd.DataFrame) -> pd.DataFrame:
    """Bucket-local min-label fixpoint; emits improved (vid, comp) rows.

    Fully vectorized (pandas C kernels, no per-row Python): each sweep maps
    endpoint→comp with Series.map, takes per-endpoint groupby minima of the
    opposite side, and merges — a local Shiloach-Vishkin pass."""
    if len(edges_pdf) == 0 or len(state_pdf) == 0:
        return pd.DataFrame(_EMPTY)
    # comp map over every vertex touched by this bucket (defensively deduped)
    touched = pd.Index(
        pd.unique(
            pd.concat(
                [edges_pdf[SRC], edges_pdf[DST], state_pdf[VID]], ignore_index=True
            )
        )
    )
    state_u = state_pdf.groupby(VID, as_index=False)[COMP].min()
    comp = pd.Series(state_u[COMP].to_numpy(), index=state_u[VID].to_numpy())
    missing = touched.difference(comp.index)
    if len(missing):
        comp = pd.concat([comp, pd.Series(missing.to_numpy(), index=missing)])

    src = edges_pdf[SRC]
    dst = edges_pdf[DST]
    for _ in range(8):
        cs = src.map(comp).to_numpy()
        cd = dst.map(comp).to_numpy()
        # candidate minima flowing both ways along each edge
        flow = pd.DataFrame(
            {
                "v": pd.concat([dst, src], ignore_index=True),
                "c": pd.concat(
                    [pd.Series(cs), pd.Series(cd)], ignore_index=True
                ),
            }
        )
        mins = flow.groupby("v", sort=False)["c"].min()
        cur = mins.index.map(comp)
        improved = mins[mins.to_numpy() < cur.to_numpy()]
        if len(improved) == 0:
            break
        improved.index.name = None
        # NOTE: Series.loc/update misalign on this pd.unique-built index
        # (observed dropping labels); combine_first aligns correctly
        comp = improved.combine_first(comp).astype("int64")
    changed = comp[comp.to_numpy() != comp.index.to_numpy()]
    # only report rows that differ from the incoming state (or new minima)
    out = pd.DataFrame({VID: changed.index.to_numpy(), COMP: changed.to_numpy()})
    return out if len(out) else pd.DataFrame(_EMPTY)


def wcc_csr(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    vertices: DataFrame | None = None,
    num_buckets: int | None = None,
    max_rounds: int = 50,
) -> DataFrame:
    """[vid, comp] — Tier B twin of operators.wcc (identical output)."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    P = num_buckets or spark.sparkContext.defaultParallelism
    und = (
        ef.as_undirected()
        .df.select(SRC, DST)
        .distinct()
        .withColumn("pkey", F.pmod(F.col(SRC), F.lit(P)))
        .repartition(P, "pkey")
    )
    und.persist()
    und.count()
    grouped_edges = und.groupby("pkey")

    verts = vertices.select(VID) if vertices is not None else ef.vertices()
    state = verts.select(VID, F.col(VID).alias(COMP)).localCheckpoint(eager=True)

    # Convergence via the monotone checksum (labels only DECREASE, so Σcomp
    # strictly decreases until the fixpoint) — one aggregate per round
    # instead of a state self-join (same trick as operators/wcc.py).
    prev_sum: int | None = None
    converged = False
    for _ in range(max_rounds):
        st = state.withColumn("pkey", F.pmod(F.col(VID), F.lit(P)))
        proposals = grouped_edges.cogroup(st.groupby("pkey")).applyInPandas(
            lambda e, s: _local_collapse(e, s), schema=f"{VID} long, {COMP} long"
        )
        # NOTE: a vertex can appear in many buckets (as dst); take the min
        merged = (
            state.unionByName(proposals)
            .groupBy(VID)
            .agg(F.min(COMP).alias(COMP))
        )
        # pointer jump (comp values are vids): comp'(v) = comp(comp(v)).
        # shuffle_hash: the mapping is |V|-sized — keep the plan
        # stats-independent, same convention as operators/wcc.py
        mapping = merged.select(F.col(VID).alias("_m"), F.col(COMP).alias("_mc")).hint(
            "shuffle_hash"
        )
        jumped = (
            merged.join(mapping, merged[COMP] == F.col("_m"), "left")
            .select(VID, F.coalesce("_mc", COMP).alias(COMP))
            .localCheckpoint(eager=True)
        )
        state = jumped
        row = state.agg(F.sum(F.col(COMP).cast("decimal(38,0)")).alias("s")).collect()[0]
        s = int(row["s"] or 0)
        if prev_sum is not None and s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:
        warnings.warn(
            f"wcc_csr: hit max_rounds={max_rounds} without converging; "
            "component labels may be non-final",
            RuntimeWarning,
        )
    und.unpersist()
    return state
