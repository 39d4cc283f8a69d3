"""PPR sweep cut — local community detection around a seed set.

The canonical local-clustering recipe (Andersen, Chung & Lang, FOCS 2006:
personalized-PageRank vector, vertices ordered by degree-normalized score,
sweep over prefixes, keep the minimum-conductance prefix).  The reference
has no community-quality procedures at all; this completes the repo's
community family (louvain / sllpa / conductance) with the provable LOCAL
method — the one that runs around one seed without touching the far graph.

Contract (deterministic, cross-engine):
  * PPR = the repo's delta-push personalized PageRank, fixed iterations;
    scores quantized to the 1e-6 grid BEFORE the degree normalization, so
    both engines order the identical doubles (tie-break: vid asc);
  * sweep universe = top_k degree-normalized vertices (documented cap —
    local clustering never needs the global tail; the curve is what the
    caller inspects);
  * conductance phi(S_k) = cut(S_k) / min(vol(S_k), vol(G) - vol(S_k)) on
    the UNDIRECTED SIMPLE graph (unweighted), 6dp; NULL when the minimum
    volume is 0 (the degenerate all-of-G prefix has no conductance — a 0.0
    there would always win an argmin and mask the real community).

Scale shape: the heavy work is the PPR superstep (shared machinery) and
ONE distributed TakeOrderedAndProject for the top_k candidates; the sweep
itself is the histogram-difference trick — each undirected edge becomes a
(+1 at min-position, -1 at max-position) event, so cut(S_k) for EVERY k is
one prefix sum over <= top_k rows.  No per-prefix recount, no |V|-sized
window: everything after the top-k take runs on a curve-sized frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame
from neo4j_graph_algorithms_spark.operators.pagerank import pagerank


def ppr_sweep(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    source_vids: DataFrame,
    max_iterations: int = 20,
    damping: float = 0.85,
    top_k: int = 100,
) -> DataFrame:
    """[k, vid, cut, vol, phi] — the sweep curve over the top_k
    degree-normalized PPR prefix; row k is the set of the first k vertices."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    res = pagerank(
        spark,
        ef,
        max_iterations=max_iterations,
        damping_factor=damping,
        source_vids=source_vids,
    )
    scores = res.state.select(VID, F.round("rank", 6).alias("_r6")).filter(
        F.col("_r6") > 0
    )

    und = ef.canonical().df.select(SRC, DST).filter(F.col(SRC) != F.col(DST))
    deg = (
        und.select(F.col(SRC).alias(VID))
        .unionByName(und.select(F.col(DST).alias(VID)))
        .groupBy(VID)
        .agg(F.count("*").alias("_deg"))
    )
    vol_all = deg.agg(F.sum("_deg").alias("_vol_all"))

    cand = scores.join(deg.hint("shuffle_hash"), on=VID).select(
        VID, "_deg", (F.col("_r6") / F.col("_deg")).alias("_ratio")
    )
    # distributed top-k take, THEN a curve-sized window for positions
    top = cand.orderBy(F.col("_ratio").desc(), F.col(VID)).limit(top_k)
    pos = top.select(
        VID,
        "_deg",
        F.row_number()
        .over(Window.orderBy(F.col("_ratio").desc(), F.col(VID)))
        .alias("k"),
    ).localCheckpoint(eager=True)

    p_src = pos.select(F.col(VID).alias(SRC), F.col("k").alias("_ks"))
    p_dst = pos.select(F.col(VID).alias(DST), F.col("k").alias("_kd"))
    ev = (
        und.join(F.broadcast(p_src), on=SRC, how="left")
        .join(F.broadcast(p_dst), on=DST, how="left")
        .filter(F.col("_ks").isNotNull() | F.col("_kd").isNotNull())
        .select(
            F.least(
                F.coalesce(F.col("_ks"), F.lit(1 << 31)),
                F.coalesce(F.col("_kd"), F.lit(1 << 31)),
            ).alias("_kmin"),
            F.when(
                F.col("_ks").isNotNull() & F.col("_kd").isNotNull(),
                F.greatest(F.col("_ks"), F.col("_kd")),
            ).alias("_kmax"),
        )
    )
    diff = (
        ev.select(F.col("_kmin").alias("k"), F.lit(1).alias("_v"))
        .unionByName(
            ev.filter(F.col("_kmax").isNotNull()).select(
                F.col("_kmax").alias("k"), F.lit(-1).alias("_v")
            )
        )
        .groupBy("k")
        .agg(F.sum("_v").alias("_dv"))
    )

    wk = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        pos.join(diff, on="k", how="left")
        .select(VID, "k", "_deg", F.coalesce(F.col("_dv"), F.lit(0)).alias("_dv"))
        .select(
            "k",
            VID,
            F.sum("_dv").over(wk).alias("cut"),
            F.sum("_deg").over(wk).alias("vol"),
        )
        .crossJoin(F.broadcast(vol_all))
    )
    mn = F.least(F.col("vol"), F.col("_vol_all") - F.col("vol"))
    return curve.select(
        "k",
        VID,
        F.col("cut").cast("long").alias("cut"),
        F.col("vol").cast("long").alias("vol"),
        F.round(F.when(mn > 0, F.col("cut").cast("double") / mn), 6).alias("phi"),
    )
