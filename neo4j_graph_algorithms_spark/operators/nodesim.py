"""Neighborhood similarity + link prediction (beyond the reference catalogue).

The reference repo stops at metapaths for node-pair analytics; its successor
(Neo4j GDS) ships `gds.nodeSimilarity` (neighborhood Jaccard/overlap) and the
link-prediction functions (`gds.alpha.linkprediction.adamicAdar`,
`commonNeighbors`) on the same undirected-neighborhood semantics the triangle
operator here already reproduces (impl/TriangleCount.java:40-206's
Direction.BOTH simple graph).  Both are core link-graph queries a user of the
reference ecosystem runs today, so they are first-class gated operators.

Scale story (the part that matters at 10^12 edges):
  * candidate pairs are generated ONLY through shared neighbors (a wedge
    join) — never an all-pairs cross;
  * each wedge center n fans out deg(n)^2 pairs, so hub centers dominate
    cost quadratically.  `max_center_degree` drops hub centers (the GDS
    `degreeCutoff`/top-k bound analogue); dropped-center counts are WARNED,
    never silent.  Centers are where skew lives: after the cap, AQE's
    skew-join split handles residual imbalance;
  * the |V|-sized degree table joins carry `shuffle_hash` hints on degree
    PROJECTIONS (repo convention: never let Catalyst broadcast a
    vertex-state-sized frame — the build is a serial driver-side section);
  * `top_k` ranks within each node's candidates (bounded window, key =
    node), matching gds.nodeSimilarity's topK.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame

# Default wedge-center degree cap (gds.nodeSimilarity degreeCutoff
# analogue).  A hub center fans out deg² candidate pairs, so the DEFAULT
# must be finite at 100 TB; pass max_center_degree=None to opt out.
DEFAULT_MAX_CENTER_DEGREE = 10_000


def _neighborhoods(edges: EdgeFrame | DataFrame) -> DataFrame:
    """Distinct undirected [vid, nbr] adjacency (Direction.BOTH, simple)."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    und = ef.canonical().df.select(SRC, DST)
    return (
        und.select(F.col(SRC).alias(VID), F.col(DST).alias("nbr"))
        .unionByName(und.select(F.col(DST).alias(VID), F.col(SRC).alias("nbr")))
    )


def _common_neighbor_pairs(
    nbrs: DataFrame, max_center_degree: int | None
) -> DataFrame:
    """[a, b, common] for a<b sharing >=1 neighbor; wedge centers above
    `max_center_degree` are excluded (warned)."""
    deg = nbrs.groupBy("nbr").agg(F.count("*").alias("center_deg"))
    if max_center_degree is not None:
        # head(1) existence probe (not a full count): the clean no-hub path
        # pays one early-terminating job, not a second full aggregation
        if deg.filter(F.col("center_deg") > max_center_degree).head(1):
            warnings.warn(
                "node_similarity: hub wedge centers with degree > "
                f"{max_center_degree} excluded from candidate generation; "
                "pairs connected ONLY through those hubs are not scored",
                RuntimeWarning,
                stacklevel=3,
            )
        keep = deg.filter(F.col("center_deg") <= max_center_degree).select("nbr")
        nbrs = nbrs.join(keep.hint("shuffle_hash"), on="nbr", how="left_semi")
    a = nbrs.select(F.col("nbr").alias("c"), F.col(VID).alias("a"))
    b = nbrs.select(F.col("nbr").alias("c"), F.col(VID).alias("b"))
    return (
        a.join(b, on="c")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )


def node_similarity(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    metric: str = "jaccard",
    top_k: int | None = 10,
    similarity_cutoff: float = 1e-9,
    max_center_degree: int | None = DEFAULT_MAX_CENTER_DEGREE,
) -> DataFrame:
    """[a, b, common, sim] neighborhood similarity for canonical pairs a<b.

    metric='jaccard': |N(a)∩N(b)| / |N(a)∪N(b)|  (gds.nodeSimilarity default)
    metric='overlap': |N(a)∩N(b)| / min(|N(a)|, |N(b)|)

    `top_k` keeps the k best pairs per LEFT node a (ranked sim desc, b asc —
    deterministic), mirroring gds.nodeSimilarity topK.  `sim` rounded to 6dp
    (repo float policy).

    `max_center_degree` defaults FINITE (10^4, the GDS degreeCutoff
    analogue): a single unbounded celebrity hub fans out deg² = 10^12
    candidate pairs at web scale, so unbounded generation must be an
    explicit `max_center_degree=None` opt-out, never the default.
    """
    if metric not in ("jaccard", "overlap"):
        raise ValueError(f"unknown metric {metric!r}")
    nbrs = _neighborhoods(edges).persist()
    pairs = _common_neighbor_pairs(nbrs, max_center_degree)
    deg = nbrs.groupBy(VID).agg(F.count("*").alias("deg"))
    pairs = (
        pairs.join(
            deg.select(F.col(VID).alias("a"), F.col("deg").alias("da")).hint(
                "shuffle_hash"
            ),
            on="a",
        )
        .join(
            deg.select(F.col(VID).alias("b"), F.col("deg").alias("db")).hint(
                "shuffle_hash"
            ),
            on="b",
        )
    )
    if metric == "jaccard":
        sim = F.col("common") / (F.col("da") + F.col("db") - F.col("common"))
    else:
        sim = F.col("common") / F.least("da", "db")
    out = pairs.select(
        "a", "b", "common", F.round(sim, 6).alias("sim")
    ).filter(F.col("sim") >= similarity_cutoff)
    if top_k is not None:
        w = Window.partitionBy("a").orderBy(F.desc("sim"), F.asc("b"))
        out = (
            out.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= top_k)
            .drop("rk")
        )
    out = out.localCheckpoint(eager=True)
    nbrs.unpersist()
    return out


def adamic_adar(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    top_k: int | None = None,
    max_center_degree: int | None = DEFAULT_MAX_CENTER_DEGREE,
    existing_links: bool = True,
) -> DataFrame:
    """[a, b, common, score] Adamic-Adar link-prediction scores for a<b:
    score = Σ_{n ∈ N(a)∩N(b)} 1/ln(deg(n))  (degree-1 centers contribute 0
    by convention — ln(1)=0 would divide by zero; such centers cannot close
    a wedge anyway).  `existing_links=False` drops pairs already joined by
    an edge (the usual link-prediction framing: score only NEW candidates).

    `max_center_degree` defaults finite (see node_similarity) — explicit
    None to go unbounded.
    """
    nbrs = _neighborhoods(edges).persist()
    deg = nbrs.groupBy("nbr").agg(F.count("*").alias("center_deg"))
    centers = nbrs.join(deg.hint("shuffle_hash"), on="nbr")
    if max_center_degree is not None:
        if deg.filter(F.col("center_deg") > max_center_degree).head(1):
            warnings.warn(
                "adamic_adar: hub wedge centers with degree > "
                f"{max_center_degree} excluded",
                RuntimeWarning,
                stacklevel=2,
            )
        centers = centers.filter(F.col("center_deg") <= max_center_degree)
    a = centers.select(
        F.col("nbr").alias("c"), F.col(VID).alias("a"), F.col("center_deg")
    )
    b = centers.select(F.col("nbr").alias("c"), F.col(VID).alias("b"))
    scored = (
        a.join(b, on="c")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("common"),
            F.sum(
                F.when(F.col("center_deg") > 1, F.lit(1.0) / F.log("center_deg"))
                .otherwise(F.lit(0.0))
            ).alias("score"),
        )
        .select("a", "b", "common", F.round("score", 6).alias("score"))
    )
    if not existing_links:
        und = (edges.df if isinstance(edges, EdgeFrame) else edges).select(
            F.least(SRC, DST).alias("a"), F.greatest(SRC, DST).alias("b")
        ).distinct()
        scored = scored.join(und, on=["a", "b"], how="left_anti")
    if top_k is not None:
        w = Window.partitionBy("a").orderBy(F.desc("score"), F.asc("b"))
        scored = (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= top_k)
            .drop("rk")
        )
    out = scored.localCheckpoint(eager=True)
    nbrs.unpersist()
    return out
