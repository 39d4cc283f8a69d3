"""Who-to-Follow: personalized-SALSA recommendation around a seed set.

The production link-graph recommender (Gupta, Goel, Lin, Sharma, Wang,
Zadeh, "WTF: The Who to Follow Service at Twitter", WWW 2013): compute a
personalized-PageRank "circle of trust" around the seed users, induce the
bipartite subgraph whose hub side is the circle, run SALSA on it, and
recommend the top authorities the seeds do not already sit next to.  The
reference catalogue stops at global scores (PageRank/HITS-family — e.g.
/root/reference/algo/src/main/java/org/neo4j/graphalgo/PageRankProc.java:1);
this composes the repo's existing PPR and SALSA supersteps into the
recommendation query those scores exist to serve.

Determinism contract (cross-engine, same discipline as operators/sweep.py):
PPR scores are quantized to the 1e-6 grid before ranking, circle = top-C
by (score desc, vid asc); SALSA runs a fixed iteration count; the
recommendation list is ranked on the 1e-6-quantized authority score with
vid tie-break.  Every step reuses gated machinery (pagerank_personalized,
salsa_10iter), so the composed oracle replays bit-identical arithmetic.

Scale shape: the PPR and SALSA supersteps are the gated implementations
(delta-push / folded inverse degrees, shuffle_hash-hinted state
projections); circle selection is one distributed TakeOrderedAndProject
(top-C, C ~ 10^2-10^3 — never a global sort); the subgraph induction is a
semi-join against the circle projection.  At web scale the induced
bipartite graph is circle-out-degree-bounded — the whole SALSA stage
touches O(C * avg_outdeg) edges regardless of |E|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame
from neo4j_graph_algorithms_spark.operators.pagerank import pagerank
from neo4j_graph_algorithms_spark.operators.salsa import AUTH, salsa, salsa_scores


def who_to_follow(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    source_vids: DataFrame,
    circle_size: int = 100,
    n_recs: int = 50,
    ppr_iterations: int = 20,
    damping: float = 0.85,
    salsa_iterations: int = 10,
) -> DataFrame:
    """[rank, vid, auth] — top-`n_recs` recommended vertices.

    Candidates are authorities of the circle-induced subgraph that are NOT
    circle members themselves (the circle approximates "already followed /
    trusted"; WTF's production filter).  auth is the 1e-6-quantized SALSA
    authority score; rank breaks ties by vid asc.
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    ppr = pagerank(
        spark,
        ef,
        max_iterations=ppr_iterations,
        damping_factor=damping,
        source_vids=source_vids,
    )
    scores = ppr.state.select(VID, F.round("rank", 6).alias("_r6")).filter(
        F.col("_r6") > 0
    )
    # top-C: TakeOrderedAndProject (bounded heap per partition), not a sort
    circle = (
        scores.orderBy(F.desc("_r6"), F.asc(VID)).limit(circle_size).select(VID)
    )
    induced = ef.df.select(SRC, DST).join(
        circle.withColumnRenamed(VID, SRC).hint("shuffle_hash"),
        on=SRC,
        how="left_semi",
    )
    res = salsa(spark, induced, max_iterations=salsa_iterations)
    recs = (
        salsa_scores(res)
        .select(VID, F.round(AUTH, 6).alias("auth"))
        .filter(F.col("auth") > 0)
        .join(circle.hint("shuffle_hash"), on=VID, how="left_anti")
        .orderBy(F.desc("auth"), F.asc(VID))
        .limit(n_recs)
    )
    w = Window.orderBy(F.desc("auth"), F.asc(VID))
    return recs.withColumn("rank", F.row_number().over(w)).select(
        "rank", VID, "auth"
    )
