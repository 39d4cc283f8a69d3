"""Speaker-Listener Label Propagation (SLPA / gds.sllpa) — OVERLAPPING
community detection (Xie, Szymanski, Liu, arXiv:1109.5720).

Complements operators/lpa.py (disjoint labels): every vertex keeps a
MEMORY of labels; each round every neighbor speaks one label drawn from
its memory proportionally to the label's count, the listener adopts the
most frequent label heard and adds it to memory; after T rounds a vertex
belongs to every community whose label fills at least `threshold` of its
memory — so vertices can belong to several communities.

Determinism (the engine contract, same as walks.py): the "random" speaker
draw is hash(speaker, listener, round, seed) mod total-count over labels
ordered ascending — pure integer arithmetic over integer counts, so the
DuckDB oracle, a rerun, or a resumed job reproduces the identical
memberships.  Listener ties break toward the smallest label.

Scale shape per round: one hash join of the (src-partitioned, cached)
interaction table against the memory projection (hinted — memory is
|V·t|-sized, never broadcast), one cumulative-count window bounded by a
speaker's memory (<= t+1 rows), one listener argmax window bounded by
in-degree, one map-side-combined memory merge.  Memory is bounded by
(T+1)·|V| rows total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame
from neo4j_graph_algorithms_spark.operators.walks import (
    A_CUR,
    A_SEED,
    A_STEP,
    A_WALK,
    WALK_P,
)


def sllpa(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    iterations: int = 4,
    threshold: float = 0.3,
    seed: int = 42,
) -> DataFrame:
    """[vid, label] — overlapping community memberships: every label whose
    count fills >= `threshold` of the vertex's memory after `iterations`
    propagation rounds (memory size = iterations + 1, counting the initial
    self-label).  Divergence from straight paper semantics, matching
    gds.sllpa: a vertex with NO label reaching the threshold (isolated
    vertices keep the single self-label with count 1 <
    threshold*(iterations+1); a connected vertex's memory can be fully
    fragmented) falls back to a SELF-LABEL membership instead of vanishing
    from the output, so every vertex belongs to at least one community.
    The DuckDB twin (oracles.sllpa_sql) encodes the same convention.
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    und = ef.canonical().df.select(SRC, DST)
    inter = (
        und.unionByName(und.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))
        .distinct()
        .select(F.col(SRC).alias("s"), F.col(DST).alias("l"))
        .repartition("s")
        .persist()
    )
    inter.count()

    # memory: [vid, label, cnt]
    mem = ef.vertices().select(
        VID, F.col(VID).alias("label"), F.lit(1).alias("cnt")
    ).localCheckpoint(eager=True)

    for t in range(1, iterations + 1):
        spoken = inter.join(
            mem.select(F.col(VID).alias("s"), "label", "cnt").hint("shuffle_hash"),
            on="s",
        )
        w = Window.partitionBy("s", "l").orderBy("label")
        h = F.pmod(
            F.pmod(F.col("s"), F.lit(WALK_P)) * A_CUR
            + F.pmod(F.col("l"), F.lit(WALK_P)) * A_WALK
            + F.lit(t) * A_STEP
            + F.lit(seed) * A_SEED,
            F.lit(WALK_P),
        )
        picked = (
            spoken.select(
                "s", "l", "label", "cnt",
                F.sum("cnt").over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ).alias("cum"),
                F.sum("cnt").over(Window.partitionBy("s", "l")).alias("tot"),
            )
            .withColumn("_r", h % F.col("tot"))
            .filter((F.col("_r") >= F.col("cum") - F.col("cnt")) & (F.col("_r") < F.col("cum")))
            .select("l", "label")
        )
        # listener adopts the most frequent heard label (ties -> smallest)
        heard = picked.groupBy("l", "label").agg(F.count("*").alias("n"))
        wl = Window.partitionBy("l").orderBy(F.desc("n"), F.asc("label"))
        adopted = (
            heard.withColumn("_rn", F.row_number().over(wl))
            .filter(F.col("_rn") == 1)
            .select(F.col("l").alias(VID), "label", F.lit(1).alias("cnt"))
        )
        mem = (
            mem.unionByName(adopted)
            .groupBy(VID, "label")
            .agg(F.sum("cnt").alias("cnt"))
            .localCheckpoint(eager=True)
        )

    inter.unpersist()
    min_cnt = threshold * (iterations + 1)
    kept = mem.filter(F.col("cnt") >= min_cnt).select(VID, "label")
    # every vertex keeps >= 1 membership (gds.sllpa convention): union a
    # self-label row for vertices with no label above the threshold.  mem
    # contains every vertex (all start with a self-label), so the anti-join
    # is against vertex state — hinted, never broadcast.
    orphans = (
        mem.select(VID)
        .distinct()
        .join(kept.select(VID).distinct().hint("shuffle_hash"), on=VID, how="left_anti")
        .select(VID, F.col(VID).alias("label"))
    )
    return kept.unionByName(orphans)
