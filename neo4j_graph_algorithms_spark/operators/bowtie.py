"""Bow-tie decomposition of a directed link graph (Broder et al. 2000).

"Graph structure in the Web" (Broder, Kumar, Maghoul, Raghavan,
Rajagopalan, Stata, Tomkins, Wiener — WWW 2000) partitions a web-scale
digraph around its largest strongly connected component: CORE (the giant
SCC), IN (reaches CORE), OUT (reached from CORE), TUBES (IN-to-OUT paths
bypassing CORE), TENDRILS (hanging off IN / into OUT), DISCONNECTED.
It is THE canonical structural census of a crawl/link graph — the
reference catalogue has the SCC building block only
(/root/reference/algo/src/main/java/org/neo4j/graphalgo/StronglyConnectedComponentsProc.java:1);
this composes it into the census.

Derivation from four set-reachability closures (each a frontier BFS —
no pairwise closure anywhere):
    CORE = largest SCC (ties: smallest component id);
    OUT  = Fwd(CORE) \\ CORE;     IN = Bwd(CORE) \\ CORE;
    rest = V \\ (CORE|IN|OUT), split by (v in Fwd(IN)) x (v in Bwd(OUT)):
    both -> tube, from-IN only -> tendril_in, to-OUT only -> tendril_out,
    neither -> disconnected.

Scale shape: SCC is the gated operators/scc.py (trim + pointer-jumped
color + FW/BW intersection); each reachability is a delta-frontier
superstep — only the NEW frontier joins the src-partitioned edge cache
per round, visited vertices never rejoin; membership checks are hash
semi-/anti-joins on `shuffle_hash`-hinted projections (vertex-sized
frames never broadcast).  Rounds = graph diameter, the BFS floor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame
from neo4j_graph_algorithms_spark.operators.scc import scc
from neo4j_graph_algorithms_spark.plans.runtime import SuperstepRunner

CLASS = "bowtie_class"


def reach_set(
    spark: SparkSession,
    edges: DataFrame,
    seeds: DataFrame,
    reverse: bool = False,
    max_iterations: int = 100,
) -> DataFrame:
    """[vid] vertices reachable from `seeds` ([vid]) via >= 0 directed
    edges (seeds included).  `reverse=True` follows edges backwards.
    Delta-frontier BFS on SuperstepRunner."""
    e = edges.select(SRC, DST) if not reverse else edges.select(
        F.col(DST).alias(SRC), F.col(SRC).alias(DST)
    )
    e = e.distinct().repartition(SRC).persist()
    state0 = seeds.select(VID).distinct().withColumn("frontier", F.lit(True))

    def step(state: DataFrame, i: int) -> DataFrame:
        fr = state.filter(F.col("frontier")).select(F.col(VID).alias(SRC))
        nxt = (
            e.join(fr.hint("shuffle_hash"), on=SRC, how="left_semi")
            .select(F.col(DST).alias(VID))
            .distinct()
            .join(state.select(VID).hint("shuffle_hash"), on=VID, how="left_anti")
        )
        return state.select(VID).withColumn("frontier", F.lit(False)).unionByName(
            nxt.withColumn("frontier", F.lit(True))
        )

    runner = SuperstepRunner(
        spark,
        max_iterations=max_iterations,
        metric=lambda new, old, i: float(
            new.filter(F.col("frontier")).count()
        ),
        converged=lambda m: m == 0.0,
        job_group="linkgraph-bowtie-reach",
    )
    result = runner.run(state0, step)
    e.unpersist()
    return result.state.select(VID)


def bowtie_decomposition(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    max_iterations: int = 100,
) -> DataFrame:
    """[vid, bowtie_class] over the vertices of the directed simple graph;
    classes: core | in | out | tube | tendril_in | tendril_out |
    disconnected."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    e = ef.df.select(SRC, DST).distinct().persist()
    verts = (
        e.select(F.col(SRC).alias(VID))
        .unionByName(e.select(F.col(DST).alias(VID)))
        .distinct()
        .persist()
    )
    comp = scc(spark, e).persist()
    top = (
        comp.groupBy("comp")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("comp"))
        .limit(1)
        .first()
    )
    core = comp.filter(F.col("comp") == top["comp"]).select(VID).localCheckpoint(
        eager=True
    )
    fwd = reach_set(spark, e, core, reverse=False, max_iterations=max_iterations)
    bwd = reach_set(spark, e, core, reverse=True, max_iterations=max_iterations)
    out_ = fwd.join(core.hint("shuffle_hash"), on=VID, how="left_anti").localCheckpoint(
        eager=True
    )
    in_ = bwd.join(core.hint("shuffle_hash"), on=VID, how="left_anti").localCheckpoint(
        eager=True
    )
    from_in = reach_set(spark, e, in_, reverse=False, max_iterations=max_iterations)
    to_out = reach_set(spark, e, out_, reverse=True, max_iterations=max_iterations)
    labeled = (
        verts.join(core.withColumn("_core", F.lit(True)).hint("shuffle_hash"), on=VID, how="left")
        .join(in_.withColumn("_in", F.lit(True)).hint("shuffle_hash"), on=VID, how="left")
        .join(out_.withColumn("_out", F.lit(True)).hint("shuffle_hash"), on=VID, how="left")
        .join(from_in.withColumn("_fi", F.lit(True)).hint("shuffle_hash"), on=VID, how="left")
        .join(to_out.withColumn("_to", F.lit(True)).hint("shuffle_hash"), on=VID, how="left")
        .select(
            VID,
            F.when(F.col("_core"), F.lit("core"))
            .when(F.col("_in"), F.lit("in"))
            .when(F.col("_out"), F.lit("out"))
            .when(F.col("_fi") & F.col("_to"), F.lit("tube"))
            .when(F.col("_fi"), F.lit("tendril_in"))
            .when(F.col("_to"), F.lit("tendril_out"))
            .otherwise(F.lit("disconnected"))
            .alias(CLASS),
        )
    )
    out = labeled.localCheckpoint(eager=True)
    e.unpersist()
    verts.unpersist()
    comp.unpersist()
    return out


def bowtie_census(labels: DataFrame) -> DataFrame:
    """[bowtie_class, n] — the published summary table."""
    return labels.groupBy(CLASS).agg(F.count("*").alias("n"))
