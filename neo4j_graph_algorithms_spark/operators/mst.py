"""Minimum spanning tree / forest (algo.mst).

The reference runs sequential Prim with a priority queue
(impl/MSTPrim.java; proc MSTPrimProc.java:65).  Prim is inherently
sequential, so the Spark-native formulation is Borůvka — the classic
parallel MST: every round each component picks its minimum incident
cross-edge (deterministic tie-break on (weight, src, dst)), the picked
edges join components, components relabel by connectivity, repeat.
O(log n) rounds, each a join+groupBy; identical tree weight to Prim, and
the identical edge SET when weights are distinct (the tie-break makes the
output deterministic otherwise).

Fixture MSTPrimTest.java:38-75: K-ish 5-node graph → tree {ab, ac, bd, ce},
weight 12.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, WEIGHT, EdgeFrame


def mst(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    max_rounds: int = 64,
) -> DataFrame:
    """[src, dst, weight] the minimum spanning forest of the undirected
    graph (canonical src<dst rows)."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    # undirected-canonical with the MINIMUM parallel edge kept (canonical()
    # sums weights, which is the wrong reduction for MST)
    base = (
        ef.df.filter(F.col(SRC) != F.col(DST))
        .select(
            F.least(SRC, DST).alias(SRC), F.greatest(SRC, DST).alias(DST), F.col(WEIGHT)
        )
        .groupBy(SRC, DST)
        .agg(F.min(WEIGHT).alias(WEIGHT))
        .localCheckpoint(eager=True)
    )
    comp = (
        base.select(F.col(SRC).alias(VID))
        .unionByName(base.select(F.col(DST).alias(VID)))
        .distinct()
        .select(VID, F.col(VID).alias("comp"))
        .localCheckpoint(eager=True)
    )
    picked: list[DataFrame] = []

    for _ in range(max_rounds):
        cross = (
            base.join(
                comp.select(F.col(VID).alias(SRC), F.col("comp").alias("c_src")), on=SRC
            )
            .join(
                comp.select(F.col(VID).alias(DST), F.col("comp").alias("c_dst")), on=DST
            )
            .filter(F.col("c_src") != F.col("c_dst"))
        )
        # each component's minimum incident cross edge (either endpoint side)
        incident = cross.select(
            F.col("c_src").alias("c"), SRC, DST, WEIGHT, "c_src", "c_dst"
        ).unionByName(
            cross.select(F.col("c_dst").alias("c"), SRC, DST, WEIGHT, "c_src", "c_dst")
        )
        w = Window.partitionBy("c").orderBy(WEIGHT, SRC, DST)
        chosen = (
            incident.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(SRC, DST, WEIGHT, "c_src", "c_dst")
            .distinct()
            .localCheckpoint(eager=True)
        )
        if chosen.isEmpty():
            break
        picked.append(chosen.select(SRC, DST, WEIGHT))
        # merge components: connectivity over the component graph of chosen
        # edges (hook + pointer-jump, few iterations — the graph is a forest)
        cedges = chosen.select(
            F.col("c_src").alias("a"), F.col("c_dst").alias("b")
        )
        cund = cedges.unionByName(
            cedges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        labels = (
            cund.select(F.col("a").alias("c"))
            .distinct()
            .select("c", F.col("c").alias("root"))
        )
        # monotone-checksum convergence: roots only DECREASE under
        # min-propagation, so Σroot is stationary exactly at the fixpoint —
        # one aggregate per round, no state self-join (wcc.py's trick)
        prev_sum = None
        for _j in range(max_rounds):
            nbr = (
                cund.join(labels.withColumnRenamed("c", "a"), on="a")
                .select(F.col("b").alias("c"), "root")
            )
            cand = (
                nbr.unionByName(labels)
                .groupBy("c")
                .agg(F.min("root").alias("root"))
            )
            # shuffle_hash: component-sized jump mapping, stats-independent
            mapping = cand.select(
                F.col("c").alias("_m"), F.col("root").alias("_mr")
            ).hint("shuffle_hash")
            labels = (
                cand.join(mapping, cand["root"] == F.col("_m"), "left")
                .select("c", F.coalesce("_mr", "root").alias("root"))
                .localCheckpoint(eager=True)
            )
            row = labels.agg(
                F.sum(F.col("root").cast("decimal(38,0)")).alias("s")
            ).collect()[0]
            s = int(row["s"] or 0)
            if prev_sum is not None and s == prev_sum:
                break
            prev_sum = s
        comp = (
            comp.join(labels.withColumnRenamed("c", "comp"), on="comp", how="left")
            .select(VID, F.coalesce("root", F.col("comp")).alias("comp"))
            .localCheckpoint(eager=True)
        )

    if not picked:
        return spark.createDataFrame([], f"{SRC} long, {DST} long, {WEIGHT} double")
    out = picked[0]
    for p in picked[1:]:
        out = out.unionByName(p)
    return out.distinct()


def mst_stats(tree: DataFrame) -> DataFrame:
    """weight min/max/sum of the forest (MSTPrimProc.java:65 yields)."""
    return tree.agg(
        F.count("*").alias("edge_count"),
        F.min(WEIGHT).alias("min_weight"),
        F.max(WEIGHT).alias("max_weight"),
        F.sum(WEIGHT).alias("total_weight"),
    )
