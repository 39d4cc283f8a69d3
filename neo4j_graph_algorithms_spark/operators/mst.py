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

Durable checkpoints (north rule: runs resume mid-algorithm): with
`checkpoint_dir` set, each completed Borůvka round commits its picked
edges to `<dir>/picked/round=<k>` and the component labels to
`<dir>/comp/round=<k>` (the comp write's _SUCCESS is the commit marker),
and the inner min-label fixpoint runs on SuperstepRunner with durable
state under `<dir>/fix/round=<k>`.  `resume=True` restarts after the
newest committed round.  Use a fresh dir for non-resume runs.

Fixture MSTPrimTest.java:38-75: K-ish 5-node graph → tree {ab, ac, bd, ce},
weight 12.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, WEIGHT, EdgeFrame
from neo4j_graph_algorithms_spark.plans.runtime import SuperstepRunner


def _min_label_fixpoint(
    spark: SparkSession,
    labels: DataFrame,
    cund: DataFrame,
    max_rounds: int,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> DataFrame:
    """Min-propagation with pointer jumping over the component graph
    [c, root], run on SuperstepRunner.  Monotone-checksum convergence:
    roots only DECREASE, so Σroot is stationary exactly at the fixpoint —
    one aggregate per round, no state self-join (wcc.py's trick)."""

    def step(lbl: DataFrame, i: int) -> DataFrame:
        nbr = cund.join(lbl.withColumnRenamed("c", "a"), on="a").select(
            F.col("b").alias("c"), "root"
        )
        cand = nbr.unionByName(lbl).groupBy("c").agg(F.min("root").alias("root"))
        # shuffle_hash: component-sized jump mapping, stats-independent
        mapping = cand.select(F.col("c").alias("_m"), F.col("root").alias("_mr")).hint(
            "shuffle_hash"
        )
        return cand.join(mapping, cand["root"] == F.col("_m"), "left").select(
            "c", F.coalesce("_mr", "root").alias("root")
        )

    prev: dict = {}

    def metric(new: DataFrame, old: DataFrame, i: int) -> float:
        row = new.agg(F.sum(F.col("root").cast("decimal(38,0)")).alias("s")).collect()[0]
        s = int(row["s"] or 0)
        changed = prev.get("s") != s
        prev["s"] = s
        return 1.0 if changed else 0.0

    runner = SuperstepRunner(
        spark,
        max_iterations=max_rounds,
        metric=metric,
        converged=lambda m: m == 0.0,
        checkpoint_dir=checkpoint_dir,
        job_group="linkgraph-mst-fixpoint",
    )
    return runner.run(labels, step, resume=resume).state


def _latest_round(checkpoint_dir: str) -> int | None:
    root = os.path.join(checkpoint_dir, "comp")
    if not os.path.isdir(root):
        return None
    rounds = [
        int(name.split("=", 1)[1])
        for name in os.listdir(root)
        if name.startswith("round=")
        and os.path.exists(os.path.join(root, name, "_SUCCESS"))
    ]
    return max(rounds) if rounds else None


def mst(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    max_rounds: int = 64,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    metrics: dict | None = None,
) -> DataFrame:
    """[src, dst, weight] the minimum spanning forest of the undirected
    graph (canonical src<dst rows).  See module docstring for the durable
    checkpoint / resume contract."""
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
    mx: dict = metrics if metrics is not None else {}
    mx.setdefault("boruvka_rounds", 0)
    picked: list[DataFrame] = []

    def _picked_path(k: int) -> str:
        return os.path.join(checkpoint_dir, "picked", f"round={k}")

    def _comp_path(k: int) -> str:
        return os.path.join(checkpoint_dir, "comp", f"round={k}")

    start_round = 0
    if checkpoint_dir and resume:
        latest = _latest_round(checkpoint_dir)
        if latest is not None:
            comp = spark.read.parquet(_comp_path(latest)).localCheckpoint(eager=True)
            for k in range(latest + 1):
                picked.append(spark.read.parquet(_picked_path(k)))
            start_round = latest + 1
            mx["resumed_round"] = latest

    for round_k in range(start_round, max_rounds):
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
        mx["boruvka_rounds"] += 1
        chosen_edges = chosen.select(SRC, DST, WEIGHT)
        picked.append(chosen_edges)
        # merge components: connectivity over the component graph of chosen
        # edges (hook + pointer-jump, few iterations — the graph is a forest)
        cedges = chosen.select(F.col("c_src").alias("a"), F.col("c_dst").alias("b"))
        cund = cedges.unionByName(
            cedges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        labels = (
            cund.select(F.col("a").alias("c"))
            .distinct()
            .select("c", F.col("c").alias("root"))
        )
        labels = _min_label_fixpoint(
            spark,
            labels,
            cund,
            max_rounds,
            checkpoint_dir=(
                os.path.join(checkpoint_dir, "fix", f"round={round_k}")
                if checkpoint_dir
                else None
            ),
            resume=resume and round_k == start_round,
        )
        comp = (
            comp.join(labels.withColumnRenamed("c", "comp"), on="comp", how="left")
            .select(VID, F.coalesce("root", F.col("comp")).alias("comp"))
            .localCheckpoint(eager=True)
        )
        if checkpoint_dir:
            chosen_edges.write.mode("overwrite").parquet(_picked_path(round_k))
            comp.write.mode("overwrite").parquet(_comp_path(round_k))

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
