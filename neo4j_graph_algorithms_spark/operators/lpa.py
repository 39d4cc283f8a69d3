"""Label propagation (algo.labelPropagation).

The fork removed the implementation; the executable spec is the commented-out
integration test (tests/.../LabelPropagationProcIntegrationTest.java:49-199)
plus doc/label-propagation.adoc:100-137 (see SURVEY.md §2.12.6):

  * seeds: `partitionProperty` value when present, else the node id
    (:140-151);
  * per iteration a node adopts the label maximizing
    Σ over neighbors with that label of (neighbor nodeWeight × relWeight);
  * direction OUTGOING gathers from out-neighbors, INCOMING from in-neighbors
    (:117-136, :166-174); `weightProperty` default 'weight';
  * runs ≤ `iterations` (default 1, adoc:104); reports didConverge.

Determinism note: the reference updates labels in node-id scan order within
an iteration (asynchronous Gauss-Seidel), which is inherently sequential.
We run SYNCHRONOUS supersteps with a deterministic tie-break (smallest
label wins), the standard distributed formulation: all integration-test
fixtures agree; pathological 2-cycles that oscillate under synchronous
updates (and silently depend on scan order in the reference) hit the
iteration cap with didConverge=False instead.

Spark plan per superstep (2 shuffles):
    votes = gather_edges ⋈ labels(nbr) [⋈ node_weights(nbr)]
              groupBy(gatherer, label).sum(nodeWeight × relWeight)
    top   = row_number over (gatherer; weight desc, label asc) == 1
    new   = labels left ⋈ top (isolated nodes keep their label)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, WEIGHT, EdgeFrame
from neo4j_graph_algorithms_spark.plans.runtime import SuperstepResult, SuperstepRunner

LABEL = "label"


def lpa(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    seeds: DataFrame | None = None,
    vertices: DataFrame | None = None,
    node_weights: DataFrame | None = None,
    direction: str = "OUTGOING",
    max_iterations: int = 1,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
    metric_every: int = 1,
) -> SuperstepResult:
    """Return SuperstepResult with state [vid, label].

    `seeds`: optional [vid, label] (partitionProperty); nodes absent from it
    fall back to label = vid.  `node_weights`: optional [vid, nweight],
    default 1.0.  `metric_every=k`: run the change-count convergence join
    only every k-th superstep (labels are not monotone, so LPA cannot use
    the WCC checksum trick; skipping the join is the cheap alternative —
    worst case k-1 extra supersteps).
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)

    # gather side: (gatherer, nbr, w)
    d = direction.upper()
    if d == "OUTGOING":
        gather = ef.df.select(F.col(SRC).alias("gatherer"), F.col(DST).alias("nbr"), WEIGHT)
    elif d == "INCOMING":
        gather = ef.df.select(F.col(DST).alias("gatherer"), F.col(SRC).alias("nbr"), WEIGHT)
    elif d == "BOTH":
        gather = ef.as_undirected().df.select(
            F.col(SRC).alias("gatherer"), F.col(DST).alias("nbr"), WEIGHT
        )
    else:
        raise ValueError(f"unknown direction {direction!r}")
    if node_weights is not None:
        gather = gather.join(
            node_weights.select(F.col(VID).alias("nbr"), F.col("nweight")), on="nbr", how="left"
        ).select("gatherer", "nbr", (F.col(WEIGHT) * F.coalesce("nweight", F.lit(1.0))).alias(WEIGHT))
    # Cached PRE-PARTITIONED on the superstep join key (nbr): the edge table
    # shuffles once here; per superstep only the vertex state moves
    # (same discipline as operators/pagerank.py).
    gather = gather.repartition("nbr").persist()

    verts = vertices.select(VID) if vertices is not None else ef.vertices()
    if seeds is not None:
        state0 = verts.join(seeds.select(VID, F.col(LABEL).cast("long")), on=VID, how="left").select(
            VID, F.coalesce(F.col(LABEL), F.col(VID)).alias(LABEL)
        )
    else:
        state0 = verts.select(F.col(VID), F.col(VID).alias(LABEL))

    def step(state: DataFrame, i: int) -> DataFrame:
        # shuffle_hash: keep Catalyst from broadcasting the (large) vertex
        # state every superstep — a serial driver-side build that caps
        # cluster scaling (see operators/pagerank.py step)
        votes = (
            gather.join(
                state.select(F.col(VID).alias("nbr"), LABEL).hint("shuffle_hash"),
                on="nbr",
            )
            .groupBy("gatherer", LABEL)
            .agg(F.sum(WEIGHT).alias("wsum"))
        )
        w = Window.partitionBy("gatherer").orderBy(F.col("wsum").desc(), F.col(LABEL).asc())
        top = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(F.col("gatherer").alias(VID), F.col(LABEL).alias("_new"))
        )
        return state.join(top, on=VID, how="left").select(
            VID, F.coalesce(F.col("_new"), F.col(LABEL)).alias(LABEL)
        )

    def metric(new: DataFrame, old: DataFrame, i: int) -> float:
        return float(
            new.alias("n")
            .join(old.alias("o"), on=VID)
            .filter(F.col(f"n.{LABEL}") != F.col(f"o.{LABEL}"))
            .count()
        )

    runner = SuperstepRunner(
        spark,
        max_iterations=max_iterations,
        metric=metric,
        converged=lambda changed: changed == 0,
        checkpoint_dir=checkpoint_dir,
        checkpoint_interval=checkpoint_interval,
        job_group="linkgraph-lpa",
        metric_every=metric_every,
    )
    result = runner.run(state0, step, resume=resume)
    gather.unpersist()
    return result
