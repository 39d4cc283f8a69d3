"""Weakly connected components (algo.unionFind family).

Semantics oracle: sequential disjoint-set union over all OUTGOING edges,
computing undirected connectivity (reference impl/GraphUnionFind.java:58-73;
core/utils/dss/DisjointSetStruct.java:42-244).  Component ids in the
reference are arbitrary DSS roots; tests assert partition structure only
(UnionFindProcIntegrationTest.java:113-176), and the reference's own
MSColoring variant (impl/MSColoring.java:66-121) proves canonical-extremum
labels are an accepted equivalent.  We canonicalize: component id = MIN
member id.

Spark formulation: min-label propagation accelerated with pointer jumping
(Shiloach-Vishkin style).  Each superstep:

    1. hop:   cand(v)  = min(comp(v), min over undirected neighbors comp(u))
    2. jump:  comp'(v) = comp value currently held by node cand(v)

Plain hop propagation needs O(diameter) rounds — unacceptable for web-scale
path graphs; the jump step composes label mappings so convergence is
O(log n) rounds.  Each round = 2 shuffles (one edge join + group-by, one
self-join), both hash-partitioned on vid.

The weighted/threshold variant unions only edges with weight >= threshold
(GraphUnionFind.java:82-99, compare is >= at :90).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame
from neo4j_graph_algorithms_spark.plans.runtime import SuperstepResult, SuperstepRunner

COMP = "comp"


def wcc(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    vertices: DataFrame | None = None,
    threshold: float | None = None,
    max_iterations: int = 100,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
    extremum: str = "min",
    initial_components: DataFrame | None = None,
) -> SuperstepResult:
    """Return SuperstepResult whose state is [vid, comp] (comp = min member id).

    `threshold`: if set, union only edges with weight >= threshold
    (weighted unionFind, GraphUnionFind.java:90).
    `vertices`: optional [vid] frame; isolated vertices become their own
    singleton components (reference includes every loaded node,
    DisjointSetStruct.java:42-58).
    `extremum='max'` is the MSColoring variant (algo.unionFind.mscoloring,
    impl/MSColoring.java:66-121): component id = MAX member id.

    `initial_components` ([vid, comp]) WARM-STARTS from a prior labeling —
    the incremental mode for an ADDITIVE graph (edges only accumulate,
    e.g. the streaming co-commit table): extremum-propagation converges to
    the per-component extremum of the INITIAL labels, and a prior valid
    labeling's ids are member vids whose old components stay intact under
    edge addition, so the fixpoint is exactly the new labeling — reached
    in rounds ~ log(merged-component count) instead of log(diameter).
    INVALID after edge REMOVAL (stale labels may no longer be reachable);
    run cold when edges can vanish.  Missing vids start at vid (cold).
    """
    if extremum not in ("min", "max"):
        raise ValueError(f"extremum must be 'min' or 'max', got {extremum!r}")
    agg_fn = F.min if extremum == "min" else F.max
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    if threshold is not None:
        ef = ef.filter_weight(threshold)

    # Undirected neighbor pairs, both directions, no weights needed past here.
    # Cached PRE-PARTITIONED on the superstep join key (src): only the small
    # vertex state shuffles each round; the 2|E| edge table shuffles once at
    # build time (same discipline as operators/pagerank.py).
    und = ef.as_undirected().df.select(SRC, DST).distinct().repartition(SRC)
    und.persist()

    verts = vertices.select(VID) if vertices is not None else None
    all_verts = (
        und.select(F.col(SRC).alias(VID)).distinct()
        if verts is None
        else verts.unionByName(und.select(F.col(SRC).alias(VID))).distinct()
    )
    if initial_components is None:
        state0 = all_verts.select(F.col(VID), F.col(VID).alias(COMP))
    else:
        state0 = all_verts.join(
            initial_components.select(VID, F.col(COMP).alias("_pc")),
            on=VID,
            how="left",
        ).select(VID, F.coalesce("_pc", F.col(VID)).alias(COMP))

    def step(state: DataFrame, i: int) -> DataFrame:
        # 1. hop: min over self + neighbors.  shuffle_hash: never broadcast
        # the vertex state (serial driver-side build per superstep —
        # see operators/pagerank.py step)
        nbr = (
            und.join(state.withColumnRenamed(VID, SRC).hint("shuffle_hash"), on=SRC)
            .select(F.col(DST).alias(VID), COMP)
        )
        cand = (
            nbr.unionByName(state.select(VID, COMP))
            .groupBy(VID)
            .agg(agg_fn(COMP).alias(COMP))
        )
        # 2. pointer jump: comp'(v) = comp(cand(v)); comp values are node ids
        #    so the mapping lives in `cand` itself.  comp(cand) is always at
        #    least as extreme as cand, so jumping only accelerates.
        # shuffle_hash on the mapping side too: the jump self-join is
        # state-vs-state (|V| rows each) — letting stats-driven broadcast
        # pick the plan makes small-scale tests diverge from cluster-scale
        # behavior; the hint keeps the plan stats-independent
        mapping = cand.select(
            F.col(VID).alias("_m_vid"), F.col(COMP).alias("_m_comp")
        ).hint("shuffle_hash")
        jumped = (
            cand.join(mapping, cand[COMP] == F.col("_m_vid"), "left")
            .select(VID, F.coalesce(F.col("_m_comp"), F.col(COMP)).alias(COMP))
        )
        return jumped

    # Convergence via a monotone checksum instead of a change-count join:
    # labels only ever DECREASE under min-propagation (or increase under
    # max), so Σcomp is strictly monotone until the fixpoint — one cheap
    # aggregate per round replaces a 2M×2M shuffle join.
    prev_sum: list[int | None] = [None]

    def metric(new: DataFrame, old: DataFrame, i: int) -> float:
        # decimal(38,0): comp ids are arbitrary 64-bit (hashed) vids, a
        # plain long sum would overflow; comparison is exact integer
        row = new.agg(F.sum(F.col(COMP).cast("decimal(38,0)")).alias("s")).collect()[0]
        s = int(row["s"] or 0)
        delta = None if prev_sum[0] is None else abs(prev_sum[0] - s)
        prev_sum[0] = s
        return float("inf") if delta is None else float(min(delta, 10**15))

    runner = SuperstepRunner(
        spark,
        max_iterations=max_iterations,
        metric=metric,
        converged=lambda delta: delta == 0,
        checkpoint_dir=checkpoint_dir,
        checkpoint_interval=checkpoint_interval,
        job_group="linkgraph-wcc",
    )
    result = runner.run(state0, step, resume=resume)
    und.unpersist()
    return result


def wcc_stats(components: DataFrame) -> DataFrame:
    """setCount / set-size stats over a [vid, comp] frame
    (DisjointSetStruct.java:224-244; result DTOs algo/results/)."""
    sizes = components.groupBy(COMP).agg(F.count("*").alias("size"))
    return sizes.agg(
        F.count("*").alias("set_count"),
        F.min("size").alias("min_size"),
        F.max("size").alias("max_size"),
        F.avg("size").alias("avg_size"),
    )
