"""k-core decomposition (beyond the reference catalogue).

The reference ships degree-based hub mitigation
(impl/metapath/MetaPathPrecomputeHighDegreeNodes.java) but no coreness;
its successor (Neo4j GDS `gds.kcore`) and every link-graph curation
pipeline use k-cores to isolate the dense nucleus of a web/co-commit graph
(spam farms, template cliques) and to bound training-subgraph density.

Algorithm: synchronous peel.  Each superstep drops every vertex whose
degree IN THE SURVIVING SUBGRAPH is < k, until a fixpoint — the classic
distributed k-core (Montresor et al., "Distributed k-Core Decomposition",
IEEE TPDS 2013, converges in <= |V| rounds, in practice O(peel depth)).

Spark formulation: state = the surviving undirected adjacency [src, dst]
(both directions).  Per superstep: one groupBy(src) degree aggregation
(map-side combined) and one semi-join of the adjacency against the
surviving vertex set on EACH endpoint — all hash-partitioned on the same
key, and the survivor set (|V|-sized, shrinking) carries the repo's
`shuffle_hash` hint so Catalyst never broadcasts vertex state.  The state
only ever SHRINKS, so the convergence metric is the monotone row-count
delta (one cheap agg, no state-vs-state join).

`coreness` sweeps k upward re-using the previous core ((k+1)-core ⊆
k-core), so the total work is one peel pass per degeneracy level over an
ever-shrinking subgraph — the standard sequential-sweep bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame
from neo4j_graph_algorithms_spark.plans.runtime import SuperstepResult, SuperstepRunner


def _both_directions(edges: EdgeFrame | DataFrame) -> DataFrame:
    """Distinct undirected adjacency, both row directions, self-loops out."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    und = ef.canonical().df.select(SRC, DST)
    return und.unionByName(
        und.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    )


def kcore(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    k: int,
    max_iterations: int = 100,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
) -> SuperstepResult:
    """Peel to the k-core; result state is [vid, deg] — the vertices of the
    k-core with their degree WITHIN the core subgraph (all >= k).

    Runs on SuperstepRunner: durable per-round checkpoints + resume like
    every other iterative operator (plans/runtime.py).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    adj0 = _both_directions(edges).repartition(SRC)

    def step(state: DataFrame, i: int) -> DataFrame:
        deg = state.groupBy(SRC).agg(F.count("*").alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select(SRC)
        # semi-join both endpoints against the (shrinking) survivor set;
        # hint the survivor PROJECTION: state-sized frames never broadcast
        return (
            state.join(keep.hint("shuffle_hash"), on=SRC, how="left_semi")
            .join(
                keep.select(F.col(SRC).alias(DST)).hint("shuffle_hash"),
                on=DST,
                how="left_semi",
            )
        )

    runner = SuperstepRunner(
        spark,
        max_iterations=max_iterations,
        # monotone shrink: converged when no adjacency row was removed
        metric=lambda new, old, i: float(old.count() - new.count()),
        converged=lambda m: m == 0.0,
        checkpoint_dir=checkpoint_dir,
        checkpoint_interval=checkpoint_interval,
        job_group=f"linkgraph-kcore-{k}",
    )
    res = runner.run(adj0, step, resume=resume)
    core = (
        res.state.groupBy(F.col(SRC).alias(VID))
        .agg(F.count("*").alias("deg"))
    )
    return SuperstepResult(
        state=core,
        iterations=res.iterations,
        converged=res.converged,
        metrics=res.metrics,
        first_plan=res.first_plan,
    )


def s_core(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    s: int,
    max_iterations: int = 100,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
) -> SuperstepResult:
    """s-core: the weighted k-core (Eidsaa & Almaas, "s-core network
    decomposition", Phys. Rev. E 88, 2013) — peel every vertex whose
    STRENGTH (sum of incident edge weights in the surviving subgraph) is
    < s, to a fixpoint.  Result state is [vid, strength] with strength as
    BIGINT (weights are cast to long up front, so the per-round strength
    aggregation is exact integer arithmetic — order-free, engine-free; the
    repo's integer gate discipline).  Same superstep shape as `kcore`:
    one map-side-combined strength aggregation + two shuffle_hash-hinted
    survivor semi-joins per round, monotone row-count convergence.
    """
    if s < 1:
        raise ValueError(f"s must be >= 1, got {s}")
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    und = ef.canonical().df.select(SRC, DST, F.col("weight").cast("long").alias("w"))
    adj0 = (
        und.unionByName(
            und.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), "w")
        )
        .repartition(SRC)
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        strength = state.groupBy(SRC).agg(F.sum("w").alias("strength"))
        keep = strength.filter(F.col("strength") >= s).select(SRC)
        return (
            state.join(keep.hint("shuffle_hash"), on=SRC, how="left_semi")
            .join(
                keep.select(F.col(SRC).alias(DST)).hint("shuffle_hash"),
                on=DST,
                how="left_semi",
            )
        )

    runner = SuperstepRunner(
        spark,
        max_iterations=max_iterations,
        metric=lambda new, old, i: float(old.count() - new.count()),
        converged=lambda m: m == 0.0,
        checkpoint_dir=checkpoint_dir,
        checkpoint_interval=checkpoint_interval,
        job_group=f"linkgraph-score-{s}",
    )
    res = runner.run(adj0, step, resume=resume)
    core = res.state.groupBy(F.col(SRC).alias(VID)).agg(
        F.sum("w").alias("strength")
    )
    return SuperstepResult(
        state=core,
        iterations=res.iterations,
        converged=res.converged,
        metrics=res.metrics,
        first_plan=res.first_plan,
    )


def coreness(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    max_k: int | None = None,
    max_iterations_per_k: int = 100,
) -> DataFrame:
    """[vid, core] — the largest k such that vid is in the k-core.

    Upward sweep re-using the previous survivor subgraph; vertices dropped
    while peeling to the k-core have coreness k-1.  Isolated vertices (deg
    0 after canonicalization, incl. self-loop-only) never enter the sweep
    and are emitted with core 0.

    When ``max_k`` cuts the sweep short, every vertex still surviving in
    the max_k-core is emitted with ``core = max_k`` — a documented CLAMP
    (their true coreness is >= max_k), not a silent fall-through to 0.
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    all_verts = ef.vertices()
    adj = _both_directions(ef).repartition(SRC).persist()
    adj.count()
    assigned: list[DataFrame] = []
    k = 1
    while True:
        if max_k is not None and k > max_k:
            # clamp: survivors of the max_k-core have coreness >= max_k
            assigned.append(
                adj.select(F.col(SRC).alias(VID))
                .distinct()
                .select(VID, F.lit(max_k).alias("core"))
                .localCheckpoint(eager=True)
            )
            adj.unpersist()
            break
        survivors = adj
        for _ in range(max_iterations_per_k):
            deg = survivors.groupBy(SRC).agg(F.count("*").alias("deg"))
            keep = deg.filter(F.col("deg") >= k).select(SRC)
            nxt = (
                survivors.join(keep.hint("shuffle_hash"), on=SRC, how="left_semi")
                .join(
                    keep.select(F.col(SRC).alias(DST)).hint("shuffle_hash"),
                    on=DST,
                    how="left_semi",
                )
                .localCheckpoint(eager=True)
            )
            before, after = survivors.count(), nxt.count()
            survivors = nxt
            if after == before:
                break
        dropped = (
            adj.select(F.col(SRC).alias(VID)).distinct()
            .join(
                survivors.select(F.col(SRC).alias(VID)).distinct(),
                on=VID,
                how="left_anti",
            )
            .select(VID, F.lit(k - 1).alias("core"))
        )
        assigned.append(dropped.localCheckpoint(eager=True))
        if survivors.isEmpty():
            adj.unpersist()
            break
        adj.unpersist()
        adj = survivors.persist()
        k += 1
    # each vid is dropped at exactly one level → the parts are disjoint
    out = all_verts.select(VID)
    if assigned:
        labels = assigned[0]
        for part in assigned[1:]:
            labels = labels.unionByName(part)
        out = out.join(labels, on=VID, how="left")
        return out.select(VID, F.coalesce("core", F.lit(0)).alias("core"))
    return out.select(VID, F.lit(0).alias("core"))


def coreness_hindex(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    max_iterations: int = 50,
    fixed_iterations: bool = False,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
) -> SuperstepResult:
    """[vid, core] via h-index iteration — the ONE-LOOP coreness.

    c_0(v) = deg(v); c_{t+1}(v) = h-index of {c_t(u) : u ~ v} (the largest
    h with >= h neighbors of value >= h).  The sequence is pointwise
    non-increasing and converges to the exact coreness (Lü, Zhou, Zhang &
    Stanley, Nature Communications 7:10168, 2016) — no analogue in the
    reference (kcore itself is beyond-catalogue).

    This is the 10^12-edge path: `coreness` (the upward peel sweep above)
    runs one shrinking peel PASS PER DEGENERACY LEVEL — dozens of
    sequential phases on a web graph — while h-index iteration is a single
    superstep loop that usually converges in O(10) rounds.  Per round: one
    state join shuffled on the adjacency key + one per-vertex window over
    neighbor values (rank-desc; h = max rank r with value >= r).  The
    h-index is tie-order invariant, so row_number nondeterminism across
    equal values cannot change the result.  Hub windows are degree-sized:
    at web scale pair this with the degree caps the audits
    (graph_degree_stats / rich_club) motivate.

    With ``fixed_iterations=True`` runs EXACTLY max_iterations rounds (no
    early-stop collect) — the mode the driver gate uses to mirror the
    unrolled DuckDB oracle; the default early-stops when no vertex changed.
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    adj = _both_directions(ef).repartition(DST).persist()
    adj.count()
    verts = ef.vertices()
    deg = adj.groupBy(F.col(SRC).alias(VID)).agg(F.count("*").alias("core"))
    state0 = (
        verts.join(deg.hint("shuffle_hash"), on=VID, how="left")
        .select(VID, F.coalesce(F.col("core"), F.lit(0)).alias("core"))
    )

    w = Window.partitionBy(SRC).orderBy(F.col("_cn").desc())

    def step(state: DataFrame, i: int) -> DataFrame:
        nbr_vals = adj.join(
            state.select(F.col(VID).alias(DST), F.col("core").alias("_cn")).hint(
                "shuffle_hash"
            ),
            on=DST,
        ).select(SRC, "_cn")
        h = (
            nbr_vals.withColumn("_r", F.row_number().over(w))
            .groupBy(F.col(SRC).alias(VID))
            .agg(
                F.coalesce(
                    F.max(F.when(F.col("_cn") >= F.col("_r"), F.col("_r"))), F.lit(0)
                ).alias("_h")
            )
        )
        return (
            state.select(VID)
            .join(h.hint("shuffle_hash"), on=VID, how="left")
            .select(VID, F.coalesce(F.col("_h"), F.lit(0)).alias("core"))
        )

    def changed(new: DataFrame, old: DataFrame, i: int) -> float:
        # monotone non-increasing, so sum(core) strictly drops until the
        # fixpoint — one scalar agg per state, no state-vs-state join
        ns = new.agg(F.sum("core")).collect()[0][0] or 0
        os_ = old.agg(F.sum("core")).collect()[0][0] or 0
        return float(os_ - ns)

    runner = SuperstepRunner(
        spark,
        max_iterations=max_iterations,
        metric=None if fixed_iterations else changed,
        converged=None if fixed_iterations else (lambda m: m == 0.0),
        checkpoint_dir=checkpoint_dir,
        checkpoint_interval=checkpoint_interval,
        job_group="linkgraph-coreness-hindex",
    )
    result = runner.run(state0, step, resume=resume)
    adj.unpersist()
    return result
