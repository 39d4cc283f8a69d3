"""Louvain community detection — phase-1 greedy modularity
(algo.louvain, impl/louvain/Louvain.java:37-200; the reference's plain
implementation runs the local-move phase without the hierarchy fold,
SURVEY.md §2.11).

Semantics: undirected weighted graph; each pass every node considers
moving to the community of a neighbor, picking the move with the largest
modularity gain

    ΔQ(i→c) = k_i_in(c)/m − deg_i·Σtot(c)/(2m²)        (standard form)

moving only when the best move strictly beats staying (ties → smaller
community id).  Synchronous DataFrame moves oscillate on symmetric graphs,
so each sub-step only moves the even- or odd-vid half (alternating) — a
standard parallel-Louvain determinism device.  Converges when no node
moves; `modularity` reports Q for any assignment.

Plan shape per sub-step: one edge⋈state join + two aggregations — all
hash-partitioned on vid, no broadcasts of vertex state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, WEIGHT, EdgeFrame
from neo4j_graph_algorithms_spark.plans.runtime import SuperstepRunner

COMM = "community"


def _und_simple(ef: EdgeFrame) -> DataFrame:
    """Canonical undirected weighted edges, self-loops dropped."""
    return ef.canonical().df


def modularity_df(spark: SparkSession, edges: EdgeFrame | DataFrame, assignment: DataFrame) -> DataFrame:
    """One-row [modularity] for a [vid, community] assignment:
    Q = Σ_c ( w_in(c)/m − (deg(c)/(2m))² ), undirected weighted."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    und = _und_simple(ef)
    m = und.agg(F.sum(WEIGHT)).collect()[0][0]
    if not m:
        return spark.createDataFrame([(0.0,)], "modularity double")
    a = assignment.select(F.col(VID), F.col(COMM))
    e_comm = (
        und.join(a.select(F.col(VID).alias(SRC), F.col(COMM).alias("c_src")), on=SRC)
        .join(a.select(F.col(VID).alias(DST), F.col(COMM).alias("c_dst")), on=DST)
    )
    w_in = (
        e_comm.filter(F.col("c_src") == F.col("c_dst"))
        .groupBy(F.col("c_src").alias(COMM))
        .agg(F.sum(WEIGHT).alias("w_in"))
    )
    # weighted degree per community (each edge contributes to both endpoints)
    deg = (
        e_comm.select(F.col("c_src").alias(COMM), WEIGHT)
        .unionByName(e_comm.select(F.col("c_dst").alias(COMM), WEIGHT))
        .groupBy(COMM)
        .agg(F.sum(WEIGHT).alias("deg"))
    )
    per_comm = deg.join(w_in, on=COMM, how="left").select(
        (
            F.coalesce(F.col("w_in"), F.lit(0.0)) / F.lit(float(m))
            - F.pow(F.col("deg") / F.lit(2.0 * float(m)), 2)
        ).alias("q")
    )
    return per_comm.agg(F.round(F.sum("q"), 6).alias("modularity"))


def louvain(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    max_iterations: int = 20,
    metric_every: int = 1,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
    integer_gains: bool = False,
) -> DataFrame:
    """[vid, community] after the phase-1 local-move loop (communities
    canonicalized to min member id).

    `metric_every=k`: run the moved-count convergence join only every k-th
    sub-step (each is a |V|⋈|V| join job); skipped sub-steps assume
    non-convergence, so worst case k-1 extra sub-steps run.

    `integer_gains=True` — the DETERMINISTIC GATE MODE: requires
    integer-valued edge weights (cast to long; true of every engine-derived
    graph — co-order/co-commit counts).  Both sides of every gain
    comparison are multiplied by the positive constant 2m² so the decision
    becomes pure integer arithmetic in decimal(38,0):

        move iff  W2·kin(best) − ki·σ_adj  >  W2·kin(own) − ki·(σ_own − ki)

    with W2 = 2m = Σ both-direction weights.  The greedy trajectory —
    every move, every tie-break (smaller community id), the alternating
    even/odd halves, and the round count — is then engine- and
    re-shard-invariant, which is what lets `louvain_communities` assert
    VALUES against the unrolled DuckDB twin (oracles.louvain_int_sql)
    instead of the rows-only check.  The float path keeps its 1e-15 strict
    margin and is unchanged.

    Runs on SuperstepRunner: durable per-sub-step vertex-state checkpoints
    + mid-algorithm resume + metrics like the other iterative operators
    (north rule).  The even/odd movable half alternates on the GLOBAL
    sub-step index, which the runner preserves across resume.
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    und = _und_simple(ef)
    if integer_gains:
        und = und.withColumn(WEIGHT, F.col(WEIGHT).cast("long"))
    # both directions for gathering, cached pre-partitioned on the gather
    # join key so each sub-step exchanges only the state side (the wcc/lpa
    # superstep-cache convention)
    both = und.unionByName(
        und.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), WEIGHT)
    ).repartition(DST).persist()
    w2 = both.agg(F.sum(WEIGHT)).collect()[0][0]
    if not w2:
        return spark.createDataFrame([], f"{VID} long, {COMM} long")
    m = float(w2) / 2.0  # each edge counted twice in `both`
    DEC = "decimal(38,0)"
    w2_lit = F.lit(int(w2)).cast(DEC) if integer_gains else None

    deg = both.groupBy(F.col(SRC).alias(VID)).agg(F.sum(WEIGHT).alias("ki")).persist()
    state0 = deg.select(VID, F.col(VID).alias(COMM), "ki")

    # Convergence = no move across a window covering BOTH halves (>= 2
    # consecutive sub-steps).  With metric_every=k the moved-count join runs
    # every k-th sub-step against the ANCHOR state from the previous check,
    # so one join covers the whole k-sub-step span (the runner's `old` is
    # only the immediately-previous state, hence the explicit anchor).
    ctx = {"quiet": 0, "anchor": state0, "span": 0}

    def step(state: DataFrame, it: int) -> DataFrame:
        # community total degrees
        sigma = state.groupBy(COMM).agg(F.sum("ki").alias("sigma"))
        # k_i_in per (node, neighbor community)
        kin = (
            both.join(
                state.select(F.col(VID).alias(DST), F.col(COMM).alias("c_nbr")).hint(
                    "shuffle_hash"
                ),
                on=DST,
            )
            .groupBy(F.col(SRC).alias(VID), F.col("c_nbr"))
            .agg(F.sum(WEIGHT).alias("kin"))
        )
        cand = (
            kin.join(state.select(VID, COMM, "ki"), on=VID)
            .join(sigma.select(F.col(COMM).alias("c_nbr"), "sigma"), on="c_nbr")
            .withColumn(
                "sigma_adj",
                F.when(F.col("c_nbr") == F.col(COMM), F.col("sigma") - F.col("ki")).otherwise(
                    F.col("sigma")
                ),
            )
            .withColumn(
                "gain",
                (
                    w2_lit * F.col("kin").cast(DEC)
                    - F.col("ki").cast(DEC) * F.col("sigma_adj").cast(DEC)
                )
                if integer_gains
                else F.col("kin") / F.lit(m)
                - F.col("ki") * F.col("sigma_adj") / F.lit(2.0 * m * m),
            )
        )
        from pyspark.sql import Window

        w = Window.partitionBy(VID).orderBy(F.desc("gain"), F.asc("c_nbr"))
        best = (
            cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(VID, F.col("c_nbr").alias("_best"), F.col("gain").alias("_bg"))
        )
        # TRUE stay gain for EVERY node (not just nodes with a neighbor in
        # their own community): kin_own/m − ki·(σ_own−ki)/(2m²), kin_own
        # defaulting to 0.  A -inf sentinel here would let below-stay moves
        # win and decrease modularity (the reference only moves on positive
        # gain, impl/louvain/Louvain.java:37-200).
        kin_own = cand.filter(F.col("c_nbr") == F.col(COMM)).select(
            VID, F.col("kin").alias("_kin_own")
        )
        if integer_gains:
            stay_expr = w2_lit * F.coalesce(
                F.col("_kin_own"), F.lit(0)
            ).cast(DEC) - F.col("ki").cast(DEC) * (
                F.col("sigma") - F.col("ki")
            ).cast(DEC)
        else:
            stay_expr = (
                F.coalesce(F.col("_kin_own"), F.lit(0.0)) / F.lit(m)
                - F.col("ki") * (F.col("sigma") - F.col("ki")) / F.lit(2.0 * m * m)
            )
        stay = (
            state.join(sigma.select(COMM, "sigma"), on=COMM)
            .join(kin_own, on=VID, how="left")
            .select(VID, stay_expr.alias("_sg"))
        )
        # alternate halves to avoid synchronous oscillation
        movable = (F.col(VID) % 2 == it % 2)
        ctx["span"] += 1
        if integer_gains:
            # pure integer comparison: strict > IS the tie rule (no epsilon)
            move_ok = F.col("_bg") > F.col("_sg")
        else:
            move_ok = F.col("_bg") > F.coalesce(F.col("_sg"), F.lit(-1e18)) + 1e-15
        return (
            state.join(best, on=VID, how="left")
            .join(stay, on=VID, how="left")
            .select(
                VID,
                F.when(
                    movable & F.col("_best").isNotNull() & move_ok,
                    F.col("_best"),
                )
                .otherwise(F.col(COMM))
                .alias(COMM),
                "ki",
            )
        )

    def metric(new: DataFrame, old: DataFrame, it: int) -> float:
        moved = (
            new.alias("n")
            .join(ctx["anchor"].alias("o"), on=VID)
            .filter(F.col(f"n.{COMM}") != F.col(f"o.{COMM}"))
            .count()
        )
        ctx["quiet"] = ctx["quiet"] + ctx["span"] if moved == 0 else 0
        ctx["anchor"] = new
        ctx["span"] = 0
        return float(moved)

    runner = SuperstepRunner(
        spark,
        max_iterations=max_iterations,
        metric=metric,
        # both halves quiesced across clean checks; reads ctx, not the
        # (possibly nan on skipped sub-steps) metric value
        converged=lambda _mv: ctx["quiet"] >= 2,
        checkpoint_dir=checkpoint_dir,
        checkpoint_interval=checkpoint_interval,
        job_group="linkgraph-louvain",
        metric_every=metric_every,
    )
    # On resume the anchor restarts at the initial state (the resumed
    # checkpoint state isn't visible here), so the first check almost
    # certainly counts moves and convergence re-proves itself over >= 2
    # fresh sub-steps — conservative, never early.
    state = runner.run(state0, step, resume=resume).state

    # canonicalize community ids to min member id
    canon = state.groupBy(COMM).agg(F.min(VID).alias("_c"))
    out = state.join(canon, on=COMM).select(VID, F.col("_c").alias(COMM))
    both.unpersist()
    deg.unpersist()
    return out


def conductance_df(
    spark: SparkSession, edges: EdgeFrame | DataFrame, assignment: DataFrame
) -> DataFrame:
    """[community, internal_w, cut_w, conductance] for a [vid, community]
    assignment (the gds.conductance analogue): conductance(C) =
    cut(C) / vol(C) with vol(C) = 2·internal(C) + cut(C), over the
    canonical undirected weighted graph — 0 for isolated communities.

    Scale shape: two hash joins of the edge table against the (hinted)
    assignment projection and one map-side-combined aggregation per term —
    the same plan skeleton as `modularity_df`.

    Determinism note: the weight sums are IEEE doubles, exact (and so
    shard-order-independent) whenever weights are integer-valued — true of
    every engine-derived graph (co-order/co-commit counts).  For fractional
    user weights the 6dp rounding can sit within float-sum noise of a
    boundary; integer-scale the weight column first if you need exact
    cross-engine parity there (see pipeline/events.py for the pattern).
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    und = _und_simple(ef)
    a = assignment.select(F.col(VID), F.col(COMM))
    e_comm = und.join(
        a.select(F.col(VID).alias(SRC), F.col(COMM).alias("c_src")).hint(
            "shuffle_hash"
        ),
        on=SRC,
    ).join(
        a.select(F.col(VID).alias(DST), F.col(COMM).alias("c_dst")).hint(
            "shuffle_hash"
        ),
        on=DST,
    )
    internal = (
        e_comm.filter(F.col("c_src") == F.col("c_dst"))
        .groupBy(F.col("c_src").alias(COMM))
        .agg(F.sum(WEIGHT).alias("internal_w"))
    )
    # a cut edge contributes to BOTH endpoint communities
    cut = (
        e_comm.filter(F.col("c_src") != F.col("c_dst"))
        .select(F.col("c_src").alias(COMM), WEIGHT)
        .unionByName(
            e_comm.filter(F.col("c_src") != F.col("c_dst")).select(
                F.col("c_dst").alias(COMM), WEIGHT
            )
        )
        .groupBy(COMM)
        .agg(F.sum(WEIGHT).alias("cut_w"))
    )
    comms = assignment.select(COMM).distinct()
    out = (
        comms.join(internal, on=COMM, how="left")
        .join(cut, on=COMM, how="left")
        .select(
            COMM,
            F.coalesce("internal_w", F.lit(0.0)).alias("internal_w"),
            F.coalesce("cut_w", F.lit(0.0)).alias("cut_w"),
        )
    )
    vol = 2.0 * F.col("internal_w") + F.col("cut_w")
    return out.select(
        COMM,
        F.round("internal_w", 6).alias("internal_w"),
        F.round("cut_w", 6).alias("cut_w"),
        F.round(
            F.when(vol > 0, F.col("cut_w") / vol).otherwise(F.lit(0.0)), 6
        ).alias("conductance"),
    )
