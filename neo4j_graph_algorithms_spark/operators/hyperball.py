"""HyperBall — HyperLogLog neighborhood-size sketches (Boldi & Vigna,
"In-Core Computation of Geometric Centralities with HyperBall", 2013).

The web-scale answer to exact closeness: |ball(v, t)| for every vertex at
once, in t supersteps over the edge table, with an m-register HLL sketch
per vertex instead of a bitset per (source, vertex) pair.  Exact MS-BFS
closeness (operators/msbfs.py) is O(|V|·|E|) work; HyperBall is
O(t·|E|·m) with ~1.04/√m relative error — the only option at 10^12 edges,
which is why it complements (not replaces) the exact family.

Not in the reference catalogue (its closeness is exact MS-BFS,
/root/reference/algo/src/main/java/org/neo4j/graphalgo/impl/msbfs/).

Determinism (the oracle contract): register values derive from UNIVERSAL
integer hashes of the vertex id (same family as pipeline/text.py), not a
seeded RNG — bucket = h1(v) mod m, rho = leading-zero rank of h2(v) in a
w-bit window — so any engine reproduces the identical sketch and the
DuckDB twin checks values exactly (the ESTIMATE is approximate w.r.t. the
true ball size; the computation is bit-deterministic).

State layout: sparse (vid, bucket, reg) rows — absent rows are implicit
zero registers, merge is a plain groupBy-max, everything stays in
whole-stage codegen.  |state| ≤ m·|V| rows; a packed-array Tier B variant
would trade m× fewer rows for a pandas kernel, the same trade csr/ makes.

Superstep (identical shape to WCC's min-propagation, max instead of min):
    msgs   = state ⋈ edges on vid==src → (dst, bucket, reg)
    state' = (state ∪ msgs).groupBy(vid, bucket).max(reg)
Convergence is monotone (registers only grow), so the cheap checksum
aggregate Σreg doubles as an exact fixpoint test — the same device WCC
uses instead of a state-vs-state join.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame
from neo4j_graph_algorithms_spark.plans.runtime import SuperstepResult, SuperstepRunner

HB_P = 1_000_003  # universal-hash modulus (pipeline/text.py family)
A1, B1 = 2_654_435_761 % HB_P, 17
A2, B2 = 40_503, 8_191
RHO_W = 16  # leading-zero window width: rho in [1, 17]


def hll_alpha(m: int) -> float:
    """Standard HLL bias constant."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _h(col: Column, a: int, b: int) -> Column:
    """Universal hash in [0, HB_P); mod-P-reduced operands (no overflow,
    non-negative for xxhash64-style id spaces)."""
    return F.pmod(F.pmod(col, F.lit(HB_P)) * a + b, F.lit(HB_P))


def _rho(z: Column) -> Column:
    """Leading-zero rank of z in a RHO_W-bit window: RHO_W+1 when z = 0,
    else RHO_W − bitlength(z) + 1.  Integer CASE chain — no float log2
    (whose precision at exact powers of two differs across engines)."""
    expr = F.lit(RHO_W + 1)
    # descending thresholds: z >= 2^(k-1) ⇒ bitlength k ⇒ rho = RHO_W-k+1
    for k in range(1, RHO_W + 1):
        expr = F.when(z >= 2 ** (k - 1), F.lit(RHO_W - k + 1)).otherwise(expr)
    return expr



def _direction_edges(ef: EdgeFrame, direction: str, both: bool = False) -> DataFrame:
    """Distinct [_from, _to] register-flow edges, pre-partitioned on the
    gather key (registers flow FROM the pointed-to vertex TO the pointer —
    ball(v) pulls neighbor sketches).  Shared by hyperball /
    hyperball_harmonic / effective_diameter so the direction semantics and
    cache convention live in one place."""
    if direction == "OUTGOING":
        e = ef.df.select(F.col(DST).alias("_from"), F.col(SRC).alias("_to"))
    elif direction == "INCOMING":
        e = ef.df.select(F.col(SRC).alias("_from"), F.col(DST).alias("_to"))
    elif both and direction == "BOTH":
        e = ef.df.select(F.col(DST).alias("_from"), F.col(SRC).alias("_to")).unionByName(
            ef.df.select(F.col(SRC).alias("_from"), F.col(DST).alias("_to"))
        )
    else:
        raise ValueError(f"unknown direction {direction!r}")
    e = e.select("_from", "_to").distinct().repartition("_from").persist()
    e.count()
    return e


def _init_registers(verts: DataFrame, m: int) -> DataFrame:
    """[vid, bucket, reg] round-0 HLL registers."""
    return verts.select(
        VID,
        F.pmod(_h(F.col(VID), A1, B1), F.lit(m)).alias("bucket"),
        _rho(F.pmod(_h(F.col(VID), A2, B2), F.lit(2**RHO_W))).alias("reg"),
    )


def _advance(state: DataFrame, e: DataFrame) -> DataFrame:
    """One register-propagation superstep (join + union + groupBy-max);
    the shuffle_hash hint keeps the |V|-sized state off the broadcast path
    (repo superstep convention, pinned by tests/test_superstep_plans.py)."""
    msgs = (
        state.hint("shuffle_hash")
        .join(e, state[VID] == e["_from"], "inner")
        .select(F.col("_to").alias(VID), "bucket", "reg")
    )
    return state.unionByName(msgs).groupBy(VID, "bucket").agg(F.max("reg").alias("reg"))


def hyperball(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    radius: int = 3,
    m: int = 16,
    vertices: DataFrame | None = None,
    direction: str = "OUTGOING",
) -> SuperstepResult:
    """Sparse HLL register state [vid, bucket, reg] of ball(v, radius).

    `direction`: OUTGOING follows src→dst (out-balls), INCOMING reverses,
    BOTH unions — matching the loader's direction conventions.  Use
    `hyperball_estimates` to turn the register state into per-vertex
    cardinality estimates.
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    e = _direction_edges(ef, direction, both=True)

    verts = vertices.select(VID) if vertices is not None else ef.vertices()
    state0 = _init_registers(verts, m)

    def step(state: DataFrame, i: int) -> DataFrame:
        return _advance(state, e)

    def metric(new: DataFrame, old: DataFrame, i: int) -> float:
        # registers are monotone non-decreasing: the scalar Σreg+count is a
        # sound exact fixpoint witness (same checksum device as WCC)
        row = new.agg(
            (F.sum("reg") + F.count("*")).alias("s")
        ).collect()[0]
        return float(row["s"] or 0.0)

    last = {"v": None}

    def converged(s: float) -> bool:
        done = last["v"] is not None and s == last["v"]
        last["v"] = s
        return done

    runner = SuperstepRunner(
        spark,
        max_iterations=radius,
        metric=metric,
        converged=converged,
        job_group="linkgraph-hyperball",
    )
    result = runner.run(state0, step)
    e.unpersist()
    return result


def hyperball_estimates(state: DataFrame, m: int = 16) -> DataFrame:
    """[vid, est] HLL cardinality estimates from sparse register state.

    Raw estimate alpha·m²/Σ2^−M_j with the standard linear-counting
    small-range correction (est ≤ 2.5m and empty registers present →
    m·ln(m/zeros)); rounded to 6 decimals."""
    alpha = hll_alpha(m)
    agg = state.groupBy(VID).agg(
        F.count("*").alias("_nnz"),
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("_sp"),
    )
    denom = (F.lit(float(m)) - F.col("_nnz")) + F.col("_sp")
    raw = F.lit(alpha * m * m) / denom
    zeros = F.lit(m) - F.col("_nnz")
    corrected = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(VID, F.round(corrected, 6).alias("est"))


def hyperball_harmonic(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    radius: int = 8,
    m: int = 64,
    direction: str = "INCOMING",
) -> DataFrame:
    """[vid, approx_harmonic, harmonic_q6] — the HyperBall paper's headline
    output: harmonic centrality  Σ_{u≠v} 1/d(u,v)  estimated as
    Σ_t (|ball(t)| − |ball(t−1)|)/t  from the per-radius sketch growth.

    One incremental sketch pass (radius supersteps total — NOT one run per
    radius): after each superstep the per-vertex estimate is re-read from
    the live register state and the discounted growth accumulates.
    INCOMING balls (who reaches v) give the usual centrality reading.
    Approximate w.r.t. TRUE harmonic (HLL error, pytest-checked on
    fixtures), but the COMPUTATION is bit-deterministic and oracle-gated:
    the discounted-growth chain divides by t = 2, 3, ... which lands
    exactly on 6dp midpoints where Spark's and DuckDB's round(double, 6)
    disagree, so the accumulation runs on the INTEGER grid — per-round
    estimates quantized to E = ⌊est·10⁶ + ½⌋ (est is already 6dp-rounded,
    so est·10⁶ sits next to an integer, never near a midpoint), growth
    summed as S = Σ_t max(E_t − E_{t−1}, 0)·(L/t) with L = lcm(1..radius),
    and harmonic_q6 = (2S + L) div 2L — the exact half-up value of S/L,
    pure int64 arithmetic on both engines (exact while est < 2^53/10⁶ ≈
    9·10⁹, far beyond any gate scale; the double view is unaffected)."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    e = _direction_edges(ef, direction)

    L = math.lcm(*range(1, radius + 1))

    def q6(est_df: DataFrame, alias: str) -> DataFrame:
        # est is round(x, 6) ≥ 0: est·10⁶ sits within 1 ulp of an integer,
        # so +0.5-floor never sees a midpoint — robust integer quantization
        return est_df.select(
            VID, F.floor(F.col("est") * F.lit(1e6) + F.lit(0.5)).cast("long").alias(alias)
        )

    verts = ef.vertices()
    state = _init_registers(verts, m).localCheckpoint(eager=True)
    prev = q6(hyperball_estimates(state, m), "_e0")
    acc = verts.select(VID, F.lit(0).cast("long").alias("_s"))
    for t in range(1, radius + 1):
        state = _advance(state, e).localCheckpoint(eager=True)
        cur = q6(hyperball_estimates(state, m), "_e1")
        acc = (
            acc.join(prev, on=VID)
            .join(cur, on=VID)
            .select(
                VID,
                (
                    F.col("_s")
                    + F.greatest(F.col("_e1") - F.col("_e0"), F.lit(0).cast("long"))
                    * F.lit(L // t)
                ).alias("_s"),
            )
            .localCheckpoint(eager=True)
        )
        prev = cur.select(VID, F.col("_e1").alias("_e0"))
    e.unpersist()
    return acc.select(
        VID,
        F.expr(f"(_s * 2 + {L}) div {2 * L}").alias("harmonic_q6"),
    ).select(
        VID,
        (F.col("harmonic_q6") / F.lit(1e6)).alias("approx_harmonic"),
        "harmonic_q6",
    )


def effective_diameter(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    fraction: tuple[int, int] = (9, 10),
    max_radius: int = 8,
    m: int = 16,
    direction: str = "OUTGOING",
) -> DataFrame:
    """[effective_diameter, ball_sum_q] — the HyperANF paper's headline
    whole-graph statistic (Boldi/Rosa/Vigna, WWW'11; the reference has no
    diameter procedure — this is the approximate path a 10^12-edge graph
    actually runs): the smallest radius t whose total reachable-ball mass
    Σ_v |ball_t(v)| covers `fraction` of the mass at `max_radius`.

    Same incremental register chain as `hyperball_harmonic` — ONE sketch
    pass of `max_radius` supersteps, with a per-round SCALAR collect (one
    int64 per round, never a |V|-sized collect).  Cross-engine exactness:
    per-round per-vertex estimates are 6dp-rounded then quantized to the
    ×10⁶ integer grid (the q6 trick), the per-round totals are exact int64
    sums, and the fraction test is the pure-integer comparison
    total_t · den ≥ num · total_R — nothing for two engines to round
    differently.  `fraction` is an exact rational (num, den).
    """
    num, den = fraction
    if not (0 < num <= den):
        raise ValueError(f"fraction must be a rational in (0, 1]: {fraction}")
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    e = _direction_edges(ef, direction)

    def round_stats(state: DataFrame) -> tuple[int, int]:
        """(quantized ball-mass total, register checksum) — the checksum
        (Σreg + count over monotone registers) is the exact fixpoint
        witness hyperball() uses, so the loop stops as soon as the sketch
        converges instead of burning the remaining supersteps; totals are
        padded with the final value (once registers are fixed, every later
        round's total is identical by construction)."""
        est = hyperball_estimates(state, m)
        row = est.agg(
            F.sum(
                F.floor(F.col("est") * F.lit(1e6) + F.lit(0.5)).cast("long")
            ).alias("t")
        ).collect()[0]
        chk = state.agg((F.sum("reg") + F.count("*")).alias("s")).collect()[0]
        return int(row["t"] or 0), int(chk["s"] or 0)

    verts = ef.vertices()
    state = _init_registers(verts, m).localCheckpoint(eager=True)
    t0, chk_prev = round_stats(state)
    totals = [t0]
    for _t in range(1, max_radius + 1):
        state = _advance(state, e).localCheckpoint(eager=True)
        tq, chk = round_stats(state)
        totals.append(tq)
        if chk == chk_prev:  # sketch fixpoint: pad and stop early
            totals.extend([tq] * (max_radius - _t))
            break
        chk_prev = chk
    e.unpersist()
    final = totals[-1]
    eff = next(r for r, t in enumerate(totals) if t * den >= num * final)
    return spark.createDataFrame(
        [(eff, final)], "effective_diameter int, ball_sum_q long"
    )
