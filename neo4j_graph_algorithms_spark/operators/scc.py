"""Strongly connected components (algo.scc family).

The reference ships Tarjan variants plus MultiStep (trim + FW-BW +
coloring) — StronglyConnectedComponentsProc.java:67-384,
impl/multistepscc/*.java.  Tarjan's stack DFS is inherently sequential, so
the Spark-native formulation is the reference's *own* parallel route, the
coloring algorithm (impl/multistepscc/MultiStepColoring.java semantics):

  repeat until no unassigned vertices:
    1. trim: peel size-1 SCCs (vertices with no in- or out-edges among the
       unassigned) — MultiStepTrim.java semantics;
    2. color fixpoint: color(v) = max vid that can reach v — forward
       max-propagation accelerated with POINTER JUMPING (compose the color
       mapping through itself each round → O(log n) rounds instead of
       O(diameter); same device as operators/wcc.py), monotone-checksum
       convergence (one aggregate per round, no state self-join);
    3. backward reachability: bcolor(v) = max same-colored vid v can REACH,
       by max-propagation over reversed same-color edges, also pointer-
       jumped; v belongs to SCC(c) iff color(v)=c ∧ bcolor(v)=c
       (c reaches v and v reaches c — the FW∩BW intersection of
       ForwardBackwardScc.java as two O(log n) fixpoints);
    4. assign comp = c (canonicalized afterwards to min member id), remove,
       repeat on the rest.

The reference's MultiStep design switches algorithms when the remainder is
small (MultistepSCC.java sequential fallback); we do the same: once the
unassigned set fits `tarjan_cutoff`, the remainder is collected and finished
with iterative Tarjan driver-side.  This bounds the outer loop on
pathological deep DAG chains (each coloring round only peels the per-class
root SCCs, so a descending path would otherwise need O(n) outer rounds).

Component ids are canonicalized to MIN member id (same convention as WCC;
the reference asserts partition structure only, SCCTest/MultistepSCCProcTest).

Scale notes: every fixpoint is join+groupBy on (vid), hash-partitioned; no
global windows; both inner fixpoints are O(log n) rounds; the driver-side
finisher touches at most `tarjan_cutoff` vertices and their edges.
"""

from __future__ import annotations

import json
import os
import time
import warnings

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame
from neo4j_graph_algorithms_spark.plans.runtime import SuperstepRunner

COMP = "comp"


def _checksum(df: DataFrame, col: str) -> int:
    """Exact monotone convergence checksum: Σ col as decimal(38,0)
    (64-bit ids would overflow a long sum)."""
    row = df.agg(F.sum(F.col(col).cast("decimal(38,0)")).alias("s")).collect()[0]
    return int(row["s"] or 0)


def _rand_val(col) -> F.Column:
    """Random-ordered, collision-free propagation value: struct(xxhash64(vid),
    vid), compared lexicographically.  Pointer jumping accelerates
    max-propagation only when value order is uncorrelated with graph
    structure — an ascending-id cycle degenerates to O(n) rounds with raw
    vids; the hash front randomizes the order (expected O(log n)), and the
    vid tiebreak keeps values unique (a plain 64-bit hash could collide and
    merge two classes).  xorshift-style scrambling does NOT work here: it is
    GF(2)-linear, so sequential ids stay order-correlated."""
    c = F.col(col) if isinstance(col, str) else col
    return F.struct(F.xxhash64(c).alias("h"), c.alias("v"))


def _tarjan(vids: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    """Iterative Tarjan over the collected remainder; comp = min member id.
    Driver-side finisher for ≤ tarjan_cutoff vertices (the analogue of the
    reference's sequential fallback inside MultistepSCC.java)."""
    adj: dict[int, list[int]] = {v: [] for v in vids}
    for s, d in edges:
        adj[s].append(d)
    index: dict[int, int] = {}
    lowlink: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    comp: dict[int, int] = {}
    counter = 0
    for root in vids:
        if root in index:
            continue
        # explicit DFS stack of (vertex, iterator position)
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = lowlink[v] = counter
                counter += 1
                stack.append(v)
                on_stack.add(v)
            advanced = False
            nbrs = adj[v]
            while pi < len(nbrs):
                w = nbrs[pi]
                pi += 1
                if w not in index:
                    work[-1] = (v, pi)
                    work.append((w, 0))
                    advanced = True
                    break
                if w in on_stack:
                    lowlink[v] = min(lowlink[v], index[w])
            if advanced:
                continue
            work.pop()
            if lowlink[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                c = min(members)
                for w in members:
                    comp[w] = c
            if work:
                parent = work[-1][0]
                lowlink[parent] = min(lowlink[parent], lowlink[v])
    return comp


def _max_fixpoint(
    spark: SparkSession,
    state: DataFrame,
    push_edges: DataFrame,
    value_col: str,
    max_rounds: int,
    group_cols: list[str] | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
) -> tuple[DataFrame, bool, int]:
    """Generic max-propagation fixpoint with pointer jumping, run on
    SuperstepRunner (durable per-round checkpoints + resume + metrics, the
    same contract as pagerank/wcc/sssp supersteps).

    state: [vid, *group_cols, value_col]; values are `_rand_val` structs
    (h, v) with v a vid present in state — the jump mapping is keyed on the
    v field.  push_edges: [src, dst, *group_cols] — value flows src → dst.
    Convergence via monotone checksums: values only increase
    lexicographically, so (Σh, Σv) is stationary exactly at the fixpoint
    (h never decreases per-row; with all h unchanged, v never decreases).
    Returns (state, converged, rounds).
    """
    gcols = group_cols or []

    def step(st: DataFrame, i: int) -> DataFrame:
        pushed = push_edges.join(
            st.withColumnRenamed(VID, SRC), on=[SRC, *gcols]
        ).select(F.col(DST).alias(VID), *gcols, value_col)
        hop = (
            st.select(VID, *gcols, value_col)
            .unionByName(pushed)
            .groupBy(VID, *gcols)
            .agg(F.max(value_col).alias(value_col))
        )
        # shuffle_hash: |V|-sized jump mapping — stats-independent plan,
        # same convention as operators/wcc.py
        mapping = hop.select(
            F.col(VID).alias("_m_vid"), F.col(value_col).alias("_m_val")
        ).hint("shuffle_hash")
        return hop.join(mapping, hop[value_col]["v"] == F.col("_m_vid"), "left").select(
            VID,
            *gcols,
            F.greatest(F.coalesce("_m_val", value_col), F.col(value_col)).alias(
                value_col
            ),
        )

    prev: dict = {}

    def metric(new: DataFrame, old: DataFrame, i: int) -> float:
        row = new.agg(
            F.sum(F.col(value_col)["h"].cast("decimal(38,0)")).alias("sh"),
            F.sum(F.col(value_col)["v"].cast("decimal(38,0)")).alias("sv"),
        ).collect()[0]
        s = (int(row["sh"] or 0), int(row["sv"] or 0))
        changed = prev.get("s") != s
        prev["s"] = s
        return 1.0 if changed else 0.0

    runner = SuperstepRunner(
        spark,
        max_iterations=max_rounds,
        metric=metric,
        converged=lambda m: m == 0.0,
        checkpoint_dir=checkpoint_dir,
        checkpoint_interval=checkpoint_interval,
        job_group="linkgraph-scc-fixpoint",
    )
    res = runner.run(state, step, resume=resume)
    return res.state, res.converged, res.iterations


def _latest_outer_round(checkpoint_dir: str) -> int | None:
    """Newest committed outer round: a round is committed once its
    `remaining/round=<k>` parquet carries _SUCCESS (written AFTER the
    round's `assigned/round=<k>`, so assigned for all k' ≤ k is durable)."""
    root = os.path.join(checkpoint_dir, "remaining")
    if not os.path.isdir(root):
        return None
    rounds = [
        int(name.split("=", 1)[1])
        for name in os.listdir(root)
        if name.startswith("round=")
        and os.path.exists(os.path.join(root, name, "_SUCCESS"))
    ]
    return max(rounds) if rounds else None


def scc(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    vertices: DataFrame | None = None,
    max_outer: int = 50,
    max_color_rounds: int = 200,
    tarjan_cutoff: int = 10_000,
    metrics: dict | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_interval: int = 5,
    resume: bool = False,
) -> DataFrame:
    """[vid, comp] with comp = min member id of the strongly connected
    component.  Directed edges; parallel edges/self-loops tolerated.

    `tarjan_cutoff`: once ≤ this many vertices remain unassigned, finish
    driver-side with iterative Tarjan (0 disables the fallback).
    `metrics`: optional dict filled with {'outer_rounds', 'color_rounds',
    'bcolor_rounds', 'tarjan_vertices'} for observability/testing.

    Durable checkpoints (north rule: runs resume mid-algorithm): with
    `checkpoint_dir` set, each completed outer round commits the newly
    assigned components to `<dir>/assigned/round=<k>` and the unassigned
    set to `<dir>/remaining/round=<k>` (commit marker = the remaining
    write's _SUCCESS), appending a convergence-metrics row to
    `<dir>/outer_metrics.jsonl`; the color/bcolor fixpoints additionally
    run on SuperstepRunner with per-superstep durable state under
    `<dir>/fix/round=<k>/{color,bcolor}`.  `resume=True` restarts after
    the newest committed round (and mid-fixpoint inside the first
    uncommitted one).  Use a fresh dir for non-resume runs.
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    e = ef.df.select(SRC, DST).filter(F.col(SRC) != F.col(DST)).distinct()
    e.persist()

    mx: dict = metrics if metrics is not None else {}
    mx.update(outer_rounds=0, color_rounds=[], bcolor_rounds=[], tarjan_vertices=0)

    def _assigned_path(k: int) -> str:
        return os.path.join(checkpoint_dir, "assigned", f"round={k}")

    def _remaining_path(k: int) -> str:
        return os.path.join(checkpoint_dir, "remaining", f"round={k}")

    def _commit_round(k: int, round_assigned: DataFrame, rem: DataFrame, n_rem: int) -> None:
        if not checkpoint_dir:
            return
        round_assigned.write.mode("overwrite").parquet(_assigned_path(k))
        rem.write.mode("overwrite").parquet(_remaining_path(k))
        row = {
            "round": k,
            "remaining": n_rem,
            "color_rounds": mx["color_rounds"][-1] if mx["color_rounds"] else None,
            "bcolor_rounds": mx["bcolor_rounds"][-1] if mx["bcolor_rounds"] else None,
            "ts": time.time(),
        }
        with open(os.path.join(checkpoint_dir, "outer_metrics.jsonl"), "a") as fh:
            fh.write(json.dumps(row) + "\n")

    # vertices come from the UNFILTERED edge set: a vertex with only a
    # self-loop is still a (singleton) SCC
    verts = vertices.select(VID) if vertices is not None else ef.vertices()
    remaining = verts.localCheckpoint(eager=True)
    assigned_parts: list[DataFrame] = []
    start_round = 0
    if checkpoint_dir and resume:
        latest = _latest_outer_round(checkpoint_dir)
        if latest is not None:
            remaining = spark.read.parquet(_remaining_path(latest)).localCheckpoint(
                eager=True
            )
            for k in range(latest + 1):
                assigned_parts.append(spark.read.parquet(_assigned_path(k)))
            start_round = latest + 1
            mx["resumed_round"] = latest
    exhausted = True

    for outer_k in range(start_round, max_outer):
        n_remaining = remaining.count()
        if n_remaining == 0:
            break
        if tarjan_cutoff and n_remaining <= tarjan_cutoff:
            # sequential fallback on the small remainder (MultistepSCC.java's
            # own design: switch algorithms when the frontier gets small).
            # The vertex count is bounded by the cutoff but the EDGE count is
            # not (a dense 10k remainder can hold ~10^8 edges): cap the
            # collect at 20x cutoff edges and stay distributed above it.
            er_small = (
                e.join(remaining.withColumnRenamed(VID, SRC), on=SRC, how="left_semi")
                .join(remaining.withColumnRenamed(VID, DST), on=DST, how="left_semi")
            )
            edge_cap = 20 * tarjan_cutoff
            n_edges_small = er_small.limit(edge_cap + 1).count()
            if n_edges_small > edge_cap:
                warnings.warn(
                    f"scc: Tarjan remainder has >{edge_cap} edges "
                    f"({n_remaining} vertices); staying on the distributed path",
                    RuntimeWarning,
                )
            else:
                mx["tarjan_vertices"] = n_remaining
                vids = [r[VID] for r in remaining.collect()]
                elist = [(r[SRC], r[DST]) for r in er_small.collect()]
                comp_map = _tarjan(vids, elist)
                assigned_parts.append(
                    spark.createDataFrame(
                        [(v, c) for v, c in comp_map.items()],
                        f"{VID} long, {COMP} long",
                    )
                )
                remaining = spark.createDataFrame([], f"{VID} long")
                break
        mx["outer_rounds"] += 1
        # edges among remaining vertices only
        er = (
            e.join(remaining.withColumnRenamed(VID, SRC), on=SRC, how="left_semi")
            .join(remaining.withColumnRenamed(VID, DST), on=DST, how="left_semi")
            .localCheckpoint(eager=True)
        )
        # 1. trim: no out-edges or no in-edges → singleton SCC
        srcs = er.select(F.col(SRC).alias(VID)).distinct()
        dsts = er.select(F.col(DST).alias(VID)).distinct()
        core = remaining.join(srcs, on=VID, how="left_semi").join(
            dsts, on=VID, how="left_semi"
        )
        # comp values are always MEMBER vids of their own class (trimmed
        # singleton: itself; colored SCC: its root; Tarjan: min member) —
        # classes are disjoint vertex sets, so comp values never collide
        trimmed = remaining.join(core, on=VID, how="left_anti")
        trimmed_assigned = trimmed.select(VID, F.col(VID).alias(COMP))
        assigned_parts.append(trimmed_assigned)
        if core.isEmpty():
            remaining = core
            _commit_round(outer_k, trimmed_assigned, remaining, 0)
            break
        core = core.localCheckpoint(eager=True)
        ec = (
            er.join(core.withColumnRenamed(VID, SRC), on=SRC, how="left_semi")
            .join(core.withColumnRenamed(VID, DST), on=DST, how="left_semi")
            .localCheckpoint(eager=True)
        )

        # 2. color fixpoint: color(v) = hash-max vertex that can reach v.
        #    Jump soundness: color(v)=(h(u),u) means u ⤳ v, and
        #    color(u) ⤳ u ⤳ v, so color(color(v)) is a valid (≥) color.
        color0 = core.select(VID, _rand_val(VID).alias("color"))
        fix_dir = (
            os.path.join(checkpoint_dir, "fix", f"round={outer_k}")
            if checkpoint_dir
            else None
        )
        colorst, ok, rounds = _max_fixpoint(
            spark,
            color0,
            ec,
            "color",
            max_color_rounds,
            checkpoint_dir=os.path.join(fix_dir, "color") if fix_dir else None,
            checkpoint_interval=checkpoint_interval,
            resume=resume and outer_k == start_round,
        )
        # flatten to the root vid: unique per class (vid tiebreak in the
        # struct), so the class id IS a member vertex
        color = colorst.select(VID, F.col("color")["v"].alias("color"))
        mx["color_rounds"].append(rounds)
        if not ok:
            warnings.warn(
                f"scc: color fixpoint hit max_color_rounds={max_color_rounds} "
                "without converging; results may be incomplete",
                RuntimeWarning,
            )

        # 3. backward reachability within each color class: bcolor(v) = the
        #    hash-max same-colored vertex v can REACH (max-propagation over
        #    REVERSED same-color edges, pointer-jumped).  The root r of a
        #    class is its hash-max member (color(w) ≥ (h(w),w) for members),
        #    so v ∈ SCC(r) iff color(v)=r ∧ bcolor(v)=r: r reaches v
        #    (step 2) and v reaches r.  The fixpoint runs UNGROUPED: the
        #    edge table is already restricted to same-class edges, so both
        #    the hop and the jump stay inside the class by construction —
        #    no class key in the join.
        edge_col = (
            ec.join(
                color.withColumnRenamed(VID, SRC).withColumnRenamed("color", "c_src"),
                on=SRC,
            )
            .join(
                color.withColumnRenamed(VID, DST).withColumnRenamed("color", "c_dst"),
                on=DST,
            )
            .filter(F.col("c_src") == F.col("c_dst"))
            .select(SRC, DST)
            .localCheckpoint(eager=True)
        )
        rev = edge_col.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
        b0 = color.select(VID, _rand_val(VID).alias("bcolor"))
        bstate_st, ok_b, rounds_b = _max_fixpoint(
            spark,
            b0,
            rev,
            "bcolor",
            max_color_rounds,
            checkpoint_dir=os.path.join(fix_dir, "bcolor") if fix_dir else None,
            checkpoint_interval=checkpoint_interval,
            resume=resume and outer_k == start_round,
        )
        bstate = bstate_st.select(VID, F.col("bcolor")["v"].alias("bcolor")).join(
            color, on=VID
        )
        mx["bcolor_rounds"].append(rounds_b)
        if not ok_b:
            warnings.warn(
                f"scc: backward fixpoint hit max_color_rounds={max_color_rounds} "
                "without converging; results may be incomplete",
                RuntimeWarning,
            )
        in_scc = bstate.filter(F.col("bcolor") == F.col("color")).select(
            VID, "color"
        ).localCheckpoint(eager=True)
        scc_assigned = in_scc.select(VID, F.col("color").alias(COMP))
        assigned_parts.append(scc_assigned)
        remaining = core.join(in_scc, on=VID, how="left_anti").localCheckpoint(eager=True)
        _commit_round(
            outer_k,
            trimmed_assigned.unionByName(scc_assigned),
            remaining,
            remaining.count() if checkpoint_dir else -1,
        )
    else:
        exhausted = False

    if not exhausted and not remaining.isEmpty():
        warnings.warn(
            f"scc: outer loop hit max_outer={max_outer} with unassigned "
            "vertices remaining; output is incomplete",
            RuntimeWarning,
        )

    if not assigned_parts:
        e.unpersist()
        return spark.createDataFrame([], f"{VID} long, {COMP} long")
    out = assigned_parts[0]
    for p in assigned_parts[1:]:
        out = out.unionByName(p)
    # canonicalize comp ids to min member id
    canon = out.groupBy(COMP).agg(F.min(VID).alias("_min"))
    res = out.join(canon, on=COMP).select(VID, F.col("_min").alias(COMP))
    e.unpersist()
    return res


def scc_stats(components: DataFrame) -> DataFrame:
    """setCount / maxSetSize / minSetSize (MultistepSCCProcTest YIELD)."""
    sizes = components.groupBy(COMP).agg(F.count("*").alias("size"))
    return sizes.agg(
        F.count("*").alias("set_count"),
        F.min("size").alias("min_set_size"),
        F.max("size").alias("max_set_size"),
    )
