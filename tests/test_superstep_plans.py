"""Plan-shape assertions for superstep operators.

The convention (CLAUDE.md / BENCH/BASELINE.md): vertex state must NEVER be
broadcast inside a superstep join — Catalyst's BroadcastHashJoin builds the
hash relation serially on the driver every superstep, which caps cluster
scaling.  All operators place a `shuffle_hash` hint on a PROJECTION of the
state side (small side = build side); APSP hints the cached edge side
because hinting its checkpointed (source, vid)-keyed frontier trips a
Spark 4.1 Catalyst NoSuchElementException (operators/paths.py:274-277).

These tests pin the convention via SuperstepResult.first_plan — the first
superstep's physical plan, captured before lineage truncation.
"""

from __future__ import annotations

from neo4j_graph_algorithms_spark.operators.lpa import lpa
from neo4j_graph_algorithms_spark.operators.pagerank import pagerank
from neo4j_graph_algorithms_spark.operators.wcc import wcc
from tests.conftest import edge_df

_PAIRS = [(i, (i + 1) % 12) for i in range(12)] + [(0, 5), (3, 9)]


def _assert_no_state_broadcast(plan: str) -> None:
    assert plan is not None
    # the physical plan (with the hint honored) must use shuffle-based
    # joins for the state; a BroadcastHashJoin here means the hint regressed
    assert "BroadcastHashJoin" not in plan, plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan, plan


def test_wcc_superstep_never_broadcasts_state(spark):
    res = wcc(spark, edge_df(spark, _PAIRS), max_iterations=2)
    _assert_no_state_broadcast(res.first_plan)


def test_lpa_superstep_never_broadcasts_state(spark):
    res = lpa(spark, edge_df(spark, _PAIRS), max_iterations=2)
    _assert_no_state_broadcast(res.first_plan)


def test_pagerank_superstep_never_broadcasts_state(spark):
    res = pagerank(spark, edge_df(spark, _PAIRS), max_iterations=2)
    _assert_no_state_broadcast(res.first_plan)


def _capture_result(monkeypatch):
    """Capture the SuperstepResult of operators that return a bare DataFrame
    (sssp/delta_stepping) so first_plan can be asserted."""
    from neo4j_graph_algorithms_spark.plans import runtime

    captured = {}
    orig = runtime.SuperstepRunner.run

    def capturing(self, initial_state, step, resume=False):
        res = orig(self, initial_state, step, resume=resume)
        captured["res"] = res
        return res

    monkeypatch.setattr(runtime.SuperstepRunner, "run", capturing)
    return captured


def test_sssp_superstep_never_broadcasts_state(spark, monkeypatch):
    from neo4j_graph_algorithms_spark.operators.paths import sssp

    captured = _capture_result(monkeypatch)
    sssp(spark, edge_df(spark, _PAIRS), source=0, max_iterations=2)
    _assert_no_state_broadcast(captured["res"].first_plan)


def test_delta_stepping_superstep_never_broadcasts_state(spark, monkeypatch):
    """The flattened bucket loop broadcasts its 1-row bucket-cursor
    aggregate (a scalar — that IS the right plan) but never the |V| state:
    every BroadcastExchange must be fed by the cursor's single-partition
    aggregate, and the edge⋈frontier join must stay a ShuffledHashJoin."""
    from neo4j_graph_algorithms_spark.operators.paths import delta_stepping

    captured = _capture_result(monkeypatch)
    delta_stepping(spark, edge_df(spark, _PAIRS), source=0, delta=2.0, max_iterations=2)
    plan = captured["res"].first_plan
    assert plan is not None and "ShuffledHashJoin" in plan, plan
    lines = plan.splitlines()
    for n, line in enumerate(lines):
        if "BroadcastExchange" in line:
            below = "\n".join(lines[n : n + 5])
            assert "Exchange SinglePartition" in below, (
                "broadcast whose build side is not the 1-row cursor:\n" + below
            )


def test_eigenvector_superstep_never_broadcasts_state(spark):
    from neo4j_graph_algorithms_spark.operators.eigenvector import eigenvector

    res = eigenvector(spark, edge_df(spark, _PAIRS), max_iterations=2)
    # the L2-norm fold broadcasts a 1-row SCALAR (BroadcastNestedLoopJoin) —
    # that is the right plan; what must never appear is a BroadcastHashJoin
    # building the |V|-sized score relation on the driver
    _assert_no_state_broadcast(res.first_plan)


def test_kcore_superstep_never_broadcasts_state(spark):
    from neo4j_graph_algorithms_spark.operators.kcore import kcore

    res = kcore(spark, edge_df(spark, _PAIRS), k=2, max_iterations=2)
    _assert_no_state_broadcast(res.first_plan)


def test_topo_levels_superstep_never_broadcasts_state(spark):
    from neo4j_graph_algorithms_spark.operators.dag import topo_levels

    dag_pairs = [(i, j) for i in range(8) for j in range(8) if i < j and (i + j) % 3 == 0]
    res = topo_levels(spark, edge_df(spark, dag_pairs), max_iterations=3)
    _assert_no_state_broadcast(res.first_plan)


def test_coloring_superstep_never_broadcasts_state(spark, monkeypatch):
    """greedy_coloring's nb_colors join hashes the COLORED-state projection,
    which grows to |V| — the shuffle_hash hint must hold in a round where
    the colored set is non-empty (round 1's is empty, so first_plan alone
    can't pin this join; capture every round's plan instead)."""
    from neo4j_graph_algorithms_spark.operators.coloring import greedy_coloring
    from neo4j_graph_algorithms_spark.plans import runtime

    plans: list[str] = []
    orig = runtime.SuperstepRunner.run

    # wrap step via run so each round's plan is recorded
    def run_with_wrap(self, initial_state, step, resume=False):
        def wrapped(state, i):
            new = step(state, i)
            plans.append(new._jdf.queryExecution().toString())
            return new

        return orig(self, initial_state, wrapped, resume=resume)

    monkeypatch.setattr(runtime.SuperstepRunner, "run", run_with_wrap)
    greedy_coloring(spark, edge_df(spark, _PAIRS), max_iterations=30)
    assert len(plans) >= 2, "graph colored in one round; grow the fixture"
    for plan in plans[1:]:  # rounds with a non-empty colored set
        assert "BroadcastHashJoin" not in plan, plan
        assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan, plan


def test_keep_best_join_never_broadcasts_corpus(spark):
    """keep_best_in_groups joins two |corpus|-sized projections (groups ×
    quality) — the shuffle_hash hint must hold so neither side is ever a
    driver-built broadcast relation at scale."""
    from neo4j_graph_algorithms_spark.pipeline.dedup import keep_best_in_groups

    docs = spark.createDataFrame(
        [(i, f"w{i} w{i + 1} w{i + 2} the a of and") for i in range(30)],
        "doc_id long, text string",
    )
    plan = (
        keep_best_in_groups(docs, num_hashes=4, bands=2, ngram=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" not in plan, plan


def test_funnel_step_join_never_broadcasts_survivors(spark):
    """funnel's per-step join pairs the survivor frame with a corpus-sized
    event slice — the shuffle_hash hint on the survivor PROJECTION must
    hold so neither side becomes a driver-built broadcast at scale.
    funnel returns counts (not a lazy DF), so the plan is inspected on a
    reconstruction of one step's join exactly as events.py builds it."""
    import datetime as dt

    from pyspark.sql import functions as F

    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), i % 5,
         ["view", "click"][i % 2], 0.0)
        for i in range(40)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).select(
        F.col("user_id").alias("_u"),
        F.unix_timestamp("ts").alias("_ep"),
        F.col("event_id").alias("_eid"),
        F.col("event_type").alias("_t"),
    )
    cur = (
        ev.filter(F.col("_t") == "view")
        .groupBy("_u")
        .agg(F.min(F.struct("_ep", "_eid")).alias("_a"))
        .select("_u", F.col("_a._ep").alias("_ep"), F.col("_a._eid").alias("_eid"),
                F.col("_a._ep").alias("_ep0"))
        .localCheckpoint(eager=True)
    )
    nxt = ev.filter(F.col("_t") == "click").select(
        "_u", F.col("_ep").alias("_nep"), F.col("_eid").alias("_neid")
    )
    step = (
        cur.select("_u", "_ep", "_eid", "_ep0").hint("shuffle_hash")
        .join(nxt, on="_u")
        .groupBy("_u", "_ep0")
        .agg(F.count("*").alias("n"))
    )
    plan = step._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan, plan


def test_retention_join_never_broadcasts_user_cohorts(spark):
    """retention_cohorts joins |users|-sized first-period frame back to the
    activity frame — must stay a shuffle join."""
    import datetime as dt

    from neo4j_graph_algorithms_spark.pipeline.events import retention_cohorts

    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), i % 7, "x", 0.0)
        for i in range(50)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    plan = (
        retention_cohorts(ev, period_days=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" not in plan, plan


def test_coreness_hindex_superstep_never_broadcasts_state(spark):
    """coreness_hindex joins |V|-sized state onto the adjacency each round
    and folds per-vertex h-indexes back — both joins must stay shuffle-based
    (repo convention: no graph-scaled broadcast in superstep joins)."""
    from neo4j_graph_algorithms_spark.operators.kcore import coreness_hindex

    pairs = [(i, (i + 1) % 16) for i in range(16)] + [(0, 8), (4, 12)]
    res = coreness_hindex(
        spark,
        edge_df(spark, pairs),
        max_iterations=2,
        fixed_iterations=True,
    )
    plan = res.first_plan
    assert plan is not None
    assert "BroadcastHashJoin" not in plan, plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan, plan


def test_score_superstep_never_broadcasts_state(spark):
    from neo4j_graph_algorithms_spark.operators.kcore import s_core

    res = s_core(spark, edge_df(spark, _PAIRS), s=2, max_iterations=2)
    _assert_no_state_broadcast(res.first_plan)


def test_bowtie_reach_superstep_never_broadcasts_state(spark, monkeypatch):
    from neo4j_graph_algorithms_spark.operators.bowtie import reach_set

    captured = _capture_result(monkeypatch)
    edges = edge_df(spark, _PAIRS).select("src", "dst")
    seeds = spark.createDataFrame([(0,)], "vid long")
    reach_set(spark, edges, seeds)
    _assert_no_state_broadcast(captured["res"].first_plan)
