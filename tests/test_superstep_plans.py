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
