"""Topological levels + cycle detection."""

import pytest

from neo4j_graph_algorithms_spark.operators.dag import is_dag, topo_levels
from tests.conftest import edge_df


def test_levels_diamond(spark):
    # 0 -> {1,2} -> 3, plus a long arm 0->4->5->3: level(3) is the LONGEST path
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3), (0, 4), (4, 5), (5, 3)]
    res = topo_levels(spark, edge_df(spark, pairs))
    got = {r["vid"]: r["level"] for r in res.state.collect()}
    assert got == {0: 0, 1: 1, 2: 1, 4: 1, 5: 2, 3: 3}
    assert res.converged


def test_multiple_sources_and_isolated(spark):
    pairs = [(10, 11), (20, 11)]
    got = {r["vid"]: r["level"] for r in topo_levels(spark, edge_df(spark, pairs)).state.collect()}
    assert got == {10: 0, 20: 0, 11: 1}


def test_cycle_warns_and_is_dag(spark):
    dag = edge_df(spark, [(0, 1), (1, 2)])
    cyc = edge_df(spark, [(0, 1), (1, 2), (2, 0)])
    assert is_dag(spark, dag) is True
    assert is_dag(spark, cyc) is False
    with pytest.warns(RuntimeWarning):
        topo_levels(spark, cyc, max_iterations=5)


def test_resume_checkpoint(spark, tmp_path):
    pairs = [(i, i + 1) for i in range(8)]
    cold = topo_levels(spark, edge_df(spark, pairs))
    ck = str(tmp_path / "topo")
    warm = topo_levels(spark, edge_df(spark, pairs), checkpoint_dir=ck)
    resumed = topo_levels(spark, edge_df(spark, pairs), checkpoint_dir=ck, resume=True)
    a = sorted(map(tuple, cold.state.collect()))
    assert sorted(map(tuple, warm.state.collect())) == a
    assert sorted(map(tuple, resumed.state.collect())) == a
