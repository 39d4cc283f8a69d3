"""WCC vs reference fixtures (UnionFindProcIntegrationTest.java:113-176).

Components canonicalized to min member id (SURVEY.md §2.12.3).
"""

import pytest

from neo4j_graph_algorithms_spark.operators.wcc import wcc, wcc_stats
from tests.conftest import collect_map, edge_df


def comp_sets(state_df):
    rows = state_df.collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r["comp"], set()).add(r["vid"])
    return {frozenset(v) for v in by_comp.values()}


def test_wcc_full_graph(spark, f3_unionfind):
    edges, vertices, ids = f3_unionfind
    res = wcc(spark, edges, vertices=vertices)
    assert res.converged
    sets = comp_sets(res.state)
    expect = {
        frozenset(range(0, 7)),   # {A..G}
        frozenset({7, 8}),        # {H,I}
        frozenset({9}),           # {J}
    }
    assert sets == expect
    # component id == min member id
    comp = collect_map(res.state, "vid", "comp")
    assert comp[0] == 0 and comp[6] == 0 and comp[8] == 7 and comp[9] == 9


def test_wcc_set_stats(spark, f3_unionfind):
    edges, vertices, _ = f3_unionfind
    res = wcc(spark, edges, vertices=vertices)
    stats = wcc_stats(res.state).collect()[0]
    assert stats["set_count"] == 3
    assert stats["max_size"] == 7 and stats["min_size"] == 1


@pytest.mark.parametrize(
    "threshold,expected_sizes",
    [
        (5.0, {4, 3, 2, 1}),   # 4.2-cost edge D→E drops (:151-160)
        (3.14, {7, 2, 1}),     # 4.2-cost edge survives; >= compare (:162-171)
    ],
)
def test_wcc_threshold(spark, f3_unionfind, threshold, expected_sizes):
    edges, vertices, _ = f3_unionfind
    res = wcc(spark, edges, vertices=vertices, threshold=threshold)
    sizes = {len(s) for s in comp_sets(res.state)}
    assert sizes == expected_sizes


def test_wcc_isolated_vertices_are_singletons(spark, f3_unionfind):
    edges, vertices, _ = f3_unionfind
    res = wcc(spark, edges, vertices=vertices)
    comp = collect_map(res.state, "vid", "comp")
    assert comp[9] == 9  # J isolated


def test_wcc_long_path_converges_fast(spark):
    """Pointer jumping: a 64-node path must converge in << 64 rounds."""
    from tests.conftest import edge_df

    n = 64
    edges = edge_df(spark, [(i, i + 1) for i in range(n - 1)])
    res = wcc(spark, edges, max_iterations=20)
    assert res.converged, "path graph did not converge within 20 rounds"
    comp = collect_map(res.state, "vid", "comp")
    assert set(comp.values()) == {0}
    assert res.iterations <= 10


def test_wcc_resume_from_checkpoint(spark, tmp_path, f3_unionfind):
    edges, vertices, _ = f3_unionfind
    ckpt = str(tmp_path / "wcc_ckpt")
    res1 = wcc(spark, edges, vertices=vertices, checkpoint_dir=ckpt, checkpoint_interval=1)
    # resume: must produce identical state without redoing all work
    res2 = wcc(
        spark, edges, vertices=vertices, checkpoint_dir=ckpt, checkpoint_interval=1, resume=True
    )
    assert comp_sets(res2.state) == comp_sets(res1.state)


def test_wcc_warm_start_additive(spark):
    """Warm-start from a prior labeling on an ADDITIVE graph change:
    two chains merge via a new bridge edge — warm result equals cold and
    the runner needs fewer supersteps than the cold diameter walk."""
    old_pairs = [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12), (12, 13)]
    new_pairs = old_pairs + [(3, 10)]
    prior = wcc(spark, edge_df(spark, old_pairs)).state.select("vid", "comp")
    cold = wcc(spark, edge_df(spark, new_pairs))
    warm = wcc(spark, edge_df(spark, new_pairs), initial_components=prior)
    a = {r.vid: r.comp for r in cold.state.collect()}
    b = {r.vid: r.comp for r in warm.state.collect()}
    assert a == b
    assert set(a.values()) == {0}
    assert len(warm.metrics) < len(cold.metrics)


def test_wcc_warm_start_new_vertices_cold_init(spark):
    """Vids absent from the prior labeling initialize at their own vid."""
    prior = wcc(spark, edge_df(spark, [(0, 1)])).state.select("vid", "comp")
    new = edge_df(spark, [(0, 1), (5, 6)])
    got = {r.vid: r.comp for r in wcc(spark, new, initial_components=prior).state.collect()}
    assert got == {0: 0, 1: 0, 5: 5, 6: 5}


def test_bipartite_project_cap_and_weights(spark):
    from neo4j_graph_algorithms_spark.graph import bipartite_project

    rel = spark.createDataFrame(
        [("g1", 1), ("g1", 2), ("g1", 3), ("g2", 1), ("g2", 2), ("g2", 2)],
        "grp string, item long",
    )
    out = {(r["src"], r["dst"]): r["weight"]
           for r in bipartite_project(rel, "grp", "item").collect()}
    # (1,2) share g1+g2 (dup row in g2 collapses); (1,3),(2,3) share g1 only
    assert out == {(1, 2): 2.0, (1, 3): 1.0, (2, 3): 1.0}
    # cap=2 truncates g1 to items {1,2}: the (_,3) pairs disappear
    capped = {(r["src"], r["dst"]): r["weight"]
              for r in bipartite_project(rel, "grp", "item", max_group_size=2).collect()}
    assert capped == {(1, 2): 2.0}
