"""SCC, shortest-path, and MS-BFS centrality tests — fixtures lifted from
the reference (MultistepSCCProcTest.java:55-77,
ShortestPathDeltaSteppingProcTest.java:46-92, ClosenessCentralityTest.java
49-72, HarmonicCentralityTest.java)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.operators.msbfs import closeness, harmonic
from neo4j_graph_algorithms_spark.operators.paths import delta_stepping, sssp
from neo4j_graph_algorithms_spark.operators.scc import scc, scc_stats

from tests.conftest import edge_df, names_to_ids, parse_edges

# SCC fixture: three directed triangles, a->d bridge, x isolated
SCC_NODES = "abcdefghix"
SCC_EDGES = "a>b, b>c, c>a, d>e, e>f, f>d, a>d, g>h, h>i, i>g"


def test_scc_triangles(spark):
    ids = names_to_ids(SCC_NODES)
    edges = edge_df(spark, parse_edges(SCC_EDGES, ids))
    verts = spark.createDataFrame([(i,) for i in ids.values()], "vid long")
    res = {r.vid: r.comp for r in scc(spark, edges, vertices=verts).collect()}
    # components: {a,b,c}, {d,e,f}, {g,h,i}, {x}
    assert res[ids["a"]] == res[ids["b"]] == res[ids["c"]] == min(
        ids["a"], ids["b"], ids["c"]
    )
    assert res[ids["d"]] == res[ids["e"]] == res[ids["f"]]
    assert res[ids["g"]] == res[ids["h"]] == res[ids["i"]]
    assert res[ids["x"]] == ids["x"]
    assert res[ids["a"]] != res[ids["d"]] != res[ids["g"]]
    stats = scc_stats(
        scc(spark, edges, vertices=verts)
    ).collect()[0]
    assert stats.set_count == 4
    assert stats.max_set_size == 3 and stats.min_set_size == 1


def test_scc_cycle_vs_dag(spark):
    # 0->1->2->0 cycle plus 2->3 tail: {0,1,2} one SCC, {3} singleton
    edges = edge_df(spark, [(0, 1), (1, 2), (2, 0), (2, 3)])
    res = {r.vid: r.comp for r in scc(spark, edges).collect()}
    assert res == {0: 0, 1: 0, 2: 0, 3: 3}


def test_scc_pure_dag_all_singletons(spark):
    edges = edge_df(spark, [(0, 1), (1, 2), (0, 2)])
    res = {r.vid: r.comp for r in scc(spark, edges).collect()}
    assert res == {0: 0, 1: 1, 2: 2}


def test_scc_parallel_path_matches_tarjan_fallback(spark):
    ids = names_to_ids(SCC_NODES)
    edges = edge_df(spark, parse_edges(SCC_EDGES, ids))
    verts = spark.createDataFrame([(i,) for i in ids.values()], "vid long")
    par = {r.vid: r.comp for r in scc(spark, edges, vertices=verts, tarjan_cutoff=0).collect()}
    seq = {r.vid: r.comp for r in scc(spark, edges, vertices=verts).collect()}
    assert par == seq


def test_scc_color_fixpoint_is_logarithmic(spark):
    # one directed cycle of 512 vertices = one SCC of diameter 511; with
    # pointer jumping both fixpoints must finish in O(log n) rounds, not
    # O(diameter) (the round-1 verdict's scale-killer)
    n = 512
    edges = edge_df(spark, [(i, (i + 1) % n) for i in range(n)])
    metrics: dict = {}
    res = scc(spark, edges, tarjan_cutoff=0, metrics=metrics).collect()
    comps = {r.comp for r in res}
    assert len(res) == n and comps == {0}
    assert max(metrics["color_rounds"]) <= 27  # ~3·log2(512), far below 511
    assert max(metrics["bcolor_rounds"]) <= 27
    assert metrics["outer_rounds"] <= 2


def test_scc_deep_chain_uses_sequential_fallback(spark):
    # descending path n→…→1: the coloring route would need O(n) outer
    # rounds (each round peels only the class-root singleton); the
    # small-remainder Tarjan fallback must absorb it in one step
    n = 2000
    edges = edge_df(spark, [(i + 1, i) for i in range(n)])
    metrics: dict = {}
    res = {r.vid: r.comp for r in scc(spark, edges, metrics=metrics).collect()}
    assert len(res) == n + 1 and all(res[v] == v for v in res)
    assert metrics["tarjan_vertices"] == n + 1
    assert metrics["outer_rounds"] == 0


# Δ-stepping fixture: three weighted chains s→x, costs 5/3/2 per hop
DS_NODES = "sabcdefghix"


def _ds_edges(spark):
    ids = names_to_ids(DS_NODES)
    spec = [
        ("x", "s", 5.0),
        ("s", "a", 5.0), ("a", "b", 5.0), ("b", "c", 5.0), ("c", "x", 5.0),
        ("s", "d", 3.0), ("d", "e", 3.0), ("e", "f", 3.0), ("f", "x", 3.0),
        ("s", "g", 2.0), ("g", "h", 2.0), ("h", "i", 2.0), ("i", "x", 2.0),
    ]
    pairs = [(ids[s], ids[d]) for s, d, _ in spec]
    weights = [w for _, _, w in spec]
    return edge_df(spark, pairs, weights), ids


def test_sssp_reference_fixture(spark):
    edges, ids = _ds_edges(spark)
    dist = {r.vid: r.dist for r in sssp(spark, edges, source=ids["s"]).collect()}
    assert dist[ids["x"]] == 8.0  # via the cost-2 chain {s,g,h,i,x}
    assert dist[ids["c"]] == 15.0
    assert dist[ids["f"]] == 9.0
    assert dist[ids["s"]] == 0.0


@pytest.mark.parametrize("delta", [1.0, 2.5, 3.0, 100.0])
def test_delta_stepping_matches_sssp(spark, delta):
    edges, ids = _ds_edges(spark)
    want = {r.vid: r.dist for r in sssp(spark, edges, source=ids["s"]).collect()}
    got = {
        r.vid: r.dist
        for r in delta_stepping(spark, edges, source=ids["s"], delta=delta).collect()
    }
    assert got == want


def test_sssp_cheapest_parallel_edge(spark):
    edges = edge_df(spark, [(0, 1), (0, 1), (1, 2)], [7.0, 3.0, 1.0])
    dist = {r.vid: r.dist for r in sssp(spark, edges, source=0).collect()}
    assert dist == {0: 0.0, 1: 3.0, 2: 4.0}


# Closeness fixture: path A<->B<->C<->D<->E, expected {0.4, 4/7, 4/6, 4/7, 0.4}
def _path_edges(spark):
    pairs = [(i, i + 1) for i in range(4)] + [(i + 1, i) for i in range(4)]
    return edge_df(spark, pairs)


def test_closeness_path_graph(spark):
    got = {r.vid: r.centrality for r in closeness(spark, _path_edges(spark)).collect()}
    want = {0: 4 / 10, 1: 4 / 7, 2: 4 / 6, 3: 4 / 7, 4: 4 / 10}
    for v, c in want.items():
        assert got[v] == pytest.approx(c), v


def test_harmonic_path_graph(spark):
    got = {r.vid: r.centrality for r in harmonic(spark, _path_edges(spark)).collect()}
    # node C: (1/2 + 1 + 1 + 1/2)/4 = 0.75
    assert got[2] == pytest.approx(3 / 4)
    assert got[0] == pytest.approx((1 + 1 / 2 + 1 / 3 + 1 / 4) / 4)


def test_closeness_untouched_node_zero(spark):
    # 0->1 only; node 2 isolated via vertices list is absent from edges —
    # use a directed edge where node 1 cannot reach anyone: farness(0)=0
    edges = edge_df(spark, [(0, 1)])
    got = {r.vid: r.centrality for r in closeness(spark, edges).collect()}
    assert got[0] == 0.0  # nothing reaches node 0
    assert got[1] == pytest.approx(1.0)  # reached by 1 source at depth 1: (n-1)/1


def test_closeness_sampled_sources(spark):
    edges = _path_edges(spark)
    srcs = spark.createDataFrame([(0,), (4,)], "vid long")
    got = {r.vid: r.centrality for r in closeness(spark, edges, sources=srcs).collect()}
    # farness(2) over sample {0,4} = 2+2 = 4 -> (5-1)/4 = 1.0
    assert got[2] == pytest.approx(1.0)


def test_msbfs_many_sources_multi_batch(spark):
    # ring of 150 nodes -> 3 batches of 64; closeness must still be uniform
    n = 150
    pairs = [(i, (i + 1) % n) for i in range(n)] + [((i + 1) % n, i) for i in range(n)]
    edges = edge_df(spark, pairs)
    got = [r.centrality for r in closeness(spark, edges, max_depth=80).collect()]
    assert len(got) == n
    assert max(got) == pytest.approx(min(got))  # symmetric ring


def test_all_shortest_paths_path_graph(spark):
    from neo4j_graph_algorithms_spark.operators.msbfs import all_shortest_paths

    got = {
        (r.source, r.vid): r.depth
        for r in all_shortest_paths(spark, _path_edges(spark)).collect()
    }
    # undirected path 0-1-2-3-4: d(0,4)=4, d(1,3)=2, symmetric
    assert got[(0, 4)] == 4 and got[(4, 0)] == 4
    assert got[(1, 3)] == 2 and got[(2, 3)] == 1
    assert (0, 0) not in got  # self rows omitted
    assert len(got) == 20  # 5*4 ordered pairs


def test_all_shortest_paths_directed_sources_subset(spark):
    from neo4j_graph_algorithms_spark.operators.msbfs import all_shortest_paths

    edges = edge_df(spark, [(0, 1), (1, 2)])
    srcs = spark.createDataFrame([(0,)], "vid long")
    got = {
        (r.source, r.vid): r.depth
        for r in all_shortest_paths(spark, edges, sources=srcs, direction="OUTGOING").collect()
    }
    assert got == {(0, 1): 1, (0, 2): 2}


def test_scc_tarjan_edge_collect_capped(spark):
    """A dense remainder under the vertex cutoff but over the 20x-cutoff
    edge cap must NOT be collected: the loop warns and finishes on the
    distributed path, still producing the right components."""
    import itertools
    import warnings

    n = 30  # n(n-1) = 870 > 20 * 30 = 600
    dense = spark.createDataFrame(
        [(a, b) for a, b in itertools.permutations(range(n), 2)],
        "src long, dst long",
    )
    metrics: dict = {}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = scc(spark, dense, tarjan_cutoff=n, metrics=metrics)
        assert any("distributed path" in str(x.message) for x in w)
    assert metrics["tarjan_vertices"] == 0  # fallback never ran
    rows = out.collect()
    assert len(rows) == n and len({r.comp for r in rows}) == 1


def test_scc_resume_from_checkpoint(spark, tmp_path):
    """North rule: scc resumes mid-algorithm from durable checkpoints.
    A DAG chain forces multiple outer trim/color rounds (each round peels
    only the prefix-hash-maxima roots + the two trim ends); run 1 stops
    after one committed outer round, run 2 resumes past it and must not
    redo it (resumed_round recorded, fewer outer rounds executed)."""
    import warnings as _w

    pairs = [(i, i + 1) for i in range(24)]
    edges = edge_df(spark, pairs)
    ck = str(tmp_path / "scc-ck")

    mx_full: dict = {}
    expected = {
        r.vid: r.comp
        for r in scc(
            spark, edge_df(spark, pairs), tarjan_cutoff=0, metrics=mx_full
        ).collect()
    }
    assert mx_full["outer_rounds"] >= 2  # fixture really is multi-round

    mx1: dict = {}
    with _w.catch_warnings():
        _w.simplefilter("ignore", RuntimeWarning)  # expected: incomplete
        scc(
            spark,
            edges,
            tarjan_cutoff=0,
            max_outer=1,
            metrics=mx1,
            checkpoint_dir=ck,
        )
    assert mx1["outer_rounds"] == 1

    mx2: dict = {}
    out = scc(
        spark,
        edges,
        tarjan_cutoff=0,
        metrics=mx2,
        checkpoint_dir=ck,
        resume=True,
    )
    assert mx2["resumed_round"] == 0
    assert mx2["outer_rounds"] == mx_full["outer_rounds"] - 1
    got = {r.vid: r.comp for r in out.collect()}
    assert got == expected  # all singletons, identical to the one-shot run
