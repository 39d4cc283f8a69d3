"""shortest_path (node-sequence reconstruction) + weighted APSP tests.

Fixture: ShortestPathDeltaSteppingProcTest.java:46-92 — three weighted
chains s→x with per-hop costs 5/3/2; shortest s→x = 8 via the cost-2 chain.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.operators.paths import (
    all_shortest_paths_weighted,
    shortest_path,
    sssp,
)
from tests.conftest import edge_df, names_to_ids

DS_NODES = "sabcdefghix"


def _ds_edges(spark):
    ids = names_to_ids(DS_NODES)
    spec = [
        ("s", "a", 5.0), ("a", "b", 5.0), ("b", "c", 5.0), ("c", "x", 5.0),
        ("s", "d", 3.0), ("d", "e", 3.0), ("e", "f", 3.0), ("f", "x", 3.0),
        ("s", "g", 2.0), ("g", "h", 2.0), ("h", "i", 2.0), ("i", "x", 2.0),
    ]
    pairs = [(ids[s], ids[d]) for s, d, _ in spec]
    weights = [w for _, _, w in spec]
    return edge_df(spark, pairs, weights), ids


def test_shortest_path_node_sequence(spark):
    edges, ids = _ds_edges(spark)
    rows = shortest_path(spark, edges, ids["s"], ids["x"]).orderBy("step").collect()
    seq = [(r.step, r.vid, r.dist) for r in rows]
    want = [
        (0, ids["s"], 0.0),
        (1, ids["g"], 2.0),
        (2, ids["h"], 4.0),
        (3, ids["i"], 6.0),
        (4, ids["x"], 8.0),
    ]
    assert seq == want


def test_shortest_path_unreachable_is_empty(spark):
    edges = edge_df(spark, [(0, 1), (2, 3)])
    assert shortest_path(spark, edges, 0, 3).count() == 0


def test_shortest_path_canonical_tie_break(spark):
    # two equal-cost paths 0→1→3 and 0→2→3; pred(3) must be the MIN vid (1)
    edges = edge_df(spark, [(0, 1), (0, 2), (1, 3), (2, 3)], [1.0, 1.0, 1.0, 1.0])
    seq = [r.vid for r in shortest_path(spark, edges, 0, 3).orderBy("step").collect()]
    assert seq == [0, 1, 3]


def test_apsp_weighted_matches_per_source_sssp(spark):
    edges, ids = _ds_edges(spark)
    apsp = {
        (r.source, r.vid): r.dist
        for r in all_shortest_paths_weighted(spark, edges).collect()
    }
    for s in (ids["s"], ids["d"], ids["x"]):
        per = {r.vid: r.dist for r in sssp(spark, edges, s).collect()}
        for v, d in per.items():
            assert apsp[(s, v)] == d
    # self rows present with dist 0; no rows for unreachable pairs
    assert apsp[(ids["x"], ids["x"])] == 0.0
    assert (ids["x"], ids["s"]) not in apsp


def test_apsp_weighted_source_subset(spark):
    edges, ids = _ds_edges(spark)
    srcs = spark.createDataFrame([(ids["s"],)], "vid long")
    got = {
        (r.source, r.vid): r.dist
        for r in all_shortest_paths_weighted(spark, edges, sources=srcs).collect()
    }
    assert all(s == ids["s"] for s, _ in got)
    assert got[(ids["s"], ids["x"])] == 8.0


def test_sssp_resume_from_checkpoint(spark, tmp_path):
    """North rule: sssp resumes mid-algorithm from durable checkpoints
    (same contract the pagerank/wcc resume tests pin)."""
    from neo4j_graph_algorithms_spark.operators.paths import sssp
    from tests.conftest import edge_df

    pairs = [(i, i + 1) for i in range(12)]
    weights = [1.0] * 12
    edges = edge_df(spark, pairs, weights)
    ck = str(tmp_path / "sssp-ck")
    # run 1: stop early (4 supersteps), durable checkpoint written
    partial = sssp(spark, edges, source=0, max_iterations=4, checkpoint_dir=ck,
                   checkpoint_interval=2)
    got_partial = {r.vid: r.dist for r in partial.collect()}
    assert max(got_partial.values()) <= 4.0
    # run 2: resume to convergence; distances complete the chain
    full = sssp(spark, edges, source=0, max_iterations=50, checkpoint_dir=ck,
                resume=True)
    got = {r.vid: r.dist for r in full.collect()}
    assert got == {i: float(i) for i in range(13)}


def test_delta_stepping_resume_from_checkpoint(spark, tmp_path):
    """Δ-stepping now runs the flattened bucket loop on SuperstepRunner:
    stop mid-bucket-sequence, resume from the durable checkpoint, and the
    state's improved-flags + the min-flagged-bucket cursor reconstruct the
    correct bucket position with no separate cursor to persist."""
    from neo4j_graph_algorithms_spark.operators.paths import delta_stepping
    from tests.conftest import edge_df

    pairs = [(i, i + 1) for i in range(12)]
    weights = [1.0] * 12
    edges = edge_df(spark, pairs, weights)
    ck = str(tmp_path / "ds-ck")
    partial = delta_stepping(spark, edges, source=0, delta=2.0, max_iterations=4,
                             checkpoint_dir=ck, checkpoint_interval=2)
    got_partial = {r.vid: r.dist for r in partial.collect()}
    assert max(got_partial.values()) <= 4.0
    full = delta_stepping(spark, edges, source=0, delta=2.0, max_iterations=50,
                          checkpoint_dir=ck, resume=True)
    got = {r.vid: r.dist for r in full.collect()}
    assert got == {i: float(i) for i in range(13)}


def test_msbfs_depths_resume_from_checkpoint(spark, tmp_path):
    """MS-BFS now carries per-depth first-visit masks in state (seen map),
    so a durable checkpoint restores the whole traversal — accumulated
    depth contributions included — and resume completes the chain."""
    from neo4j_graph_algorithms_spark.operators.msbfs import msbfs_depths
    from tests.conftest import edge_df

    edges = edge_df(spark, [(i, i + 1) for i in range(12)], [1.0] * 12)
    src = spark.createDataFrame([(0,)], "vid long")
    ck = str(tmp_path / "msbfs-ck")
    partial = msbfs_depths(spark, edges, sources=src, direction="OUTGOING",
                           max_depth=4, checkpoint_dir=ck)
    got_partial = {(r.vid, r.depth) for r in partial.collect()}
    assert got_partial == {(i, i) for i in range(1, 5)}
    full = msbfs_depths(spark, edges, sources=src, direction="OUTGOING",
                        max_depth=50, checkpoint_dir=ck, resume=True)
    got = {(r.vid, r.depth, r.n_sources) for r in full.collect()}
    assert got == {(i, i, 1) for i in range(1, 13)}


def test_sssp_warm_start_shortcut_added(spark):
    """Warm-start from a prior run after a shortcut edge is added: prior
    dists are valid upper bounds, relaxation lowers only the affected
    suffix; result equals the cold run in far fewer supersteps."""
    from tests.conftest import edge_df

    n = 24
    chain = [(i, i + 1) for i in range(n)]
    w = [1.0] * n
    prior = sssp(spark, edge_df(spark, chain, w), source=0)
    new = edge_df(spark, chain + [(0, 20)], w + [2.5])

    from neo4j_graph_algorithms_spark.operators import paths as _p

    cold_res = _p.sssp(spark, new, source=0)
    warm_res = _p.sssp(spark, new, source=0, initial_dists=prior)
    a = {r.vid: r.dist for r in cold_res.collect()}
    b = {r.vid: r.dist for r in warm_res.collect()}
    assert a == b
    assert a[20] == 2.5 and a[23] == 5.5  # shortcut rewrote the suffix
