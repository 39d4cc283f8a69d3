"""A*/ALT goal-directed shortest path (operators/astar.py).

Reuses the delta-stepping fixture (ShortestPathDeltaSteppingProcTest.java:
46-92) plus hash-seeded random graphs for the admissibility property.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.operators.astar import (
    astar_path,
    landmark_heuristic,
    pick_landmarks,
)
from neo4j_graph_algorithms_spark.operators.paths import shortest_path, sssp
from tests.conftest import edge_df, names_to_ids
from tests.test_shortest_path_apsp import _ds_edges


def test_astar_matches_shortest_path_fixture(spark):
    edges, ids = _ds_edges(spark)
    want = [
        (r.step, r.vid, r.dist)
        for r in shortest_path(spark, edges, ids["s"], ids["x"]).orderBy("step").collect()
    ]
    got = [
        (r.step, r.vid, r.dist)
        for r in astar_path(spark, edges, ids["s"], ids["x"], landmarks=2)
        .orderBy("step")
        .collect()
    ]
    assert got == want and got[-1][2] == 8.0


def test_astar_matches_on_random_graphs(spark):
    rng = random.Random(41)
    for trial in range(3):
        n = 14
        pairs = sorted(
            {(rng.randrange(n), rng.randrange(n)) for _ in range(40)}
        )
        pairs = [(a, b) for a, b in pairs if a != b]
        weights = [float(rng.randint(1, 9)) for _ in pairs]
        edges = edge_df(spark, pairs, weights)
        d = {r.vid: r.dist for r in sssp(spark, edges, 0).collect()}
        reach = [v for v in d if v != 0]
        if not reach:
            continue
        target = max(reach, key=lambda v: (d[v], -v))
        want = [
            (r.step, r.vid, r.dist)
            for r in shortest_path(spark, edges, 0, target).orderBy("step").collect()
        ]
        got = [
            (r.step, r.vid, r.dist)
            for r in astar_path(spark, edges, 0, target, landmarks=2)
            .orderBy("step")
            .collect()
        ]
        assert got == want, f"trial {trial} target {target}"


def test_landmark_heuristic_admissible_and_bound_valid(spark):
    """h(v) <= d(v, t) for every v, and U >= d(s, t)."""
    rng = random.Random(7)
    n = 12
    pairs = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(34)})
    pairs = [(a, b) for a, b in pairs if a != b]
    weights = [float(rng.randint(1, 5)) for _ in pairs]
    edges = edge_df(spark, pairs, weights)
    e = edges.groupBy("src", "dst").agg(F.min("weight").alias("weight"))
    d0 = {r.vid: r.dist for r in sssp(spark, edges, 0).collect()}
    target = max((v for v in d0 if v != 0), key=lambda v: (d0[v], -v))
    lms = pick_landmarks(e, 2)
    h, upper = landmark_heuristic(spark, e, 0, target, lms)
    # true remaining distance to target = reverse sssp from target
    rev = e.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
    )
    true_rem = {r.vid: r.dist for r in sssp(spark, rev, target).collect()}
    for r in h.collect():
        if r.vid in true_rem:
            assert r.h <= true_rem[r.vid] + 1e-9, (r.vid, r.h, true_rem[r.vid])
    assert upper >= d0[target] - 1e-9


def test_astar_unreachable_target_empty(spark):
    edges = edge_df(spark, [(0, 1), (2, 3)])
    assert astar_path(spark, edges, 0, 3, landmarks=1).count() == 0


def test_astar_reuses_precomputed_heuristic(spark):
    edges, ids = _ds_edges(spark)
    e = edges.groupBy("src", "dst").agg(F.min("weight").alias("weight"))
    lms = pick_landmarks(e, 2)
    h, upper = landmark_heuristic(spark, e, ids["s"], ids["x"], lms)
    got = [
        r.vid
        for r in astar_path(
            spark, edges, ids["s"], ids["x"], heuristic=h, upper_bound=upper
        )
        .orderBy("step")
        .collect()
    ]
    assert got == [ids[c] for c in "sghix"]


def test_pick_landmarks_farthest_spreads_to_periphery(spark):
    """On a path graph seeded at the high-degree middle, farthest-point
    selection must pick an endpoint next (degree selection would pick
    another interior hub)."""
    from neo4j_graph_algorithms_spark.operators.astar import (
        pick_landmarks_farthest,
    )

    # path 0-1-2-3-4-5-6 plus extra parallel-ish edges to make 3 the hub
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (3, 1), (3, 5)]
    e = edge_df(spark, pairs).groupBy("src", "dst").agg(
        F.min("weight").alias("weight")
    )
    lms = pick_landmarks_farthest(spark, e, 3)
    assert lms[0] == 3  # degree seed
    # the two farthest-from-{3} vertices are the endpoints 0 and 6 (dist 2
    # via the shortcuts... 3-1-0 = 2 hops, 3-5-6 = 2 hops; ties -> vid asc)
    assert set(lms[1:]) <= {0, 6}
    assert len(lms) == 3 and len(set(lms)) == 3


def test_pick_landmarks_farthest_deterministic_and_capped(spark):
    from neo4j_graph_algorithms_spark.operators.astar import (
        pick_landmarks_farthest,
    )

    e = edge_df(spark, [(0, 1), (1, 2)]).groupBy("src", "dst").agg(
        F.min("weight").alias("weight")
    )
    a = pick_landmarks_farthest(spark, e, 2)
    b = pick_landmarks_farthest(spark, e, 2)
    assert a == b and len(a) == 2
    # asking for more landmarks than reachable vertices stops early
    assert len(pick_landmarks_farthest(spark, e, 10)) <= 3
