"""Degree centrality (operators/degrees.py)."""

from __future__ import annotations

import pytest

from neo4j_graph_algorithms_spark.operators.degrees import degree_centrality
from tests.conftest import edge_df


def test_degree_hand_values(spark):
    # multigraph: parallel edge 0→1 twice, plus 1→0 (reverse), 1→2, self 2→2
    pairs = [(0, 1), (0, 1), (1, 0), (1, 2), (2, 2)]
    got = {r["vid"]: (r["out_deg"], r["in_deg"], r["deg"]) for r in
           degree_centrality(spark, edge_df(spark, pairs)).collect()}
    # out/in count parallel edges and self-loops; deg is undirected-simple
    assert got[0] == (2, 1, 1)   # distinct neighbors of 0: {1}
    assert got[1] == (2, 2, 2)   # {0, 2}
    assert got[2] == (1, 2, 1)   # {1} (self-loop dropped in simple view)


def test_degree_isolated_vertex_zero(spark):
    verts = None
    edges = edge_df(spark, [(0, 1)])
    verts = edges.sparkSession.createDataFrame([(0,), (1,), (7,)], "vid long")
    got = {r["vid"]: (r["out_deg"], r["in_deg"], r["deg"]) for r in
           degree_centrality(spark, edges, vertices=verts).collect()}
    assert got[7] == (0, 0, 0)
    assert got[0] == (1, 0, 1)


def test_degree_assortativity_signs(spark):
    from neo4j_graph_algorithms_spark.operators.degrees import degree_assortativity
    from tests.conftest import edge_df

    # star = maximally disassortative (r = -1)
    star = [(0, i) for i in range(1, 6)]
    r = degree_assortativity(spark, edge_df(spark, star)).collect()[0]["assortativity"]
    assert r == pytest.approx(-1.0)
    # two disjoint cliques of different sizes: every endpoint pair has equal
    # degrees -> r = 1
    k3 = [(a, b) for a in range(3) for b in range(3) if a < b]
    k4 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    r2 = degree_assortativity(spark, edge_df(spark, k3 + k4)).collect()[0]["assortativity"]
    assert r2 == pytest.approx(1.0)


def test_degree_distribution_hand_values(spark):
    from neo4j_graph_algorithms_spark.operators.degrees import degree_distribution

    # path 0-1-2-3 plus hub 4 connected to all: degs = [2,3,3,2,4]
    pairs = [(0, 1), (1, 2), (2, 3), (4, 0), (4, 1), (4, 2), (4, 3)]
    row = degree_distribution(spark, edge_df(spark, pairs)).collect()[0]
    assert row["n_vertices"] == 5
    assert row["n_edges"] == 7
    assert (row["min_deg"], row["max_deg"], row["sum_deg"]) == (2, 4, 14)
    # sorted degs [2,2,3,3,4]: ceil-rank discrete percentiles
    assert row["p50_deg"] == 3   # rank ceil(2.5)=3 -> value 3
    assert row["p90_deg"] == 4   # rank ceil(4.5)=5 -> value 4
    assert row["p99_deg"] == 4


def test_degree_distribution_isolated_and_selfloop(spark):
    from neo4j_graph_algorithms_spark.operators.degrees import degree_distribution

    edges = edge_df(spark, [(0, 1), (2, 2)])
    verts = spark.createDataFrame([(0,), (1,), (2,), (9,)], "vid long")
    row = degree_distribution(spark, edges, vertices=verts).collect()[0]
    # self-loop and isolated vertex both have simple degree 0
    assert row["n_vertices"] == 4
    assert (row["min_deg"], row["max_deg"], row["sum_deg"], row["n_edges"]) == (0, 1, 2, 1)
    assert row["p50_deg"] == 0   # sorted [0,0,1,1], rank 2 -> 0
    assert row["p90_deg"] == 1


def test_degree_distribution_empty_graph_one_null_row(spark):
    from neo4j_graph_algorithms_spark.operators.degrees import degree_distribution

    empty = spark.createDataFrame([], "src long, dst long")
    rows = degree_distribution(spark, empty).collect()
    # one all-NULL row — the same shape as the SQL twin's aggregate
    assert len(rows) == 1
    assert all(v is None for v in rows[0].asDict().values())


# ---- rich_club --------------------------------------------------------------


def _expected_rich_club(edges):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    out = {}
    for k in sorted(set(deg.values())):
        club = {v for v, d in deg.items() if d > k}
        if len(club) < 2:
            continue
        e = sum(1 for a, b in und if a in club and b in club)
        out[k] = (
            len(club),
            e,
            e * 2_000_000 // (len(club) * (len(club) - 1)),
        )
    return out


def test_rich_club_star_plus_clique(spark):
    from neo4j_graph_algorithms_spark.operators.degrees import rich_club
    from tests.conftest import edge_df

    # K4 core {0,1,2,3} + pendant leaves on 0 — hubs interlink maximally
    edges = [(i, j) for i in range(4) for j in range(i + 1, 4)] + [
        (0, 10),
        (0, 11),
        (0, 12),
    ]
    got = {
        r.k: (r.n_nodes, r.n_edges, r.phi_q6)
        for r in rich_club(spark, edge_df(spark, edges)).collect()
    }
    assert got == _expected_rich_club(edges)
    assert got[1] == (4, 6, 1_000_000)  # the >1 club is exactly K4: phi = 1


def test_rich_club_random_and_reshard(spark):
    import random

    from neo4j_graph_algorithms_spark.operators.degrees import rich_club
    from tests.conftest import edge_df

    rng = random.Random(31)
    edges = sorted({(rng.randrange(20), rng.randrange(20)) for _ in range(50)})
    df = edge_df(spark, edges)
    got = {
        r.k: (r.n_nodes, r.n_edges, r.phi_q6)
        for r in rich_club(spark, df).collect()
    }
    assert got == _expected_rich_club(edges)
    got2 = {
        r.k: (r.n_nodes, r.n_edges, r.phi_q6)
        for r in rich_club(spark, df.repartition(7)).collect()
    }
    assert got2 == got


def test_degree_gini_star_and_cycle(spark):
    from neo4j_graph_algorithms_spark.operators.degrees import degree_gini
    from tests.conftest import edge_df

    # star K(1,5): degrees sorted [1,1,1,1,1,5] → G = (2·45 − 7·10)/(6·10) = 1/3
    star = [(0, i) for i in range(1, 6)]
    row = degree_gini(spark, edge_df(spark, star)).collect()[0]
    assert (row["n_vertices"], row["sum_deg"]) == (6, 10)
    assert row["gini_q6"] == pytest.approx(1 / 3, abs=1e-6)
    # regular graph (6-cycle): all degrees equal → G = 0
    cycle = [(i, (i + 1) % 6) for i in range(6)]
    row = degree_gini(spark, edge_df(spark, cycle)).collect()[0]
    assert row["gini_q6"] == 0.0


def test_degree_gini_multigraph_invariance(spark):
    from neo4j_graph_algorithms_spark.operators.degrees import degree_gini
    from tests.conftest import edge_df

    # parallel edges, reverses, and self-loops must not change the
    # undirected-simple degree view
    base = [(0, 1), (1, 2), (2, 0), (0, 3)]
    noisy = base + [(1, 0), (0, 1), (3, 3)]
    g1 = degree_gini(spark, edge_df(spark, base)).collect()[0]
    g2 = degree_gini(spark, edge_df(spark, noisy)).collect()[0]
    assert g1 == g2


def test_degree_powerlaw_matches_python(spark):
    import math

    from neo4j_graph_algorithms_spark.operators.degrees import degree_powerlaw
    from tests.conftest import edge_df

    # hub-skewed toy: one hub of degree 8, spokes of degree 1-2
    pairs = [(0, i) for i in range(1, 9)] + [(1, 2), (3, 4), (5, 6)]
    degs = {}
    simple = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    for a, b in simple:
        degs[a] = degs.get(a, 0) + 1
        degs[b] = degs.get(b, 0) + 1
    dmin = 1
    tail = [d for d in degs.values() if d >= dmin]
    s = sum(round(math.log(d / (dmin - 0.5)) * 1_000_000) for d in tail) / 1e6
    alpha = 1.0 + len(tail) / s
    row = degree_powerlaw(spark, edge_df(spark, pairs), dmin=dmin).collect()[0]
    assert row["dmin"] == dmin and row["n_tail"] == len(tail)
    assert row["alpha_q6"] == pytest.approx(alpha, abs=1e-6)
    assert row["sigma_q6"] == pytest.approx((alpha - 1) / math.sqrt(len(tail)), abs=1e-6)


def test_graph_reciprocity_hand_values(spark):
    from neo4j_graph_algorithms_spark.operators.degrees import graph_reciprocity
    from tests.conftest import edge_df

    # 0↔1 mutual, 1→2 one-way, 2→2 self-loop (excluded), 0→1 duplicate
    pairs = [(0, 1), (1, 0), (1, 2), (2, 2), (0, 1)]
    row = graph_reciprocity(spark, edge_df(spark, pairs)).collect()[0]
    # distinct non-loop edges: (0,1),(1,0),(1,2) → 2 of 3 reciprocal
    assert (row["n_edges"], row["n_reciprocal"]) == (3, 2)
    assert row["reciprocity_q6"] == pytest.approx(2 / 3, abs=1e-6)


def test_graph_reciprocity_extremes(spark):
    from neo4j_graph_algorithms_spark.operators.degrees import graph_reciprocity
    from tests.conftest import edge_df

    # fully symmetric graph → 1.0
    sym = [(0, 1), (1, 0), (1, 2), (2, 1)]
    assert graph_reciprocity(spark, edge_df(spark, sym)).collect()[0][
        "reciprocity_q6"
    ] == 1.0
    # pure DAG → 0.0
    dag = [(0, 1), (1, 2), (0, 2)]
    assert graph_reciprocity(spark, edge_df(spark, dag)).collect()[0][
        "reciprocity_q6"
    ] == 0.0


def test_two_hop_ball_path_graph(spark):
    from neo4j_graph_algorithms_spark.operators.degrees import two_hop_ball_sizes

    # path 0-1-2-3-4: ball2 sizes 2,3,4,3,2
    got = {
        r.vid: (r.n1, r.n2)
        for r in two_hop_ball_sizes(
            edge_df(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
        ).collect()
    }
    assert got == {0: (1, 2), 1: (2, 3), 2: (2, 4), 3: (2, 3), 4: (1, 2)}


def test_two_hop_ball_matches_python_bfs(spark):
    import random
    from collections import defaultdict

    from neo4j_graph_algorithms_spark.operators.degrees import two_hop_ball_sizes

    rng = random.Random(31)
    pairs = sorted({(rng.randrange(25), rng.randrange(25)) for _ in range(60)})
    pairs = [(a, b) for a, b in pairs if a != b]
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for v in adj:
        ball = set(adj[v])
        for u in adj[v]:
            ball |= adj[u]
        ball.discard(v)
        want[v] = (len(adj[v]), len(ball))
    got = {
        r.vid: (r.n1, r.n2)
        for r in two_hop_ball_sizes(edge_df(spark, pairs)).collect()
    }
    assert got == want


def test_two_hop_ball_hub_cap_drops_wedges_through_hubs(spark):
    from neo4j_graph_algorithms_spark.operators.degrees import two_hop_ball_sizes

    # star center 0 with leaves 1..4: capping centers at degree 2 removes
    # all wedges THROUGH 0, so each leaf sees only the center (n2 = 1)
    pairs = [(0, i) for i in range(1, 5)]
    got = {
        r.vid: (r.n1, r.n2)
        for r in two_hop_ball_sizes(edge_df(spark, pairs), max_degree=2).collect()
    }
    assert got[1] == (1, 1) and got[0] == (4, 4)


def test_avg_neighbor_degree_star(spark):
    from neo4j_graph_algorithms_spark.operators.degrees import avg_neighbor_degree

    # star 0-{1,2,3}: leaves have deg 1, their one neighbor has deg 3 ->
    # knn(1) = 3; center deg 3, neighbors all deg 1 -> knn(3) = 1
    got = {
        r.deg: (r.n_vertices, r.sum_nbr_deg_sum, r.knn)
        for r in avg_neighbor_degree(
            edge_df(spark, [(0, 1), (0, 2), (0, 3)])
        ).collect()
    }
    assert got == {1: (3, 9, 3.0), 3: (1, 3, 1.0)}


def test_avg_neighbor_degree_matches_python(spark):
    import random
    from collections import defaultdict

    from neo4j_graph_algorithms_spark.operators.degrees import avg_neighbor_degree

    rng = random.Random(53)
    pairs = sorted({(rng.randrange(20), rng.randrange(20)) for _ in range(50)})
    pairs = [(a, b) for a, b in pairs if a != b]
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    per_class = defaultdict(lambda: [0, 0])
    for v, ns in adj.items():
        k = len(ns)
        per_class[k][0] += 1
        per_class[k][1] += sum(len(adj[u]) for u in ns)
    want = {
        k: (n, s, s / (k * n)) for k, (n, s) in per_class.items()
    }
    got = {
        r.deg: (r.n_vertices, r.sum_nbr_deg_sum, r.knn)
        for r in avg_neighbor_degree(edge_df(spark, pairs)).collect()
    }
    assert got == want
