"""Louvain phase-1 tests: planted two-clique graph, modularity values."""

from __future__ import annotations

import itertools

import pytest

from neo4j_graph_algorithms_spark.operators.louvain import louvain, modularity_df

from tests.conftest import edge_df


def _two_cliques(spark):
    """K4 on {0..3} + K4 on {4..7} + one bridge 3-4."""
    pairs = (
        list(itertools.combinations(range(4), 2))
        + list(itertools.combinations(range(4, 8), 2))
        + [(3, 4)]
    )
    return edge_df(spark, pairs)


def test_louvain_finds_planted_cliques(spark):
    edges = _two_cliques(spark)
    got = {r.vid: r.community for r in louvain(spark, edges).collect()}
    assert got[0] == got[1] == got[2] == got[3]
    assert got[4] == got[5] == got[6] == got[7]
    assert got[0] != got[4]
    assert got[0] == 0 and got[4] == 4  # canonical min-member ids


def test_modularity_of_planted_partition(spark):
    edges = _two_cliques(spark)
    assign = spark.createDataFrame(
        [(i, 0 if i < 4 else 4) for i in range(8)], "vid long, community long"
    )
    q = modularity_df(spark, edges, assign).collect()[0].modularity
    # m=13; w_in=6 each; deg(c)=13 each: Q = 2*(6/13 - (13/26)^2) = 12/13 - 1/2
    assert q == pytest.approx(round(12 / 13 - 0.5, 6))


def test_modularity_singleton_partition_negative(spark):
    edges = edge_df(spark, [(0, 1), (1, 2)])
    assign = spark.createDataFrame([(i, i) for i in range(3)], "vid long, community long")
    q = modularity_df(spark, edges, assign).collect()[0].modularity
    # all edges cross communities: Q = -Σ (deg_c/2m)^2 = -(1/16 + 4/16 + 1/16)
    assert q == pytest.approx(-6 / 16)


def test_louvain_improves_modularity_over_singletons(spark):
    edges = _two_cliques(spark)
    assign = louvain(spark, edges)
    q = modularity_df(spark, edges, assign).collect()[0].modularity
    assert q == pytest.approx(round(12 / 13 - 0.5, 6))


def test_louvain_empty(spark):
    empty = edge_df(spark, [])
    assert louvain(spark, empty).count() == 0


def test_louvain_metric_every_matches_default(spark):
    """metric_every only changes WHEN the moved-count join runs, never the
    move trajectory: identical assignments for a fixed iteration budget."""
    from neo4j_graph_algorithms_spark.sources.synth import planted_partition_graph

    g = planted_partition_graph(spark, groups=4, group_size=6)
    a = {r.vid: r.community for r in louvain(spark, g, max_iterations=4).collect()}
    b = {
        r.vid: r.community
        for r in louvain(spark, g, max_iterations=4, metric_every=3).collect()
    }
    assert a == b


def test_louvain_fixed2_planted_deterministic(spark):
    """The louvain_fixed2_planted gate's Spark half is run-to-run
    deterministic (the oracle parity then hinges only on exact arithmetic,
    which the power-of-two m guarantees)."""
    from neo4j_graph_algorithms_spark.sources.synth import planted_partition_graph

    g = planted_partition_graph(spark, groups=4, group_size=6)
    runs = [
        {r.vid: r.community for r in louvain(spark, g, max_iterations=2).collect()}
        for _ in range(2)
    ]
    assert runs[0] == runs[1]
    # after both halves moved once, the four planted groups are already
    # separated (each node sits with >= its own group)
    import collections

    sizes = collections.Counter(runs[0].values())
    assert len(sizes) <= 8  # moving toward 4 communities, never fragmenting up


def test_planted_partition_edge_count_power_of_two(spark):
    from neo4j_graph_algorithms_spark.sources.synth import planted_partition_graph

    g = planted_partition_graph(spark, groups=4, group_size=6)
    n = g.count()
    assert n == 64 and (n & (n - 1)) == 0


def test_louvain_resume_from_checkpoint(spark, tmp_path):
    """North rule: louvain resumes mid-algorithm from durable checkpoints.
    Run 1 stops after 2 sub-steps (checkpoint committed); run 2 resumes and
    must land on the planted two-clique partition — and because the movable
    half alternates on the GLOBAL sub-step index, the resumed run continues
    with the correct parity."""
    edges = _two_cliques(spark)
    ck = str(tmp_path / "louvain-ck")
    louvain(spark, edges, max_iterations=2, checkpoint_dir=ck, checkpoint_interval=1)
    import os

    assert os.path.isdir(os.path.join(ck, "state"))
    got = {
        r.vid: r.community
        for r in louvain(
            spark, edges, max_iterations=20, checkpoint_dir=ck, resume=True
        ).collect()
    }
    assert got[0] == got[1] == got[2] == got[3] == 0
    assert got[4] == got[5] == got[6] == got[7] == 4


def test_conductance_hand_values(spark):
    from neo4j_graph_algorithms_spark.operators.louvain import conductance_df
    from tests.conftest import edge_df

    # two triangles joined by one bridge; assignment = the two triangles
    pairs = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    assign = spark.createDataFrame(
        [(v, 0) for v in (0, 1, 2)] + [(v, 1) for v in (3, 4, 5)],
        "vid long, community long",
    )
    out = {r["community"]: r for r in
           conductance_df(spark, edge_df(spark, pairs), assign).collect()}
    # each side: internal 3, cut 1 -> 1/7
    for c in (0, 1):
        assert out[c]["internal_w"] == 3.0
        assert out[c]["cut_w"] == 1.0
        assert out[c]["conductance"] == round(1 / 7, 6)


def test_conductance_isolated_community_is_zero(spark):
    from neo4j_graph_algorithms_spark.operators.louvain import conductance_df
    from tests.conftest import edge_df

    pairs = [(0, 1)]
    assign = spark.createDataFrame(
        [(0, 0), (1, 0), (9, 5)], "vid long, community long"
    )
    out = {r["community"]: r["conductance"]
           for r in conductance_df(spark, edge_df(spark, pairs), assign).collect()}
    assert out[0] == 0.0  # no cut edges
    assert out[5] == 0.0  # isolated community, vol 0


# --- r5: integer_gains deterministic gate mode ------------------------------


def _python_louvain_int(pairs, weights, rounds):
    """Pure-Python EXACT twin of louvain(integer_gains=True): same
    2m²-scaled integer gain rule, smaller-community tie-break, alternating
    even/odd halves, min-member canonicalization.  Independent of both
    engines — the pytest-side ground truth for the louvain_communities
    value gate (the DuckDB twin is oracles.louvain_int_sql)."""
    from collections import defaultdict

    acc = defaultdict(int)
    for (s, d), w in zip(pairs, weights):
        if s == d:
            continue
        acc[(min(s, d), max(s, d))] += int(w)
    adj = defaultdict(list)
    for (s, d), w in acc.items():
        adj[s].append((d, w))
        adj[d].append((s, w))
    ki = {v: sum(w for _, w in nbrs) for v, nbrs in adj.items()}
    w2 = sum(ki.values())
    comm = {v: v for v in adj}
    for it in range(rounds):
        sigma = defaultdict(int)
        for v in adj:
            sigma[comm[v]] += ki[v]
        new = {}
        for v in adj:
            kin = defaultdict(int)
            for u, w in adj[v]:
                kin[comm[u]] += w
            best, bg = None, None
            for c in sorted(kin):
                sadj = sigma[c] - (ki[v] if c == comm[v] else 0)
                g = w2 * kin[c] - ki[v] * sadj
                if bg is None or g > bg:
                    best, bg = c, g
            sg = w2 * kin.get(comm[v], 0) - ki[v] * (sigma[comm[v]] - ki[v])
            movable = v % 2 == it % 2
            new[v] = best if (movable and best is not None and bg > sg) else comm[v]
        comm = new
    canon = {}
    for v, c in comm.items():
        canon[c] = min(canon.get(c, v), v)
    return {v: canon[c] for v, c in comm.items()}


def test_louvain_integer_gains_matches_python_twin(spark):
    """integer_gains trajectory == the pure-Python exact twin at every
    cut-off depth, on an integer-weighted non-trivial fixture."""
    import itertools

    pairs = (
        list(itertools.combinations(range(4), 2))
        + list(itertools.combinations(range(4, 8), 2))
        + [(3, 4), (0, 5), (2, 7)]
    )
    weights = [((s + d) % 3) + 1 for s, d in pairs]
    edges = edge_df(spark, pairs, weights)
    for rounds in (1, 2, 4):
        got = {
            r.vid: r.community
            for r in louvain(
                spark, edges, max_iterations=rounds, integer_gains=True
            ).collect()
        }
        want = _python_louvain_int(pairs, weights, rounds)
        assert got == want, f"rounds={rounds}"


def test_louvain_integer_gains_finds_planted_cliques(spark):
    edges = _two_cliques(spark)
    got = {
        r.vid: r.community
        for r in louvain(spark, edges, integer_gains=True).collect()
    }
    assert got[0] == got[1] == got[2] == got[3] == 0
    assert got[4] == got[5] == got[6] == got[7] == 4


def test_louvain_integer_gains_matches_float_path(spark):
    """On integer weights with well-separated gains the exact-integer and
    float decision rules agree (the float epsilon 1e-15 is far below any
    gain gap here)."""
    edges = _two_cliques(spark)
    a = {
        r.vid: r.community
        for r in louvain(spark, edges, max_iterations=4).collect()
    }
    b = {
        r.vid: r.community
        for r in louvain(
            spark, edges, max_iterations=4, integer_gains=True
        ).collect()
    }
    assert a == b
