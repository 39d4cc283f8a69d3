"""Deterministic random-walk sampler: reproducibility, sink handling,
neighbor-choice validity."""

from __future__ import annotations

from neo4j_graph_algorithms_spark.operators.walks import random_walks
from tests.conftest import edge_df


def _collect(df):
    return sorted((r.walk_id, r.step, r.vid) for r in df.collect())


def test_walks_deterministic_and_valid(spark):
    pairs = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (3, 0)]
    a = _collect(random_walks(spark, edge_df(spark, pairs), walk_length=5, seed=7))
    b = _collect(random_walks(spark, edge_df(spark, pairs), walk_length=5, seed=7))
    assert a == b  # same seed -> identical corpus
    edges = set(pairs)
    by_walk = {}
    for wid, step, vid in a:
        by_walk.setdefault(wid, []).append((step, vid))
    for wid, seq in by_walk.items():
        seq.sort()
        assert seq[0][0] == 0 and seq[0][1] == wid  # walks_per_node=1: id=start
        for (s1, u), (s2, v) in zip(seq, seq[1:]):
            assert s2 == s1 + 1 and (u, v) in edges  # every hop is a real edge


def test_walks_seed_changes_corpus(spark):
    pairs = [(i, j) for i in range(6) for j in range(6) if i != j]
    a = _collect(random_walks(spark, edge_df(spark, pairs), walk_length=4, seed=1))
    b = _collect(random_walks(spark, edge_df(spark, pairs), walk_length=4, seed=2))
    assert a != b


def test_walks_stop_at_sinks(spark):
    # 0 -> 1 -> 2, 2 is a sink: every walk ends by step 2
    got = _collect(random_walks(spark, edge_df(spark, [(0, 1), (1, 2)]), walk_length=9))
    steps = {}
    for wid, step, vid in got:
        steps.setdefault(wid, []).append(step)
    assert max(steps[0]) == 2  # from 0: two hops then sink
    assert max(steps[1]) == 1
    assert max(steps[2]) == 0  # the sink emits only its start row


def test_walks_per_node_ids(spark):
    got = _collect(
        random_walks(spark, edge_df(spark, [(0, 1), (1, 0)]), walk_length=1, walks_per_node=3)
    )
    start_rows = [(w, v) for w, s, v in got if s == 0]
    assert sorted(start_rows) == [(0, 0), (1, 0), (2, 0), (3, 1), (4, 1), (5, 1)]


def test_skipgram_pairs_window(spark):
    from neo4j_graph_algorithms_spark.operators.walks import walk_skipgram_pairs

    walks = spark.createDataFrame(
        [(0, 0, 10), (0, 1, 11), (0, 2, 12), (0, 3, 13), (1, 0, 20)],
        "walk_id long, step int, vid long",
    )
    got = sorted(
        (r.walk_id, r.center, r.context, r.offset)
        for r in walk_skipgram_pairs(walks, window=2).collect()
    )
    # center 10 (step 0): contexts at steps 1,2 only
    assert [(c, x, o) for w, c, x, o in got if c == 10] == [(10, 11, 1), (10, 12, 2)]
    # center 11: contexts at -1, +1, +2
    assert [(x, o) for w, c, x, o in got if c == 11] == [(10, -1), (12, 1), (13, 2)]
    # single-row walk 1 emits nothing
    assert not [t for t in got if t[0] == 1]
    # unordered mode keeps only positive offsets
    half = walk_skipgram_pairs(walks, window=2, ordered=False).collect()
    assert all(r.offset >= 1 for r in half)


# -- k-hop fixed-fanout sampling -------------------------------------------------


def test_khop_fanout_caps_per_vertex(spark):
    from neo4j_graph_algorithms_spark.operators.walks import khop_fanout_sample
    from tests.conftest import edge_df

    # vertex 0 has 5 out-neighbors; fanout 3 keeps exactly 3
    pairs = [(0, i) for i in range(1, 6)] + [(1, 10), (2, 11)]
    out = khop_fanout_sample(spark, edge_df(spark, pairs), fanouts=(3,)).collect()
    per_src = {}
    for r in out:
        per_src.setdefault(r["src"], set()).add(r["dst"])
    assert len(per_src[0]) == 3
    assert all(len(v) <= 3 for v in per_src.values())


def test_khop_layer2_expands_only_from_sampled_frontier(spark):
    from neo4j_graph_algorithms_spark.operators.walks import khop_fanout_sample
    from tests.conftest import edge_df

    pairs = [(0, 1), (1, 2), (2, 3)]
    out = khop_fanout_sample(
        spark, edge_df(spark, pairs), fanouts=(1, 1),
        roots=edge_df(spark, pairs).sparkSession.createDataFrame([(0,)], "vid long"),
    ).collect()
    got = {(r["layer"], r["src"], r["dst"]) for r in out}
    assert got == {(1, 0, 1), (2, 1, 2)}


def test_khop_deterministic_across_runs(spark):
    from neo4j_graph_algorithms_spark.operators.walks import khop_fanout_sample
    from tests.conftest import edge_df

    pairs = [(i, j) for i in range(8) for j in range(8) if i != j]
    a = sorted(map(tuple, khop_fanout_sample(spark, edge_df(spark, pairs), fanouts=(2, 2), seed=7).collect()))
    b = sorted(map(tuple, khop_fanout_sample(spark, edge_df(spark, pairs), fanouts=(2, 2), seed=7).collect()))
    c = sorted(map(tuple, khop_fanout_sample(spark, edge_df(spark, pairs), fanouts=(2, 2), seed=8).collect()))
    assert a == b
    assert a != c  # different seed samples differently


def _py_node2vec(pairs, walk_length, p, q, seed, walks_per_node=1):
    """Independent Python mirror of node2vec_walks (weights + hash pick)."""
    from fractions import Fraction
    from math import lcm

    from neo4j_graph_algorithms_spark.operators.walks import (
        A_CUR, A_SEED, A_STEP, A_WALK, WALK_P,
    )

    fr, fq = Fraction(1) / Fraction(p), Fraction(1) / Fraction(q)
    den = lcm(fr.denominator, fq.denominator)
    w_ret, w_in, w_out = int(fr * den), den, int(fq * den)
    adj = {}
    eset = set(pairs)
    for s, d in pairs:
        adj.setdefault(s, set()).add(d)
    verts = sorted({v for e in pairs for v in e})
    rows = []
    for v in verts:
        for k in range(walks_per_node):
            wid = v * walks_per_node + k
            cur, prev = v, None
            rows.append((wid, 0, cur))
            for step in range(1, walk_length + 1):
                if cur not in adj:
                    break
                cands = sorted(adj[cur])
                wts = [
                    w_ret if c == prev
                    else (w_in if (prev, c) in eset else w_out)
                    for c in cands
                ]
                h = ((cur % WALK_P) * A_CUR + step * A_STEP
                     + (wid % WALK_P) * A_WALK + seed * A_SEED) % WALK_P
                r = h % sum(wts)
                cum = 0
                for c, w in zip(cands, wts):
                    cum += w
                    if r < cum:
                        prev, cur = cur, c
                        break
                rows.append((wid, step, cur))
    return sorted(rows)


def test_node2vec_matches_python_mirror(spark):
    from neo4j_graph_algorithms_spark.operators.walks import node2vec_walks
    from tests.conftest import edge_df

    pairs = [(i, j) for i in range(7) for j in range(7) if (i + 2 * j) % 3 and i != j]
    got = sorted(map(tuple, node2vec_walks(
        spark, edge_df(spark, pairs), walk_length=3, p=2.0, q=0.5, seed=7
    ).collect()))
    assert got == _py_node2vec(pairs, walk_length=3, p=2.0, q=0.5, seed=7)


def test_node2vec_walks_follow_edges_and_stop_at_sinks(spark):
    from neo4j_graph_algorithms_spark.operators.walks import node2vec_walks
    from tests.conftest import edge_df

    pairs = [(0, 1), (1, 2)]  # 2 is a sink
    out = node2vec_walks(spark, edge_df(spark, pairs), walk_length=5).collect()
    by_walk = {}
    for r in out:
        by_walk.setdefault(r["walk_id"], {})[r["step"]] = r["vid"]
    eset = set(pairs)
    for steps in by_walk.values():
        seq = [steps[i] for i in sorted(steps)]
        assert all((a, b) in eset for a, b in zip(seq, seq[1:]))
    # walk from 0 is forced 0->1->2 then stops at the sink
    assert [by_walk[0][i] for i in sorted(by_walk[0])] == [0, 1, 2]
