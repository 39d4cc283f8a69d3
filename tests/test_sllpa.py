"""SLPA overlapping communities: structure, determinism, overlap."""

from neo4j_graph_algorithms_spark.operators.sllpa import sllpa
from tests.conftest import edge_df


def _two_cliques_with_bridge():
    k1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    k2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    return k1 + k2 + [(3, 10)]  # 3-10 bridges the cliques


def test_cliques_converge_to_their_labels(spark):
    out = sllpa(spark, edge_df(spark, _two_cliques_with_bridge()),
                iterations=8, threshold=0.3, seed=1).collect()
    members = {}
    for r in out:
        members.setdefault(r["label"], set()).add(r["vid"])
    # each clique shares at least one dominant community covering it
    assert any({0, 1, 2, 3} <= m for m in members.values()), members
    assert any({10, 11, 12, 13} <= m for m in members.values()), members


def test_deterministic_and_seed_sensitive(spark):
    pairs = _two_cliques_with_bridge()
    a = sorted(map(tuple, sllpa(spark, edge_df(spark, pairs), iterations=4, seed=1).collect()))
    b = sorted(map(tuple, sllpa(spark, edge_df(spark, pairs), iterations=4, seed=1).collect()))
    assert a == b
    # different seed: same algorithm, possibly different draws (don't
    # require inequality — small graphs can coincide — just validity)
    c = sllpa(spark, edge_df(spark, pairs), iterations=4, seed=2).collect()
    assert all(r["label"] in {v for e in pairs for v in e} for r in c)


def test_overlap_possible_at_low_threshold(spark):
    out = sllpa(spark, edge_df(spark, _two_cliques_with_bridge()),
                iterations=8, threshold=0.2, seed=1).collect()
    per_vid = {}
    for r in out:
        per_vid.setdefault(r["vid"], set()).add(r["label"])
    assert max(len(v) for v in per_vid.values()) >= 2  # someone overlaps


def test_every_vertex_keeps_a_membership(spark):
    # vertex 9 is self-loop-only (isolated after canonicalization): its
    # memory stays at the single self-label, below threshold*(iters+1) —
    # the gds.sllpa fallback keeps it in its own community instead of
    # dropping it, and every vertex has >= 1 membership
    pairs = _two_cliques_with_bridge() + [(9, 9)]
    out = sllpa(spark, edge_df(spark, pairs), iterations=4,
                threshold=0.3, seed=1).collect()
    per_vid = {}
    for r in out:
        per_vid.setdefault(r["vid"], set()).add(r["label"])
    assert per_vid[9] == {9}
    assert set(per_vid) == {v for e in pairs for v in e}
