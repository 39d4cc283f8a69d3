"""Label propagation vs the fork's executable spec
(LabelPropagationProcIntegrationTest.java:49-199 — commented out upstream,
semantics in FIXTURES.md F6a)."""

from neo4j_graph_algorithms_spark.operators.lpa import lpa
from tests.conftest import collect_map


def _f6a(spark):
    """a(vid 0, seed 42), b(vid 1, seed 42); a→ nodes 2..6, b→ nodes 7..11;
    weights (1,2,1,1,8), child seeds (1,1,1,1,2)."""
    edges = []
    for child, w in zip(range(2, 7), (1.0, 2.0, 1.0, 1.0, 8.0)):
        edges.append((0, child, w))
    for child, w in zip(range(7, 12), (1.0, 2.0, 1.0, 1.0, 8.0)):
        edges.append((1, child, w))
    edges_df = spark.createDataFrame(edges, "src long, dst long, weight double")
    seed_rows = [(0, 42), (1, 42)]
    seed_rows += [(v, p) for v, p in zip(range(2, 7), (1, 1, 1, 1, 2))]
    seed_rows += [(v, p) for v, p in zip(range(7, 12), (1, 1, 1, 1, 2))]
    seeds = spark.createDataFrame(seed_rows, "vid long, label long")
    return edges_df, seeds


def test_lpa_outgoing_weighted_majority(spark):
    edges, seeds = _f6a(spark)
    res = lpa(spark, edges, seeds=seeds, direction="OUTGOING", max_iterations=1)
    labels = collect_map(res.state, "vid", "label")
    # weight-8 neighbor (partition 2) dominates partitions 1 (total 5)
    assert labels[0] == 2 and labels[1] == 2
    # children have no out-neighbors → keep their seeds
    assert labels[2] == 1 and labels[6] == 2


def test_lpa_seed_fallback_node_ids(spark):
    edges, _ = _f6a(spark)
    res = lpa(spark, edges, seeds=None, direction="OUTGOING", max_iterations=1)
    labels = collect_map(res.state, "vid", "label")
    # votes are over neighbor ids; weight-8 child wins: a→6, b→11 (:139-151)
    assert labels[0] == 6 and labels[1] == 11


def test_lpa_incoming_children_adopt_parent(spark):
    edges, seeds = _f6a(spark)
    res = lpa(spark, edges, seeds=seeds, direction="INCOMING", max_iterations=1)
    labels = collect_map(res.state, "vid", "label")
    for child in range(2, 12):
        assert labels[child] == 42  # children adopt the parent's 42 (:166-174)


def test_lpa_convergence_flag(spark):
    edges, seeds = _f6a(spark)
    # children never change; parents flip once then stay → converges in 2 iters
    res = lpa(spark, edges, seeds=seeds, direction="OUTGOING", max_iterations=10)
    assert res.did_converge
    assert res.iterations <= 3


def test_lpa_node_weights(spark):
    """nodeWeight × relWeight: boost node 3's weight so partition 1 wins."""
    edges, seeds = _f6a(spark)
    nw = spark.createDataFrame([(3, 10.0), (8, 10.0)], "vid long, nweight double")
    res = lpa(
        spark, edges, seeds=seeds, node_weights=nw, direction="OUTGOING", max_iterations=1
    )
    labels = collect_map(res.state, "vid", "label")
    # partition 1: 1 + 2*10 + 1 + 1 = 23 > 8 → parents adopt 1
    assert labels[0] == 1 and labels[1] == 1


def test_lpa_deterministic_tie_break(spark):
    """Equal-weight tie adopts the smallest label."""
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 1.0)], "src long, dst long, weight double"
    )
    seeds = spark.createDataFrame([(1, 7), (2, 5)], "vid long, label long")
    res = lpa(spark, edges, seeds=seeds, max_iterations=1)
    labels = collect_map(res.state, "vid", "label")
    assert labels[0] == 5


def test_weighted_votes_beat_count_votes(spark):
    # vertex 0 hears: label 9 from ONE heavy edge (w=5) vs label 2 from TWO
    # light edges (w=1 each, seeded to share label 2).  Weighted LPA adopts
    # 9 (wsum 5 > 2); count-based voting would adopt 2 — and so would the
    # tie-break (2 < 9), so this discriminates weight handling.
    edges = spark.createDataFrame(
        [(0, 1, 5.0), (0, 2, 1.0), (0, 3, 1.0)],
        "src long, dst long, weight double",
    )
    seeds = spark.createDataFrame(
        [(1, 9), (2, 2), (3, 2)], "vid long, label long"
    )
    res = lpa(spark, edges, seeds=seeds, max_iterations=1)
    got = {r["vid"]: r["label"] for r in res.state.collect()}
    assert got[0] == 9
