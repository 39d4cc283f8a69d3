"""MetaPath computation vs a brute-force pure-Python oracle.

The fork ships no metapath tests (SURVEY.md §5); the oracle below replays
impl/metapath/ComputeAllMetaPaths.java:100-173 semantics exactly: seed 1 per
(node, label-of-node); expand over UNDIRECTED adjacency; neighbor contributes
its FIRST label; counts are walk-instance counts.
"""

from collections import defaultdict

import pytest

from neo4j_graph_algorithms_spark.operators.metapath import (
    compute_all_metapaths,
    filter_metapaths,
    get_schema,
)

# F7: heterogeneous fixture — 12 nodes, labels = lang buckets {0:py, 1:js, 2:md},
# edge types {0:IMPORT, 1:COCOMMIT}; deterministic hand-written topology.
F7_LABELS = {
    0: [0], 1: [0], 2: [0, 2], 3: [1], 4: [1], 5: [2],
    6: [0], 7: [1], 8: [2], 9: [0], 10: [1, 0], 11: [2],
}
F7_EDGES = [  # (src, dst, type) — stored directed, semantics undirected
    (0, 1, 0), (1, 2, 0), (2, 3, 1), (3, 4, 0), (4, 5, 1), (5, 0, 1),
    (6, 7, 0), (7, 8, 1), (8, 9, 0), (9, 10, 1), (10, 11, 0), (11, 6, 1),
    (0, 6, 1), (1, 7, 0), (2, 8, 1), (3, 9, 0), (4, 10, 1), (5, 11, 0),
    (0, 3, 0), (2, 10, 0),
]


def oracle_metapaths(labels, edges, length):
    """Pure-Python replay of ComputeAllMetaPaths (level-synchronous)."""
    adj = defaultdict(list)
    for s, d, t in edges:
        adj[s].append((d, t))
        if s != d:
            adj[d].append((s, t))
    primary = {v: ls[0] for v, ls in labels.items()}
    # state: {(path_tuple, vid): cnt}
    state = defaultdict(int)
    for v, ls in labels.items():
        for l in ls:
            state[((str(l),), v)] += 1
    totals = defaultdict(int)
    for (p, v), c in state.items():
        totals["|".join(p)] += c
    for _ in range(1, length):
        nxt = defaultdict(int)
        for (p, v), c in state.items():
            for (u, t) in adj[v]:
                nxt[(p + (str(t), str(primary[u])), u)] += c
        state = nxt
        for (p, v), c in state.items():
            totals["|".join(p)] += c
    return dict(totals)


@pytest.fixture(scope="module")
def f7(spark):
    edges = spark.createDataFrame(F7_EDGES, "src long, dst long, type int")
    labels = spark.createDataFrame(
        [(v, ls) for v, ls in F7_LABELS.items()], "vid long, labels array<int>"
    )
    return edges, labels


@pytest.mark.parametrize("length", [1, 2, 3])
def test_metapath_counts_match_oracle(spark, f7, length):
    edges, labels = f7
    got = {r["path"]: r["cnt"] for r in compute_all_metapaths(spark, edges, labels, length).collect()}
    want = oracle_metapaths(F7_LABELS, F7_EDGES, length)
    assert got == want


def test_metapath_between_types(spark, f7):
    edges, labels = f7
    got = {
        r["path"]: r["cnt"]
        for r in compute_all_metapaths(
            spark, edges, labels, 3, start_labels=[0], end_labels=[2]
        ).collect()
    }
    want = {
        p: c
        for p, c in oracle_metapaths(F7_LABELS, F7_EDGES, 3).items()
        if p.split("|")[0] == "0" and p.split("|")[-1] == "2"
    }
    assert got == want


def test_metapath_for_instances(spark, f7):
    edges, labels = f7
    seed = spark.createDataFrame([(0,), (6,)], "vid long")
    got = {
        r["path"]: r["cnt"]
        for r in compute_all_metapaths(spark, edges, labels, 2, seed_vertices=seed).collect()
    }
    # oracle with seeds restricted to {0, 6}
    labels_seeded = {v: ls for v, ls in F7_LABELS.items() if v in (0, 6)}
    adj_labels = F7_LABELS
    from collections import defaultdict as dd

    adj = dd(list)
    for s, d, t in F7_EDGES:
        adj[s].append((d, t))
        adj[d].append((s, t))
    primary = {v: ls[0] for v, ls in adj_labels.items()}
    want = dd(int)
    state = dd(int)
    for v, ls in labels_seeded.items():
        for l in ls:
            state[((str(l),), v)] += 1
    for (p, v), c in state.items():
        want["|".join(p)] += c
    for (p, v), c in list(state.items()):
        for (u, t) in adj[v]:
            want["|".join(p + (str(t), str(primary[u])))] += c
    assert got == dict(want)


def test_get_schema(spark, f7):
    edges, labels = f7
    schema = {(r.src_label, r.type, r.dst_label) for r in get_schema(spark, edges, labels).collect()}
    # spot checks: edge (0,1,IMPORT) both label 0 → (0,0,0); (4,5,COCOMMIT): labels 1,2 → (1,1,2)
    assert (0, 0, 0) in schema
    assert (1, 1, 2) in schema
    # canonicalized: src_label <= dst_label always
    assert all(s <= d for s, _, d in schema)


def test_filter_metapaths(spark, f7):
    edges, labels = f7
    mp = compute_all_metapaths(spark, edges, labels, 2)
    only = filter_metapaths(mp, start_label=0, end_label=2).collect()
    assert len(only) > 0
    for r in only:
        parts = r["path"].split("|")
        assert parts[0] == "0" and parts[-1] == "2"


def test_metapath_explosion_guard(spark, f7):
    edges, labels = f7
    with pytest.raises(RuntimeError, match="explosion"):
        compute_all_metapaths(spark, edges, labels, 3, max_paths=2)
