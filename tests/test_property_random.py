"""Property-based randomized tests: random small graphs vs pure-Python
oracles (SURVEY.md §5 — the reference has no property tests; these harden
the exact-output operators beyond the hand-built fixtures).

Hypothesis generates edge lists; settings keep each Spark round short
(deadline disabled — JVM latency, not algorithm cost)."""

from __future__ import annotations

from collections import deque

from hypothesis import HealthCheck, given, settings, strategies as st

from neo4j_graph_algorithms_spark.csr.wcc import wcc_csr
from neo4j_graph_algorithms_spark.operators.scc import scc
from neo4j_graph_algorithms_spark.operators.paths import sssp
from neo4j_graph_algorithms_spark.operators.triangles import triangle_count
from neo4j_graph_algorithms_spark.operators.wcc import wcc

from tests.conftest import edge_df

EDGES = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)),
    min_size=1,
    max_size=25,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def py_wcc(pairs):
    """Undirected components by BFS; comp = min member id."""
    adj = {}
    nodes = set()
    for s, d in pairs:
        nodes.add(s)
        nodes.add(d)
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    comp = {}
    for start in sorted(nodes):
        if start in comp:
            continue
        q, members = deque([start]), []
        seen = {start}
        while q:
            u = q.popleft()
            members.append(u)
            for v in adj.get(u, ()):
                if v not in seen:
                    seen.add(v)
                    q.append(v)
        m = min(members)
        for u in members:
            comp[u] = m
    return comp


def py_scc(pairs):
    """Tarjan-free SCC oracle: mutual reachability closure, comp = min."""
    nodes = sorted({x for e in pairs for x in e})
    adj = {}
    for s, d in pairs:
        if s != d:
            adj.setdefault(s, set()).add(d)
    def reach(u):
        seen = {u}
        q = deque([u])
        while q:
            x = q.popleft()
            for y in adj.get(x, ()):
                if y not in seen:
                    seen.add(y)
                    q.append(y)
        return seen
    r = {u: reach(u) for u in nodes}
    return {u: min([u] + [v for v in nodes if u in r[v] and v in r[u]]) for u in nodes}


def py_sssp(pairs, source):
    """Unweighted min-hop distances (weights all 1.0)."""
    adj = {}
    for s, d in pairs:
        adj.setdefault(s, set()).add(d)
    dist = {source: 0.0}
    q = deque([source])
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1.0
                q.append(v)
    return dist


def py_triangles(pairs):
    und = {tuple(sorted(e)) for e in pairs if e[0] != e[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    total = 0
    for i, u in enumerate(nodes):
        for v in (x for x in adj[u] if x > u):
            total += len([w for w in adj[u] & adj[v] if w > v])
    return total


@given(EDGES)
@SETTINGS
def test_wcc_random(spark, pairs):
    got = {r.vid: r.comp for r in wcc(spark, edge_df(spark, pairs)).state.collect()}
    assert got == py_wcc(pairs)


@given(EDGES)
@SETTINGS
def test_wcc_csr_random(spark, pairs):
    got = {r.vid: r.comp for r in wcc_csr(spark, edge_df(spark, pairs), num_buckets=3).collect()}
    assert got == py_wcc(pairs)


@given(EDGES)
@SETTINGS
def test_scc_random(spark, pairs):
    got = {r.vid: r.comp for r in scc(spark, edge_df(spark, pairs)).collect()}
    assert got == py_scc(pairs)


@given(EDGES)
@SETTINGS
def test_scc_random_parallel_path(spark, pairs):
    # tarjan_cutoff=0 forces the distributed trim + hash-randomized
    # color/backward fixpoints (the default would route these small graphs
    # to the sequential fallback and never exercise them)
    got = {
        r.vid: r.comp for r in scc(spark, edge_df(spark, pairs), tarjan_cutoff=0).collect()
    }
    assert got == py_scc(pairs)


@given(EDGES)
@SETTINGS
def test_apsp_weighted_random(spark, pairs):
    from neo4j_graph_algorithms_spark.operators.paths import all_shortest_paths_weighted

    got = {
        (r.source, r.vid): r.dist
        for r in all_shortest_paths_weighted(spark, edge_df(spark, pairs)).collect()
    }
    nodes = {x for e in pairs for x in e}
    want = {}
    for s in nodes:
        for v, d in py_sssp(pairs, s).items():
            want[(s, v)] = d
    assert got == want


@given(EDGES)
@SETTINGS
def test_sssp_random(spark, pairs):
    source = min(x for e in pairs for x in e)
    got = {r.vid: r.dist for r in sssp(spark, edge_df(spark, pairs), source=source).collect()}
    assert got == py_sssp(pairs, source)


@given(EDGES)
@SETTINGS
def test_triangles_random(spark, pairs):
    _, total = triangle_count(spark, edge_df(spark, pairs))
    assert total == py_triangles(pairs)


WEIGHTED_EDGES = st.lists(
    st.tuples(
        st.integers(0, 11), st.integers(0, 11), st.integers(1, 9)
    ),
    min_size=1,
    max_size=20,
)


@given(WEIGHTED_EDGES)
@SETTINGS
def test_sssp_csr_matches_tier_a_random(spark, triples):
    """Tier B SSSP == Tier A on random weighted digraphs (bit-exact:
    integer weights, order-independent min)."""
    from neo4j_graph_algorithms_spark.csr.paths import sssp_csr

    pairs = [(s, d) for s, d, _ in triples]
    weights = [float(w) for _, _, w in triples]
    edges = edge_df(spark, pairs, weights)
    src = min(min(s, d) for s, d in pairs)
    a = {r.vid: r.dist for r in sssp(spark, edges, source=src).collect()}
    b = {
        r.vid: r.dist
        for r in sssp_csr(spark, edges, source=src, num_buckets=3).collect()
    }
    assert a == b


@given(EDGES)
@SETTINGS
def test_lpa_csr_matches_tier_a_random(spark, pairs):
    """Tier B LPA == Tier A on random digraphs (unit weights: exact vote
    sums, identical argmax tie-breaks)."""
    from neo4j_graph_algorithms_spark.csr.lpa import lpa_csr
    from neo4j_graph_algorithms_spark.operators.lpa import lpa

    edges = edge_df(spark, pairs)
    a = {
        r.vid: r.label
        for r in lpa(spark, edges, direction="BOTH", max_iterations=3).state.collect()
    }
    b = {
        r.vid: r.label
        for r in lpa_csr(
            spark, edges, direction="BOTH", max_iterations=3, num_buckets=3
        ).state.collect()
    }
    assert a == b


def py_ktruss(pairs, k):
    """Sequential peel: canonical undirected simple edges with support
    >= k-2 at fixpoint."""
    edges = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    while True:
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        keep = {
            (a, b)
            for a, b in edges
            if len(adj[a] & adj[b]) >= k - 2
        }
        if keep == edges:
            return edges
        edges = keep


@given(pairs=EDGES)
@SETTINGS
def test_ktruss_random(spark, pairs):
    from neo4j_graph_algorithms_spark.operators.ktruss import ktruss

    got = {(r["src"], r["dst"]) for r in ktruss(spark, edge_df(spark, pairs), k=4).collect()}
    assert got == py_ktruss(pairs, 4)


def py_topo_levels(pairs):
    """Longest-path-from-source levels; None if cyclic."""
    nodes = {v for e in pairs for v in e}
    adj, indeg = {}, {v: 0 for v in nodes}
    for s, d in pairs:
        adj.setdefault(s, []).append(d)
        indeg[d] += 1
    level = {v: 0 for v in nodes}
    q = deque(v for v in nodes if indeg[v] == 0)
    seen = 0
    while q:
        u = q.popleft()
        seen += 1
        for w in adj.get(u, []):
            level[w] = max(level[w], level[u] + 1)
            indeg[w] -= 1
            if indeg[w] == 0:
                q.append(w)
    return level if seen == len(nodes) else None


DAG_EDGES = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)).map(
        lambda t: (min(t), max(t) + 1)  # src < dst: guaranteed acyclic
    ),
    min_size=1,
    max_size=25,
)


@given(pairs=DAG_EDGES)
@SETTINGS
def test_topo_levels_random_dag(spark, pairs):
    from neo4j_graph_algorithms_spark.operators.dag import topo_levels

    got = {r["vid"]: r["level"] for r in topo_levels(spark, edge_df(spark, pairs)).state.collect()}
    assert got == py_topo_levels(pairs)


@given(EDGES)
@SETTINGS
def test_degree_distribution_matches_python(spark, pairs):
    from neo4j_graph_algorithms_spark.operators.degrees import degree_distribution

    # python oracle: undirected-simple degrees, ceil-rank discrete percentiles
    neigh = {}
    for s, d in pairs:
        neigh.setdefault(s, set())
        neigh.setdefault(d, set())
        if s != d:
            neigh[s].add(d)
            neigh[d].add(s)
    degs = sorted(len(v) for v in neigh.values())
    n = len(degs)

    def pct(q):
        # min degree whose cumulative count satisfies 100*cum >= n*q
        cum = 0
        for deg in degs:
            cum += 1
            if 100 * cum >= n * q:
                return deg
        return degs[-1]

    row = degree_distribution(spark, edge_df(spark, pairs)).collect()[0]
    assert row["n_vertices"] == n
    assert row["min_deg"] == degs[0] and row["max_deg"] == degs[-1]
    assert row["sum_deg"] == sum(degs) and row["n_edges"] == sum(degs) // 2
    assert (row["p50_deg"], row["p90_deg"], row["p99_deg"]) == (
        pct(50), pct(90), pct(99),
    )


# ---- symmetry-breaking trio + contraction (r4 continuation) ------------------


def _und(pairs):
    return {(min(a, b), max(a, b)) for a, b in pairs if a != b}


@given(EDGES)
@SETTINGS
def test_coloring_proper_complete_bounded(spark, pairs):
    from neo4j_graph_algorithms_spark.operators.coloring import greedy_coloring

    und = _und(pairs)
    verts = {v for e in pairs for v in e}
    out = greedy_coloring(spark, edge_df(spark, pairs)).collect()
    col = {r.vid: r.color for r in out}
    assert set(col) == verts
    assert all(col[a] != col[b] for a, b in und)
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert all(0 <= c <= max(deg.values(), default=0) for c in col.values())


@given(EDGES)
@SETTINGS
def test_matching_then_coarsen_invariants(spark, pairs):
    from neo4j_graph_algorithms_spark.operators.coarsen import coarsen_by_matching
    from neo4j_graph_algorithms_spark.operators.matching import maximal_matching

    und = _und(pairs)
    df = edge_df(spark, pairs)
    m = [(r.src, r.dst) for r in maximal_matching(spark, df).collect()]
    # matching: disjoint endpoints, edges of the graph, maximal
    touched = [v for e in m for v in e]
    assert len(touched) == len(set(touched))
    assert all((a, b) in und for a, b in m)
    matched = set(touched)
    assert all(a in matched or b in matched for a, b in und)  # maximality
    # contraction: conserves base edges minus intra-pair ones, no self-loops
    coarse = {(r.src, r.dst): r.weight for r in coarsen_by_matching(spark, df).collect()}
    intra = sum(1 for a, b in und if (a, b) in {tuple(sorted(p)) for p in m})
    assert sum(coarse.values()) == len(und) - intra
    assert all(s < d for s, d in coarse)
