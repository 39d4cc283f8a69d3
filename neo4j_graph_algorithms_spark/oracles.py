"""DuckDB oracle SQL builders for the driver's correctness gate.

Each builder returns ANSI SQL runnable by DuckDB over the pre-registered
testdata views (lineitem, orders, part, ...), computing the SAME result as
the matching Spark query in __spark_entry__.py.  Iterative algorithms are
UNROLLED into chained CTEs (generated here with Python loops) — fixed
iteration counts for PageRank/LPA, and hop+pointer-jump rounds for WCC that
cover any diameter ≤ 2^K, so the unrolled oracle reaches the same fixpoint
the Spark loop converges to.

Float policy: integer-valued results are exact; PageRank/averages are
rounded to 6 decimals on BOTH sides (per-element FP error after ~20
float64 iterations is ~1e-12 relative, far below the rounding quantum).
"""

from __future__ import annotations

# ---- shared graph-derivation CTEs (must mirror sources/tpch.py) -------------

COORDER_CTES = """li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
coorder AS (
  SELECT CAST(a.l_partkey AS BIGINT) AS src, CAST(b.l_partkey AS BIGINT) AS dst,
         CAST(count(*) AS DOUBLE) AS weight
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2)"""

LINESEQ_CTES = """seq AS (
  SELECT l_orderkey, l_partkey,
         lead(l_partkey) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS next_pk
  FROM lineitem),
lineseq AS (
  SELECT CAST(l_partkey AS BIGINT) AS src, CAST(next_pk AS BIGINT) AS dst
  FROM seq WHERE next_pk IS NOT NULL AND next_pk <> l_partkey)"""

LINESEQ_VERTS = """verts AS (
  SELECT src AS vid FROM lineseq UNION SELECT dst AS vid FROM lineseq)"""

COORDER_VERTS = """verts AS (
  SELECT src AS vid FROM coorder UNION SELECT dst AS vid FROM coorder)"""


def coorder_edges_sql() -> str:
    return f"WITH {COORDER_CTES}\nSELECT src, dst, weight FROM coorder"


def lineseq_edges_sql() -> str:
    return f"WITH {LINESEQ_CTES}\nSELECT src, dst FROM lineseq"


def pagerank_sql(iterations: int = 20, damping: float = 0.85) -> str:
    """Unrolled delta-push PageRank on the line-seq multigraph."""
    alpha = repr(1.0 - damping)
    d = repr(damping)
    parts = [
        LINESEQ_CTES,
        LINESEQ_VERTS,
        "deg AS (SELECT src, count(*) AS outdeg FROM lineseq GROUP BY src)",
        "ewd AS (SELECT e.src, e.dst, 1.0 / d.outdeg AS inv FROM lineseq e JOIN deg d USING (src))",
        f"r0 AS MATERIALIZED (SELECT vid, CAST({alpha} AS DOUBLE) AS rank, CAST({alpha} AS DOUBLE) AS delta FROM verts)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""s{i} AS MATERIALIZED (
  SELECT e.dst AS vid, sum(r.delta * e.inv) AS s
  FROM r{i - 1} r JOIN ewd e ON r.vid = e.src WHERE r.delta > 0 GROUP BY e.dst),
r{i} AS MATERIALIZED (
  SELECT v.vid, v.rank + {d} * coalesce(s.s, 0) AS rank, {d} * coalesce(s.s, 0) AS delta
  FROM r{i - 1} v LEFT JOIN s{i} s ON v.vid = s.vid)"""
        )
    return (
        "WITH " + ",\n".join(parts) + f"\nSELECT vid, round(rank, 6) AS rank FROM r{iterations}"
    )


def _wcc_rounds_ctes(rounds: int) -> str:
    """c0..cK over `coorder`: hop-min then pointer-jump per round."""
    parts = [
        COORDER_CTES,
        "und AS (SELECT src, dst FROM coorder UNION ALL SELECT dst AS src, src AS dst FROM coorder)",
        COORDER_VERTS,
        "c0 AS MATERIALIZED (SELECT vid, vid AS comp FROM verts)",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"""h{k} AS MATERIALIZED (
  SELECT vid, min(comp) AS comp FROM (
    SELECT u.dst AS vid, c.comp FROM und u JOIN c{k - 1} c ON u.src = c.vid
    UNION ALL SELECT vid, comp FROM c{k - 1}) x GROUP BY vid),
c{k} AS MATERIALIZED (
  SELECT a.vid, coalesce(b.comp, a.comp) AS comp
  FROM h{k} a LEFT JOIN h{k} b ON a.comp = b.vid)"""
        )
    return "WITH " + ",\n".join(parts)


def wcc_sql(rounds: int = 12) -> str:
    return _wcc_rounds_ctes(rounds) + f"\nSELECT vid, comp FROM c{rounds}"


def wcc_stats_sql(rounds: int = 12) -> str:
    return (
        _wcc_rounds_ctes(rounds)
        + f""",
sizes AS (SELECT comp, count(*) AS size FROM c{rounds} GROUP BY comp)
SELECT count(*) AS set_count, min(size) AS min_size, max(size) AS max_size,
       round(avg(size), 6) AS avg_size
FROM sizes"""
    )


TRIANGLE_CTES = f"""{COORDER_CTES},
e AS (SELECT src, dst FROM coorder),
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM e e1 JOIN e e2 ON e1.dst = e2.src
  JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst)"""


def triangle_total_sql() -> str:
    return f"WITH {TRIANGLE_CTES}\nSELECT count(*) AS triangles FROM tri"


def triangles_per_node_sql() -> str:
    return f"""WITH {TRIANGLE_CTES},
{COORDER_VERTS},
pn AS (SELECT vid, count(*) AS n FROM (
  SELECT a AS vid FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri) x
  GROUP BY vid)
SELECT v.vid, coalesce(pn.n, 0) AS triangles FROM verts v LEFT JOIN pn USING (vid)"""


def clustering_coefficient_sql() -> str:
    return f"""WITH {TRIANGLE_CTES},
{COORDER_VERTS},
pn AS (SELECT vid, count(*) AS n FROM (
  SELECT a AS vid FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri) x
  GROUP BY vid),
deg AS (SELECT vid, count(*) AS degree FROM (
  SELECT src AS vid FROM coorder UNION ALL SELECT dst AS vid FROM coorder) x GROUP BY vid)
SELECT v.vid,
       coalesce(pn.n, 0) AS triangles,
       coalesce(deg.degree, 0) AS degree,
       round(CASE WHEN coalesce(deg.degree, 0) >= 2
             THEN 2.0 * coalesce(pn.n, 0) / (deg.degree * (deg.degree - 1))
             ELSE 0.0 END, 9) AS coefficient
FROM verts v LEFT JOIN pn USING (vid) LEFT JOIN deg USING (vid)"""


def avg_clustering_coefficient_sql() -> str:
    return f"""WITH {TRIANGLE_CTES},
{COORDER_VERTS},
pn AS (SELECT vid, count(*) AS n FROM (
  SELECT a AS vid FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri) x
  GROUP BY vid),
deg AS (SELECT vid, count(*) AS degree FROM (
  SELECT src AS vid FROM coorder UNION ALL SELECT dst AS vid FROM coorder) x GROUP BY vid),
co AS (SELECT CASE WHEN coalesce(deg.degree, 0) >= 2
              THEN 2.0 * coalesce(pn.n, 0) / (deg.degree * (deg.degree - 1))
              ELSE 0.0 END AS coefficient
       FROM verts v LEFT JOIN pn USING (vid) LEFT JOIN deg USING (vid))
SELECT round(avg(coefficient), 6) AS avg_coefficient FROM co"""


def lpa_sql(iterations: int = 3) -> str:
    """Unrolled synchronous LPA on line-seq, OUTGOING, seeds = vid,
    smallest-label tie-break."""
    parts = [LINESEQ_CTES, LINESEQ_VERTS, "l0 AS MATERIALIZED (SELECT vid, vid AS label FROM verts)"]
    for i in range(1, iterations + 1):
        parts.append(
            f"""v{i} AS MATERIALIZED (
  SELECT e.src AS vid, l.label, count(*) AS w
  FROM lineseq e JOIN l{i - 1} l ON e.dst = l.vid GROUP BY 1, 2),
t{i} AS MATERIALIZED (
  SELECT vid, label FROM (
    SELECT vid, label, row_number() OVER (PARTITION BY vid ORDER BY w DESC, label ASC) AS rn
    FROM v{i}) x WHERE rn = 1),
l{i} AS MATERIALIZED (
  SELECT a.vid, coalesce(t.label, a.label) AS label
  FROM l{i - 1} a LEFT JOIN t{i} t USING (vid))"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT vid, label FROM l{iterations}"


def metapath_sql(length: int = 3) -> str:
    """Unrolled metapath walk counts on the typed line-seq graph."""
    parts = [
        """orders_t AS (
  SELECT o_orderkey, CAST(substr(o_orderpriority, 1, 1) AS INT) - 1 AS type FROM orders)""",
        """tseq AS (
  SELECT l_orderkey, l_partkey,
         lead(l_partkey) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS next_pk
  FROM lineitem)""",
        """tedges AS (
  SELECT CAST(s.l_partkey AS BIGINT) AS src, CAST(s.next_pk AS BIGINT) AS dst, o.type
  FROM tseq s JOIN orders_t o ON s.l_orderkey = o.o_orderkey
  WHERE s.next_pk IS NOT NULL AND s.next_pk <> s.l_partkey)""",
        "tund AS (SELECT src, dst, type FROM tedges UNION ALL SELECT dst AS src, src AS dst, type FROM tedges)",
        "lab AS (SELECT CAST(p_partkey AS BIGINT) AS vid, CAST(p_partkey % 3 AS INT) AS label FROM part)",
        "s1 AS (SELECT CAST(label AS VARCHAR) AS path, vid, CAST(1 AS BIGINT) AS cnt FROM lab)",
        "r1 AS (SELECT path, sum(cnt) AS cnt FROM s1 GROUP BY path)",
    ]
    for i in range(2, length + 1):
        parts.append(
            f"""s{i} AS MATERIALIZED (
  SELECT s.path || '|' || CAST(e.type AS VARCHAR) || '|' || CAST(l.label AS VARCHAR) AS path,
         e.dst AS vid, sum(s.cnt) AS cnt
  FROM s{i - 1} s JOIN tund e ON s.vid = e.src JOIN lab l ON l.vid = e.dst
  GROUP BY 1, 2),
r{i} AS MATERIALIZED (SELECT path, sum(cnt) AS cnt FROM s{i} GROUP BY path)"""
        )
    union = " UNION ALL ".join(f"SELECT * FROM r{i}" for i in range(1, length + 1))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT path, CAST(sum(cnt) AS BIGINT) AS cnt FROM ({union}) allr GROUP BY path"
    )


def out_degree_distribution_sql() -> str:
    return f"""WITH {LINESEQ_CTES},
od AS (SELECT src, count(*) AS outdeg FROM lineseq GROUP BY src)
SELECT outdeg AS degree, count(*) AS n_nodes FROM od GROUP BY 1"""


# ---- SCC / shortest paths / MS-BFS centralities -----------------------------

SCC_SUB_CTES = """g AS (
  SELECT DISTINCT src, dst FROM lineseq
  WHERE src < {max_vid} AND dst < {max_vid} AND src <> dst),
gverts AS (SELECT src AS vid FROM g UNION SELECT dst AS vid FROM g)"""


def scc_sql(max_vid: int = 400) -> str:
    """Transitive-closure SCC oracle on the size-capped line-seq subgraph:
    comp(v) = min(v, {u : u↝v and v↝u}) via a recursive reachability CTE."""
    sub = SCC_SUB_CTES.format(max_vid=max_vid)
    return f"""WITH RECURSIVE {LINESEQ_CTES},
{sub},
reach(s, v) AS (
  SELECT src, dst FROM g
  UNION
  SELECT r.s, g.dst FROM reach r JOIN g ON g.src = r.v),
mutual AS (
  SELECT r1.s AS u, r1.v AS v FROM reach r1 JOIN reach r2 ON r1.s = r2.v AND r1.v = r2.s)
SELECT vv.vid, CAST(least(vv.vid, coalesce(min(m.u), vv.vid)) AS BIGINT) AS comp
FROM gverts vv LEFT JOIN mutual m ON m.v = vv.vid
GROUP BY vv.vid"""


def sssp_sql(source: int = 0, rounds: int = 10) -> str:
    """Unrolled Bellman-Ford (min-plus) rounds over line-seq (weight 1.0);
    `rounds` must cover the source eccentricity (measured 4 at sf0.01)."""
    parts = [
        LINESEQ_CTES,
        "e AS (SELECT src, dst, 1.0 AS w FROM (SELECT DISTINCT src, dst FROM lineseq))",
        f"d0 AS MATERIALIZED (SELECT CAST({source} AS BIGINT) AS vid, CAST(0.0 AS DOUBLE) AS dist)",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"""d{k} AS MATERIALIZED (
  SELECT vid, min(dist) AS dist FROM (
    SELECT e.dst AS vid, d.dist + e.w AS dist FROM d{k - 1} d JOIN e ON e.src = d.vid
    UNION ALL SELECT vid, dist FROM d{k - 1}) x GROUP BY vid)"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT vid, dist FROM d{rounds}"


def _bfs_dist_ctes(edges_cte: str, n_sources: int, max_depth: int) -> str:
    """s0..sK: per-(source, vertex) BFS min hop distance, sources = vid < n."""
    parts = [
        LINESEQ_CTES,
        LINESEQ_VERTS,
        edges_cte,
        f"s0 AS MATERIALIZED (SELECT vid AS s, vid AS v, 0 AS d FROM verts WHERE vid < {n_sources})",
    ]
    for k in range(1, max_depth + 1):
        parts.append(
            f"""s{k} AS MATERIALIZED (
  SELECT s, v, min(d) AS d FROM (
    SELECT p.s, b.dst AS v, p.d + 1 AS d FROM s{k - 1} p JOIN bfse b ON b.src = p.v
    UNION ALL SELECT s, v, d FROM s{k - 1}) x GROUP BY s, v)"""
        )
    return "WITH " + ",\n".join(parts)


def closeness_sql(n_sources: int = 32, max_depth: int = 8) -> str:
    """Sampled/capped closeness (MSClosenessCentrality semantics):
    centrality = (n-1)/farness over the source sample, 0 if untouched.
    BFS direction OUTGOING."""
    edges_cte = "bfse AS (SELECT DISTINCT src, dst FROM lineseq)"
    body = _bfs_dist_ctes(edges_cte, n_sources, max_depth)
    return (
        body
        + f""",
farness AS (SELECT v AS vid, sum(d) AS farness FROM s{max_depth} GROUP BY v),
n AS (SELECT count(*) AS n FROM verts)
SELECT verts.vid,
       round(CASE WHEN coalesce(f.farness, 0) > 0
                  THEN (n.n - 1) * 1.0 / f.farness ELSE 0.0 END, 6) AS centrality
FROM verts LEFT JOIN farness f ON f.vid = verts.vid CROSS JOIN n"""
    )


def harmonic_sql(n_sources: int = 32, max_depth: int = 8) -> str:
    """Sampled/capped harmonic centrality: Σ 1/d / (n-1), BFS over BOTH."""
    edges_cte = (
        "bfse AS (SELECT src, dst FROM (SELECT src, dst FROM lineseq "
        "UNION SELECT dst AS src, src AS dst FROM lineseq))"
    )
    body = _bfs_dist_ctes(edges_cte, n_sources, max_depth)
    return (
        body
        + f""",
inv AS (SELECT v AS vid, sum(1.0 / d) AS inv FROM s{max_depth} WHERE d > 0 GROUP BY v),
n AS (SELECT count(*) AS n FROM verts)
SELECT verts.vid,
       round(coalesce(i.inv, 0.0) / (n.n - 1), 6) AS centrality
FROM verts LEFT JOIN inv i ON i.vid = verts.vid CROSS JOIN n"""
    )


def modularity_sql(mod: int = 7) -> str:
    """Modularity of the assignment community = vid % mod over the co-order
    graph: Q = Σ_c (w_in/m − (deg_c/2m)²)."""
    return f"""WITH {COORDER_CTES},
{COORDER_VERTS.replace('verts AS', 'cverts AS')},
a AS (SELECT vid, vid % {mod} AS community FROM cverts),
ec AS (
  SELECT e.weight, sa.community AS c_src, sb.community AS c_dst
  FROM coorder e JOIN a sa ON sa.vid = e.src JOIN a sb ON sb.vid = e.dst),
m AS (SELECT sum(weight) AS m FROM coorder),
w_in AS (SELECT c_src AS community, sum(weight) AS w_in FROM ec WHERE c_src = c_dst GROUP BY 1),
deg AS (
  SELECT community, sum(weight) AS deg FROM (
    SELECT c_src AS community, weight FROM ec
    UNION ALL SELECT c_dst AS community, weight FROM ec) x GROUP BY 1)
SELECT round(sum(coalesce(w.w_in, 0) / m.m - pow(d.deg / (2 * m.m), 2)), 6) AS modularity
FROM deg d LEFT JOIN w_in w USING (community) CROSS JOIN m"""


def wcc_threshold_sql(threshold: float, rounds: int = 12) -> str:
    """Weighted unionFind: union only edges with weight >= threshold
    (GraphUnionFind.java:90 — compare is >=); singletons keep comp = vid."""
    base = _wcc_rounds_ctes(rounds).replace(
        "und AS (SELECT src, dst FROM coorder UNION ALL SELECT dst AS src, src AS dst FROM coorder)",
        f"""und AS (SELECT src, dst FROM coorder WHERE weight >= {threshold}
  UNION ALL SELECT dst AS src, src AS dst FROM coorder WHERE weight >= {threshold})""",
    )
    return base + f"\nSELECT vid, comp FROM c{rounds}"


def mscoloring_sql(rounds: int = 12) -> str:
    """MSColoring variant: component id = MAX member id
    (impl/MSColoring.java:96-112)."""
    base = _wcc_rounds_ctes(rounds).replace("min(comp)", "max(comp)")
    return base + f"\nSELECT vid, comp FROM c{rounds}"


def triangle_stream_sql() -> str:
    """Each triangle once as (a, b, c), a<b<c by vid
    (algo.triangle.stream, impl/TriangleStream.java)."""
    return f"""WITH {TRIANGLE_CTES}
SELECT least(a, b, c) AS a,
       a + b + c - least(a, b, c) - greatest(a, b, c) AS b,
       greatest(a, b, c) AS c
FROM tri"""
