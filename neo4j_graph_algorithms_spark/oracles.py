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


def pagerank_warm_sql(
    pre_iters: int = 20, warm_iters: int = 10, damping: float = 0.85, mod: int = 97
) -> str:
    """Two-phase warm-restart oracle mirroring
    `pagerank(..., initial_ranks=...)`: cold delta-push `pre_iters` on the
    sub-multigraph with every (src+dst) % mod == 0 edge removed, then the
    residual init  delta0 = alpha + d·M·r_old − r_old,  rank0 = r_old +
    delta0  over the FULL graph, then `warm_iters` more push rounds with
    the |delta| ≠ 0 active filter."""
    alpha = repr(1.0 - damping)
    d = repr(damping)
    parts = [
        LINESEQ_CTES,
        LINESEQ_VERTS,
        f"sub AS (SELECT src, dst FROM lineseq WHERE (src + dst) % {mod} <> 0)",
        "subverts AS (SELECT src AS vid FROM sub UNION SELECT dst AS vid FROM sub)",
        "sdeg AS (SELECT src, count(*) AS outdeg FROM sub GROUP BY src)",
        "sewd AS (SELECT e.src, e.dst, 1.0 / d.outdeg AS inv FROM sub e JOIN sdeg d USING (src))",
        f"p0 AS MATERIALIZED (SELECT vid, CAST({alpha} AS DOUBLE) AS rank, CAST({alpha} AS DOUBLE) AS delta FROM subverts)",
    ]
    for i in range(1, pre_iters + 1):
        parts.append(
            f"""ps{i} AS MATERIALIZED (
  SELECT e.dst AS vid, sum(r.delta * e.inv) AS s
  FROM p{i - 1} r JOIN sewd e ON r.vid = e.src WHERE r.delta > 0 GROUP BY e.dst),
p{i} AS MATERIALIZED (
  SELECT v.vid, v.rank + {d} * coalesce(s.s, 0) AS rank, {d} * coalesce(s.s, 0) AS delta
  FROM p{i - 1} v LEFT JOIN ps{i} s ON v.vid = s.vid)"""
        )
    parts += [
        "deg AS (SELECT src, count(*) AS outdeg FROM lineseq GROUP BY src)",
        "ewd AS (SELECT e.src, e.dst, 1.0 / d.outdeg AS inv FROM lineseq e JOIN deg d USING (src))",
        f"rold AS MATERIALIZED (SELECT v.vid, coalesce(p.rank, 0) AS r FROM verts v LEFT JOIN p{pre_iters} p ON v.vid = p.vid)",
        """m0 AS MATERIALIZED (
  SELECT e.dst AS vid, sum(r.r * e.inv) AS m
  FROM rold r JOIN ewd e ON r.vid = e.src GROUP BY e.dst)""",
        f"""w0 AS MATERIALIZED (
  SELECT v.vid, {alpha} + {d} * coalesce(m.m, 0) AS rank,
         {alpha} + {d} * coalesce(m.m, 0) - v.r AS delta
  FROM rold v LEFT JOIN m0 m ON v.vid = m.vid)""",
    ]
    for i in range(1, warm_iters + 1):
        parts.append(
            f"""ws{i} AS MATERIALIZED (
  SELECT e.dst AS vid, sum(r.delta * e.inv) AS s
  FROM w{i - 1} r JOIN ewd e ON r.vid = e.src WHERE r.delta <> 0 GROUP BY e.dst),
w{i} AS MATERIALIZED (
  SELECT v.vid, v.rank + {d} * coalesce(s.s, 0) AS rank, {d} * coalesce(s.s, 0) AS delta
  FROM w{i - 1} v LEFT JOIN ws{i} s ON v.vid = s.vid)"""
        )
    return (
        "WITH " + ",\n".join(parts) + f"\nSELECT vid, round(rank, 6) AS rank FROM w{warm_iters}"
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


def bowtie_sql(seed: int = 7, p_num: int = 1, p_den: int = 16) -> str:
    """Bow-tie decomposition (Broder et al. 2000) of the hash-sparsified
    line-seq digraph — twin of operators/bowtie.py:bowtie_decomposition
    over the same DOULION-coin edge subset (p = p_num/p_den keeps the
    giant SCC from swallowing the graph: all seven classes populated at
    sf0.01).  Reachability via one recursive pair closure reused for all
    four set closures; CORE = largest SCC, ties to smallest comp id."""
    m, a, b = 2_147_483_647, 1_103_515_245, 1_566_083_941
    return f"""WITH RECURSIVE {LINESEQ_CTES},
gd AS (SELECT DISTINCT src, dst FROM lineseq),
ge AS MATERIALIZED (
  SELECT src, dst FROM gd
  WHERE ((((src % {m}) + {m}) % {m}) * {a}
         + (((dst % {m}) + {m}) % {m}) * {b} + {seed}) % {m} % {p_den} < {p_num}),
gverts AS MATERIALIZED (
  SELECT DISTINCT vid FROM (
    SELECT src AS vid FROM ge UNION ALL SELECT dst FROM ge)),
reach(s, v) AS (
  SELECT src, dst FROM ge
  UNION
  SELECT r.s, e.dst FROM reach r JOIN ge e ON e.src = r.v),
mutual AS MATERIALIZED (
  SELECT r1.s AS u, r1.v AS v FROM reach r1 JOIN reach r2 ON r1.s = r2.v AND r1.v = r2.s),
comp AS MATERIALIZED (
  SELECT vv.vid, least(vv.vid, coalesce(min(mu.u), vv.vid)) AS comp
  FROM gverts vv LEFT JOIN mutual mu ON mu.v = vv.vid GROUP BY vv.vid),
core AS MATERIALIZED (
  SELECT vid FROM comp WHERE comp = (
    SELECT comp FROM (SELECT comp, count(*) AS n FROM comp GROUP BY comp)
    ORDER BY n DESC, comp ASC LIMIT 1)),
fwd AS MATERIALIZED (SELECT DISTINCT r.v AS vid FROM reach r JOIN core c ON c.vid = r.s),
bwd AS MATERIALIZED (SELECT DISTINCT r.s AS vid FROM reach r JOIN core c ON c.vid = r.v),
out_ AS MATERIALIZED (SELECT vid FROM fwd WHERE vid NOT IN (SELECT vid FROM core)),
in_ AS MATERIALIZED (SELECT vid FROM bwd WHERE vid NOT IN (SELECT vid FROM core)),
fromin AS MATERIALIZED (SELECT DISTINCT r.v AS vid FROM reach r JOIN in_ i ON i.vid = r.s),
toout AS MATERIALIZED (SELECT DISTINCT r.s AS vid FROM reach r JOIN out_ o ON o.vid = r.v)
SELECT vv.vid,
       CASE
         WHEN vv.vid IN (SELECT vid FROM core) THEN 'core'
         WHEN vv.vid IN (SELECT vid FROM in_) THEN 'in'
         WHEN vv.vid IN (SELECT vid FROM out_) THEN 'out'
         WHEN vv.vid IN (SELECT vid FROM fromin)
          AND vv.vid IN (SELECT vid FROM toout) THEN 'tube'
         WHEN vv.vid IN (SELECT vid FROM fromin) THEN 'tendril_in'
         WHEN vv.vid IN (SELECT vid FROM toout) THEN 'tendril_out'
         ELSE 'disconnected'
       END AS bowtie_class
FROM gverts vv"""


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


# ---- round-2 gate expansion: betweenness / MST / paths / metapath variants --

BETWEENNESS_SUB = """g AS (
  SELECT DISTINCT src, dst FROM lineseq
  WHERE src < {max_vid} AND dst < {max_vid} AND src <> dst),
gverts AS (SELECT src AS vid FROM g UNION SELECT dst AS vid FROM g)"""


def _sigma_bfs_parts(max_depth: int) -> list[str]:
    """lvl0..lvlK + vis0..visK: per-source BFS from EVERY subgraph vertex
    carrying shortest-path counts sigma (forward phase of Brandes)."""
    parts = [
        "lvl0 AS MATERIALIZED (SELECT vid AS s, vid AS v, CAST(1 AS DOUBLE) AS sigma FROM gverts)",
        "vis0 AS MATERIALIZED (SELECT s, v FROM lvl0)",
    ]
    for k in range(1, max_depth + 1):
        parts.append(
            f"""lvl{k} AS MATERIALIZED (
  SELECT x.s, x.v, sum(x.sigma) AS sigma FROM (
    SELECT l.s, g.dst AS v, l.sigma FROM lvl{k - 1} l JOIN g ON g.src = l.v) x
  LEFT JOIN vis{k - 1} vv ON vv.s = x.s AND vv.v = x.v
  WHERE vv.s IS NULL GROUP BY x.s, x.v),
vis{k} AS MATERIALIZED (
  SELECT s, v FROM vis{k - 1} UNION ALL SELECT s, v FROM lvl{k})"""
        )
    allsv = " UNION ALL ".join(
        f"SELECT s, v, {k} AS d, sigma FROM lvl{k}" for k in range(max_depth + 1)
    )
    parts.append(f"allsv AS MATERIALIZED ({allsv})")
    return parts


def _betweenness_body(source_cte: str, f_expr: str) -> str:
    """Pair-sum Brandes: bc(v) = f · Σ_{{s∈S,t}} [d(s,v)+d(v,t)=d(s,t)]·
    σ_sv·σ_vt/σ_st  (v≠s,t; the δ-accumulation identity)."""
    return f"""{source_cte},
bc AS (
  SELECT sv.v AS vid, sum(sv.sigma * vt.sigma / st.sigma) AS c
  FROM allsv sv
  JOIN srcs ss ON ss.vid = sv.s
  JOIN allsv vt ON vt.s = sv.v
  JOIN allsv st ON st.s = sv.s AND st.v = vt.v
  WHERE sv.d > 0 AND vt.d > 0 AND sv.d + vt.d = st.d
  GROUP BY sv.v)
SELECT gverts.vid, round({f_expr} * coalesce(bc.c, 0.0), 6) AS centrality
FROM gverts LEFT JOIN bc ON bc.vid = gverts.vid"""


def betweenness_sql(max_vid: int = 200, max_depth: int = 12) -> str:
    """Exact directed Brandes on the size-capped line-seq subgraph."""
    parts = [LINESEQ_CTES, BETWEENNESS_SUB.format(max_vid=max_vid)]
    parts += _sigma_bfs_parts(max_depth)
    body = _betweenness_body("srcs AS (SELECT vid FROM gverts)", "1.0")
    return "WITH " + ",\n".join(parts) + ",\n" + body


def betweenness_sampled_sql(max_vid: int = 200, k: int = 32, max_depth: int = 12) -> str:
    """RA-Brandes, degree strategy: sources = top-k by (BOTH-degree DESC,
    vid ASC); estimate scaled by n/k
    (RABrandesBetweennessCentrality.java:177)."""
    parts = [LINESEQ_CTES, BETWEENNESS_SUB.format(max_vid=max_vid)]
    parts += _sigma_bfs_parts(max_depth)
    # BOTH-degree = each edge row counted once per endpoint (Degrees.java
    # BOTH semantics, graph.py degrees): UNION ALL, not a dedup
    src_cte = f"""deg AS (
  SELECT vid, count(*) AS degree FROM (
    SELECT src AS vid FROM g UNION ALL SELECT dst AS vid FROM g) dd GROUP BY vid),
srcs AS (SELECT vid FROM deg ORDER BY degree DESC, vid ASC LIMIT {k})"""
    n_over_k = f"((SELECT count(*) FROM gverts) * 1.0 / {k})"
    body = _betweenness_body(src_cte, n_over_k)
    return "WITH " + ",\n".join(parts) + ",\n" + body


def mst_parts(boruvka_rounds: int = 12, label_rounds: int = 12) -> list[str]:
    """Unrolled Borůvka over the weighted co-order graph, mirroring
    operators/mst.py exactly: per round each component picks its minimum
    incident cross edge (tie-break (weight, src, dst)), picked edges merge
    components via an unrolled hop+jump connectivity fixpoint."""
    parts = [
        COORDER_CTES,
        "base AS (SELECT src, dst, min(weight) AS weight FROM coorder GROUP BY src, dst)",
        "bverts AS (SELECT src AS vid FROM base UNION SELECT dst AS vid FROM base)",
        "comp0 AS MATERIALIZED (SELECT vid, vid AS comp FROM bverts)",
    ]
    for r in range(1, boruvka_rounds + 1):
        parts.append(
            f"""cross{r} AS MATERIALIZED (
  SELECT b.src, b.dst, b.weight, cs.comp AS c_src, cd.comp AS c_dst
  FROM base b JOIN comp{r - 1} cs ON cs.vid = b.src JOIN comp{r - 1} cd ON cd.vid = b.dst
  WHERE cs.comp <> cd.comp),
inc{r} AS (
  SELECT c_src AS c, src, dst, weight, c_src, c_dst FROM cross{r}
  UNION ALL SELECT c_dst AS c, src, dst, weight, c_src, c_dst FROM cross{r}),
ch{r} AS MATERIALIZED (
  SELECT DISTINCT src, dst, weight, c_src, c_dst FROM (
    SELECT *, row_number() OVER (PARTITION BY c ORDER BY weight, src, dst) AS rn
    FROM inc{r}) x WHERE rn = 1),
cu{r} AS (
  SELECT c_src AS a, c_dst AS b FROM ch{r}
  UNION ALL SELECT c_dst AS a, c_src AS b FROM ch{r}),
lb{r}_0 AS MATERIALIZED (SELECT DISTINCT a AS c, a AS root FROM cu{r})"""
        )
        for j in range(1, label_rounds + 1):
            parts.append(
                f"""lh{r}_{j} AS MATERIALIZED (
  SELECT c, min(root) AS root FROM (
    SELECT u.b AS c, l.root FROM cu{r} u JOIN lb{r}_{j - 1} l ON l.c = u.a
    UNION ALL SELECT c, root FROM lb{r}_{j - 1}) x GROUP BY c),
lb{r}_{j} AS MATERIALIZED (
  SELECT a.c, coalesce(b.root, a.root) AS root
  FROM lh{r}_{j} a LEFT JOIN lh{r}_{j} b ON a.root = b.c)"""
            )
        parts.append(
            f"""comp{r} AS MATERIALIZED (
  SELECT p.vid, coalesce(l.root, p.comp) AS comp
  FROM comp{r - 1} p LEFT JOIN lb{r}_{label_rounds} l ON l.c = p.comp)"""
        )
    picked = " UNION ALL ".join(
        f"SELECT src, dst, weight FROM ch{r}" for r in range(1, boruvka_rounds + 1)
    )
    parts.append(f"forest AS (SELECT DISTINCT src, dst, weight FROM ({picked}) pp)")
    return parts


def mst_sql(boruvka_rounds: int = 12, label_rounds: int = 12) -> str:
    return (
        "WITH "
        + ",\n".join(mst_parts(boruvka_rounds, label_rounds))
        + "\nSELECT src, dst, weight FROM forest"
    )


def mst_stats_sql(boruvka_rounds: int = 12, label_rounds: int = 12) -> str:
    return (
        "WITH "
        + ",\n".join(mst_parts(boruvka_rounds, label_rounds))
        + """
SELECT CAST(count(*) AS BIGINT) AS edge_count, min(weight) AS min_weight,
       max(weight) AS max_weight, sum(weight) AS total_weight FROM forest"""
    )


def all_shortest_paths_sql(n_sources: int = 16, max_depth: int = 8) -> str:
    """Unweighted MS-BFS (source, vid, depth) pairs, BOTH direction."""
    edges_cte = (
        "bfse AS (SELECT src, dst FROM (SELECT src, dst FROM lineseq "
        "UNION SELECT dst AS src, src AS dst FROM lineseq))"
    )
    body = _bfs_dist_ctes(edges_cte, n_sources, max_depth)
    return (
        body
        + f"\nSELECT s AS source, v AS vid, CAST(d AS INT) AS depth FROM s{max_depth} WHERE d > 0"
    )


def apsp_weighted_sql(max_src: int = 8, rounds: int = 32) -> str:
    """Weighted multi-source Bellman-Ford keyed (source, vid) over line-seq
    with the deterministic derived weight (src+dst)%7+1."""
    parts = [
        LINESEQ_CTES,
        """we AS (SELECT src, dst, CAST((src + dst) % 7 + 1 AS DOUBLE) AS w
  FROM (SELECT DISTINCT src, dst FROM lineseq))""",
        f"""d0 AS MATERIALIZED (
  SELECT vid AS source, vid, CAST(0.0 AS DOUBLE) AS dist
  FROM (SELECT src AS vid FROM lineseq UNION SELECT dst FROM lineseq) vv
  WHERE vid <= {max_src})""",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"""d{k} AS MATERIALIZED (
  SELECT source, vid, min(dist) AS dist FROM (
    SELECT d.source, e.dst AS vid, d.dist + e.w AS dist
    FROM d{k - 1} d JOIN we e ON e.src = d.vid
    UNION ALL SELECT source, vid, dist FROM d{k - 1}) x GROUP BY source, vid)"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT source, vid, dist FROM d{rounds}"


def shortest_path_nodes_sql(source: int = 0, rounds: int = 10) -> str:
    """Path node sequence source→target where target = argmax dist
    (tie: min vid): canonical min-pred per vertex, recursive backward walk,
    step = rank by dist along the path."""
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
    parts.append(f"dd AS (SELECT vid, dist FROM d{rounds})")
    parts.append(
        "tgt AS (SELECT vid FROM dd ORDER BY dist DESC, vid ASC LIMIT 1)"
    )
    parts.append(
        f"""pred AS MATERIALIZED (
  SELECT e.dst AS vid, min(e.src) AS pred
  FROM e JOIN dd ds ON ds.vid = e.src JOIN dd dt ON dt.vid = e.dst
  WHERE ds.dist + e.w = dt.dist AND e.dst <> {source}
  GROUP BY e.dst)""",
    )
    parts.append(
        """walk(vid) AS (
  SELECT vid FROM tgt
  UNION ALL
  SELECT p.pred FROM walk w JOIN pred p ON p.vid = w.vid)"""
    )
    return (
        "WITH RECURSIVE "
        + ",\n".join(parts)
        + """
SELECT CAST(row_number() OVER (ORDER BY d.dist) - 1 AS INT) AS step, w.vid, d.dist
FROM walk w JOIN dd d ON d.vid = w.vid"""
    )


# ---- metapath variants / schema / reducer -----------------------------------

TYPED_CTES = """orders_t AS (
  SELECT o_orderkey, CAST(substr(o_orderpriority, 1, 1) AS INT) - 1 AS type FROM orders),
tseq AS (
  SELECT l_orderkey, l_partkey,
         lead(l_partkey) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS next_pk
  FROM lineitem),
tedges AS (
  SELECT CAST(s.l_partkey AS BIGINT) AS src, CAST(s.next_pk AS BIGINT) AS dst, o.type
  FROM tseq s JOIN orders_t o ON s.l_orderkey = o.o_orderkey
  WHERE s.next_pk IS NOT NULL AND s.next_pk <> s.l_partkey),
tund AS (SELECT src, dst, type FROM tedges UNION ALL SELECT dst AS src, src AS dst, type FROM tedges),
lab AS (SELECT CAST(p_partkey AS BIGINT) AS vid, CAST(p_partkey % 3 AS INT) AS label FROM part)"""


def metapath_variant_sql(
    length: int = 3,
    start_labels: list[int] | None = None,
    end_labels: list[int] | None = None,
    seed_max_vid: int | None = None,
    start_vid: int | None = None,
    end_vid: int | None = None,
) -> str:
    """Parameterized twin of operators/metapath.py: BetweenTypes
    (start/end labels), ForInstances (seed set), and metaPath (instance
    pair) all share the same unrolled walk with different seed/record
    filters."""
    seed_conds = []
    if start_labels is not None:
        seed_conds.append("label IN (" + ", ".join(str(int(x)) for x in start_labels) + ")")
    if seed_max_vid is not None:
        seed_conds.append(f"vid <= {seed_max_vid}")
    if start_vid is not None:
        seed_conds.append(f"vid = {int(start_vid)}")
    where = (" WHERE " + " AND ".join(seed_conds)) if seed_conds else ""

    def rec(i: int) -> str:
        conds = []
        if end_labels is not None:
            lbls = ", ".join(str(int(x)) for x in end_labels)
            conds.append(f"l.label IN ({lbls})")
        if end_vid is not None:
            conds.append(f"s.vid = {int(end_vid)}")
        w = (" WHERE " + " AND ".join(conds)) if conds else ""
        return (
            f"r{i} AS (SELECT s.path, sum(s.cnt) AS cnt FROM s{i} s "
            f"JOIN lab l ON l.vid = s.vid{w} GROUP BY s.path)"
        )

    parts = [
        TYPED_CTES,
        f"s1 AS (SELECT CAST(label AS VARCHAR) AS path, vid, CAST(1 AS BIGINT) AS cnt FROM lab{where})",
        rec(1),
    ]
    for i in range(2, length + 1):
        parts.append(
            f"""s{i} AS MATERIALIZED (
  SELECT s.path || '|' || CAST(e.type AS VARCHAR) || '|' || CAST(l.label AS VARCHAR) AS path,
         e.dst AS vid, sum(s.cnt) AS cnt
  FROM s{i - 1} s JOIN tund e ON s.vid = e.src JOIN lab l ON l.vid = e.dst
  GROUP BY 1, 2),
{rec(i)}"""
        )
    union = " UNION ALL ".join(f"SELECT * FROM r{i}" for i in range(1, length + 1))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT path, CAST(sum(cnt) AS BIGINT) AS cnt FROM ({union}) allr GROUP BY path"
    )


def get_schema_sql() -> str:
    return f"""WITH {TYPED_CTES},
j AS (
  SELECT ls.label AS sl, e.type, ld.label AS dl
  FROM tund e JOIN lab ls ON ls.vid = e.src JOIN lab ld ON ld.vid = e.dst)
SELECT DISTINCT CAST(least(sl, dl) AS INT) AS src_label, type,
       CAST(greatest(sl, dl) AS INT) AS dst_label FROM j"""


def graph_reducer_sql(keep_labels: list[int], keep_types: list[int]) -> str:
    lbls = ", ".join(str(int(x)) for x in keep_labels)
    typs = ", ".join(str(int(x)) for x in keep_types)
    return f"""WITH {TYPED_CTES},
keep AS (SELECT vid FROM lab WHERE label IN ({lbls}))
SELECT e.src, e.dst, e.type FROM tedges e
JOIN keep ks ON ks.vid = e.src JOIN keep kd ON kd.vid = e.dst
WHERE e.type IN ({typs})"""


def _schema_expand_parts(length: int, weighted: bool) -> tuple[list[str], str]:
    parts = [
        TYPED_CTES,
        """segcnt AS (
  SELECT ls.label AS lb, e.type AS t, ld.label AS nb, count(*) AS cnt
  FROM tund e JOIN lab ls ON ls.vid = e.src JOIN lab ld ON ld.vid = e.dst
  GROUP BY 1, 2, 3)""",
        "tot AS (SELECT sum(cnt) AS total FROM segcnt)",
        "alllb AS (SELECT DISTINCT lb FROM segcnt)",
    ]
    if weighted:
        parts.append(
            "p1 AS (SELECT CAST(lb AS VARCHAR) AS path, lb AS endlb, CAST(1.0 AS DOUBLE) AS w FROM alllb)"
        )
        for k in range(2, length + 1):
            parts.append(
                f"""p{k} AS (
  SELECT p.path || '|' || CAST(s.t AS VARCHAR) || '|' || CAST(s.nb AS VARCHAR) AS path,
         s.nb AS endlb, p.w * (CAST(s.cnt AS DOUBLE) / tot.total) AS w
  FROM p{k - 1} p JOIN segcnt s ON s.lb = p.endlb CROSS JOIN tot)"""
            )
        union = " UNION ALL ".join(f"SELECT path, w FROM p{k}" for k in range(2, length + 1))
    else:
        parts.append("p1 AS (SELECT CAST(lb AS VARCHAR) AS path, lb AS endlb FROM alllb)")
        for k in range(2, length + 1):
            parts.append(
                f"""p{k} AS (
  SELECT DISTINCT p.path || '|' || CAST(s.t AS VARCHAR) || '|' || CAST(s.nb AS VARCHAR) AS path,
         s.nb AS endlb
  FROM p{k - 1} p JOIN segcnt s ON s.lb = p.endlb)"""
            )
        union = " UNION ALL ".join(f"SELECT path FROM p{k}" for k in range(1, length + 1))
    return parts, union


def schema_full_sql(length: int = 3) -> str:
    parts, union = _schema_expand_parts(length, weighted=False)
    return "WITH " + ",\n".join(parts) + f"\nSELECT DISTINCT path FROM ({union}) pp"


def schema_full_weights_sql(length: int = 3) -> str:
    parts, union = _schema_expand_parts(length, weighted=True)
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT path, round(max(w), 9) AS weight FROM ({union}) pp GROUP BY path"
    )


def louvain_invariant_sql() -> str:
    """The louvain loop is a heuristic; the SQL-checkable invariant is that
    its modularity is at least the vid%7 strawman's (computed Spark-side
    with the same modularity_df used by the gated modularity query)."""
    return "SELECT CAST(TRUE AS BOOLEAN) AS louvain_beats_strawman"


def louvain_int_sql(iterations: int = 4) -> str:
    """Value twin of operators/louvain.py:louvain(integer_gains=True) over
    the co-order graph — the r5 deterministic gate mode.  Every gain
    comparison is multiplied through by the positive constant 2m², so the
    whole greedy trajectory (moves, smaller-community tie-breaks,
    alternating even/odd halves) is pure integer arithmetic: HUGEINT here,
    decimal(38,0) on the Spark side — bit-identical by construction.
    Unrolls `iterations` sub-steps; the Spark side may stop early at a
    two-half quiescent fixpoint, after which further unrolled sub-steps
    are provably no-ops (the step is a deterministic function of state)."""
    parts = [
        COORDER_CTES,
        "und AS (SELECT src, dst, CAST(weight AS BIGINT) AS w FROM coorder)",
        "bothe AS (SELECT src, dst, w FROM und UNION ALL SELECT dst, src, w FROM und)",
        "w2 AS (SELECT CAST(SUM(w) AS HUGEINT) AS w2 FROM bothe)",
        "deg AS (SELECT src AS vid, CAST(SUM(w) AS BIGINT) AS ki FROM bothe GROUP BY src)",
        "l0 AS MATERIALIZED (SELECT vid, vid AS community, ki FROM deg)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""sig{i} AS MATERIALIZED (
  SELECT community, CAST(SUM(ki) AS BIGINT) AS sigma FROM l{i - 1} GROUP BY 1),
kin{i} AS MATERIALIZED (
  SELECT e.src AS vid, l.community AS c_nbr, CAST(SUM(e.w) AS BIGINT) AS kin
  FROM bothe e JOIN l{i - 1} l ON e.dst = l.vid GROUP BY 1, 2),
cand{i} AS MATERIALIZED (
  SELECT k.vid, k.c_nbr, k.kin, s.community, s.ki,
         CASE WHEN k.c_nbr = s.community THEN g.sigma - s.ki ELSE g.sigma END AS sigma_adj
  FROM kin{i} k JOIN l{i - 1} s ON s.vid = k.vid JOIN sig{i} g ON g.community = k.c_nbr),
best{i} AS MATERIALIZED (
  SELECT vid, c_nbr AS best, ig FROM (
    SELECT vid, c_nbr, ig,
           row_number() OVER (PARTITION BY vid ORDER BY ig DESC, c_nbr ASC) AS rn
    FROM (SELECT c.vid, c.c_nbr,
                 w2.w2 * c.kin - CAST(c.ki AS HUGEINT) * c.sigma_adj AS ig
          FROM cand{i} c CROSS JOIN w2) y) x WHERE rn = 1),
stay{i} AS MATERIALIZED (
  SELECT s.vid,
         w2.w2 * coalesce(o.kin, 0) - CAST(s.ki AS HUGEINT) * (g.sigma - s.ki) AS ig_stay
  FROM l{i - 1} s JOIN sig{i} g ON g.community = s.community
  LEFT JOIN (SELECT vid, kin FROM cand{i} WHERE c_nbr = community) o ON o.vid = s.vid
  CROSS JOIN w2),
l{i} AS MATERIALIZED (
  SELECT s.vid,
         CASE WHEN s.vid % 2 = {(i - 1) % 2} AND b.best IS NOT NULL AND b.ig > st.ig_stay
              THEN b.best ELSE s.community END AS community,
         s.ki
  FROM l{i - 1} s LEFT JOIN best{i} b ON b.vid = s.vid
  LEFT JOIN stay{i} st ON st.vid = s.vid)"""
        )
    parts.append(
        f"canon AS (SELECT community, MIN(vid) AS c FROM l{iterations} GROUP BY 1)"
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT l.vid, c.c AS community FROM l{iterations} l JOIN canon c USING (community)"
    )


def louvain_fixed_sql(groups: int = 4, group_size: int = 6) -> str:
    """Value-level louvain twin: EXACT transcription of the phase-1
    local-move rule (operators/louvain.py step: sigma/kin/gain, strict
    bg > sg + 1e-15, alternating even/odd halves, min-member
    canonicalization) unrolled for 2 sub-steps over the planted-partition
    ring graph of sources/synth.planted_partition_graph.

    Engine-independence argument: the default 4x6 graph has m = 64 edges
    (power of two) and unit weights, so kin/ki/sigma are small integers and
    every gain division (by m, by 2m^2 = 8192) is EXACT in IEEE double —
    the greedy trajectory is bit-identical between Spark and DuckDB."""
    gs = int(group_size)
    n = int(groups) * gs
    m = float(groups * (gs * (gs - 1) // 2) + groups)
    m2 = 2.0 * m * m
    bridges = " UNION ALL ".join(
        "SELECT {a} AS src, {b} AS dst".format(
            a=min(g * gs + gs - 1, ((g + 1) % groups) * gs),
            b=max(g * gs + gs - 1, ((g + 1) % groups) * gs),
        )
        for g in range(groups)
    )
    parts = [
        f"""nodes AS (SELECT range AS v FROM range({n})),
intra AS (SELECT a.v AS src, b.v AS dst FROM nodes a JOIN nodes b
          ON a.v < b.v AND a.v // {gs} = b.v // {gs}),
bridges AS ({bridges}),
und AS (SELECT src, dst, CAST(1.0 AS DOUBLE) AS w FROM intra
        UNION ALL SELECT src, dst, CAST(1.0 AS DOUBLE) FROM bridges),
bothe AS (SELECT src, dst, w FROM und UNION ALL SELECT dst, src, w FROM und),
deg AS (SELECT src AS vid, SUM(w) AS ki FROM bothe GROUP BY src),
st0 AS (SELECT vid, vid AS community, ki FROM deg)"""
    ]
    for i in range(2):
        p = i % 2
        parts.append(
            f"""sg{i} AS (SELECT community, SUM(ki) AS sigma FROM st{i} GROUP BY community),
kin{i} AS (SELECT e.src AS vid, s.community AS c_nbr, SUM(e.w) AS kin
           FROM bothe e JOIN st{i} s ON e.dst = s.vid GROUP BY e.src, s.community),
cand{i} AS (SELECT k.vid, k.c_nbr, k.kin, st.community, st.ki,
            CASE WHEN k.c_nbr = st.community THEN g.sigma - st.ki
                 ELSE g.sigma END AS sigma_adj
            FROM kin{i} k JOIN st{i} st ON k.vid = st.vid
            JOIN sg{i} g ON g.community = k.c_nbr),
gain{i} AS (SELECT vid, c_nbr, community, kin,
            kin / {m} - ki * sigma_adj / {m2} AS gain FROM cand{i}),
best{i} AS (SELECT vid, c_nbr AS best, gain AS bg FROM (
              SELECT vid, c_nbr, gain,
                     row_number() OVER (PARTITION BY vid
                                        ORDER BY gain DESC, c_nbr ASC) AS rn
              FROM gain{i}) t WHERE rn = 1),
stay{i} AS (SELECT st.vid,
            coalesce(ko.kin, 0) / {m} - st.ki * (g.sigma - st.ki) / {m2} AS sg
            FROM st{i} st JOIN sg{i} g ON st.community = g.community
            LEFT JOIN (SELECT vid, kin FROM gain{i} WHERE c_nbr = community) ko
              ON st.vid = ko.vid),
st{i + 1} AS (SELECT st.vid,
            CASE WHEN st.vid % 2 = {p} AND b.best IS NOT NULL
                      AND b.bg > coalesce(s.sg, -1e18) + 1e-15
                 THEN b.best ELSE st.community END AS community, st.ki
            FROM st{i} st LEFT JOIN best{i} b ON st.vid = b.vid
            LEFT JOIN stay{i} s ON st.vid = s.vid)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + """,
canon AS (SELECT community, MIN(vid) AS c FROM st2 GROUP BY community)
SELECT s.vid, c.c AS community FROM st2 s JOIN canon c ON s.community = c.community"""
    )


# ---- corpus ingest twins (oracle-parity 'poly' hash mode) -------------------

def _corpus_ctes(
    n_repos: int = 4,
    files_per_repo: int = 50,
    commits_per_repo: int = 20,
    touch_mod: int = 5,
    seed: int = 42,
) -> str:
    """DuckDB regeneration of sources/corpus.synthesize_corpus(hash_mode=
    'poly'): the corpus is pure arithmetic over range(), so the oracle
    rebuilds the IDENTICAL table from nothing."""
    from neo4j_graph_algorithms_spark.sources.derive import poly_hash_sql

    per_repo = files_per_repo * commits_per_repo
    n = n_repos * per_repo
    touch = poly_hash_sql("repo || '|' || \"commit\" || '|' || path || '|" + str(seed) + "'")
    return f"""cbase AS (
  SELECT CAST(i // {per_repo} AS BIGINT) AS repo_idx,
         CAST((i % {per_repo}) // {commits_per_repo} AS BIGINT) AS file_idx,
         CAST(i % {commits_per_repo} AS BIGINT) AS commit_idx
  FROM range({n}) t(i)),
cnamed AS (
  SELECT printf('repo_%d', repo_idx) AS repo,
         (['py', 'js', 'md'])[CAST(file_idx % 3 AS INT) + 1] AS lang,
         file_idx, commit_idx
  FROM cbase),
cfull AS (
  SELECT repo, lang, file_idx, commit_idx,
         printf('src/f_%d.%s', file_idx, lang) AS path,
         printf('c_%04d', commit_idx) AS "commit",
         printf('# module f_%d in %s', file_idx, repo) || chr(10) ||
         printf('import f_%d', (file_idx * 3 + 1) % {files_per_repo}) || chr(10) ||
         printf('import f_%d', (file_idx * 7 + 2) % {files_per_repo}) || chr(10) ||
         printf('def main_%d(): return %d', file_idx, file_idx) AS content
  FROM cnamed),
corpus AS (
  SELECT repo, path, "commit", lang, content FROM cfull
  WHERE {touch} % {touch_mod} = 0 OR file_idx % {commits_per_repo} = commit_idx)"""


def corpus_sha_sql() -> str:
    return f"""WITH {_corpus_ctes()}
SELECT repo, path, "commit", sha256(content) AS content_sha256 FROM corpus"""


def _corpus_cocommit_parts() -> list[str]:
    from neo4j_graph_algorithms_spark.sources.derive import poly_hash_sql

    vid = poly_hash_sql("repo || '|' || path")
    return [
        _corpus_ctes(),
        f"""touches AS (
  SELECT DISTINCT repo, "commit", path, {vid} AS vid FROM corpus)""",
        """cedges AS (
  SELECT a.vid AS src, b.vid AS dst, CAST(count(*) AS DOUBLE) AS weight
  FROM touches a JOIN touches b
    ON a.repo = b.repo AND a."commit" = b."commit" AND a.vid < b.vid
  GROUP BY 1, 2)""",
    ]


def corpus_cocommit_sql() -> str:
    return (
        "WITH " + ",\n".join(_corpus_cocommit_parts()) + "\nSELECT src, dst, weight FROM cedges"
    )


def corpus_import_sql() -> str:
    from neo4j_graph_algorithms_spark.sources.derive import poly_hash_sql

    vid = poly_hash_sql("repo || '|' || path")
    return f"""WITH {_corpus_ctes()},
files AS (
  SELECT DISTINCT repo, path, {vid} AS vid,
         regexp_extract(path, '([^/]+)\\.[a-z]+$', 1) AS module
  FROM corpus),
imps AS (
  SELECT DISTINCT c.repo, {poly_hash_sql("c.repo || '|' || c.path")} AS vid,
         unnest(regexp_extract_all(c.content, 'import ([A-Za-z0-9_]+)', 1)) AS module
  FROM (SELECT DISTINCT repo, path, content FROM corpus) c)
SELECT DISTINCT i.vid AS src, f.vid AS dst
FROM imps i JOIN files f ON f.repo = i.repo AND f.module = i.module
WHERE i.vid <> f.vid"""


def corpus_pagerank_sql(iterations: int = 10, damping: float = 0.85) -> str:
    """Unrolled delta-push PageRank over the poly-id co-commit graph."""
    alpha = repr(1.0 - damping)
    d = repr(damping)
    parts = _corpus_cocommit_parts()
    parts += [
        "cverts AS (SELECT src AS vid FROM cedges UNION SELECT dst AS vid FROM cedges)",
        "cdeg AS (SELECT src, count(*) AS outdeg FROM cedges GROUP BY src)",
        "cewd AS (SELECT e.src, e.dst, 1.0 / d.outdeg AS inv FROM cedges e JOIN cdeg d USING (src))",
        f"cr0 AS MATERIALIZED (SELECT vid, CAST({alpha} AS DOUBLE) AS rank, CAST({alpha} AS DOUBLE) AS delta FROM cverts)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""cs{i} AS MATERIALIZED (
  SELECT e.dst AS vid, sum(r.delta * e.inv) AS s
  FROM cr{i - 1} r JOIN cewd e ON r.vid = e.src WHERE r.delta > 0 GROUP BY e.dst),
cr{i} AS MATERIALIZED (
  SELECT v.vid, v.rank + {d} * coalesce(s.s, 0) AS rank, {d} * coalesce(s.s, 0) AS delta
  FROM cr{i - 1} v LEFT JOIN cs{i} s ON v.vid = s.vid)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT vid, round(rank, 6) AS rank FROM cr{iterations}"
    )


def corpus_incremental_pagerank_sql(
    wave_commits: tuple[int, ...] = (10, 15, 20),
    iters_per_wave: int = 8,
    damping: float = 0.85,
) -> str:
    """Twin of the streaming_incremental_pagerank gate — the north-star
    loop end-to-end: the co-commit graph grows wave by wave (wave w = the
    corpus restricted to commit ordinal < wave_commits[w]), and PageRank is
    republished after each wave by warm-restarting from the previous
    scores (streaming/incremental.py:refresh_pagerank_scores).  Each phase
    unrolls `iters_per_wave` fixed delta-push rounds (tolerance=None on
    the Spark side); phase 1 is the cold init (rank=delta=alpha), later
    phases use the residual init  delta0 = alpha + d·M·r_old − r_old  over
    the GROWN graph with prior-missing vertices at 0 — exactly
    `pagerank(initial_ranks=...)`.  Wave splits are BY COMMIT, so the
    cumulative streaming-merged edge table after wave w equals the batch
    co-commit derivation of the wave-w corpus prefix."""
    from neo4j_graph_algorithms_spark.sources.derive import poly_hash_sql

    vid = poly_hash_sql("repo || '|' || path")
    alpha = repr(1.0 - damping)
    d = repr(damping)
    parts = [_corpus_ctes()]
    prev_final: str | None = None
    for w, kc in enumerate(wave_commits, start=1):
        cut = f"c_{int(kc):04d}"
        parts.append(
            f"""t{w} AS (
  SELECT DISTINCT repo, "commit", path, {vid} AS vid FROM corpus
  WHERE "commit" < '{cut}')"""
        )
        # distinct canonical pairs: unweighted pagerank outdeg = edge ROWS
        # of the merged table, one per pair
        parts.append(
            f"""e{w} AS (
  SELECT a.vid AS src, b.vid AS dst
  FROM t{w} a JOIN t{w} b
    ON a.repo = b.repo AND a."commit" = b."commit" AND a.vid < b.vid
  GROUP BY 1, 2)"""
        )
        parts.append(
            f"v{w} AS (SELECT src AS vid FROM e{w} UNION SELECT dst AS vid FROM e{w})"
        )
        parts.append(f"dg{w} AS (SELECT src, count(*) AS outdeg FROM e{w} GROUP BY src)")
        parts.append(
            f"ew{w} AS (SELECT e.src, e.dst, 1.0 / d.outdeg AS inv FROM e{w} e JOIN dg{w} d USING (src))"
        )
        if prev_final is None:
            parts.append(
                f"r{w}_0 AS MATERIALIZED (SELECT vid, CAST({alpha} AS DOUBLE) AS rank, "
                f"CAST({alpha} AS DOUBLE) AS delta FROM v{w})"
            )
        else:
            parts.append(
                f"""rold{w} AS MATERIALIZED (
  SELECT v.vid, coalesce(p.rank, 0) AS r FROM v{w} v LEFT JOIN {prev_final} p ON v.vid = p.vid)"""
            )
            parts.append(
                f"""m{w} AS MATERIALIZED (
  SELECT e.dst AS vid, sum(r.r * e.inv) AS m
  FROM rold{w} r JOIN ew{w} e ON r.vid = e.src GROUP BY e.dst)"""
            )
            parts.append(
                f"""r{w}_0 AS MATERIALIZED (
  SELECT v.vid, {alpha} + {d} * coalesce(m.m, 0) AS rank,
         {alpha} + {d} * coalesce(m.m, 0) - v.r AS delta
  FROM rold{w} v LEFT JOIN m{w} m ON v.vid = m.vid)"""
            )
        for i in range(1, iters_per_wave + 1):
            parts.append(
                f"""r{w}_{i}s AS MATERIALIZED (
  SELECT e.dst AS vid, sum(r.delta * e.inv) AS s
  FROM r{w}_{i - 1} r JOIN ew{w} e ON r.vid = e.src WHERE r.delta <> 0 GROUP BY e.dst),
r{w}_{i} AS MATERIALIZED (
  SELECT v.vid, v.rank + {d} * coalesce(s.s, 0) AS rank, {d} * coalesce(s.s, 0) AS delta
  FROM r{w}_{i - 1} v LEFT JOIN r{w}_{i}s s ON v.vid = s.vid)"""
            )
        prev_final = f"r{w}_{iters_per_wave}"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT vid, round(rank, 6) AS rank FROM {prev_final}"
    )


def metapath_filter_sql(length: int = 3, start_label: int = 0, end_label: int = 2) -> str:
    """filterMetaPaths twin: full metapath counts filtered by start+end label."""
    inner = metapath_variant_sql(length=length)
    return f"""WITH allmp AS ({inner})
SELECT path, cnt FROM allmp
WHERE string_split(path, '|')[1] = '{int(start_label)}'
  AND string_split(path, '|')[-1] = '{int(end_label)}'"""


def label_dictionary_sql() -> str:
    """getLabelIdToLabelNameMapping twin over the part-type vocabulary."""
    return """WITH names AS (SELECT DISTINCT p_type AS label_name FROM part)
SELECT CAST(dense_rank() OVER (ORDER BY label_name) - 1 AS INT) AS label_id,
       label_name
FROM names"""


def hits_sql(iterations: int = 10) -> str:
    """Unrolled HITS (auth/hub, per-half-step L2 normalization) on the
    line-seq multigraph — twin of operators/hits.py."""
    parts = [
        LINESEQ_CTES,
        LINESEQ_VERTS,
        "s0 AS MATERIALIZED (SELECT vid, CAST(1.0 AS DOUBLE) AS auth, CAST(1.0 AS DOUBLE) AS hub FROM verts)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""ar{i} AS MATERIALIZED (
  SELECT e.dst AS vid, sum(s.hub) AS a
  FROM s{i - 1} s JOIN lineseq e ON s.vid = e.src GROUP BY e.dst),
an{i} AS (SELECT sqrt(sum(a * a)) AS an FROM ar{i}),
a{i} AS MATERIALIZED (
  SELECT v.vid,
         coalesce(r.a, 0) / (CASE WHEN coalesce(an.an, 0) > 0 THEN an.an ELSE 1 END) AS auth
  FROM s{i - 1} v LEFT JOIN ar{i} r ON v.vid = r.vid CROSS JOIN an{i} an),
hr{i} AS MATERIALIZED (
  SELECT e.src AS vid, sum(a.auth) AS h
  FROM a{i} a JOIN lineseq e ON a.vid = e.dst GROUP BY e.src),
hn{i} AS (SELECT sqrt(sum(h * h)) AS hn FROM hr{i}),
s{i} AS MATERIALIZED (
  SELECT a.vid, a.auth,
         coalesce(r.h, 0) / (CASE WHEN coalesce(hn.hn, 0) > 0 THEN hn.hn ELSE 1 END) AS hub
  FROM a{i} a LEFT JOIN hr{i} r ON a.vid = r.vid CROSS JOIN hn{i} hn)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT vid, round(auth, 6) AS auth, round(hub, 6) AS hub FROM s{iterations}"
    )


def random_walks_sql(
    walk_length: int = 4, walks_per_node: int = 1, seed: int = 42
) -> str:
    """Unrolled deterministic random walks on the line-seq graph — twin of
    operators/walks.py (same universal-hash neighbor choice, so the walk
    corpus is bit-identical across engines)."""
    from neo4j_graph_algorithms_spark.operators.walks import (
        A_CUR,
        A_SEED,
        A_STEP,
        A_WALK,
        WALK_P,
    )

    parts = [
        LINESEQ_CTES,
        LINESEQ_VERTS,
        "dedges AS (SELECT DISTINCT src, dst FROM lineseq)",
        """adj AS MATERIALIZED (
  SELECT src, dst, row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS rk,
         count(*) OVER (PARTITION BY src) AS deg
  FROM dedges)""",
        f"""w0 AS MATERIALIZED (
  SELECT vid * {walks_per_node} + k.k AS walk_id, vid AS cur
  FROM verts CROSS JOIN (SELECT unnest(range({walks_per_node})) AS k) k)""",
    ]
    for i in range(1, walk_length + 1):
        choice = (
            f"((w.cur % {WALK_P}) * {A_CUR} + {i} * {A_STEP}"
            f" + (w.walk_id % {WALK_P}) * {A_WALK} + {seed} * {A_SEED})"
            f" % {WALK_P} % a.deg"
        )
        parts.append(
            f"""f{i} AS MATERIALIZED (
  SELECT w.walk_id, a.dst AS cur
  FROM w{i - 1} w JOIN adj a ON w.cur = a.src AND a.rk = {choice})"""
        )
        parts.append(f"w{i} AS (SELECT walk_id, cur FROM f{i})")
    selects = ["SELECT walk_id, CAST(0 AS INTEGER) AS step, cur AS vid FROM w0"]
    for i in range(1, walk_length + 1):
        selects.append(
            f"SELECT walk_id, CAST({i} AS INTEGER) AS step, cur AS vid FROM w{i}"
        )
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)


DAG_SAMPLE_SQL = (
    "SELECT DISTINCT src, dst FROM lineseq WHERE src < dst "
    "AND ((src * 2654435761 + dst * 40503) % 1000003) % {mod} = 0"
)


def dag_levels_sql(mod: int = 8, rounds: int = 16) -> str:
    """Unrolled topological levels on the hash-sampled src<dst line-seq DAG
    — twin of operators/dag.py topo_levels (level = longest path from a
    source; the max-merge is idempotent at the fixpoint so extra unrolled
    rounds are safe — depth is 12 at sf0.01, rounds=16 covers it)."""
    parts = [
        LINESEQ_CTES,
        f"e AS MATERIALIZED ({DAG_SAMPLE_SQL.format(mod=mod)})",
        """l0 AS MATERIALIZED (
  SELECT vid, 0 AS level FROM (SELECT src AS vid FROM e UNION SELECT dst FROM e))""",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""m{i} AS (
  SELECT e.dst AS vid, max(l.level) + 1 AS m
  FROM e JOIN l{i - 1} l ON e.src = l.vid GROUP BY e.dst),
l{i} AS MATERIALIZED (
  SELECT v.vid, greatest(v.level, coalesce(m.m, 0)) AS level
  FROM l{i - 1} v LEFT JOIN m{i} m ON v.vid = m.vid)"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT vid, level FROM l{rounds}"


def ktruss_sql(k: int = 4, rounds: int = 8) -> str:
    """Unrolled k-truss peel on the line-seq graph — twin of
    operators/ktruss.py.  `rounds` just needs to exceed the peel depth:
    peeling is idempotent at the fixpoint, so extra unrolled rounds return
    the identical edge set."""
    parts = [
        LINESEQ_CTES,
        """e0 AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
  FROM lineseq WHERE src <> dst)""",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""t{i} AS MATERIALIZED (
  SELECT x.src AS a, x.dst AS b, y.dst AS c
  FROM e{i - 1} x JOIN e{i - 1} y ON x.src = y.src AND x.dst < y.dst
  JOIN e{i - 1} z ON z.src = x.dst AND z.dst = y.dst),
s{i} AS (
  SELECT u, v, count(*) AS cnt FROM (
    SELECT a AS u, b AS v FROM t{i}
    UNION ALL SELECT a, c FROM t{i}
    UNION ALL SELECT b, c FROM t{i}) GROUP BY u, v),
e{i} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{i - 1} e
  JOIN s{i} s ON e.src = s.u AND e.dst = s.v
  WHERE s.cnt >= {k} - 2)"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT src, dst FROM e{rounds}"


def node2vec_walks_sql(
    walk_length: int = 3,
    walks_per_node: int = 1,
    p: float = 2.0,
    q: float = 0.5,
    seed: int = 7,
) -> str:
    """Unrolled node2vec second-order biased walks on the line-seq graph —
    twin of operators/walks.py node2vec_walks: identical integer-scaled
    weights (1/p return, 1 in-neighborhood, 1/q explore), identical
    cumulative-weight pick via hash(cur, step, walk, seed) mod total."""
    from fractions import Fraction
    from math import lcm

    from neo4j_graph_algorithms_spark.operators.walks import (
        A_CUR,
        A_SEED,
        A_STEP,
        A_WALK,
        WALK_P,
    )

    fr, fq = Fraction(1) / Fraction(p), Fraction(1) / Fraction(q)
    den = lcm(fr.denominator, fq.denominator)
    w_ret, w_in, w_out = int(fr * den), den, int(fq * den)

    parts = [
        LINESEQ_CTES,
        LINESEQ_VERTS,
        "dedges AS MATERIALIZED (SELECT DISTINCT src, dst FROM lineseq)",
        f"""w0 AS MATERIALIZED (
  SELECT vid * {walks_per_node} + k.k AS walk_id, vid AS cur,
         CAST(NULL AS BIGINT) AS prev
  FROM verts CROSS JOIN (SELECT unnest(range({walks_per_node})) AS k) k)""",
    ]
    for i in range(1, walk_length + 1):
        choice = (
            f"((cur % {WALK_P}) * {A_CUR} + {i} * {A_STEP}"
            f" + (walk_id % {WALK_P}) * {A_WALK} + {seed} * {A_SEED}) % {WALK_P}"
        )
        parts.append(
            f"""c{i} AS MATERIALIZED (
  SELECT w.walk_id, w.cur, a.dst AS cand,
         CASE WHEN a.dst = w.prev THEN {w_ret}
              WHEN de.src IS NOT NULL THEN {w_in}
              ELSE {w_out} END AS wt
  FROM w{i - 1} w JOIN dedges a ON w.cur = a.src
  LEFT JOIN dedges de ON de.src = w.prev AND de.dst = a.dst),
s{i} AS MATERIALIZED (
  SELECT walk_id, cur, cand, wt,
         sum(wt) OVER (PARTITION BY walk_id ORDER BY cand
                       ROWS UNBOUNDED PRECEDING) AS cum,
         sum(wt) OVER (PARTITION BY walk_id) AS tot
  FROM c{i}),
w{i} AS MATERIALIZED (
  SELECT walk_id, cand AS cur, cur AS prev
  FROM s{i}
  WHERE ({choice}) % tot >= cum - wt AND ({choice}) % tot < cum)"""
        )
    selects = ["SELECT walk_id, CAST(0 AS INTEGER) AS step, cur AS vid FROM w0"]
    for i in range(1, walk_length + 1):
        selects.append(
            f"SELECT walk_id, CAST({i} AS INTEGER) AS step, cur AS vid FROM w{i}"
        )
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)


def walk_skipgrams_sql(
    window: int = 2, walk_length: int = 4, walks_per_node: int = 1, seed: int = 42
) -> str:
    """Skip-gram pairs over the deterministic walk corpus — twin of
    operators/walks.py walk_skipgram_pairs on random_walks."""
    rw = random_walks_sql(walk_length, walks_per_node, seed)
    return f"""WITH walks AS ({rw})
SELECT a.walk_id, a.vid AS center, b.vid AS context,
       CAST(b.step - a.step AS INTEGER) AS offset
FROM walks a JOIN walks b ON a.walk_id = b.walk_id
WHERE b.step - a.step BETWEEN -{window} AND {window} AND b.step <> a.step"""


def hyperball_sql(radius: int = 2, m: int = 16) -> str:
    """Unrolled HyperBall on the line-seq graph (OUTGOING balls) — twin of
    operators/hyperball.py.  Registers are exact integers; the estimate's
    float arithmetic is dyadic-exact except one ln (absorbed by 6dp)."""
    from neo4j_graph_algorithms_spark.operators.hyperball import (
        A1,
        A2,
        B1,
        B2,
        HB_P,
        RHO_W,
        hll_alpha,
    )

    rho_case = (
        "CASE "
        + " ".join(
            f"WHEN z >= {2 ** (k - 1)} THEN {RHO_W - k + 1}"
            for k in range(RHO_W, 0, -1)
        )
        + f" ELSE {RHO_W + 1} END"
    )
    parts = [
        LINESEQ_CTES,
        LINESEQ_VERTS,
        "dedges AS (SELECT DISTINCT src, dst FROM lineseq)",
        f"""hz AS (
  SELECT vid,
         ((vid % {HB_P}) * {A1} + {B1}) % {HB_P} % {m} AS bucket,
         ((vid % {HB_P}) * {A2} + {B2}) % {HB_P} % {2 ** RHO_W} AS z
  FROM verts)""",
        f"r0 AS MATERIALIZED (SELECT vid, bucket, {rho_case} AS reg FROM hz)",
    ]
    for i in range(1, radius + 1):
        parts.append(
            f"""r{i} AS MATERIALIZED (
  SELECT vid, bucket, max(reg) AS reg FROM (
    SELECT e.src AS vid, r.bucket, r.reg FROM r{i - 1} r JOIN dedges e ON r.vid = e.dst
    UNION ALL SELECT vid, bucket, reg FROM r{i - 1}) x
  GROUP BY vid, bucket)"""
        )
    alpha_mm = repr(hll_alpha(m) * m * m)
    parts.append(
        f"""agg AS (
  SELECT vid, count(*) AS nnz, sum(power(2.0, -reg)) AS sp
  FROM r{radius} GROUP BY vid),
est AS (
  SELECT vid,
         {alpha_mm} / ((CAST({m} AS DOUBLE) - nnz) + sp) AS raw,
         {m} - nnz AS zeros
  FROM agg)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT vid,
       round(CASE WHEN raw <= {repr(2.5 * m)} AND zeros > 0
                  THEN {repr(float(m))} * ln({repr(float(m))} / zeros)
                  ELSE raw END, 6) AS est
FROM est"""
    )


def hyperball_harmonic_sql(radius: int = 4, m: int = 16) -> str:
    """Unrolled HyperBall harmonic centrality on the line-seq graph
    (INCOMING balls) — twin of operators/hyperball.py:hyperball_harmonic.
    Registers are exact integers; each per-round estimate is rounded to 6dp
    then quantized to the ×10⁶ integer grid, and the discounted-growth
    chain runs in exact int64 arithmetic (S = Σ max(ΔE,0)·(L/t),
    harmonic_q6 = (2S+L)//(2L)) — see the operator docstring for why the
    float chain's /2, /3 divisions land on 6dp midpoints where the two
    engines' round(double, 6) disagree."""
    from neo4j_graph_algorithms_spark.operators.hyperball import (
        A1,
        A2,
        B1,
        B2,
        HB_P,
        RHO_W,
        hll_alpha,
    )

    rho_case = (
        "CASE "
        + " ".join(
            f"WHEN z >= {2 ** (k - 1)} THEN {RHO_W - k + 1}"
            for k in range(RHO_W, 0, -1)
        )
        + f" ELSE {RHO_W + 1} END"
    )
    alpha_mm = repr(hll_alpha(m) * m * m)

    def est_cte(i: int) -> str:
        return f"""agg{i} AS (
  SELECT vid, count(*) AS nnz, sum(power(2.0, -reg)) AS sp
  FROM r{i} GROUP BY vid),
est{i} AS (
  SELECT vid,
         round(CASE WHEN {alpha_mm} / ((CAST({m} AS DOUBLE) - nnz) + sp)
                         <= {repr(2.5 * m)} AND {m} - nnz > 0
                    THEN {repr(float(m))} * ln({repr(float(m))} / ({m} - nnz))
                    ELSE {alpha_mm} / ((CAST({m} AS DOUBLE) - nnz) + sp)
               END, 6) AS est
  FROM agg{i})"""

    parts = [
        LINESEQ_CTES,
        LINESEQ_VERTS,
        "dedges AS (SELECT DISTINCT src, dst FROM lineseq)",
        f"""hz AS (
  SELECT vid,
         ((vid % {HB_P}) * {A1} + {B1}) % {HB_P} % {m} AS bucket,
         ((vid % {HB_P}) * {A2} + {B2}) % {HB_P} % {2 ** RHO_W} AS z
  FROM verts)""",
        f"r0 AS MATERIALIZED (SELECT vid, bucket, {rho_case} AS reg FROM hz)",
        est_cte(0),
    ]
    for i in range(1, radius + 1):
        # INCOMING balls: registers flow src -> dst (who reaches v)
        parts.append(
            f"""r{i} AS MATERIALIZED (
  SELECT vid, bucket, max(reg) AS reg FROM (
    SELECT e.dst AS vid, r.bucket, r.reg FROM r{i - 1} r JOIN dedges e ON r.vid = e.src
    UNION ALL SELECT vid, bucket, reg FROM r{i - 1}) x
  GROUP BY vid, bucket)"""
        )
        parts.append(est_cte(i))
    import math as _math

    L = _math.lcm(*range(1, radius + 1))
    for i in range(radius + 1):
        parts.append(
            f"""eq{i} AS (
  SELECT vid, CAST(floor(est * 1000000 + 0.5) AS BIGINT) AS e FROM est{i})"""
        )
    s_terms = " + ".join(
        f"greatest(e{t}.e - e{t - 1}.e, 0) * {L // t}" for t in range(1, radius + 1)
    )
    joins = "eq0 e0 " + " ".join(
        f"JOIN eq{t} e{t} USING (vid)" for t in range(1, radius + 1)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
s AS (SELECT vid, {s_terms} AS s FROM {joins})
SELECT vid,
       CAST((s * 2 + {L}) // {2 * L} AS BIGINT) / 1000000.0 AS approx_harmonic,
       CAST((s * 2 + {L}) // {2 * L} AS BIGINT) AS harmonic_q6
FROM s"""
    )


# ---- neighborhood similarity / link prediction (operators/nodesim.py) --------

NBR_CTES = f"""{LINESEQ_CTES},
und AS (SELECT DISTINCT least(src, dst) AS s, greatest(src, dst) AS d
        FROM lineseq WHERE src <> dst),
nbrs AS (SELECT s AS vid, d AS nbr FROM und
         UNION ALL SELECT d AS vid, s AS nbr FROM und)"""


def node_similarity_sql(
    top_k: int = 10, cutoff: float = 1e-9, max_center_degree: int = 10_000
) -> str:
    """Neighborhood Jaccard over the undirected-simple line-seq graph,
    top_k per left node — twin of operators/nodesim.py:node_similarity,
    INCLUDING its default hub cap: wedge centers with degree >
    `max_center_degree` are excluded from candidate generation (pair
    degrees da/db still come from the UNCAPPED neighborhoods, matching the
    Spark side)."""
    return f"""WITH {NBR_CTES},
deg AS (SELECT vid, count(*) AS deg FROM nbrs GROUP BY vid),
cdeg AS (SELECT nbr, count(*) AS center_deg FROM nbrs GROUP BY nbr),
kn AS (SELECT n.vid, n.nbr FROM nbrs n JOIN cdeg c USING (nbr)
       WHERE c.center_deg <= {max_center_degree}),
pairs AS (
  SELECT x.vid AS a, y.vid AS b, count(*) AS common
  FROM kn x JOIN kn y ON x.nbr = y.nbr AND x.vid < y.vid
  GROUP BY 1, 2),
scored AS (
  SELECT p.a, p.b, p.common,
         round(CAST(p.common AS DOUBLE) / (da.deg + db.deg - p.common), 6) AS sim
  FROM pairs p JOIN deg da ON da.vid = p.a JOIN deg db ON db.vid = p.b),
ranked AS (
  SELECT a, b, common, sim,
         row_number() OVER (PARTITION BY a ORDER BY sim DESC, b ASC) AS rk
  FROM scored WHERE sim >= {cutoff})
SELECT a, b, common, sim FROM ranked WHERE rk <= {top_k}"""


def adamic_adar_sql(
    top_k: int | None = None, max_center_degree: int = 10_000
) -> str:
    """Adamic-Adar link-prediction scores over canonical wedge pairs —
    twin of operators/nodesim.py:adamic_adar, INCLUDING its default hub
    cap on wedge centers."""
    tail = "SELECT a, b, common, score FROM scored"
    if top_k is not None:
        tail = f"""ranked AS (
  SELECT a, b, common, score,
         row_number() OVER (PARTITION BY a ORDER BY score DESC, b ASC) AS rk
  FROM scored)
SELECT a, b, common, score FROM ranked WHERE rk <= {top_k}"""
        tail = ",\n" + tail
    else:
        tail = "\n" + tail
    return f"""WITH {NBR_CTES},
cdeg AS (SELECT nbr, count(*) AS center_deg FROM nbrs GROUP BY nbr),
w AS (SELECT n.vid, n.nbr, c.center_deg FROM nbrs n JOIN cdeg c USING (nbr)
      WHERE c.center_deg <= {max_center_degree}),
scored AS (
  SELECT x.vid AS a, y.vid AS b, count(*) AS common,
         round(sum(CASE WHEN x.center_deg > 1
                        THEN 1.0 / ln(x.center_deg) ELSE 0.0 END), 6) AS score
  FROM w x JOIN w y ON x.nbr = y.nbr AND x.vid < y.vid
  GROUP BY 1, 2){tail}"""


def kcore_sql(k: int = 30, rounds: int = 12) -> str:
    """Unrolled synchronous peel to the k-core of the undirected line-seq
    graph — twin of operators/kcore.py:kcore.  `rounds` must cover the peel
    depth at the gate SF (measured: 4 rounds at sf0.01 for k=30; 12 gives
    3x margin — each extra round is an idle fixpoint no-op)."""
    parts = [
        NBR_CTES,
        "a0 AS MATERIALIZED (SELECT vid AS src, nbr AS dst FROM nbrs)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""k{i} AS MATERIALIZED (
  SELECT src FROM (SELECT src, count(*) AS c FROM a{i - 1} GROUP BY src)
  WHERE c >= {k}),
a{i} AS MATERIALIZED (
  SELECT x.src, x.dst FROM a{i - 1} x
  JOIN k{i} ka ON ka.src = x.src JOIN k{i} kb ON kb.src = x.dst)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT src AS vid, count(*) AS deg FROM a{rounds} GROUP BY src"
    )


def score_sql(s: int = 82, rounds: int = 12) -> str:
    """Unrolled s-core peel (weighted k-core) on the co-order graph — twin
    of operators/kcore.py:s_core.  Strength sums run in BIGINT (co-order
    weights are integer counts), so the compare is exact.  `rounds` must
    cover the peel depth at the gate SF (measured: 6 rounds at sf0.01 for
    s=82; 12 gives 2x margin — extra rounds are idle fixpoint no-ops)."""
    parts = [
        COORDER_CTES,
        """sa0 AS MATERIALIZED (
  SELECT src, dst, CAST(weight AS BIGINT) AS w FROM coorder
  UNION ALL
  SELECT dst AS src, src AS dst, CAST(weight AS BIGINT) AS w FROM coorder)""",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""sk{i} AS MATERIALIZED (
  SELECT src FROM (SELECT src, sum(w) AS st FROM sa{i - 1} GROUP BY src)
  WHERE st >= {s}),
sa{i} AS MATERIALIZED (
  SELECT x.src, x.dst, x.w FROM sa{i - 1} x
  JOIN sk{i} ka ON ka.src = x.src JOIN sk{i} kb ON kb.src = x.dst)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT src AS vid, sum(w) AS strength FROM sa{rounds} GROUP BY src"
    )


def onion_sql(rounds: int = 48) -> str:
    """Unrolled onion decomposition of the undirected line-seq graph — twin
    of operators/onion.py:onion_decomposition.  Per round the threshold k
    rises to the minimum surviving degree and every vertex with degree <= k
    is removed, tagged with the round index (layer) and k (onion_core).
    `rounds` must cover the full peel depth at the gate SF (measured: 40
    rounds at sf0.01; 48 gives margin — post-fixpoint rounds are idle
    no-ops over an empty vertex set)."""
    parts = [
        NBR_CTES,
        "oa0 AS MATERIALIZED (SELECT vid AS src, nbr AS dst FROM nbrs)",
        "ov0 AS MATERIALIZED (SELECT DISTINCT vid FROM nbrs)",
        "ok0 AS (SELECT 0 AS k)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""od{i} AS MATERIALIZED (
  SELECT v.vid, coalesce(c.c, 0) AS c
  FROM ov{i - 1} v LEFT JOIN
       (SELECT src, count(*) AS c FROM oa{i - 1} GROUP BY src) c
       ON c.src = v.vid),
ok{i} AS MATERIALIZED (SELECT greatest((SELECT k FROM ok{i - 1}),
                 coalesce((SELECT min(c) FROM od{i}),
                          (SELECT k FROM ok{i - 1}))) AS k),
orm{i} AS MATERIALIZED (
  SELECT d.vid, {i} AS layer, (SELECT k FROM ok{i}) AS core
  FROM od{i} d WHERE d.c <= (SELECT k FROM ok{i})),
ov{i} AS MATERIALIZED (
  SELECT vid FROM od{i} WHERE c > (SELECT k FROM ok{i})),
oa{i} AS MATERIALIZED (
  SELECT x.src, x.dst FROM oa{i - 1} x
  JOIN ov{i} p ON p.vid = x.src JOIN ov{i} q ON q.vid = x.dst)"""
        )
    union = "\nUNION ALL ".join(
        f"SELECT vid, layer, core FROM orm{i}" for i in range(1, rounds + 1)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT vid, CAST(layer AS INTEGER) AS layer,"
        f" CAST(core AS INTEGER) AS onion_core FROM ({union})"
    )


def avg_neighbor_degree_sql() -> str:
    """knn(k) curve on the undirected line-seq graph — twin of
    operators/degrees.py:avg_neighbor_degree (raw BIGINT numerators, one
    shared class denominator k*n_k)."""
    return f"""WITH {NBR_CTES},
deg AS (SELECT vid, count(*) AS deg FROM nbrs GROUP BY vid),
s AS (
  SELECT n.vid, sum(d2.deg) AS s
  FROM nbrs n JOIN deg d2 ON d2.vid = n.nbr GROUP BY n.vid)
SELECT d.deg, count(*) AS n_vertices,
       CAST(sum(s.s) AS BIGINT) AS sum_nbr_deg_sum,
       sum(s.s) * 1.0 / (d.deg * count(*)) AS knn
FROM deg d JOIN s ON s.vid = d.vid
GROUP BY d.deg"""


def two_hop_ball_sql() -> str:
    """Exact 1-/2-hop neighborhood sizes on the undirected line-seq graph —
    twin of operators/degrees.py:two_hop_ball_sizes (no hub cap at the
    gate SF, matching the Spark default)."""
    return f"""WITH {NBR_CTES},
ball AS (
  SELECT DISTINCT vid, u FROM (
    SELECT a.vid, b.nbr AS u
    FROM nbrs a JOIN nbrs b ON b.vid = a.nbr
    WHERE b.nbr <> a.vid
    UNION ALL
    SELECT vid, nbr AS u FROM nbrs)),
n1 AS (SELECT vid, count(*) AS n1 FROM nbrs GROUP BY vid),
n2 AS (SELECT vid, count(*) AS n2 FROM ball GROUP BY vid)
SELECT n1.vid, n1.n1, coalesce(n2.n2, 0) AS n2
FROM n1 LEFT JOIN n2 ON n2.vid = n1.vid"""


def sage_aggregate_sql() -> str:
    """Twin of pipeline/sage.py:sage_aggregate over the undirected line-seq
    graph and the embeddings table: two-layer GraphSAGE mean-aggregator in
    exact BIGINT micro-units (half-up grid, floor((2s+d)/(2d)) layer-1
    re-rounding — bit-identical to the Spark double division)."""
    return f"""WITH {NBR_CTES},
semb AS (
  SELECT vec_id AS vid, CAST(i - 1 AS INTEGER) AS pos,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS m
  FROM embeddings, unnest(range(1, len(embedding) + 1)) t(i)),
l1 AS MATERIALIZED (
  SELECT n.vid, e.pos, sum(e.m) AS sum1, count(*) AS d1
  FROM nbrs n JOIN semb e ON e.vid = n.nbr GROUP BY n.vid, e.pos),
m1 AS MATERIALIZED (
  SELECT vid, pos, CAST(floor((2 * sum1 + d1) / (2.0 * d1)) AS BIGINT) AS m
  FROM l1),
l2 AS (
  SELECT n.vid, e.pos, sum(e.m) AS sum2, count(*) AS d2
  FROM nbrs n JOIN m1 e ON e.vid = n.nbr GROUP BY n.vid, e.pos)
SELECT a.vid, a.pos, a.sum1, a.d1, b.sum2, b.d2
FROM l1 a LEFT JOIN l2 b ON b.vid = a.vid AND b.pos = a.pos"""


def eigenvector_sql(iterations: int = 20) -> str:
    """Unrolled undamped power iteration (per-step L2 normalization) on the
    undirected-simple line-seq graph — twin of operators/eigenvector.py."""
    parts = [
        NBR_CTES,
        """everts AS (SELECT vid FROM nbrs UNION SELECT nbr FROM nbrs)""",
        "x0 AS MATERIALIZED (SELECT vid, CAST(1.0 AS DOUBLE) AS score FROM everts)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""xr{i} AS MATERIALIZED (
  SELECT e.nbr AS vid, sum(x.score) AS s
  FROM x{i - 1} x JOIN nbrs e ON x.vid = e.vid GROUP BY e.nbr),
xn{i} AS (SELECT sqrt(sum(s * s)) AS n FROM xr{i}),
x{i} AS MATERIALIZED (
  SELECT v.vid,
         coalesce(r.s, 0) / (CASE WHEN coalesce(xn.n, 0) > 0 THEN xn.n ELSE 1 END) AS score
  FROM x{i - 1} v LEFT JOIN xr{i} r ON v.vid = r.vid CROSS JOIN xn{i} xn)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT vid, round(score, 6) AS score FROM x{iterations}"
    )


def pagerank_personalized_sql(
    iterations: int = 20, damping: float = 0.85, source_mod: int = 50
) -> str:
    """Unrolled PERSONALIZED PageRank (teleport only to vid % source_mod == 0)
    on the line-seq multigraph — twin of operators/pagerank.py(source_vids=...).
    Identical push recurrence to pagerank_sql; only r0 differs."""
    alpha = repr(1.0 - damping)
    d = repr(damping)
    parts = [
        LINESEQ_CTES,
        LINESEQ_VERTS,
        "deg AS (SELECT src, count(*) AS outdeg FROM lineseq GROUP BY src)",
        "ewd AS (SELECT e.src, e.dst, 1.0 / d.outdeg AS inv FROM lineseq e JOIN deg d USING (src))",
        f"""r0 AS MATERIALIZED (
  SELECT vid,
         CASE WHEN vid % {source_mod} = 0 THEN CAST({alpha} AS DOUBLE) ELSE 0.0 END AS rank,
         CASE WHEN vid % {source_mod} = 0 THEN CAST({alpha} AS DOUBLE) ELSE 0.0 END AS delta
  FROM verts)""",
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


def khop_fanout_sql(
    fanouts: tuple[int, ...] = (3, 2), seed: int = 42
) -> str:
    """Unrolled GraphSAGE-style fixed-fanout sample on the line-seq graph —
    twin of operators/walks.py:khop_fanout_sample (identical universal-hash
    neighbor ranking, so the sampled edge set is bit-identical)."""
    from neo4j_graph_algorithms_spark.operators.walks import (
        A_CUR,
        A_SEED,
        A_STEP,
        A_WALK,
        WALK_P,
    )

    parts = [
        LINESEQ_CTES,
        "adj AS (SELECT DISTINCT src, dst FROM lineseq)",
        "f0 AS (SELECT DISTINCT src FROM adj)",
    ]
    selects = []
    for layer, fanout in enumerate(fanouts, start=1):
        parts.append(
            f"""c{layer} AS (
  SELECT a.src, a.dst,
         ((a.src % {WALK_P}) * {A_CUR} + (a.dst % {WALK_P}) * {A_WALK}
          + {layer} * {A_STEP} + {seed} * {A_SEED}) % {WALK_P} AS h
  FROM adj a JOIN f{layer - 1} f ON a.src = f.src),
p{layer} AS MATERIALIZED (
  SELECT {layer} AS layer, src, dst
  FROM (SELECT src, dst,
               row_number() OVER (PARTITION BY src ORDER BY h ASC, dst ASC) AS rn
        FROM c{layer})
  WHERE rn <= {fanout}),
f{layer} AS (SELECT DISTINCT dst AS src FROM p{layer})"""
        )
        selects.append(f"SELECT layer, src, dst FROM p{layer}")
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)


def degree_centrality_sql() -> str:
    """Directed multigraph out/in degrees + undirected-simple degree on the
    line-seq graph — twin of operators/degrees.py:degree_centrality."""
    return f"""WITH {LINESEQ_CTES},
{LINESEQ_VERTS},
outd AS (SELECT src AS vid, count(*) AS out_deg FROM lineseq GROUP BY src),
ind AS (SELECT dst AS vid, count(*) AS in_deg FROM lineseq GROUP BY dst),
und AS (SELECT DISTINCT least(src, dst) AS s, greatest(src, dst) AS d
        FROM lineseq WHERE src <> dst),
both_d AS (
  SELECT vid, count(*) AS deg FROM (
    SELECT s AS vid FROM und UNION ALL SELECT d AS vid FROM und) x
  GROUP BY vid)
SELECT v.vid,
       coalesce(o.out_deg, 0) AS out_deg,
       coalesce(i.in_deg, 0) AS in_deg,
       coalesce(b.deg, 0) AS deg
FROM verts v
LEFT JOIN outd o ON v.vid = o.vid
LEFT JOIN ind i ON v.vid = i.vid
LEFT JOIN both_d b ON v.vid = b.vid"""


def pagerank_weighted_sql(iterations: int = 20, damping: float = 0.85) -> str:
    """Unrolled WEIGHTED PageRank on the co-order graph (weights = shared
    order counts) — twin of operators/pagerank.py(weighted=True): mass
    pushes proportionally to w(u,v)/Σ_out w(u)."""
    alpha = repr(1.0 - damping)
    d = repr(damping)
    parts = [
        COORDER_CTES,
        COORDER_VERTS,
        "wdeg AS (SELECT src, sum(weight) AS wsum FROM coorder GROUP BY src)",
        "ewd AS (SELECT e.src, e.dst, e.weight / d.wsum AS inv FROM coorder e JOIN wdeg d USING (src))",
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


def article_rank_sql(iterations: int = 20, damping: float = 0.85) -> str:
    """Unrolled ArticleRank on the line-seq multigraph — twin of
    operators/pagerank.py pagerank(article_rank=True): push denominator is
    outdeg + avg_outdeg (avg over ALL vertices, danglers contribute 0;
    both engines compute it as one exact-integer double division)."""
    alpha = repr(1.0 - damping)
    d = repr(damping)
    parts = [
        LINESEQ_CTES,
        LINESEQ_VERTS,
        "avgd AS (SELECT (SELECT count(*) FROM lineseq) * 1.0 / (SELECT count(*) FROM verts) AS a)",
        "deg AS (SELECT src, count(*) AS outdeg FROM lineseq GROUP BY src)",
        "ewd AS (SELECT e.src, e.dst, 1.0 / (d.outdeg + (SELECT a FROM avgd)) AS inv FROM lineseq e JOIN deg d USING (src))",
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


def degree_assortativity_sql() -> str:
    """Newman degree assortativity on the undirected simple co-order graph
    — twin of operators/degrees.py degree_assortativity."""
    return f"""WITH {COORDER_CTES},
und AS (SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
        FROM coorder WHERE src <> dst),
both_dir AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
deg AS (SELECT src AS vid, count(*) AS deg FROM both_dir GROUP BY src)
SELECT round(corr(a.deg * 1.0, b.deg * 1.0), 6) AS assortativity
FROM both_dir e JOIN deg a ON a.vid = e.src JOIN deg b ON b.vid = e.dst"""


def transitivity_sql() -> str:
    """Global clustering coefficient 3·triangles/wedges on the undirected
    simple co-order graph — twin of operators/triangles.py transitivity."""
    return f"""WITH {COORDER_CTES},
und AS (SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
        FROM coorder WHERE src <> dst),
tri AS (
  SELECT count(*) AS t
  FROM und x JOIN und y ON x.src = y.src AND x.dst < y.dst
  JOIN und z ON z.src = x.dst AND z.dst = y.dst),
deg AS (
  SELECT v, count(*) AS d FROM (
    SELECT src AS v FROM und UNION ALL SELECT dst FROM und) GROUP BY v),
w AS (SELECT sum(d * (d - 1) / 2) AS w FROM deg)
SELECT round(3.0 * (SELECT t FROM tri) / (SELECT w FROM w), 6) AS transitivity"""


def bipartite_copurchase_sql(max_group_size: int = 40) -> str:
    """Customer co-purchase projection (parts = groups, customers = items,
    clique-capped) — twin of graph.py bipartite_project."""
    return f"""WITH cp AS (
  SELECT DISTINCT CAST(l_partkey AS BIGINT) AS g, CAST(o_custkey AS BIGINT) AS i
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
capped AS (
  SELECT g, i FROM (
    SELECT g, i, row_number() OVER (PARTITION BY g ORDER BY i) AS rn FROM cp) x
  WHERE rn <= {max_group_size})
SELECT a.i AS src, b.i AS dst, CAST(count(*) AS DOUBLE) AS weight
FROM capped a JOIN capped b ON a.g = b.g AND a.i < b.i
GROUP BY a.i, b.i"""


def katz_sql(iterations: int = 20, alpha: float = 0.05, beta: float = 1.0) -> str:
    """Unrolled truncated Katz on the line-seq multigraph — twin of
    operators/katz.py (delta-push with constant attenuation alpha)."""
    a = repr(float(alpha))
    b = repr(float(beta))
    parts = [
        LINESEQ_CTES,
        LINESEQ_VERTS,
        f"r0 AS MATERIALIZED (SELECT vid, CAST({b} AS DOUBLE) AS score, CAST({b} AS DOUBLE) AS delta FROM verts)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""s{i} AS MATERIALIZED (
  SELECT e.dst AS vid, {a} * sum(r.delta) AS s
  FROM r{i - 1} r JOIN lineseq e ON r.vid = e.src WHERE r.delta <> 0 GROUP BY e.dst),
r{i} AS MATERIALIZED (
  SELECT v.vid, v.score + coalesce(s.s, 0) AS score, coalesce(s.s, 0) AS delta
  FROM r{i - 1} v LEFT JOIN s{i} s ON v.vid = s.vid)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT vid, round(score, 6) AS score FROM r{iterations}"
    )


def conductance_sql(mod: int = 7) -> str:
    """Per-community conductance of the vid % mod assignment over the
    co-order graph — twin of operators/louvain.py conductance_df:
    cut(C) / (2*internal(C) + cut(C)), 0 for isolated communities."""
    return f"""WITH {COORDER_CTES},
{COORDER_VERTS.replace('verts AS', 'cverts AS')},
a AS (SELECT vid, vid % {mod} AS community FROM cverts),
ec AS (
  SELECT e.weight, sa.community AS c_src, sb.community AS c_dst
  FROM coorder e JOIN a sa ON sa.vid = e.src JOIN a sb ON sb.vid = e.dst),
w_in AS (SELECT c_src AS community, sum(weight) AS internal_w FROM ec WHERE c_src = c_dst GROUP BY 1),
cut AS (
  SELECT community, sum(weight) AS cut_w FROM (
    SELECT c_src AS community, weight FROM ec WHERE c_src <> c_dst
    UNION ALL SELECT c_dst, weight FROM ec WHERE c_src <> c_dst) x GROUP BY 1),
comms AS (SELECT DISTINCT community FROM a)
SELECT c.community,
       round(coalesce(w.internal_w, 0), 6) AS internal_w,
       round(coalesce(t.cut_w, 0), 6) AS cut_w,
       round(CASE WHEN 2 * coalesce(w.internal_w, 0) + coalesce(t.cut_w, 0) > 0
             THEN coalesce(t.cut_w, 0) / (2 * coalesce(w.internal_w, 0) + coalesce(t.cut_w, 0))
             ELSE 0 END, 6) AS conductance
FROM comms c LEFT JOIN w_in w USING (community) LEFT JOIN cut t USING (community)"""


def sllpa_sql(iterations: int = 4, threshold: float = 0.3, seed: int = 42) -> str:
    """Unrolled SLPA (overlapping communities) on the undirected-simple
    line-seq graph — twin of operators/sllpa.py: same hash-weighted
    speaker draw, same smallest-label tie-break, same memory threshold."""
    from neo4j_graph_algorithms_spark.operators.walks import (
        A_CUR,
        A_SEED,
        A_STEP,
        A_WALK,
        WALK_P,
    )

    min_cnt = repr(threshold * (iterations + 1))
    parts = [
        LINESEQ_CTES,
        LINESEQ_VERTS,
        """und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM lineseq WHERE src <> dst)""",
        "inter AS MATERIALIZED (SELECT a AS s, b AS l FROM und UNION ALL SELECT b, a FROM und)",
        "m0 AS MATERIALIZED (SELECT vid, vid AS label, 1 AS cnt FROM verts)",
    ]
    for t in range(1, iterations + 1):
        h = (
            f"((s % {WALK_P}) * {A_CUR} + (l % {WALK_P}) * {A_WALK}"
            f" + {t} * {A_STEP} + {seed} * {A_SEED}) % {WALK_P}"
        )
        parts.append(
            f"""sp{t} AS MATERIALIZED (
  SELECT i.s, i.l, m.label, m.cnt,
         sum(m.cnt) OVER (PARTITION BY i.s, i.l ORDER BY m.label
                          ROWS UNBOUNDED PRECEDING) AS cum,
         sum(m.cnt) OVER (PARTITION BY i.s, i.l) AS tot
  FROM inter i JOIN m{t - 1} m ON m.vid = i.s),
pk{t} AS (
  SELECT l, label FROM sp{t}
  WHERE ({h}) % tot >= cum - cnt AND ({h}) % tot < cum),
hd{t} AS (SELECT l, label, count(*) AS n FROM pk{t} GROUP BY l, label),
ad{t} AS (
  SELECT l AS vid, label, 1 AS cnt FROM (
    SELECT l, label, row_number() OVER (PARTITION BY l ORDER BY n DESC, label) AS rn
    FROM hd{t}) x WHERE rn = 1),
m{t} AS MATERIALIZED (
  SELECT vid, label, CAST(sum(cnt) AS BIGINT) AS cnt FROM (
    SELECT vid, label, cnt FROM m{t - 1}
    UNION ALL SELECT vid, label, cnt FROM ad{t}) u GROUP BY vid, label)"""
        )
    # gds.sllpa convention (mirrors the operator): vertices with no label
    # above the threshold fall back to a self-label membership.
    parts.append(
        f"kept AS (SELECT vid, label FROM m{iterations} WHERE cnt >= {min_cnt})"
    )
    return (
        "WITH " + ",\n".join(parts)
        + "\nSELECT vid, label FROM kept"
        + "\nUNION ALL SELECT vid, vid AS label FROM verts"
        + " WHERE vid NOT IN (SELECT vid FROM kept)"
    )


def fastrp_sql(
    dim: int = 8,
    iteration_weights: tuple[float, ...] = (1.0, 1.0),
    seed: int = 42,
) -> str:
    """Unrolled FastRP on the undirected-simple line-seq graph — twin of
    operators/fastrp.py: identical INTEGER-scaled state (value x 10^6), so
    every aggregation is an exact integer sum and every float step is a
    per-row IEEE chain on identical inputs — bit-identical across engines
    (see the operator docstring for why decimal quantization is not)."""
    from neo4j_graph_algorithms_spark.operators.fastrp import (
        A_D,
        A_S,
        A_V,
        FASTRP_P,
        SCALE,
    )

    def half_away(x: str) -> str:
        return (
            f"CAST(CASE WHEN ({x}) >= 0 THEN floor(({x}) + 0.5)"
            f" ELSE -floor(-({x}) + 0.5) END AS BIGINT)"
        )

    parts = [
        LINESEQ_CTES,
        LINESEQ_VERTS,
        """und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM lineseq WHERE src <> dst)""",
        "inter AS MATERIALIZED (SELECT a AS s, b AS l FROM und UNION ALL SELECT b, a FROM und)",
        f"dims AS (SELECT unnest(range({dim})) AS d)",
        f"""sg AS (
  SELECT vid, d,
         CASE ((vid % {FASTRP_P}) * {A_V} + d * {A_D} + {seed} * {A_S}) % {FASTRP_P} % 6
           WHEN 0 THEN -1 WHEN 5 THEN 1 ELSE 0 END AS sign
  FROM verts CROSS JOIN dims)""",
        """nnz AS (SELECT vid, CAST(sum(sign * sign) AS BIGINT) AS nz FROM sg GROUP BY vid)""",
        f"""s0 AS MATERIALIZED (
  SELECT g.vid, g.d,
         g.sign * {half_away(f"{SCALE}.0 / sqrt(CAST(greatest(n.nz, 1) AS DOUBLE))")} AS val
  FROM sg g JOIN nnz n USING (vid))""",
    ]
    emb_terms = []
    for k, w in enumerate(iteration_weights, start=1):
        mean = half_away("CAST(a.num AS DOUBLE) / a.n")
        norm = half_away(
            f"CAST(f.val AS DOUBLE) * {SCALE} / sqrt(CAST(greatest(q.s2, 1) AS DOUBLE))"
        )
        parts.append(
            f"""a{k} AS (
  SELECT i.l AS vid, x.d, CAST(sum(x.val) AS BIGINT) AS num, count(*) AS n
  FROM inter i JOIN s{k - 1} x ON x.vid = i.s GROUP BY i.l, x.d),
f{k} AS (
  SELECT vd.vid, vd.d, coalesce({mean}, 0) AS val
  FROM (SELECT vid, d FROM verts CROSS JOIN dims) vd
  LEFT JOIN a{k} a ON a.vid = vd.vid AND a.d = vd.d),
q{k} AS (SELECT vid, CAST(sum(val * val) AS BIGINT) AS s2 FROM f{k} GROUP BY vid),
s{k} AS MATERIALIZED (
  SELECT f.vid, f.d, {norm} AS val
  FROM f{k} f JOIN q{k} q USING (vid)),
e{k} AS (SELECT vid, d, {half_away(f"CAST(val AS DOUBLE) * {w!r}")} AS val FROM s{k})"""
        )
        emb_terms.append(f"e{k}")
    acc = emb_terms[0]
    for idx, term in enumerate(emb_terms[1:], start=2):
        parts.append(
            f"""acc{idx} AS (
  SELECT a.vid, a.d, a.val + b.val AS val
  FROM {acc} a JOIN {term} b ON a.vid = b.vid AND a.d = b.d)"""
        )
        acc = f"acc{idx}"
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT vid, CAST(d AS INTEGER) AS dim, val AS val_q6 FROM {acc}"
    )


def lpa_weighted_sql(iterations: int = 3) -> str:
    """Unrolled WEIGHTED synchronous LPA on the undirected co-order graph —
    twin of operators/lpa.py lpa(direction='BOTH') where votes sum edge
    weights (integer-valued doubles: shared-order counts, so the sums are
    exact and order-independent)."""
    parts = [
        COORDER_CTES,
        COORDER_VERTS,
        """und AS MATERIALIZED (
  SELECT src, dst, weight FROM coorder
  UNION ALL SELECT dst, src, weight FROM coorder WHERE src <> dst)""",
        "l0 AS MATERIALIZED (SELECT vid, vid AS label FROM verts)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""v{i} AS MATERIALIZED (
  SELECT e.src AS vid, l.label, sum(e.weight) AS w
  FROM und e JOIN l{i - 1} l ON e.dst = l.vid GROUP BY 1, 2),
t{i} AS MATERIALIZED (
  SELECT vid, label FROM (
    SELECT vid, label, row_number() OVER (PARTITION BY vid ORDER BY w DESC, label ASC) AS rn
    FROM v{i}) x WHERE rn = 1),
l{i} AS MATERIALIZED (
  SELECT a.vid, coalesce(t.label, a.label) AS label
  FROM l{i - 1} a LEFT JOIN t{i} t USING (vid))"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT vid, label FROM l{iterations}"


def degree_distribution_sql(percentiles: tuple[int, ...] = (50, 90, 99)) -> str:
    """Twin of operators/degrees.py:degree_distribution on the line-seq
    graph: histogram + cumulative count; p(q) = min deg with
    100*cum >= n*q (discrete percentile, pure BIGINT comparison)."""
    pct_cols = ",\n       ".join(
        f"(SELECT min(deg) FROM cum, tot WHERE cum.cum * 100 >= tot.n_vertices * {q})"
        f" AS p{q}_deg"
        for q in percentiles
    )
    return f"""WITH {LINESEQ_CTES},
{LINESEQ_VERTS},
und AS (SELECT DISTINCT least(src, dst) AS s, greatest(src, dst) AS d
        FROM lineseq WHERE src <> dst),
both_d AS (
  SELECT vid, count(*) AS deg FROM (
    SELECT s AS vid FROM und UNION ALL SELECT d AS vid FROM und) x
  GROUP BY vid),
degs AS (
  SELECT v.vid, coalesce(b.deg, 0) AS deg
  FROM verts v LEFT JOIN both_d b ON v.vid = b.vid),
hist AS (SELECT deg, count(*) AS cnt FROM degs GROUP BY deg),
cum AS (SELECT deg, cnt, sum(cnt) OVER (ORDER BY deg) AS cum FROM hist),
tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n_vertices,
         CAST(min(deg) AS BIGINT) AS min_deg,
         CAST(max(deg) AS BIGINT) AS max_deg,
         CAST(sum(deg * cnt) AS BIGINT) AS sum_deg
  FROM hist)
SELECT n_vertices,
       CAST(sum_deg / 2 AS BIGINT) AS n_edges,
       min_deg, max_deg, sum_deg,
       {pct_cols}
FROM tot"""


def effective_diameter_sql(
    fraction: tuple[int, int] = (9, 10), max_radius: int = 8, m: int = 16
) -> str:
    """Twin of operators/hyperball.py:effective_diameter on the line-seq
    graph (OUTGOING balls): the same register chain as hyperball_sql with a
    quantized total per level, then the pure-integer fraction test."""
    from neo4j_graph_algorithms_spark.operators.hyperball import (
        A1,
        A2,
        B1,
        B2,
        HB_P,
        RHO_W,
        hll_alpha,
    )

    num, den = fraction
    rho_case = (
        "CASE "
        + " ".join(
            f"WHEN z >= {2 ** (k - 1)} THEN {RHO_W - k + 1}"
            for k in range(RHO_W, 0, -1)
        )
        + f" ELSE {RHO_W + 1} END"
    )
    alpha_mm = repr(hll_alpha(m) * m * m)
    parts = [
        LINESEQ_CTES,
        LINESEQ_VERTS,
        "dedges AS (SELECT DISTINCT src, dst FROM lineseq)",
        f"""hz AS (
  SELECT vid,
         ((vid % {HB_P}) * {A1} + {B1}) % {HB_P} % {m} AS bucket,
         ((vid % {HB_P}) * {A2} + {B2}) % {HB_P} % {2 ** RHO_W} AS z
  FROM verts)""",
        f"r0 AS MATERIALIZED (SELECT vid, bucket, {rho_case} AS reg FROM hz)",
    ]
    for i in range(1, max_radius + 1):
        parts.append(
            f"""r{i} AS MATERIALIZED (
  SELECT vid, bucket, max(reg) AS reg FROM (
    SELECT e.src AS vid, r.bucket, r.reg FROM r{i - 1} r JOIN dedges e ON r.vid = e.dst
    UNION ALL SELECT vid, bucket, reg FROM r{i - 1}) x
  GROUP BY vid, bucket)"""
        )
    for i in range(max_radius + 1):
        parts.append(
            f"""t{i} AS (
  SELECT CAST(sum(CAST(floor(round(est, 6) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS tq
  FROM (
    SELECT vid,
           round(CASE WHEN raw <= {repr(2.5 * m)} AND zeros > 0
                      THEN {repr(float(m))} * ln({repr(float(m))} / zeros)
                      ELSE raw END, 6) AS est
    FROM (
      SELECT vid, {alpha_mm} / ((CAST({m} AS DOUBLE) - nnz) + sp) AS raw,
             {m} - nnz AS zeros
      FROM (SELECT vid, count(*) AS nnz, sum(power(2.0, -reg)) AS sp
            FROM r{i} GROUP BY vid) a) b) c)"""
        )
    levels = " UNION ALL ".join(
        f"SELECT {i} AS r, tq FROM t{i}" for i in range(max_radius + 1)
    )
    parts.append(f"lv AS ({levels})")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(min(r) AS INT) AS effective_diameter,
       (SELECT tq FROM lv WHERE r = {max_radius}) AS ball_sum_q
FROM lv WHERE tq * {den} >= {num} * (SELECT tq FROM lv WHERE r = {max_radius})"""
    )


# ---- maximal independent set (Luby, deterministic hash priorities) ----------


def mis_sql(seed: int = 17, rounds: int = 12) -> str:
    """Luby MIS on the undirected simple line-seq graph — twin of
    operators/mis.py:maximal_independent_set.  Priority order: Spark
    compares struct(h(vid), vid); here the composite h·2³² + vid — the
    identical lexicographic order for the test data's < 2³² ids.  `rounds`
    must be >= the Spark fixpoint round count (extra rounds are no-ops on
    an empty undecided set; sf0.01 converges in 5)."""
    from neo4j_graph_algorithms_spark.pipeline.text import HASH_P, hash_params

    a, b = hash_params(seed)
    parts = [
        LINESEQ_CTES,
        LINESEQ_VERTS,
        """und AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst FROM lineseq UNION SELECT dst AS src, src AS dst FROM lineseq)
  WHERE src <> dst)""",
        f"""u0 AS MATERIALIZED (
  SELECT vid, ((vid % {HASH_P}) * {a} + {b}) % {HASH_P} * 4294967296 + vid AS ck
  FROM verts)""",
    ]
    for k in range(1, rounds + 1):
        p = k - 1
        parts.append(
            f"""mn{k} AS MATERIALIZED (
  SELECT e.src AS vid, min(n.ck) AS mn
  FROM und e JOIN u{p} s ON s.vid = e.src JOIN u{p} n ON n.vid = e.dst
  GROUP BY e.src)"""
        )
        parts.append(
            f"""w{k} AS MATERIALIZED (
  SELECT u.vid FROM u{p} u LEFT JOIN mn{k} m ON m.vid = u.vid
  WHERE m.mn IS NULL OR u.ck < m.mn)"""
        )
        parts.append(
            f"""o{k} AS MATERIALIZED (
  SELECT DISTINCT e.dst AS vid
  FROM und e JOIN w{k} w ON w.vid = e.src JOIN u{p} s ON s.vid = e.dst)"""
        )
        parts.append(
            f"""u{k} AS MATERIALIZED (
  SELECT u.vid, u.ck FROM u{p} u
  WHERE u.vid NOT IN (SELECT vid FROM w{k})
    AND u.vid NOT IN (SELECT vid FROM o{k}))"""
        )
    unions = "\nUNION ALL\n".join(
        f"SELECT vid, TRUE AS in_mis, {k} AS r FROM w{k}\n"
        f"UNION ALL\nSELECT vid, FALSE AS in_mis, {k} AS r FROM o{k}"
        for k in range(1, rounds + 1)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT vid, in_mis, CAST(r AS INT) AS round FROM ({unions})"""
    )


def coloring_sql(seed: int = 17, rounds: int = 24) -> str:
    """Jones-Plassmann greedy coloring on the undirected simple line-seq
    graph — twin of operators/coloring.py:greedy_coloring.  Priority order:
    Spark compares struct(h(vid), vid); here the composite h·2³² + vid
    (HASH_P ≈ 10⁶ keeps it well inside BIGINT) — the identical
    lexicographic order for test ids < 2³².  Smallest-missing-color is
    list_min(list_filter(range(0, len+1), not-in-used)) — the same pure
    integer set rule as Spark's array_except/array_min, so every color and
    round is engine-invariant.  `rounds` must be >= the Spark fixpoint
    round count (extra rounds are no-ops on an empty uncolored set).

    Gate shape: the graph is the hash-THINNED lineseq graph (edge kept iff
    (src%P·31 + dst%P) % 100 < 10, same filter as the Spark gate wrapper) —
    the full lineseq graph's ~45 avg degree pushes the JP fixpoint to ~100
    rounds at every sf; thinning bounds it at ≤16 measured (sf0.001–0.1),
    so 24 unrolled rounds carry comfortable headroom."""
    from neo4j_graph_algorithms_spark.pipeline.text import HASH_P, hash_params

    a, b = hash_params(seed)
    parts = [
        LINESEQ_CTES,
        f"""thin AS MATERIALIZED (
  SELECT src, dst FROM lineseq
  WHERE ((src % {HASH_P}) * 31 + (dst % {HASH_P})) % 100 < 10)""",
        """verts AS (
  SELECT src AS vid FROM thin UNION SELECT dst AS vid FROM thin)""",
        """und AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT src, dst FROM thin UNION SELECT dst AS src, src AS dst FROM thin)
  WHERE src <> dst)""",
        f"""u0 AS MATERIALIZED (
  SELECT vid, ((vid % {HASH_P}) * {a} + {b}) % {HASH_P} * 4294967296 + vid AS ck
  FROM verts)""",
        """c0 AS MATERIALIZED (
  SELECT CAST(NULL AS BIGINT) AS vid, CAST(NULL AS INT) AS color, 0 AS r
  WHERE FALSE)""",
    ]
    for k in range(1, rounds + 1):
        p = k - 1
        parts.append(
            f"""mn{k} AS MATERIALIZED (
  SELECT e.src AS vid, min(n.ck) AS mn
  FROM und e JOIN u{p} s ON s.vid = e.src JOIN u{p} n ON n.vid = e.dst
  GROUP BY e.src)"""
        )
        parts.append(
            f"""w{k} AS MATERIALIZED (
  SELECT u.vid FROM u{p} u LEFT JOIN mn{k} m ON m.vid = u.vid
  WHERE m.mn IS NULL OR u.ck < m.mn)"""
        )
        parts.append(
            f"""used{k} AS MATERIALIZED (
  SELECT e.src AS vid, list(DISTINCT n.color) AS used
  FROM und e JOIN w{k} w ON w.vid = e.src JOIN c{p} n ON n.vid = e.dst
  GROUP BY e.src)"""
        )
        parts.append(
            f"""p{k} AS MATERIALIZED (
  SELECT w.vid,
         CAST(CASE WHEN u.used IS NULL THEN 0
              ELSE list_min(list_filter(range(0, len(u.used) + 1),
                                        x -> NOT list_contains(u.used, CAST(x AS INT))))
              END AS INT) AS color
  FROM w{k} w LEFT JOIN used{k} u ON u.vid = w.vid)"""
        )
        parts.append(
            f"""c{k} AS MATERIALIZED (
  SELECT vid, color, r FROM c{p}
  UNION ALL SELECT vid, color, {k} AS r FROM p{k})"""
        )
        parts.append(
            f"""u{k} AS MATERIALIZED (
  SELECT u.vid, u.ck FROM u{p} u
  WHERE u.vid NOT IN (SELECT vid FROM w{k}))"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT vid, color, CAST(r AS INT) AS round FROM c{rounds}"""
    )


def _matching_parts(seed: int, rounds: int) -> tuple[list[str], str]:
    """Shared unrolled greedy-matching CTE chain over the line-seq graph —
    (parts, matched-pairs UNION sql).  Used by matching_sql and
    coarsen_sql so both gates replay the identical drain."""
    from neo4j_graph_algorithms_spark.pipeline.text import HASH_P, hash_params

    a, b = hash_params(seed)
    parts = [
        LINESEQ_CTES,
        f"""r0 AS MATERIALIZED (
  SELECT src, dst,
         ((src % {HASH_P}) * {a} + {b}) % {HASH_P} AS hs,
         ((dst % {HASH_P}) * {a} + {b}) % {HASH_P} AS hd
  FROM (
    SELECT least(src, dst) AS src, greatest(src, dst) AS dst
    FROM lineseq WHERE src <> dst
    GROUP BY 1, 2))""",
        f"""e0 AS MATERIALIZED (
  SELECT src, dst,
         ((hs + hd) % {HASH_P}) * 4398046511104 + src * 2097152 + dst AS ck
  FROM r0)""",
    ]
    for k in range(1, rounds + 1):
        p = k - 1
        parts.append(
            f"""vmin{k} AS MATERIALIZED (
  SELECT vid, min(ck) AS mn FROM (
    SELECT src AS vid, ck FROM e{p}
    UNION ALL SELECT dst AS vid, ck FROM e{p}) GROUP BY vid)"""
        )
        parts.append(
            f"""w{k} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{p} e
  JOIN vmin{k} s ON s.vid = e.src AND s.mn = e.ck
  JOIN vmin{k} d ON d.vid = e.dst AND d.mn = e.ck)"""
        )
        parts.append(
            f"""e{k} AS MATERIALIZED (
  SELECT e.src, e.dst, e.ck FROM e{p} e
  WHERE e.src NOT IN (SELECT src FROM w{k} UNION ALL SELECT dst FROM w{k})
    AND e.dst NOT IN (SELECT src FROM w{k} UNION ALL SELECT dst FROM w{k}))"""
        )
    unions = "\nUNION ALL\n".join(
        f"SELECT src, dst, {k} AS r FROM w{k}" for k in range(1, rounds + 1)
    )
    return parts, unions


def matching_sql(seed: int = 29, rounds: int = 16) -> str:
    """Greedy maximal matching on the undirected simple line-seq graph —
    twin of operators/matching.py:maximal_matching.  Priority order: Spark
    compares struct(k, src, dst); here the composite k·2⁴² + src·2²¹ + dst —
    the identical lexicographic order while test ids stay < 2²¹ (lineseq
    partkeys are ≤ 2·10⁵ at sf1).  `rounds` must be >= the Spark drain
    round count (extra rounds are no-ops on an empty remaining set)."""
    parts, unions = _matching_parts(seed, rounds)
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT src, dst, CAST(r AS INT) AS round FROM ({unions})"""
    )


def coarsen_sql(seed: int = 29, rounds: int = 16) -> str:
    """Matching-contraction coarsening on the undirected simple line-seq
    graph — twin of operators/coarsen.py:coarsen_by_matching.  Replays the
    identical greedy-matching drain (shared _matching_parts chain), maps
    each matched endpoint to the pair's min vid (canonical src), rewrites
    the base edge set through the map, re-canonicalizes, drops intra-pair
    self-loops, and counts collapsed base edges as the integer weight."""
    parts, unions = _matching_parts(seed, rounds)
    parts.append(
        f"""mpairs AS MATERIALIZED (
  SELECT src, dst FROM ({unions}))"""
    )
    parts.append(
        """repmap AS MATERIALIZED (
  SELECT src AS v, src AS rep FROM mpairs
  UNION ALL SELECT dst AS v, src AS rep FROM mpairs)"""
    )
    parts.append(
        """contracted AS (
  SELECT coalesce(ms.rep, b.src) AS s, coalesce(md.rep, b.dst) AS d
  FROM r0 b
  LEFT JOIN repmap ms ON ms.v = b.src
  LEFT JOIN repmap md ON md.v = b.dst)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT least(s, d) AS src, greatest(s, d) AS dst, count(*) AS weight
FROM contracted WHERE s <> d GROUP BY 1, 2"""
    )


def rich_club_sql() -> str:
    """Rich-club curve on the undirected simple line-seq graph — twin of
    operators/degrees.py:rich_club.  Same union-of-histograms suffix-sum
    construction via a RANGE window (DuckDB RANGE frames over integers ==
    Spark rangeBetween), HUGEINT floor division for phi_q6."""
    return f"""WITH {LINESEQ_CTES},
und AS (
  SELECT least(src, dst) AS src, greatest(src, dst) AS dst
  FROM lineseq WHERE src <> dst GROUP BY 1, 2),
deg AS (
  SELECT vid, count(*) AS deg FROM (
    SELECT src AS vid FROM und UNION ALL SELECT dst AS vid FROM und)
  GROUP BY vid),
dhist AS (SELECT deg AS d, count(*) AS n FROM deg GROUP BY deg),
emin AS (
  SELECT least(ds.deg, dd.deg) AS d, count(*) AS e
  FROM und e JOIN deg ds ON ds.vid = e.src JOIN deg dd ON dd.vid = e.dst
  GROUP BY 1),
uni AS (
  SELECT d, n, CAST(0 AS BIGINT) AS e FROM dhist
  UNION ALL SELECT d, CAST(0 AS BIGINT) AS n, e FROM emin),
curves AS (
  SELECT d,
         coalesce(sum(n) OVER (ORDER BY d
             RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS n_nodes,
         coalesce(sum(e) OVER (ORDER BY d
             RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS n_edges,
         n AS _isdeg
  FROM uni)
SELECT DISTINCT d AS k, CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(n_edges AS BIGINT) AS n_edges,
       CAST(CAST(n_edges AS HUGEINT) * 2000000
            // (CAST(n_nodes AS HUGEINT) * (n_nodes - 1)) AS BIGINT) AS phi_q6
FROM curves WHERE _isdeg > 0 AND n_nodes >= 2"""


def degree_powerlaw_sql(dmin: int = 2) -> str:
    """Clauset-Shalizi-Newman discrete-approx MLE power-law exponent —
    twin of operators/degrees.py:degree_powerlaw.  Log terms summed on the
    1e-6 integer grid per distinct degree; the final alpha/sigma expressions
    textually mirror the Spark op order (1.0 + x, then − 1.0) so the two
    engines evaluate identical IEEE sequences."""
    return f"""WITH {LINESEQ_CTES},
und AS (
  SELECT least(src, dst) AS src, greatest(src, dst) AS dst
  FROM lineseq WHERE src <> dst GROUP BY 1, 2),
deg AS (
  SELECT vid, count(*) AS deg FROM (
    SELECT src AS vid FROM und UNION ALL SELECT dst AS vid FROM und)
  GROUP BY vid),
hist AS (SELECT deg, count(*) AS cnt FROM deg WHERE deg >= {dmin} GROUP BY deg),
agg AS (
  SELECT sum(cnt) AS n_tail,
         sum(CAST(round(ln(deg / ({dmin} - 0.5)) * 1000000.0, 0) AS BIGINT)
             * cnt) AS s_q6
  FROM hist)
SELECT CAST({dmin} AS BIGINT) AS dmin,
       CAST(n_tail AS BIGINT) AS n_tail,
       round(1.0 + n_tail * 1000000.0 / s_q6, 6) AS alpha_q6,
       round((1.0 + n_tail * 1000000.0 / s_q6 - 1.0) / sqrt(n_tail), 6)
         AS sigma_q6
FROM agg"""


def degree_gini_sql() -> str:
    """Degree-distribution Gini coefficient — twin of
    operators/degrees.py:degree_gini.  The doubled closed-form rank sum
    (2·Σ i·d = Σ_d d·(2·cnt·cum_prev + cnt·(cnt+1))) in HUGEINT matches
    Spark's DECIMAL(38,0) path: no division until the final double ratio."""
    return f"""WITH {LINESEQ_CTES},
und AS (
  SELECT least(src, dst) AS src, greatest(src, dst) AS dst
  FROM lineseq WHERE src <> dst GROUP BY 1, 2),
deg AS (
  SELECT vid, count(*) AS deg FROM (
    SELECT src AS vid FROM und UNION ALL SELECT dst AS vid FROM und)
  GROUP BY vid),
hist AS (SELECT deg, count(*) AS cnt FROM deg GROUP BY deg),
cum AS (
  SELECT deg, cnt,
         coalesce(sum(cnt) OVER (ORDER BY deg
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
  FROM hist),
agg AS (
  SELECT CAST(sum(cnt) AS HUGEINT) AS n,
         CAST(sum(deg * cnt) AS HUGEINT) AS sumd,
         sum(CAST(deg AS HUGEINT) *
             (2 * CAST(cnt AS HUGEINT) * CAST(cum_prev AS HUGEINT)
              + CAST(cnt AS HUGEINT) * (CAST(cnt AS HUGEINT) + 1)))
           AS two_rankdeg
  FROM cum)
SELECT CAST(n AS BIGINT) AS n_vertices,
       CAST(sumd AS BIGINT) AS sum_deg,
       round(CASE WHEN n * sumd > 0
                  THEN CAST(two_rankdeg - (n + 1) * sumd AS DOUBLE)
                       / CAST(n * sumd AS DOUBLE) END, 6) AS gini_q6
FROM agg"""


def corpus_wcc_sql(rounds: int = 8) -> str:
    """Min-id connected components over the poly-id co-commit graph — the
    batch ground truth for streaming/incremental.py:refresh_wcc_components
    (warm-start soundness: the merge sink is additive, components only ever
    merge, so the final wave's labeling must equal the batch labeling of
    the full table).  Same hop-min + pointer-jump unroll as wcc_sql;
    fixpoint-idempotent, so over-unrolling is safe."""
    parts = _corpus_cocommit_parts()
    parts += [
        "cund AS (SELECT src, dst FROM cedges UNION ALL SELECT dst AS src, src AS dst FROM cedges)",
        "cverts AS (SELECT src AS vid FROM cedges UNION SELECT dst AS vid FROM cedges)",
        "w0 AS MATERIALIZED (SELECT vid, vid AS comp FROM cverts)",
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f"""wh{k} AS MATERIALIZED (
  SELECT vid, min(comp) AS comp FROM (
    SELECT u.dst AS vid, c.comp FROM cund u JOIN w{k - 1} c ON u.src = c.vid
    UNION ALL SELECT vid, comp FROM w{k - 1}) x GROUP BY vid),
w{k} AS MATERIALIZED (
  SELECT a.vid, coalesce(b.comp, a.comp) AS comp
  FROM wh{k} a LEFT JOIN wh{k} b ON a.comp = b.vid)"""
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT vid, comp FROM w{rounds}"


def graph_reciprocity_sql() -> str:
    """Directed-edge reciprocity over the distinct non-loop lineseq edges —
    twin of operators/degrees.py:graph_reciprocity.  Two BIGINT counts, one
    double ratio: no float boundary to disagree on."""
    return f"""WITH {LINESEQ_CTES},
e AS (SELECT DISTINCT src, dst FROM lineseq WHERE src <> dst),
agg AS (
  SELECT (SELECT count(*) FROM e) AS n_edges,
         (SELECT count(*) FROM e a
          WHERE EXISTS (SELECT 1 FROM e b
                        WHERE b.src = a.dst AND b.dst = a.src)) AS n_reciprocal)
SELECT CAST(n_edges AS BIGINT) AS n_edges,
       CAST(n_reciprocal AS BIGINT) AS n_reciprocal,
       round(CASE WHEN n_edges > 0
                  THEN CAST(n_reciprocal AS DOUBLE) / CAST(n_edges AS DOUBLE)
             END, 6) AS reciprocity_q6
FROM agg"""


def salsa_sql(iterations: int = 10) -> str:
    """Unrolled SALSA power iteration (degree-normalized auth/hub sends,
    per-half-step L1 normalization) on the line-seq multigraph — twin of
    operators/salsa.py.  The inverse degrees are precomputed once (esrc /
    edst CTEs) exactly as the operator folds them into its edge caches."""
    parts = [
        LINESEQ_CTES,
        LINESEQ_VERTS,
        "od AS (SELECT src, 1.0 / count(*) AS inv_out FROM lineseq GROUP BY src)",
        "id_ AS (SELECT dst, 1.0 / count(*) AS inv_in FROM lineseq GROUP BY dst)",
        "esrc AS MATERIALIZED (SELECT e.src, e.dst, od.inv_out FROM lineseq e JOIN od USING (src))",
        "edst AS MATERIALIZED (SELECT e.src, e.dst, id_.inv_in FROM lineseq e JOIN id_ USING (dst))",
        "s0 AS MATERIALIZED (SELECT vid, CAST(1.0 AS DOUBLE) AS auth, CAST(1.0 AS DOUBLE) AS hub FROM verts)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""ar{i} AS MATERIALIZED (
  SELECT e.dst AS vid, sum(s.hub * e.inv_out) AS a
  FROM s{i - 1} s JOIN esrc e ON s.vid = e.src GROUP BY e.dst),
an{i} AS (SELECT sum(a) AS an FROM ar{i}),
a{i} AS MATERIALIZED (
  SELECT v.vid,
         coalesce(r.a, 0) / (CASE WHEN coalesce(an.an, 0) > 0 THEN an.an ELSE 1 END) AS auth
  FROM s{i - 1} v LEFT JOIN ar{i} r ON v.vid = r.vid CROSS JOIN an{i} an),
hr{i} AS MATERIALIZED (
  SELECT e.src AS vid, sum(a.auth * e.inv_in) AS h
  FROM a{i} a JOIN edst e ON a.vid = e.dst GROUP BY e.src),
hn{i} AS (SELECT sum(h) AS hn FROM hr{i}),
s{i} AS MATERIALIZED (
  SELECT a.vid, a.auth,
         coalesce(r.h, 0) / (CASE WHEN coalesce(hn.hn, 0) > 0 THEN hn.hn ELSE 1 END) AS hub
  FROM a{i} a LEFT JOIN hr{i} r ON a.vid = r.vid CROSS JOIN hn{i} hn)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT vid, round(auth, 6) AS auth, round(hub, 6) AS hub FROM s{iterations}"
    )


def wtf_sql(
    source_mod: int = 400,
    circle_size: int = 100,
    n_recs: int = 50,
    ppr_iterations: int = 20,
    damping: float = 0.85,
    salsa_iterations: int = 10,
) -> str:
    """Who-to-Follow (personalized SALSA) on the line-seq multigraph — twin
    of operators/wtf.py:who_to_follow with seeds vid % source_mod == 0.
    Composes the pagerank_personalized_sql push recurrence (unchanged),
    the top-C circle on the 1e-6 grid (vid tie-break), and the salsa_sql
    half-step recurrence replayed over the circle-induced edge set."""
    alpha = repr(1.0 - damping)
    d = repr(damping)
    parts = [
        LINESEQ_CTES,
        LINESEQ_VERTS,
        "deg AS (SELECT src, count(*) AS outdeg FROM lineseq GROUP BY src)",
        "ewd AS (SELECT e.src, e.dst, 1.0 / d.outdeg AS inv FROM lineseq e JOIN deg d USING (src))",
        f"""r0 AS MATERIALIZED (
  SELECT vid,
         CASE WHEN vid % {source_mod} = 0 THEN CAST({alpha} AS DOUBLE) ELSE 0.0 END AS rank,
         CASE WHEN vid % {source_mod} = 0 THEN CAST({alpha} AS DOUBLE) ELSE 0.0 END AS delta
  FROM verts)""",
    ]
    for i in range(1, ppr_iterations + 1):
        parts.append(
            f"""s{i} AS MATERIALIZED (
  SELECT e.dst AS vid, sum(r.delta * e.inv) AS s
  FROM r{i - 1} r JOIN ewd e ON r.vid = e.src WHERE r.delta > 0 GROUP BY e.dst),
r{i} AS MATERIALIZED (
  SELECT v.vid, v.rank + {d} * coalesce(s.s, 0) AS rank, {d} * coalesce(s.s, 0) AS delta
  FROM r{i - 1} v LEFT JOIN s{i} s ON v.vid = s.vid)"""
        )
    parts.append(
        f"""circle AS MATERIALIZED (
  SELECT vid FROM r{ppr_iterations} WHERE round(rank, 6) > 0
  ORDER BY round(rank, 6) DESC, vid LIMIT {circle_size}),
ie AS MATERIALIZED (
  SELECT e.src, e.dst FROM lineseq e JOIN circle c ON c.vid = e.src),
iverts AS (SELECT src AS vid FROM ie UNION SELECT dst FROM ie),
wod AS (SELECT src, 1.0 / count(*) AS inv_out FROM ie GROUP BY src),
wid_ AS (SELECT dst, 1.0 / count(*) AS inv_in FROM ie GROUP BY dst),
wesrc AS MATERIALIZED (SELECT e.src, e.dst, wod.inv_out FROM ie e JOIN wod USING (src)),
wedst AS MATERIALIZED (SELECT e.src, e.dst, wid_.inv_in FROM ie e JOIN wid_ USING (dst)),
ws0 AS MATERIALIZED (SELECT vid, CAST(1.0 AS DOUBLE) AS auth, CAST(1.0 AS DOUBLE) AS hub FROM iverts)"""
    )
    for i in range(1, salsa_iterations + 1):
        parts.append(
            f"""war{i} AS MATERIALIZED (
  SELECT e.dst AS vid, sum(s.hub * e.inv_out) AS a
  FROM ws{i - 1} s JOIN wesrc e ON s.vid = e.src GROUP BY e.dst),
wan{i} AS (SELECT sum(a) AS an FROM war{i}),
wa{i} AS MATERIALIZED (
  SELECT v.vid,
         coalesce(r.a, 0) / (CASE WHEN coalesce(an.an, 0) > 0 THEN an.an ELSE 1 END) AS auth
  FROM ws{i - 1} v LEFT JOIN war{i} r ON v.vid = r.vid CROSS JOIN wan{i} an),
whr{i} AS MATERIALIZED (
  SELECT e.src AS vid, sum(a.auth * e.inv_in) AS h
  FROM wa{i} a JOIN wedst e ON a.vid = e.dst GROUP BY e.src),
whn{i} AS (SELECT sum(h) AS hn FROM whr{i}),
ws{i} AS MATERIALIZED (
  SELECT a.vid, a.auth,
         coalesce(r.h, 0) / (CASE WHEN coalesce(hn.hn, 0) > 0 THEN hn.hn ELSE 1 END) AS hub
  FROM wa{i} a LEFT JOIN whr{i} r ON a.vid = r.vid CROSS JOIN whn{i} hn)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(row_number() OVER (ORDER BY auth DESC, vid) AS INT) AS rank,
       vid, auth
FROM (
  SELECT vid, round(auth, 6) AS auth FROM ws{salsa_iterations}
  WHERE round(auth, 6) > 0
    AND vid NOT IN (SELECT vid FROM circle)
  ORDER BY round(auth, 6) DESC, vid LIMIT {n_recs})"""
    )


def triangle_doulion_sql(p_num: int = 1, p_den: int = 2, seed: int = 7) -> str:
    """DOULION sampled-triangle estimate on the co-order graph — twin of
    operators/triangles.triangle_count_sampled with the same deterministic
    31-bit mixing coin (DOULION_M/A/B constants) over the canonical pair."""
    m, a, b = 2_147_483_647, 1_103_515_245, 1_566_083_941
    return f"""WITH {COORDER_CTES},
e AS (
  SELECT src, dst FROM coorder
  WHERE ((((src % {m}) + {m}) % {m}) * {a}
         + (((dst % {m}) + {m}) % {m}) * {b} + {seed}) % {m} % {p_den} < {p_num}),
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM e e1 JOIN e e2 ON e1.dst = e2.src
  JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst)
SELECT (SELECT count(*) FROM e) AS n_edges_kept,
       count(*) AS tri_sampled,
       round(count(*) * power(CAST({p_den} AS DOUBLE) / {p_num}, 3), 6)
         AS est_triangles
FROM tri"""


def triad_census_sql() -> str:
    """Directed complete-triad census on the line-seq graph — twin of
    operators/motifs.triad_census (same class definitions, same canonical
    direction-bit collapse; zero-filled over all seven classes)."""
    return f"""WITH {LINESEQ_CTES},
d AS (SELECT DISTINCT src, dst FROM lineseq WHERE src <> dst),
bits AS (SELECT least(src, dst) AS lo, greatest(src, dst) AS hi,
                max(CASE WHEN src < dst THEN 1 ELSE 0 END) AS f,
                max(CASE WHEN src > dst THEN 1 ELSE 0 END) AS r
         FROM d GROUP BY 1, 2),
tri AS (SELECT e1.f AS f_ab, e1.r AS r_ab, e2.f AS f_bc, e2.r AS r_bc,
               e3.f AS f_ac, e3.r AS r_ac
        FROM bits e1 JOIN bits e2 ON e2.lo = e1.hi
        JOIN bits e3 ON e3.lo = e1.lo AND e3.hi = e2.hi),
cls AS (SELECT CASE
  WHEN f_ab*r_ab + f_bc*r_bc + f_ac*r_ac = 3 THEN '300'
  WHEN f_ab*r_ab + f_bc*r_bc + f_ac*r_ac = 2 THEN '210'
  WHEN f_ab*r_ab + f_bc*r_bc + f_ac*r_ac = 1 THEN
    CASE WHEN f_ab*r_ab = 1 THEN
           CASE WHEN f_ac = 1 AND f_bc = 1 THEN '120D'
                WHEN r_ac = 1 AND r_bc = 1 THEN '120U' ELSE '120C' END
         WHEN f_bc*r_bc = 1 THEN
           CASE WHEN r_ab = 1 AND r_ac = 1 THEN '120D'
                WHEN f_ab = 1 AND f_ac = 1 THEN '120U' ELSE '120C' END
         ELSE
           CASE WHEN f_ab = 1 AND r_bc = 1 THEN '120D'
                WHEN r_ab = 1 AND f_bc = 1 THEN '120U' ELSE '120C' END
    END
  WHEN (f_ab = 1 AND f_bc = 1 AND r_ac = 1)
    OR (r_ab = 1 AND r_bc = 1 AND f_ac = 1) THEN '030C'
  ELSE '030T' END AS motif FROM tri),
cnt AS (SELECT motif, count(*) AS n FROM cls GROUP BY motif),
all7 AS (SELECT unnest(['030C','030T','120C','120D','120U','210','300']) AS motif)
SELECT a.motif, coalesce(c.n, 0) AS n FROM all7 a LEFT JOIN cnt c USING (motif)"""


def coreness_hindex_sql(iterations: int = 24) -> str:
    """Unrolled h-index coreness iteration on the undirected line-seq graph
    — twin of operators/kcore.coreness_hindex (c0 = degree; per round, each
    vertex takes the h-index of its neighbors' values).  Converges in 16
    rounds at sf0.01 (measured; max core 32) — 24 gives 1.5x margin, and
    extra rounds are fixpoint no-ops.  The h-index is tie-order invariant,
    so row_number tie-breaks cannot split the engines."""
    parts = [
        NBR_CTES,
        LINESEQ_VERTS,
        """c0 AS MATERIALIZED (
  SELECT v.vid, coalesce(d.deg, 0) AS core
  FROM verts v LEFT JOIN (SELECT vid, count(*) AS deg FROM nbrs GROUP BY vid) d
  USING (vid))""",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""r{i} AS (
  SELECT n.vid, c.core AS cn,
         row_number() OVER (PARTITION BY n.vid ORDER BY c.core DESC) AS r
  FROM nbrs n JOIN c{i - 1} c ON c.vid = n.nbr),
c{i} AS MATERIALIZED (
  SELECT v.vid, coalesce(h.core, 0) AS core
  FROM c{i - 1} v LEFT JOIN (
    SELECT vid, max(CASE WHEN cn >= r THEN r END) AS core FROM r{i} GROUP BY vid) h
  USING (vid))"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT vid, core FROM c{iterations}"
    )


def edge_embeddedness_sql() -> str:
    """Per-edge common-neighbor count + neighborhood overlap on the
    co-order graph — twin of operators/triangles.edge_embeddedness (same
    triangle explode-to-pairs aggregation, 6dp overlap, 0.0 when the
    other-neighbor union is empty)."""
    return f"""WITH {TRIANGLE_CTES},
pc AS (
  SELECT src, dst, count(*) AS common FROM (
    SELECT a AS src, b AS dst FROM tri
    UNION ALL SELECT b, c FROM tri
    UNION ALL SELECT a, c FROM tri) x
  GROUP BY 1, 2),
deg AS (SELECT vid, count(*) AS d FROM (
  SELECT src AS vid FROM coorder UNION ALL SELECT dst FROM coorder) x GROUP BY vid)
SELECT e.src, e.dst, coalesce(pc.common, 0) AS common,
       round(CASE WHEN du.d + dv.d - 2 - coalesce(pc.common, 0) > 0
                  THEN CAST(coalesce(pc.common, 0) AS DOUBLE)
                       / (du.d + dv.d - 2 - coalesce(pc.common, 0))
                  ELSE 0.0 END, 6) AS overlap
FROM coorder e
LEFT JOIN pc ON pc.src = e.src AND pc.dst = e.dst
JOIN deg du ON du.vid = e.src
JOIN deg dv ON dv.vid = e.dst"""


def ppr_sweep_sql(
    iterations: int = 20,
    damping: float = 0.85,
    source_mod: int = 50,
    top_k: int = 100,
) -> str:
    """PPR sweep-cut curve on the line-seq graph — twin of
    operators/sweep.ppr_sweep.  Same unrolled delta-push PPR chain as
    pagerank_personalized_sql, scores quantized to 6dp BEFORE the degree
    normalization, then the histogram-difference sweep (+1 at an edge's
    min prefix position, -1 at its max) so every prefix's cut is one
    running sum."""
    alpha = repr(1.0 - damping)
    d = repr(damping)
    parts = [
        LINESEQ_CTES,
        LINESEQ_VERTS,
        "odeg AS (SELECT src, count(*) AS outdeg FROM lineseq GROUP BY src)",
        "ewd AS (SELECT e.src, e.dst, 1.0 / d.outdeg AS inv FROM lineseq e JOIN odeg d USING (src))",
        f"""r0 AS MATERIALIZED (
  SELECT vid,
         CASE WHEN vid % {source_mod} = 0 THEN CAST({alpha} AS DOUBLE) ELSE 0.0 END AS rank,
         CASE WHEN vid % {source_mod} = 0 THEN CAST({alpha} AS DOUBLE) ELSE 0.0 END AS delta
  FROM verts)""",
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
    parts.append(
        f"""und AS (SELECT DISTINCT least(src, dst) AS s, greatest(src, dst) AS d
         FROM lineseq WHERE src <> dst),
deg AS (SELECT vid, count(*) AS deg FROM (
  SELECT s AS vid FROM und UNION ALL SELECT d FROM und) x GROUP BY vid),
m2 AS (SELECT sum(deg) AS vol_all FROM deg),
sc AS (SELECT vid, round(rank, 6) AS r6 FROM r{iterations} WHERE round(rank, 6) > 0),
pos AS MATERIALIZED (
  SELECT vid, deg, k FROM (
    SELECT sc.vid, deg.deg, row_number() OVER (ORDER BY sc.r6 / deg.deg DESC, sc.vid) AS k
    FROM sc JOIN deg USING (vid)) x
  WHERE k <= {top_k}),
ev AS (
  SELECT least(coalesce(p1.k, 2147483648), coalesce(p2.k, 2147483648)) AS kmin,
         CASE WHEN p1.k IS NOT NULL AND p2.k IS NOT NULL
              THEN greatest(p1.k, p2.k) END AS kmax
  FROM und e LEFT JOIN pos p1 ON p1.vid = e.s LEFT JOIN pos p2 ON p2.vid = e.d
  WHERE p1.k IS NOT NULL OR p2.k IS NOT NULL),
diff AS (SELECT k, sum(v) AS dv FROM (
  SELECT kmin AS k, 1 AS v FROM ev
  UNION ALL SELECT kmax, -1 FROM ev WHERE kmax IS NOT NULL) x GROUP BY k),
curve AS (
  SELECT p.k, p.vid,
         sum(coalesce(f.dv, 0)) OVER (ORDER BY p.k) AS cut,
         sum(p.deg) OVER (ORDER BY p.k) AS vol
  FROM pos p LEFT JOIN diff f USING (k))"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT c.k, c.vid, CAST(c.cut AS BIGINT) AS cut, CAST(c.vol AS BIGINT) AS vol,
       round(CASE WHEN least(c.vol, m2.vol_all - c.vol) > 0
                  THEN CAST(c.cut AS DOUBLE) / least(c.vol, m2.vol_all - c.vol)
             END, 6) AS phi
FROM curve c CROSS JOIN m2"""
    )


def edge_betweenness_sql(max_vid: int = 200, k: int = 32, max_depth: int = 12) -> str:
    """Sampled EDGE betweenness on the size-capped line-seq subgraph —
    twin of operators/betweenness.edge_betweenness with the degree-top-k
    source sample.  Unrolled as the SAME backward delta sweep the operator
    runs (NOT the pair-sum identity), in BIGINT micro-units: delta6 is an
    integer, each term is CAST(round(sigma_u/sigma_w*(10^6+delta6_w)) AS
    BIGINT), every accumulation an exact integer sum — order-free and
    bit-identical across engines, and the gate compares the raw BIGINT c6
    (never a rounded double: 1e-6 is not a binary fraction, sigma ratios
    often sit exactly on rounding boundaries, and Spark's string-based
    round vs C-library round disagree there — both observed at sf0.001)."""
    parts = [LINESEQ_CTES, BETWEENNESS_SUB.format(max_vid=max_vid)]
    parts.append(
        f"""deg AS (
  SELECT vid, count(*) AS degree FROM (
    SELECT src AS vid FROM g UNION ALL SELECT dst AS vid FROM g) dd GROUP BY vid),
srcs AS (SELECT vid FROM deg ORDER BY degree DESC, vid ASC LIMIT {k}),
lvl0 AS MATERIALIZED (SELECT vid AS s, vid AS v, CAST(1 AS DOUBLE) AS sigma FROM srcs),
vis0 AS MATERIALIZED (SELECT s, v FROM lvl0)"""
    )
    for d in range(1, max_depth + 1):
        parts.append(
            f"""lvl{d} AS MATERIALIZED (
  SELECT x.s, x.v, sum(x.sigma) AS sigma FROM (
    SELECT l.s, g.dst AS v, l.sigma FROM lvl{d - 1} l JOIN g ON g.src = l.v) x
  LEFT JOIN vis{d - 1} vv ON vv.s = x.s AND vv.v = x.v
  WHERE vv.s IS NULL GROUP BY x.s, x.v),
vis{d} AS MATERIALIZED (
  SELECT s, v FROM vis{d - 1} UNION ALL SELECT s, v FROM lvl{d})"""
        )
    parts.append(
        f"del{max_depth} AS (SELECT s, v, CAST(0 AS BIGINT) AS delta6 FROM lvl{max_depth})"
    )
    for d in range(max_depth - 1, -1, -1):
        parts.append(
            f"""term{d} AS MATERIALIZED (
  SELECT l.s, l.v AS u, g.dst AS w,
         CAST(round(l.sigma / lw.sigma * (1000000 + dw.delta6), 0) AS BIGINT) AS c6
  FROM lvl{d} l JOIN g ON g.src = l.v
  JOIN lvl{d + 1} lw ON lw.s = l.s AND lw.v = g.dst
  JOIN del{d + 1} dw ON dw.s = l.s AND dw.v = g.dst),
del{d} AS MATERIALIZED (
  SELECT l.s, l.v, CAST(coalesce(t.dsum, 0) AS BIGINT) AS delta6
  FROM lvl{d} l LEFT JOIN (
    SELECT s, u, sum(c6) AS dsum FROM term{d} GROUP BY s, u) t
  ON t.s = l.s AND t.u = l.v)"""
        )
    allterms = " UNION ALL ".join(
        f"SELECT u, w, c6 FROM term{d}" for d in range(max_depth)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
eb AS (SELECT u, w, sum(c6) AS c6 FROM ({allterms}) at GROUP BY u, w)
SELECT g.src, g.dst, CAST(coalesce(eb.c6, 0) AS BIGINT) AS c6
FROM g LEFT JOIN eb ON eb.u = g.src AND eb.w = g.dst"""
    )
