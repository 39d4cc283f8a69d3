"""Degree centrality (beyond the reference catalogue; GDS `gds.degree`).

The reference exposes degrees only internally (core Degrees.java feeds its
algorithms); its successor ships degree centrality as a user-facing
procedure, and it is the zeroth link-graph statistic every pipeline
computes (skew audits pick hub thresholds for `pagerank(hub_threshold=)`
and `node_similarity(max_center_degree=)` from exactly this table).

One groupBy per direction on the edge table, map-side combined — no joins
except the final assembly on vid.  At 10^12 edges this is the cheapest
whole-graph aggregation that exists; it is also the skew PROBE, so it must
not itself assume balance: the aggregation key is the vertex id (never a
composite), letting AQE split hot reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from neo4j_graph_algorithms_spark.graph import DST, SRC, VID, EdgeFrame


def degree_centrality(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    vertices: DataFrame | None = None,
) -> DataFrame:
    """[vid, out_deg, in_deg, deg] — directed out/in degree (parallel edges
    counted, multigraph semantics like the reference loader pre-dedup) and
    undirected-simple degree `deg` (distinct neighbors, the triangle/
    coefficient convention — impl/TriangleCount.java:132-137 BOTH-degree).
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    out_d = ef.df.groupBy(F.col(SRC).alias(VID)).agg(F.count("*").alias("out_deg"))
    in_d = ef.df.groupBy(F.col(DST).alias(VID)).agg(F.count("*").alias("in_deg"))
    und = ef.canonical().df.select(SRC, DST)
    both = (
        und.select(F.col(SRC).alias(VID))
        .unionByName(und.select(F.col(DST).alias(VID)))
        .groupBy(VID)
        .agg(F.count("*").alias("deg"))
    )
    verts = vertices.select(VID) if vertices is not None else ef.vertices()
    return (
        verts.join(out_d.hint("shuffle_hash"), on=VID, how="left")
        .join(in_d.hint("shuffle_hash"), on=VID, how="left")
        .join(both.hint("shuffle_hash"), on=VID, how="left")
        .select(
            VID,
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            F.coalesce("deg", F.lit(0)).alias("deg"),
        )
    )


def degree_assortativity(
    spark: SparkSession, edges: EdgeFrame | DataFrame
) -> DataFrame:
    """[assortativity] — Newman's degree assortativity coefficient (Newman,
    PRL 89:208701, 2002): the Pearson correlation of endpoint degrees over
    the undirected simple edge set, each edge contributing both (d_u, d_v)
    and (d_v, d_u).  r > 0: hubs link to hubs; r < 0: hubs link to leaves
    (the usual web/link-graph signature).

    Scale shape: one degree aggregation, two hash joins of the edge table
    against the (|V|-sized, hinted) degree projection, one corr() fold —
    no window, no collect of anything |E|-sized.
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    und = ef.canonical().df.select(SRC, DST)
    both = und.unionByName(und.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))
    deg = both.groupBy(F.col(SRC).alias(VID)).agg(F.count("*").alias("deg"))
    pairs = (
        both.join(
            deg.select(F.col(VID).alias(SRC), F.col("deg").alias("dx")).hint(
                "shuffle_hash"
            ),
            on=SRC,
        )
        .join(
            deg.select(F.col(VID).alias(DST), F.col("deg").alias("dy")).hint(
                "shuffle_hash"
            ),
            on=DST,
        )
    )
    return pairs.agg(
        F.round(F.corr(F.col("dx").cast("double"), F.col("dy").cast("double")), 6).alias(
            "assortativity"
        )
    )


def degree_distribution(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    vertices: DataFrame | None = None,
    percentiles: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """One-row exact degree-distribution summary —
    [n_vertices, n_edges, min_deg, max_deg, sum_deg, p<q>_deg ...].

    The skew audit a 10^12-edge ingest runs before choosing hub thresholds
    (the reference sizes its hugegraph loader from exactly these statistics,
    /root/reference/core/src/main/java/org/neo4j/graphalgo/core/huge/loader/ —
    degree scan before adjacency allocation).  Degrees follow
    `degree_centrality`'s undirected-simple `deg` convention.

    Percentiles are DISCRETE and integer-exact on both engines:
    p(q) = min degree whose cumulative vertex count >= ceil(n*q/100),
    computed on the degree HISTOGRAM (one groupBy of the |V|-sized degree
    table down to |distinct degrees| rows — typically a few thousand even at
    web scale, so the single-partition cumulative window over it is a
    deliberate, bounded driver-adjacent step, never |V|-sized).  All outputs
    are BIGINT (no float rounding to disagree on).
    """
    deg_df = degree_centrality(spark, edges, vertices).select(VID, "deg")
    hist = deg_df.groupBy("deg").agg(F.count("*").alias("cnt"))
    from pyspark.sql import Window

    w = Window.orderBy("deg").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = hist.select("deg", "cnt", F.sum("cnt").over(w).alias("cum"))
    totals = hist.agg(
        F.sum("cnt").alias("n_vertices"),
        F.min("deg").alias("min_deg"),
        F.max("deg").alias("max_deg"),
        F.sum(F.col("deg") * F.col("cnt")).alias("sum_deg"),
    )
    joined = cum.crossJoin(F.broadcast(totals))
    # cum >= ceil(n*q/100)  <=>  100*cum >= n*q — pure BIGINT comparison,
    # no float division for the two engines to round differently.
    pct_aggs = [
        F.min(
            F.when(
                F.col("cum") * 100 >= F.col("n_vertices") * q,
                F.col("deg"),
            )
        ).alias(f"p{q}_deg")
        for q in percentiles
    ]
    # GLOBAL (keyless) aggregations so an empty graph yields exactly one
    # all-NULL row — the same contract as the SQL twin's `SELECT ... FROM
    # tot` aggregate — instead of zero rows.
    pcts = joined.agg(*pct_aggs)
    return totals.crossJoin(F.broadcast(pcts)).select(
        F.col("n_vertices").cast("long").alias("n_vertices"),
        (F.col("sum_deg") / 2).cast("long").alias("n_edges"),
        F.col("min_deg").cast("long").alias("min_deg"),
        F.col("max_deg").cast("long").alias("max_deg"),
        F.col("sum_deg").cast("long").alias("sum_deg"),
        *[F.col(f"p{q}_deg").cast("long").alias(f"p{q}_deg") for q in percentiles],
    )


def rich_club(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
) -> DataFrame:
    """[k, n_nodes, n_edges, phi_q6] — the rich-club curve of the
    undirected simple graph: for every observed degree value k, the
    subgraph induced by nodes with deg > k has n_nodes vertices and
    n_edges edges, and phi = 2·E_k / (N_k·(N_k−1)) is its density
    (Colizza et al., Nature Physics 2006).  Rows with N_k < 2 are dropped
    (phi undefined).  The hub-interconnection audit: a rising phi(k) means
    hubs preferentially link to each other — exactly the regime where the
    repo's wedge/triangle hub caps and salting matter.

    Exactness: phi_q6 = floor(10⁶·2·E_k / (N_k·(N_k−1))) in DECIMAL(38,0)
    floor division — engine-invariant, no floats (twin:
    oracles.rich_club_sql).

    Scale shape: ONE pass over the canonical edge set — degree histogram
    + edge-min-degree histogram, then suffix sums via a RANGE window
    (d+1 … ∞) over the UNION of the two histograms, whose size is
    |distinct degrees| + |distinct edge-min degrees| (a few thousand at
    web scale — the degree_distribution single-partition-window
    convention, deliberate and bounded, never |V|- or |E|-sized).  No
    inequality join, no per-k rescans.
    """
    from pyspark.sql import Window

    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    und = (
        ef.with_direction("BOTH")
        .df.select(F.least(SRC, DST).alias(SRC), F.greatest(SRC, DST).alias(DST))
        .filter(F.col(SRC) != F.col(DST))
        .distinct()
    )
    und = und.localCheckpoint(eager=True)  # reused: degrees + edge mins
    deg = (
        und.select(F.col(SRC).alias(VID))
        .unionByName(und.select(F.col(DST).alias(VID)))
        .groupBy(VID)
        .agg(F.count("*").alias("deg"))
    )
    deg = deg.localCheckpoint(eager=True)  # reused: histogram + edge join
    dhist = deg.groupBy(F.col("deg").alias("d")).agg(F.count("*").alias("n"))
    emin = (
        und.join(
            deg.select(F.col(VID).alias(SRC), F.col("deg").alias("_ds")).hint(
                "shuffle_hash"
            ),
            on=SRC,
        )
        .join(
            deg.select(F.col(VID).alias(DST), F.col("deg").alias("_dd")).hint(
                "shuffle_hash"
            ),
            on=DST,
        )
        .select(F.least("_ds", "_dd").alias("d"))
        .groupBy("d")
        .agg(F.count("*").alias("e"))
    )
    uni = dhist.select("d", "n", F.lit(0).cast("long").alias("e")).unionByName(
        emin.select("d", F.lit(0).cast("long").alias("n"), "e")
    )
    w = Window.orderBy("d").rangeBetween(1, Window.unboundedFollowing)
    curves = uni.select(
        "d",
        F.coalesce(F.sum("n").over(w), F.lit(0)).alias("n_nodes"),
        F.coalesce(F.sum("e").over(w), F.lit(0)).alias("n_edges"),
        # grid = observed degree values only (edge-min-only rows excluded)
        F.col("n").alias("_isdeg"),
    )
    return (
        curves.filter((F.col("_isdeg") > 0) & (F.col("n_nodes") >= 2))
        .select(
            F.col("d").alias("k"),
            "n_nodes",
            "n_edges",
            F.expr(
                "CAST(CAST(n_edges AS DECIMAL(38,0)) * 2000000"
                " div (CAST(n_nodes AS DECIMAL(38,0)) * (n_nodes - 1)) AS BIGINT)"
            ).alias("phi_q6"),
        )
        .distinct()
    )


def _simple_degrees(edges: EdgeFrame | DataFrame) -> DataFrame:
    """[vid, deg] — undirected-simple degrees (the rich_club convention:
    canonical edge set, self-loops dropped, parallel edges collapsed)."""
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    und = (
        ef.with_direction("BOTH")
        .df.select(F.least(SRC, DST).alias(SRC), F.greatest(SRC, DST).alias(DST))
        .filter(F.col(SRC) != F.col(DST))
        .distinct()
    )
    return (
        und.select(F.col(SRC).alias(VID))
        .unionByName(und.select(F.col(DST).alias(VID)))
        .groupBy(VID)
        .agg(F.count("*").alias("deg"))
    )


def degree_powerlaw(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
    dmin: int = 2,
) -> DataFrame:
    """[dmin, n_tail, alpha_q6, sigma_q6] — maximum-likelihood power-law
    exponent of the undirected-simple degree distribution (Clauset, Shalizi
    & Newman, SIAM Review 2009, eq. 3.7 discrete approximation):

        alpha = 1 + n / Σ ln(d_i / (dmin − ½)),   over vertices d_i ≥ dmin,
        sigma = (alpha − 1) / √n                   (asymptotic std error).

    The scale-free audit behind every hub decision in this repo: alpha ≈ 2
    means heavy hubs (salt/cap aggressively — pagerank(hub_threshold=),
    node_similarity(max_center_degree=)), alpha ≥ 3 means the tail is tame.

    Exactness: the per-vertex log terms are summed on the 1e-6 integer grid
    PER DISTINCT DEGREE (term_q6 = round(10⁶·ln(d/(dmin−½))) · count_d, a
    BIGINT), so the cross-engine sum is order-independent and exact; the
    final alpha/sigma are one double expression over identical integers.

    Scale shape: one groupBy of the |V|-sized degree table down to the
    degree histogram (a few thousand rows at web scale), then a keyless
    aggregate — no window, no join, nothing |V|-sized past the histogram.
    """
    hist = (
        _simple_degrees(edges)
        .groupBy("deg")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("deg") >= dmin)
    )
    term = (
        F.round(F.log(F.col("deg") / (dmin - 0.5)) * 1_000_000.0, 0).cast("long")
        * F.col("cnt")
    )
    agg = hist.agg(
        F.sum("cnt").alias("n_tail"),
        F.sum(term).alias("s_q6"),
    )
    n, s = F.col("n_tail"), F.col("s_q6")
    alpha = F.lit(1.0) + n * F.lit(1_000_000.0) / s
    return agg.select(
        F.lit(dmin).cast("long").alias("dmin"),
        n.cast("long").alias("n_tail"),
        F.round(alpha, 6).alias("alpha_q6"),
        F.round((alpha - F.lit(1.0)) / F.sqrt(n), 6).alias("sigma_q6"),
    )


def degree_gini(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
) -> DataFrame:
    """[n_vertices, sum_deg, gini_q6] — Gini coefficient of the
    undirected-simple degree distribution, the single-number skew audit
    (0 = regular graph, → 1 = one hub owns every edge):

        G = (2·Σᵢ i·d₍ᵢ₎ − (n+1)·Σd) / (n·Σd),   d₍₁₎ ≤ … ≤ d₍ₙ₎.

    Tie order cannot matter (swapping equal degrees leaves Σ i·d₍ᵢ₎
    unchanged), so the rank sum is computed CLOSED-FORM on the degree
    histogram: degrees equal to d occupy ranks cum_prev+1 … cum_prev+cnt,
    contributing 2·Σ i·d = d·(2·cnt·cum_prev + cnt·(cnt+1)) — the DOUBLED
    form needs no division anywhere, so everything stays DECIMAL(38,0)-exact
    (cnt² would overflow BIGINT once one degree bucket exceeds 3·10⁹
    vertices — real at 10^12-file scale for deg=1) until the final ratio
    (twin: oracles.degree_gini_sql with HUGEINT sums).

    Scale shape: |V|-sized degree table → degree histogram → one cumulative
    window over the HISTOGRAM (the degree_distribution single-partition
    convention, bounded by |distinct degrees|) → keyless aggregate.
    """
    from pyspark.sql import Window

    hist = _simple_degrees(edges).groupBy("deg").agg(F.count("*").alias("cnt"))
    w = Window.orderBy("deg").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        "deg",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cum_prev"),
    )
    dd = F.col("deg").cast("decimal(38,0)")
    cc = F.col("cnt").cast("decimal(38,0)")
    pp = F.col("cum_prev").cast("decimal(38,0)")
    two_rank_contrib = dd * (F.lit(2) * cc * pp + cc * (cc + F.lit(1)))
    agg = cum.agg(
        F.sum("cnt").cast("decimal(38,0)").alias("n"),
        F.sum(F.col("deg") * F.col("cnt")).cast("decimal(38,0)").alias("sumd"),
        F.sum(two_rank_contrib).alias("two_rankdeg"),
    )
    n, s, r2 = F.col("n"), F.col("sumd"), F.col("two_rankdeg")
    gini = (r2 - (n + 1) * s).cast("double") / (n * s).cast("double")
    return agg.select(
        n.cast("long").alias("n_vertices"),
        s.cast("long").alias("sum_deg"),
        F.round(F.when((n * s) > 0, gini), 6).alias("gini_q6"),
    )


def graph_reciprocity(
    spark: SparkSession,
    edges: EdgeFrame | DataFrame,
) -> DataFrame:
    """[n_edges, n_reciprocal, reciprocity_q6] — edge reciprocity of the
    directed simple graph (Newman, "Networks" §7.10): the fraction of
    distinct non-loop directed edges (u,v) whose reverse (v,u) is also
    present.  The direction-structure audit: a link graph derived from a
    symmetric relation (co-commit) must read 1.0, an inherently
    asymmetric one (imports, sequence edges) reads near 0 — a value that
    moves between rounds means the derivation's direction handling changed.

    Exactness: two BIGINT counts and one double ratio over identical
    integers (twin: oracles.graph_reciprocity_sql).

    Scale shape: one distinct over the edge set, then ONE self-semi-join on
    the reversed key — hinted shuffle_hash (both sides are |E|-sized; a
    broadcast would be the classic |E|-broadcast failure at web scale).
    Each mutual pair counts twice, matching the standard definition r =
    |E ∩ Eᵀ| / |E|.
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    e = (
        ef.df.select(SRC, DST)
        .filter(F.col(SRC) != F.col(DST))
        .distinct()
        .localCheckpoint(eager=True)  # reused: base count + both join sides
    )
    rev = e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    recip = e.join(rev.hint("shuffle_hash"), on=[SRC, DST], how="left_semi")
    counts = e.agg(F.count("*").alias("n_edges")).crossJoin(
        recip.agg(F.count("*").alias("n_reciprocal"))
    )
    return counts.select(
        F.col("n_edges").cast("long").alias("n_edges"),
        F.col("n_reciprocal").cast("long").alias("n_reciprocal"),
        F.round(
            F.when(
                F.col("n_edges") > 0,
                F.col("n_reciprocal").cast("double") / F.col("n_edges").cast("double"),
            ),
            6,
        ).alias("reciprocity_q6"),
    )


def two_hop_ball_sizes(
    edges: EdgeFrame | DataFrame,
    max_degree: int | None = None,
) -> DataFrame:
    """[vid, n1, n2] — exact 1-hop degree and exact |ball_2(v)| - 1 (the
    number of DISTINCT vertices within undirected distance <= 2, self
    excluded) on the simple undirected graph.

    The exact validation twin of the HyperBall radius-2 estimate
    (operators/hyperball.py / gate `hyperball_est_r2`): HyperBall trades
    exactness for O(|V| log log |V|) registers; this materializes the real
    wedge closure — O(sum deg^2) pairs — which is exactly what you run at
    audit scale to measure the sketch's error, and why both live in the
    catalogue.  `max_degree` (mirrored in any oracle, per the repo's
    cap-parity rule) drops wedge CENTERS above the cap, the nodesim hub
    guard, default off.

    Plan: one self-join of the src-partitioned adjacency on the wedge
    center + one distinct + one count — map-side combined, no windows.
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    und = ef.canonical().df.select(SRC, DST)
    adj = und.unionByName(
        und.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    )
    mid_adj = adj
    if max_degree is not None:
        ok = (
            adj.groupBy(SRC)
            .agg(F.count("*").alias("_d"))
            .filter(F.col("_d") <= max_degree)
            .select(SRC)
        )
        mid_adj = adj.join(ok.hint("shuffle_hash"), on=SRC, how="left_semi")
    two = mid_adj.withColumnRenamed(SRC, "_mid").withColumnRenamed(DST, "_far")
    ball = (
        adj.join(two, adj[DST] == two["_mid"])
        .select(SRC, F.col("_far").alias(DST))
        .unionByName(adj.select(SRC, DST))
        .filter(F.col(SRC) != F.col(DST))
        .distinct()
    )
    n1 = adj.groupBy(F.col(SRC).alias(VID)).agg(F.count("*").alias("n1"))
    n2 = ball.groupBy(F.col(SRC).alias(VID)).agg(F.count("*").alias("n2"))
    return n1.join(n2, on=VID, how="left").fillna(0, subset=["n2"])


def avg_neighbor_degree(edges: EdgeFrame | DataFrame) -> DataFrame:
    """[deg, n_vertices, sum_nbr_deg_sum, knn] — the average-nearest-
    neighbor-degree curve knn(k) (Pastor-Satorras, Vazquez & Vespignani,
    "Dynamical and correlation properties of the Internet", PRL 87, 2001):
    for each degree class k, the mean over degree-k vertices of their mean
    neighbor degree.  Rising curve = assortative, falling = disassortative
    — the per-scale profile behind the single assortativity coefficient
    (degree_assortativity), and the audit that locates WHICH degree band
    drives hub-mixing in a link graph.

    Exactness: knn(k) = sum_v s_v / (k * n_k) where s_v = integer sum of
    neighbor degrees.  Per-vertex means s_v/k share the class denominator
    k, so one BIGINT numerator per class suffices; the gate carries the
    raw integers (sum_nbr_deg_sum, n_vertices) plus the derived double.

    Plan: one degree agg + one (src)-keyed join of the adjacency against
    the degree table + two map-side-combined aggs; histogram-sized output.
    """
    ef = edges if isinstance(edges, EdgeFrame) else EdgeFrame(edges)
    und = ef.canonical().df.select(SRC, DST)
    adj = und.unionByName(
        und.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    )
    deg = adj.groupBy(SRC).agg(F.count("*").alias("_deg"))
    nbr_deg = (
        adj.join(
            deg.select(F.col(SRC).alias(DST), F.col("_deg").alias("_nd")).hint(
                "shuffle_hash"
            ),
            on=DST,
        )
        .groupBy(SRC)
        .agg(F.sum("_nd").alias("_s"))
    )
    per_vertex = deg.join(nbr_deg.hint("shuffle_hash"), on=SRC)
    return (
        per_vertex.groupBy(F.col("_deg").alias("deg"))
        .agg(
            F.count("*").alias("n_vertices"),
            F.sum("_s").alias("sum_nbr_deg_sum"),
        )
        .select(
            "deg",
            "n_vertices",
            "sum_nbr_deg_sum",
            (
                F.col("sum_nbr_deg_sum").cast("double")
                / (F.col("deg") * F.col("n_vertices")).cast("double")
            ).alias("knn"),
        )
    )
