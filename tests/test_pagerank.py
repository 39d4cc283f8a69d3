"""PageRank vs reference golden values (PageRankWikiTest.java, PageRankTest.java).

Reference asserts tol 1e-2 against its quantized impl; we match that on
golden values and assert 1e-6 self-consistency across partition counts.
"""

import math

import pytest

from neo4j_graph_algorithms_spark.operators.pagerank import pagerank, pagerank_scores
from tests.conftest import F1_EXPECTED, F2_EXPECTED, collect_map, edge_df


def ranks_by_name(res, ids):
    comp = collect_map(pagerank_scores(res), "vid", "rank")
    return {name: comp.get(i, None) for name, i in ids.items()}


def test_pagerank_wiki_golden(spark, f1_pagerank_wiki):
    edges, ids = f1_pagerank_wiki
    res = pagerank(spark, edges, damping_factor=0.85, max_iterations=40)
    got = ranks_by_name(res, ids)
    for name, want in F1_EXPECTED.items():
        assert math.isclose(got[name], want, abs_tol=1e-2), (name, got[name], want)
    # dangling node a: no out-edges; nodes g..k have no in-edges → exactly 0.15
    for name in "ghijk":
        assert math.isclose(got[name], 0.15, abs_tol=1e-12)


def test_pagerank_labeled_golden(spark, f2_pagerank_labeled):
    edges, vertices, ids = f2_pagerank_labeled
    res = pagerank(spark, edges, vertices=vertices, damping_factor=0.85, max_iterations=40)
    got = ranks_by_name(res, ids)
    for name, want in F2_EXPECTED.items():
        assert math.isclose(got[name], want, abs_tol=1e-2), (name, got[name], want)


def test_pagerank_convergence_stop(spark, f1_pagerank_wiki):
    edges, ids = f1_pagerank_wiki
    res = pagerank(spark, edges, max_iterations=200, tolerance=1e-6)
    assert res.converged
    assert res.metrics[-1]["metric"] < 1e-6


def test_pagerank_partition_count_invariance(spark, f1_pagerank_wiki):
    """allclose 1e-6 across different parallelism (BASELINE.json)."""
    edges, ids = f1_pagerank_wiki
    r1 = ranks_by_name(pagerank(spark, edges.repartition(1), max_iterations=30), ids)
    r8 = ranks_by_name(pagerank(spark, edges.repartition(8), max_iterations=30), ids)
    for name in ids:
        assert math.isclose(r1[name], r8[name], rel_tol=0, abs_tol=1e-6)


def test_pagerank_resume(spark, tmp_path, f1_pagerank_wiki):
    edges, ids = f1_pagerank_wiki
    ckpt = str(tmp_path / "pr_ckpt")
    full = pagerank(spark, edges, max_iterations=40, checkpoint_dir=ckpt, checkpoint_interval=10)
    resumed = pagerank(
        spark, edges, max_iterations=40, checkpoint_dir=ckpt, checkpoint_interval=10, resume=True
    )
    a = ranks_by_name(full, ids)
    b = ranks_by_name(resumed, ids)
    for name in ids:
        assert math.isclose(a[name], b[name], abs_tol=1e-12)


def test_pagerank_hub_salting_identical(spark, f1_pagerank_wiki):
    """Salted two-phase aggregation changes the plan, not the numbers."""
    edges, ids = f1_pagerank_wiki

    plain = pagerank(spark, edges, max_iterations=20)
    salted = pagerank(
        spark, edges, max_iterations=20, hub_threshold=2, salt_buckets=4
    )
    a = {r.vid: r.rank for r in plain.state.collect()}
    b = {r.vid: r.rank for r in salted.state.collect()}
    assert set(a) == set(b)
    for v in a:
        assert math.isclose(a[v], b[v], rel_tol=0, abs_tol=1e-12), v


def test_pagerank_warm_start_edge_added(spark):
    """Warm-starting from the OLD graph's fixpoint on a graph with one
    edge ADDED converges to the cold-run values (incremental mode)."""
    old_pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0)]
    new_pairs = old_pairs + [(1, 3)]
    old = edge_df(spark, old_pairs)
    new = edge_df(spark, new_pairs)
    r_old = pagerank(spark, old, max_iterations=300, tolerance=1e-9).state.select(
        "vid", "rank"
    )
    cold = pagerank(spark, new, max_iterations=300, tolerance=1e-9)
    warm = pagerank(
        spark, new, max_iterations=300, tolerance=1e-9, initial_ranks=r_old
    )
    a = {r.vid: r.rank for r in cold.state.collect()}
    b = {r.vid: r.rank for r in warm.state.collect()}
    assert set(a) == set(b)
    for v in a:
        assert math.isclose(a[v], b[v], rel_tol=0, abs_tol=1e-6), v
    # small perturbation -> residual mass << alpha mass -> fewer supersteps
    assert len(warm.metrics) < len(cold.metrics)


def test_pagerank_warm_start_edge_removed(spark):
    """Edge REMOVAL makes the residual negative on the de-weighted targets;
    the |delta| active filter must propagate that negative mass."""
    old_pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0), (1, 3)]
    new_pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0)]
    r_old = pagerank(
        spark, edge_df(spark, old_pairs), max_iterations=300, tolerance=1e-9
    ).state.select("vid", "rank")
    new = edge_df(spark, new_pairs)
    cold = {
        r.vid: r.rank
        for r in pagerank(spark, new, max_iterations=300, tolerance=1e-9).state.collect()
    }
    warm = {
        r.vid: r.rank
        for r in pagerank(
            spark, new, max_iterations=300, tolerance=1e-9, initial_ranks=r_old
        ).state.collect()
    }
    for v in cold:
        assert math.isclose(cold[v], warm[v], rel_tol=0, abs_tol=1e-6), v


def test_pagerank_warm_start_same_graph_instant(spark, f1_pagerank_wiki):
    """Warm-starting from the SAME graph's converged ranks has ~zero
    residual: converges immediately and returns the same values."""
    edges, ids = f1_pagerank_wiki
    fix = pagerank(spark, edges, max_iterations=400, tolerance=1e-10)
    warm = pagerank(
        spark,
        edges,
        max_iterations=400,
        tolerance=1e-8,
        initial_ranks=fix.state.select("vid", "rank"),
    )
    a = ranks_by_name(fix, ids)
    b = ranks_by_name(warm, ids)
    for name in ids:
        assert math.isclose(a[name], b[name], rel_tol=0, abs_tol=1e-6), name
    assert len(warm.metrics) <= 8  # residual ~1e-13: metric_every=4 window


def test_personalized_pagerank_mass_only_near_sources(spark):
    # two disconnected directed chains: 0→1→2 and 10→11→12
    edges = edge_df(spark, [(0, 1), (1, 2), (10, 11), (11, 12)])
    res = pagerank(spark, edges, max_iterations=20, source_vids=spark.createDataFrame([(0,)], "vid long"))
    got = {r["vid"]: r["rank"] for r in res.state.collect()}
    # component of 0 carries the classic chain masses; 10's component is 0
    assert got[0] == pytest.approx(0.15)
    assert got[1] == pytest.approx(0.15 * 0.85)
    assert got[2] == pytest.approx(0.15 * 0.85 * 0.85)
    assert got[10] == got[11] == got[12] == 0.0


def test_personalized_sources_with_initial_ranks_rejected(spark):
    edges = edge_df(spark, [(0, 1)])
    src = spark.createDataFrame([(0,)], "vid long")
    with pytest.raises(ValueError):
        pagerank(spark, edges, source_vids=src,
                 initial_ranks=spark.createDataFrame([(0, 1.0)], "vid long, rank double"))


def test_weighted_pagerank_follows_weights(spark):
    # star out of 0: heavy edge to 1 (w=3), light to 2 (w=1)
    edges = spark.createDataFrame(
        [(0, 1, 3.0), (0, 2, 1.0)], "src long, dst long, weight double"
    )
    res = pagerank(spark, edges, max_iterations=20, weighted=True)
    got = {r["vid"]: r["rank"] for r in res.state.collect()}
    # one push from 0: rank(1) = 0.15 + 0.85*0.15*(3/4); rank(2) uses 1/4
    assert got[1] == pytest.approx(0.15 + 0.85 * 0.15 * 0.75)
    assert got[2] == pytest.approx(0.15 + 0.85 * 0.15 * 0.25)
    # unweighted run treats them equally
    res_u = pagerank(spark, edges, max_iterations=20, weighted=False)
    got_u = {r["vid"]: r["rank"] for r in res_u.state.collect()}
    assert got_u[1] == pytest.approx(got_u[2])


def test_article_rank_dampens_hubs(spark):
    # star: 0 -> 1..4 plus 5 -> 6.  avg_outdeg = 5 edges / 7 verts
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)] + [(5, 6)], "src long, dst long"
    )
    res = pagerank(spark, edges, max_iterations=20, article_rank=True)
    got = {r["vid"]: r["rank"] for r in res.state.collect()}
    avg = 5 / 7
    # one push: rank(leaf of 0) = 0.15 + 0.85*0.15/(4+avg); rank(6) uses 1/(1+avg)
    assert got[1] == pytest.approx(0.15 + 0.85 * 0.15 / (4 + avg))
    assert got[6] == pytest.approx(0.15 + 0.85 * 0.15 / (1 + avg))
    assert got[6] > got[1]  # hub fan-out dampened vs the single-edge source
    with pytest.raises(ValueError):
        pagerank(spark, edges, article_rank=True, weighted=True)


def test_weighted_pagerank_drops_bad_weight_edges_and_warns(spark):
    import warnings as _w

    # 0 pushes over a NULL-weight and a negative-weight edge (both invalid)
    # plus one clean edge; 3's only out-edge is zero-weight -> dangler
    dirty = spark.createDataFrame(
        [(0, 1, None), (0, 2, -2.0), (0, 4, 1.0), (3, 0, 0.0)],
        "src long, dst long, weight double",
    )
    with pytest.warns(UserWarning, match="non-positive"):
        res = pagerank(spark, dirty, max_iterations=10, weighted=True)
    got = {r["vid"]: r["rank"] for r in res.state.collect()}
    # clean graph = the one surviving edge, over the SAME vertex set
    verts = spark.createDataFrame([(v,) for v in range(5)], "vid long")
    clean = spark.createDataFrame([(0, 4, 1.0)], "src long, dst long, weight double")
    with _w.catch_warnings():
        _w.simplefilter("error")  # clean path must NOT warn (head(1) probe)
        want = {r["vid"]: r["rank"] for r in
                pagerank(spark, clean, max_iterations=10, weighted=True,
                         vertices=verts).state.collect()}
    assert got == pytest.approx(want)
    assert set(got) == {0, 1, 2, 3, 4}


def test_weighted_pagerank_null_only_weights_still_warn(spark):
    # NULL weights alone must trigger the guard: ~(w > 0) is NULL under SQL
    # three-valued logic, so the probe matches isNull explicitly
    dirty = spark.createDataFrame(
        [(0, 1, None), (0, 2, None), (3, 4, 2.0)],
        "src long, dst long, weight double",
    )
    with pytest.warns(UserWarning, match="non-positive"):
        res = pagerank(spark, dirty, max_iterations=5, weighted=True)
    got = {r["vid"]: r["rank"] for r in res.state.collect()}
    assert got[1] == pytest.approx(0.15)  # 0 danglerized, no push reaches 1
    assert got[4] > 0.15                  # the one clean edge still pushes
