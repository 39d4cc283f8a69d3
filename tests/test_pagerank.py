"""PageRank vs reference golden values (PageRankWikiTest.java, PageRankTest.java).

Reference asserts tol 1e-2 against its quantized impl; we match that on
golden values and assert 1e-6 self-consistency across partition counts.
"""

import math

from neo4j_graph_algorithms_spark.operators.pagerank import pagerank, pagerank_scores
from tests.conftest import F1_EXPECTED, F2_EXPECTED, collect_map


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
