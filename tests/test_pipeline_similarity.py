"""Similarity-search tests: brute-force cosine vs numpy oracle, SRP-LSH
recall on planted near-duplicates, IVF recall vs brute force."""

from __future__ import annotations

import numpy as np
import pytest

from neo4j_graph_algorithms_spark.pipeline.similarity import (
    cosine_pairs,
    cosine_topk,
    ivf_build,
    ivf_search,
    srp_lsh_pairs,
    srp_signature,
)

DIM = 8
N = 40


def make_vectors(plant_dup: bool):
    """Deterministic cluster structure: 4 centers, 10 vectors each, small
    per-vector perturbation; optionally vec 1 := near-copy of vec 0."""
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4, DIM))
    vecs = []
    for i in range(N):
        c = centers[i % 4]
        noise = rng.normal(scale=0.05, size=DIM)
        vecs.append((c + noise).astype(np.float32))
    if plant_dup:
        vecs[1] = (vecs[0] + rng.normal(scale=0.001, size=DIM).astype(np.float32)).astype(
            np.float32
        )
    return vecs


VECS = make_vectors(plant_dup=True)
VECS_CLEAN = make_vectors(plant_dup=False)


@pytest.fixture(scope="module")
def embs(spark):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(VECS)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def np_cosine(a, b):
    a, b = np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_cosine_topk_matches_numpy(spark, embs):
    queries = embs.filter("vec_id < 3")
    got = cosine_topk(embs, queries, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.cosine))
    for q in range(3):
        sims = [(round(np_cosine(VECS[q], VECS[j]), 6), j) for j in range(N) if j != q]
        want = sorted(sims, key=lambda t: (-t[0], t[1]))[:5]
        got_q = sorted(by_q[q])
        for (rank, nid, cos), (wcos, wid) in zip(got_q, want):
            assert nid == wid and cos == pytest.approx(wcos, abs=2e-6)


def test_cosine_pairs_threshold(spark, embs):
    got = {(r.a, r.b): r.cosine for r in cosine_pairs(embs, threshold=0.999).collect()}
    assert (0, 1) in got  # the planted near-duplicate
    for (a, b), c in got.items():
        assert np_cosine(VECS[a], VECS[b]) >= 0.999 - 1e-5
        assert a < b


def test_srp_signature_similar_vectors_share_bits(spark, embs):
    sigs = {r.vec_id: r.srp_sig for r in srp_signature(embs, n_planes=16, dim=DIM).collect()}
    assert sigs[0] == sigs[1]  # near-identical vectors -> same half-spaces
    same_cluster = bin(sigs[0] ^ sigs[4]).count("1")   # 0 and 4 share center
    diff_cluster = bin(sigs[0] ^ sigs[5]).count("1")   # different centers
    assert same_cluster <= diff_cluster


def test_srp_lsh_pairs_finds_planted_dup(spark, embs):
    got = {(r.a, r.b) for r in srp_lsh_pairs(embs, threshold=0.999, n_planes=16, bands=4, dim=DIM).collect()}
    assert (0, 1) in got
    brute = {(r.a, r.b) for r in cosine_pairs(embs, threshold=0.999).collect()}
    assert got.issubset(brute)  # verification never admits a false positive


@pytest.fixture(scope="module")
def embs_clean(spark):
    """No planted duplicate: the first-k init then seeds one centroid per
    planted cluster (ids 0..3 are one draw from each)."""
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(VECS_CLEAN)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_recovers_cluster_structure(spark, embs_clean):
    cents, assign = ivf_build(embs_clean, n_centroids=4, iterations=4)
    a = {r.vec_id: r.cid for r in assign.collect()}
    # members of the same planted cluster land in the same cell
    for base in range(4):
        cells = {a[i] for i in range(base, N, 4)}
        assert len(cells) == 1, (base, cells)


def test_ivf_search_recall_vs_brute(spark, embs_clean):
    embs = embs_clean
    cents, assign = ivf_build(embs, n_centroids=4, iterations=4)
    queries = embs.filter("vec_id < 4")
    got = ivf_search(embs, cents, assign, queries, k=3, n_probes=1).collect()
    brute = cosine_topk(embs, queries, k=3).collect()
    got_set = {(r.query_id, r.neighbor_id) for r in got}
    brute_set = {(r.query_id, r.neighbor_id) for r in brute}
    # with tight planted clusters, probing the home cell recovers the true top-3
    assert got_set == brute_set


def test_quantize_embeddings_roundtrip(spark):
    from neo4j_graph_algorithms_spark.pipeline.similarity import quantize_embeddings

    embs = spark.createDataFrame(
        [(0, [0.5, -1.0, 0.25]), (1, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r.vec_id: r for r in quantize_embeddings(embs).collect()}
    assert got[0].scale == round(1.0 / 127, 9)
    assert got[0].qvec == [64, -127, 32]  # round(0.5*127)=63.5 -> 64 (half-up)
    assert got[1].scale == 0.0 and got[1].qvec == [0, 0, 0]  # zero-vector guard
    # exploded form matches the array form
    ex = quantize_embeddings(embs, exploded=True).collect()
    assert sorted((r.vec_id, r.dim, r.q) for r in ex if r.vec_id == 0) == [
        (0, 0, 64), (0, 1, -127), (0, 2, 32)
    ]


def test_gram_matrix_matches_numpy_and_partitioning(spark):
    import numpy as np

    from neo4j_graph_algorithms_spark.pipeline.similarity import gram_matrix

    rng = np.random.RandomState(7)
    mat = rng.uniform(-0.5, 0.5, size=(40, 6)).astype(np.float32)
    rows = [(i, [float(x) for x in mat[i]]) for i in range(len(mat))]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    q = np.sign(mat.astype(np.float64) * 1000) * np.floor(
        np.abs(mat.astype(np.float64) * 1000) + 0.5
    )
    expected = (q.T @ q) / 1e6

    for nparts in (1, 7):
        got = {(r.i, r.j): r.gram
               for r in gram_matrix(embs.repartition(nparts), scale=1000).collect()}
        assert len(got) == 6 * 7 // 2  # upper triangle only
        for (i, j), v in got.items():
            assert i <= j
            assert v == round(expected[i, j], 6)


def test_pca_project_recovers_planted_axes(spark):
    import numpy as np

    from neo4j_graph_algorithms_spark.pipeline.similarity import pca_project

    # planted rank-2 data: strong axis e0 (var ~4), weak axis e3 (var ~1),
    # tiny noise elsewhere
    rng = np.random.RandomState(11)
    n, d = 200, 8
    mat = np.zeros((n, d), dtype=np.float64)
    mat[:, 0] = rng.normal(0, 2.0, n)
    mat[:, 3] = rng.normal(0, 1.0, n)
    mat += rng.normal(0, 0.01, (n, d))
    rows = [(i, [float(x) for x in mat[i]]) for i in range(n)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    out = pca_project(embs, k=2).collect()
    proj = {0: {}, 1: {}}
    for r in out:
        proj[r.component][r.vec_id] = r.value
    p0 = np.array([proj[0][i] for i in range(n)])
    p1 = np.array([proj[1][i] for i in range(n)])
    # component 0 ≈ ±axis-0 values, component 1 ≈ ±axis-3 values
    assert abs(np.corrcoef(p0, mat[:, 0])[0, 1]) > 0.999
    assert abs(np.corrcoef(p1, mat[:, 3])[0, 1]) > 0.999
    # captured variance ordering: component 0 carries more energy
    assert (p0 ** 2).sum() > (p1 ** 2).sum()


def test_pca_project_deterministic_across_partitionings(spark):
    import numpy as np

    from neo4j_graph_algorithms_spark.pipeline.similarity import pca_project

    rng = np.random.RandomState(3)
    mat = rng.uniform(-0.5, 0.5, (50, 6)).astype(np.float32)
    rows = [(i, [float(x) for x in mat[i]]) for i in range(50)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted(pca_project(embs.repartition(1), k=3).collect())
    b = sorted(pca_project(embs.repartition(8), k=3).collect())
    # the Gram pass is integer-exact, eigh runs once on the driver, and the
    # projection is a fixed-order sequential dot → bit-identical
    assert a == b


# ---- ann_recall ------------------------------------------------------------


def test_ann_recall_exact_partial_and_missing(spark):
    from neo4j_graph_algorithms_spark.pipeline.similarity import ann_recall

    exact = spark.createDataFrame(
        [(0, 10), (0, 11), (0, 12), (1, 20), (1, 21), (2, 30)],
        "query_id long, neighbor_id long",
    )
    approx = spark.createDataFrame(
        # q0: all 3 hit; q1: 1 of 2 hits + 1 miss; q2: absent entirely
        [(0, 10), (0, 11), (0, 12), (1, 20), (1, 99)],
        "query_id long, neighbor_id long",
    )
    got = {r.query_id: r for r in ann_recall(exact, approx).collect()}
    assert set(got) == {0, 1, 2}
    assert (got[0].hits, got[0].recall_q6) == (3, 1_000_000)
    assert (got[1].n_exact, got[1].n_approx, got[1].hits) == (2, 2, 1)
    assert got[1].recall_q6 == 500_000
    assert (got[2].n_approx, got[2].hits, got[2].recall_q6) == (0, 0, 0)


def test_ann_recall_ivf_end_to_end_bounds(spark, embs):
    from neo4j_graph_algorithms_spark.pipeline.similarity import (
        ann_recall,
        cosine_topk,
        ivf_build,
        ivf_search,
    )
    from pyspark.sql import functions as F

    queries = embs.filter(F.col("vec_id") < 4)
    exact = cosine_topk(embs, queries, k=3)
    cents, assign = ivf_build(embs, n_centroids=2, iterations=2, quantize=6)
    approx = ivf_search(embs, cents, assign, queries, k=3, n_probes=2, quantize=6)
    rows = ann_recall(exact, approx).collect()
    assert {r.query_id for r in rows} == {0, 1, 2, 3}
    for r in rows:
        assert 0 <= r.hits <= r.n_exact <= 3
        assert 0 <= r.recall_q6 <= 1_000_000
        assert r.recall_q6 == r.hits * 1_000_000 // r.n_exact
    # probing EVERY cell makes IVF exhaustive -> recall must be 1.0
    approx_all = ivf_search(embs, cents, assign, queries, k=3, n_probes=2, quantize=6)
    full = ann_recall(exact, approx_all).collect()
    assert all(r.recall_q6 == 1_000_000 for r in full)


def test_pca_project_planted_spectrum_exact(spark):
    """The emb_pca_project value gate's pytest twin: over the 3-4-5
    planted-spectrum table the eigendecomposition is closed-form, so every
    (row, component) projection equals a literal multiple of 0.05 — the
    same ground truth pca_planted_sql serves to the driver."""
    from neo4j_graph_algorithms_spark.pipeline.similarity import pca_project
    from neo4j_graph_algorithms_spark.sources.synth import (
        planted_spectrum_embeddings,
        planted_spectrum_expected,
    )

    got = {
        (r.vec_id, r.component): r.value
        for r in pca_project(planted_spectrum_embeddings(spark), k=8).collect()
    }
    want = {(v, c): x for v, c, x in planted_spectrum_expected()}
    assert got == want
    # no -0.0 leaks past the canonicalization (value-hash parity)
    import math

    assert all(math.copysign(1.0, v) > 0 for v in got.values() if v == 0.0)
