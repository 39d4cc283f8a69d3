"""Corpus synthesis + graph derivation + sha256 invariant (FIXTURES.md F0)."""

from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.sources import (
    check_sha_invariant,
    cocommit_edges,
    corpus_vertices,
    import_edges,
    synthesize_corpus,
    with_sha,
)


def test_corpus_schema_and_determinism(spark):
    c1 = synthesize_corpus(spark, n_repos=2, files_per_repo=10, commits_per_repo=5)
    c2 = synthesize_corpus(spark, n_repos=2, files_per_repo=10, commits_per_repo=5)
    assert c1.columns == ["repo", "path", "commit", "lang", "content"]
    assert c1.exceptAll(c2).count() == 0 and c2.exceptAll(c1).count() == 0


def test_every_file_touched_at_least_once(spark):
    c = synthesize_corpus(spark, n_repos=2, files_per_repo=10, commits_per_repo=5)
    n_files = c.select("repo", "path").distinct().count()
    assert n_files == 2 * 10


def test_vertices_hashed_ids_unique(spark):
    c = synthesize_corpus(spark, n_repos=3, files_per_repo=20, commits_per_repo=5)
    v = corpus_vertices(c)
    assert v.count() == v.select("vid").distinct().count() == 60


def test_import_edges_match_generator_rule(spark):
    c = synthesize_corpus(spark, n_repos=1, files_per_repo=10, commits_per_repo=3)
    v = {(r.repo, r.path): r.vid for r in corpus_vertices(c).collect()}
    path_by_idx = {}
    for (repo, path), vid in v.items():
        idx = int(path.split("_")[1].split(".")[0])
        path_by_idx[idx] = vid
    got = {(r.src, r.dst) for r in import_edges(c).collect()}
    want = set()
    for j in range(10):
        for tgt in ((j * 3 + 1) % 10, (j * 7 + 2) % 10):
            if tgt != j:
                want.add((path_by_idx[j], path_by_idx[tgt]))
    assert got == want


def test_cocommit_edges_canonical_and_weighted(spark):
    c = synthesize_corpus(spark, n_repos=2, files_per_repo=8, commits_per_repo=4)
    e = cocommit_edges(c)
    rows = e.collect()
    assert all(r.src < r.dst for r in rows)
    assert all(r.weight >= 1.0 for r in rows)
    # symmetric duplicate would violate canonical grouping
    assert e.groupBy("src", "dst").count().filter(F.col("count") > 1).count() == 0


def test_cocommit_clique_cap(spark):
    c = synthesize_corpus(spark, n_repos=1, files_per_repo=30, commits_per_repo=2, touch_mod=1)
    # touch_mod=1 → every commit touches every file → 30-cliques
    uncapped = cocommit_edges(c, max_files_per_commit=1000)
    capped = cocommit_edges(c, max_files_per_commit=5)
    assert uncapped.count() == 30 * 29 // 2
    assert capped.count() == 5 * 4 // 2


def test_sha_invariant_roundtrip(spark, tmp_path):
    c = synthesize_corpus(spark, n_repos=2, files_per_repo=10, commits_per_repo=5)
    out = str(tmp_path / "corpus_parquet")
    with_sha(c).write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert check_sha_invariant(c, back) == 0


def test_sha_invariant_detects_corruption(spark, tmp_path):
    c = synthesize_corpus(spark, n_repos=1, files_per_repo=5, commits_per_repo=3)
    corrupted = with_sha(c).withColumn(
        "content_sha256",
        F.when(F.col("path") == "src/f_0.py", F.lit("deadbeef")).otherwise(
            F.col("content_sha256")
        ),
    )
    assert check_sha_invariant(c, corrupted) > 0
