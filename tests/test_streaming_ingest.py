"""Streaming ingest tests: the incremental co-commit pipeline must converge
to the batch derivation regardless of how arrivals split across
micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_graph_algorithms_spark.sources.corpus import synthesize_corpus
from neo4j_graph_algorithms_spark.sources.derive import cocommit_edges
from neo4j_graph_algorithms_spark.streaming.ingest import (
    cocommit_increments,
    commit_activity,
    merge_edge_increments,
    stream_corpus,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return synthesize_corpus(
        spark, n_repos=2, files_per_repo=10, commits_per_repo=5
    ).cache()


def _run_stream(spark, in_dir, table, ckpt):
    stream = stream_corpus(spark, in_dir)
    inc = cocommit_increments(stream, id_mode="poly")
    q = merge_edge_increments(inc, table, ckpt, trigger_available_now=True)
    q.awaitTermination(300)
    return spark.read.parquet(table)


def test_incremental_cocommit_matches_batch(spark, corpus, tmp_path):
    in_dir = str(tmp_path / "in")
    # two arrival waves SPLITTING each commit's files across micro-batches:
    # the stateful operator must not double-count pairs
    corpus.filter(F.crc32("path") % 2 == 0).write.parquet(f"{in_dir}/wave=0")
    got = _run_stream(spark, in_dir, str(tmp_path / "edges"), str(tmp_path / "ck"))
    assert got.count() >= 0  # first wave only — partial graph

    corpus.filter(F.crc32("path") % 2 == 1).write.parquet(f"{in_dir}/wave=1")
    got = _run_stream(spark, in_dir, str(tmp_path / "edges"), str(tmp_path / "ck"))

    want = {
        (r.src, r.dst): r.weight
        for r in cocommit_edges(corpus, id_mode="poly").collect()
    }
    have = {(r.src, r.dst): r.weight for r in got.collect()}
    assert have == want


def test_duplicate_arrivals_are_idempotent(spark, corpus, tmp_path):
    in_dir = str(tmp_path / "in")
    corpus.write.parquet(f"{in_dir}/wave=0")
    table, ckpt = str(tmp_path / "edges"), str(tmp_path / "ck")
    _run_stream(spark, in_dir, table, ckpt)
    # the SAME rows arriving again must emit nothing new (state dedupe)
    corpus.write.parquet(f"{in_dir}/wave=1")
    got = _run_stream(spark, in_dir, table, ckpt)
    want = {
        (r.src, r.dst): r.weight
        for r in cocommit_edges(corpus, id_mode="poly").collect()
    }
    have = {(r.src, r.dst): r.weight for r in got.collect()}
    assert have == want


def test_commit_activity_windowing(spark):
    rows = [
        ("r1", "a.py", "c1", "py", "x", "2026-01-01 10:01:00"),
        ("r1", "b.py", "c1", "py", "x", "2026-01-01 10:02:00"),
        ("r2", "a.py", "c9", "py", "x", "2026-01-01 10:55:00"),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string, ts string"
    ).withColumn("event_time", F.to_timestamp("ts"))
    # batch DataFrames accept the same plan (windowed agg is mode-agnostic)
    out = commit_activity(df, window="1 hour").collect()
    by_repo = {r.repo: r.n_touches for r in out}
    assert by_repo == {"r1": 2, "r2": 1}


def test_replayed_batches_not_double_merged(spark, corpus, tmp_path):
    """foreachBatch is at-least-once: wiping the CHECKPOINT (but not the
    table) replays every micro-batch with the same batch ids — the
    batch-id marker inside the table directory must skip them, leaving
    weights un-inflated (the crash-between-swap-and-commit scenario)."""
    import shutil

    in_dir = str(tmp_path / "in")
    corpus.write.parquet(f"{in_dir}/wave=0")
    table, ckpt = str(tmp_path / "edges"), str(tmp_path / "ck")
    _run_stream(spark, in_dir, table, ckpt)
    want = {(r.src, r.dst): r.weight for r in spark.read.parquet(table).collect()}
    shutil.rmtree(ckpt)  # lose the stream's commit log; table survives
    got = _run_stream(spark, in_dir, table, ckpt)
    have = {(r.src, r.dst): r.weight for r in got.collect()}
    assert have == want  # replayed batches were skipped, not re-summed


def test_refresh_pagerank_scores_warm_tracks_merged_table(spark, tmp_path):
    """Ingest-wave loop: publish scores for wave 1, merge more edges,
    refresh — the warm-started republish must equal a cold run on the
    merged graph (1e-6) and converge in fewer supersteps."""
    import math
    import os

    from neo4j_graph_algorithms_spark.operators.pagerank import pagerank
    from neo4j_graph_algorithms_spark.streaming.incremental import (
        refresh_pagerank_scores,
    )

    edges_path = str(tmp_path / "edges")
    scores_path = str(tmp_path / "scores")
    wave1 = [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (2, 3, 1.0), (3, 0, 1.0)]
    wave2 = wave1 + [(1, 3, 2.0), (4, 0, 1.0)]
    schema = "src long, dst long, weight double"

    spark.createDataFrame(wave1, schema).write.mode("overwrite").parquet(edges_path)
    cold1 = refresh_pagerank_scores(spark, edges_path, scores_path, tolerance=1e-9)
    assert os.path.exists(os.path.join(scores_path, "_SUCCESS"))

    # wave 2 lands (simulating merge_edge_increments' swap + marker)
    spark.createDataFrame(wave2, schema).write.mode("overwrite").parquet(edges_path)
    with open(os.path.join(edges_path, "_last_batch_id"), "w") as fh:
        fh.write("7")
    warm = refresh_pagerank_scores(spark, edges_path, scores_path, tolerance=1e-9)

    got = {
        r.vid: r.rank for r in spark.read.parquet(scores_path).collect()
    }
    want = {
        r.vid: r.rank
        for r in pagerank(
            spark, spark.createDataFrame(wave2, schema), max_iterations=200, tolerance=1e-9
        ).state.collect()
    }
    assert set(got) == set(want)
    for v in want:
        assert math.isclose(got[v], want[v], rel_tol=0, abs_tol=1e-6), v
    assert len(warm.metrics) < len(cold1.metrics)
    # published scores record which ingest wave they reflect
    with open(os.path.join(scores_path, "_edge_batch_id")) as fh:
        assert fh.read() == "7"


def test_refresh_wcc_components_warm_tracks_merged_table(spark, tmp_path):
    import os

    from neo4j_graph_algorithms_spark.operators.wcc import wcc
    from neo4j_graph_algorithms_spark.streaming.incremental import (
        refresh_wcc_components,
    )

    edges_path = str(tmp_path / "edges")
    comps_path = str(tmp_path / "comps")
    schema = "src long, dst long, weight double"
    w1 = [(0, 1, 1.0), (1, 2, 1.0), (10, 11, 1.0)]
    w2 = w1 + [(2, 10, 1.0), (20, 21, 1.0)]

    spark.createDataFrame(w1, schema).write.parquet(edges_path)
    refresh_wcc_components(spark, edges_path, comps_path)
    first = {r.vid: r.comp for r in spark.read.parquet(comps_path).collect()}
    assert first == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10}

    spark.createDataFrame(w2, schema).write.mode("overwrite").parquet(edges_path)
    with open(os.path.join(edges_path, "_last_batch_id"), "w") as fh:
        fh.write("9")
    refresh_wcc_components(spark, edges_path, comps_path)
    got = {r.vid: r.comp for r in spark.read.parquet(comps_path).collect()}
    want = {
        r.vid: r.comp
        for r in wcc(spark, spark.createDataFrame(w2, schema)).state.collect()
    }
    assert got == want
    with open(os.path.join(comps_path, "_edge_batch_id")) as fh:
        assert fh.read() == "9"


def test_streaming_windowed_events_equals_batch(spark, tmp_path):
    """availableNow drain of the watermarked window stream == batch
    windowed_event_aggregate, including rows split across micro-batches."""
    from neo4j_graph_algorithms_spark.pipeline.events import windowed_event_aggregate
    from neo4j_graph_algorithms_spark.streaming.events import run_windowed_events

    rows = [
        # two hourly windows, two types; values exercise the 6dp sum grid
        (1, "2026-01-01 10:05:00", 7, "click", 0.1000005, ""),
        (2, "2026-01-01 10:15:00", 8, "click", 0.2, ""),
        (3, "2026-01-01 10:55:00", 7, "view", 1.5, ""),
        (4, "2026-01-01 11:01:00", 9, "click", 2.25, ""),
        (5, "2026-01-01 11:59:00", 9, "view", -0.75, ""),
        # a LATE row for the 10:00 window arriving in the last file
        (6, "2026-01-01 10:30:00", 8, "click", 0.0000015, ""),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    # stage as 3 files so maxFilesPerTrigger=1 yields 3 micro-batches,
    # with the late row in its own batch (complete mode must still count it)
    for i, frac in enumerate([[1, 2], [3, 4, 5], [6]]):
        ev.filter(F.col("event_id").isin(frac)).coalesce(1).write.parquet(
            str(tmp_path / "in" / f"wave={i}")
        )
    got = run_windowed_events(spark, str(tmp_path / "in"), window_minutes=60)
    want = windowed_event_aggregate(ev, window_minutes=60)
    key = ["window_start", "event_type"]
    g = {tuple(r[k] for k in key): (r.n_events, r.total_value, r.max_value)
         for r in got.collect()}
    w = {tuple(r[k] for k in key): (r.n_events, r.total_value, r.max_value)
         for r in want.collect()}
    assert g == w
    assert len(g) == 4  # 2 windows x 2 types minus the empty combos
