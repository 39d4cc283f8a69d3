"""Streaming heavy hitters (streaming/topk.py): drained stream == batch."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F


def _stage(spark, rows, n_files=3):
    base = tempfile.mkdtemp(prefix="topk-test-")
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    df.repartition(n_files).write.parquet(f"{base}/in")
    return base


def test_drain_equals_batch_topk(spark):
    from datetime import datetime, timedelta

    from neo4j_graph_algorithms_spark.streaming.topk import (
        run_heavy_hitters,
        top_k_users,
        user_count_stream,
    )

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u, n in [(1, 5), (2, 3), (3, 3), (4, 1)]:
        for i in range(n):
            rows.append((eid, t0 + timedelta(minutes=eid), u, "view", 1.5 * (u + i), "{}"))
            eid += 1
    base = _stage(spark, rows)
    try:
        got = run_heavy_hitters(spark, f"{base}/in", k=3).collect()
        batch = top_k_users(
            user_count_stream(spark.read.parquet(f"{base}/in")), k=3
        ).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in batch]
        assert [(r["rank"], r["user_id"], r["n_events"]) for r in got] == [
            (1, 1, 5),
            (2, 2, 3),  # count tie with user 3 -> user_id asc
            (3, 3, 3),
        ]
        # exact value sums survive the drain
        assert got[0]["total_value"] == sum(1.5 * (1 + i) for i in range(5))
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_drain_drops_memory_sink_view(spark):
    from datetime import datetime

    from neo4j_graph_algorithms_spark.streaming.topk import run_heavy_hitters

    before = {t.name for t in spark.catalog.listTables()}
    base = _stage(
        spark, [(0, datetime(2024, 1, 1), 9, "view", 1.0, "{}")], n_files=1
    )
    try:
        out = run_heavy_hitters(spark, f"{base}/in", k=5)
        assert out.count() == 1
        assert {t.name for t in spark.catalog.listTables()} == before
    finally:
        shutil.rmtree(base, ignore_errors=True)
