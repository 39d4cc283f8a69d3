"""Streaming sessionization (streaming/sessions.py) — drain == batch."""

import pytest
from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_streaming_sessions_equal_batch(spark, tmp_path):
    """availableNow drain of the session-window stream == batch sessionize,
    including the exact-gap boundary and out-of-order arrival."""
    from neo4j_graph_algorithms_spark.pipeline.events import sessionize
    from neo4j_graph_algorithms_spark.streaming.sessions import (
        run_sessionize_stream,
    )

    rows = [
        # user 7: gap EXACTLY 30 min (merge, batch uses <=), then 30m01s (split)
        (1, "2026-01-01 10:00:00", 7, "view", 1.5, ""),
        (2, "2026-01-01 10:30:00", 7, "click", 0.25, ""),
        (3, "2026-01-01 11:00:01", 7, "view", 2.0, ""),
        # user 8: one session, value sum on the 6dp grid
        (4, "2026-01-01 09:00:00", 8, "view", 0.1000005, ""),
        (5, "2026-01-01 09:10:00", 8, "view", 0.0000015, ""),
        # user 7 again: a LATE out-of-order row landing in the last file,
        # extending the FIRST session (10:00-10:30 -> includes 10:15)
        (6, "2026-01-01 10:15:00", 7, "click", -0.75, ""),
    ]
    ev = _events(spark, rows)
    for i, ids in enumerate([[1, 2], [3, 4, 5], [6]]):
        ev.filter(F.col("event_id").isin(ids)).coalesce(1).write.parquet(
            str(tmp_path / "in" / f"wave={i}")
        )
    got = run_sessionize_stream(spark, str(tmp_path / "in"), gap_minutes=30.0)
    want = sessionize(ev, gap_minutes=30.0)
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w
    by_user = {}
    for (uid, sid, n, *_rest) in g:
        by_user.setdefault(uid, []).append((sid, n))
    assert sorted(by_user[7]) == [(0, 3), (1, 1)]  # merged late row; split at 30m01s
    assert sorted(by_user[8]) == [(0, 2)]


def test_streaming_sessions_sf0001_equals_batch(spark, tmp_path):
    """Full sf0.001 events table, shuffled into 4 arrival files."""
    from neo4j_graph_algorithms_spark.pipeline.events import sessionize
    from neo4j_graph_algorithms_spark.streaming.sessions import (
        run_sessionize_stream,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.repartition(4).write.parquet(str(tmp_path / "in"))
    got = run_sessionize_stream(spark, str(tmp_path / "in"), gap_minutes=30.0)
    want = sessionize(ev, gap_minutes=30.0)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_session_stream_rejects_subsecond_gap(spark):
    from neo4j_graph_algorithms_spark.streaming.sessions import session_stream

    ev = _events(spark, [(1, "2026-01-01 10:00:00", 7, "view", 1.0, "")])
    with pytest.raises(ValueError, match="second-truncated"):
        session_stream(ev, gap_minutes=0.505)
