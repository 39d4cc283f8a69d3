"""Structured-Streaming sessionization: gap-based user sessions as an
incremental stream via Spark's native `F.session_window` merging state.

The batch twin is `pipeline/events.py:sessionize` (lag/cumsum windows); this
module computes the SAME sessions from a live event feed, so a 100 TB
clickstream keeps its session table current without re-scanning history.
The reference has no streaming surface (SURVEY.md §5); this follows the
repo's streaming drain-gate conventions (streaming/events.py).

Semantics bridge (the part that makes the two engines bit-equal):

  * batch sessionize compares SECOND-TRUNCATED epoch gaps with `<= gap`;
    `session_window(ts, g)` merges an event into a session iff it starts
    at or before the session's end (last_event + g) — INCLUSIVE, verified
    empirically (delta == g merges, delta == g+1 splits).  So the stream
    groups on `date_trunc('second', ts)` with a `gap seconds` window and
    reproduces the batch grouping exactly.
  * every emitted aggregate is order/batch-boundary-independent: count,
    integer min/max epochs, and the integer-scaled 1e-6-grid value sum
    (the repo-wide exact-sum contract) — so the drained stream equals the
    batch result row-for-row and both share one DuckDB oracle
    (pipeline/oracles.py:sessionize_sql).
  * session_id (the per-user session ordinal) is assigned AFTER the drain
    by ranking closed sessions on t_start — sessions are disjoint time
    intervals per user, so t_start order == the batch cumsum order.

Modes:
  * production: `session_stream(..., watermark=...)` + append/update —
    the watermark closes sessions (no event can extend a session past the
    horizon) and bounds state; late rows beyond it are dropped (the
    documented completeness/latency trade, same as streaming/events.py).
  * gate/drain: `run_sessionize_stream` uses COMPLETE mode with NO
    watermark — session-window merging state filters late input rows
    against the watermark even in complete mode (unlike tumbling windows),
    so an equality gate over arrival-order-shuffled files must not set one;
    complete mode retains all session state, which is exactly what the
    gate needs.

Scale notes: streaming state is one open-session row per active user —
bounded by concurrent-user cardinality (and by the watermark horizon in
production), not by |events|.  The post-drain ordinal rank partitions by
user (human-bounded session counts), never globally.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .events import stream_events


def session_stream(
    events: DataFrame,
    gap_minutes: float = 30.0,
    watermark: str | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """[user_id, n_events, t_start, t_end, total_value] as a streaming
    session aggregation — value-identical to the batch `sessionize` rows
    (minus the post-drain session ordinal; see `run_sessionize_stream`).

    `gap_minutes` must land on the integer-second grid (it is compared on
    second-truncated epochs, matching the batch twin)."""
    gap_s = gap_minutes * 60.0
    if gap_s != int(gap_s):
        raise ValueError(
            f"gap_minutes={gap_minutes} is not a whole number of seconds; "
            "the gap is compared on the second-truncated epoch grid"
        )
    ts2 = F.date_trunc("second", F.col(ts_col))
    scaled = F.round(F.col(value_col) * F.lit(1e6)).cast("long")
    sel = events.select(
        F.col(user_col), ts2.alias("_ts2"), scaled.alias("_v6")
    )
    if watermark is not None:
        sel = sel.withWatermark("_ts2", watermark)
    # inclusive merge: delta <= gap on the integer-second grid == batch rule
    return (
        sel.groupBy(
            F.col(user_col),
            F.session_window("_ts2", f"{int(gap_s)} seconds").alias("_sw"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min(F.unix_timestamp("_ts2")).alias("t_start"),
            F.max(F.unix_timestamp("_ts2")).alias("t_end"),
            (F.sum("_v6") / F.lit(1e6)).alias("total_value"),
        )
        .drop("_sw")
    )


def run_sessionize_stream(
    spark: SparkSession,
    input_dir: str,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    max_files_per_trigger: int | None = 1,
    timeout_s: int = 600,
) -> DataFrame:
    """Drain `input_dir` with an availableNow trigger through the
    session-window aggregation in COMPLETE mode (no watermark — see module
    docstring) and return the final session table with the per-user
    `session_id` ordinal ranked on t_start: column-identical to batch
    `pipeline/events.py:sessionize` and checked by the same
    `sessionize_sql` oracle."""
    stream = stream_events(spark, input_dir, max_files_per_trigger)
    sessions = session_stream(
        stream, gap_minutes=gap_minutes, watermark=None, user_col=user_col
    )
    name = f"sessions_{uuid.uuid4().hex[:12]}"
    q = (
        sessions.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"availableNow drain did not finish within {timeout_s}s — "
            "refusing to return a partial session table"
        )
    w = Window.partitionBy(user_col).orderBy("t_start")
    return spark.table(name).select(
        F.col(user_col),
        (F.row_number().over(w) - 1).alias("session_id"),
        "n_events",
        "t_start",
        "t_end",
        "total_value",
    )
