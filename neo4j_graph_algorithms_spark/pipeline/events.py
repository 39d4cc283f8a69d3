"""Event-stream analytics over the events table: sessionization + windowed
aggregation.

The reference is a static-graph engine, but its production context (a
commit/event log feeding the link graph) makes these the two standard
stream-shaped queries; both are expressed here as BATCH DataFrame ops whose
semantics match their Structured Streaming twins exactly:

  * `sessionize`  == `groupBy(user, F.session_window(ts, gap))` in a
    stream (same gap-merge semantics), expressed with lag/cumsum windows so
    the DuckDB oracle reproduces it bit-for-bit;
  * `windowed_event_aggregate` == `groupBy(F.window(ts, size))` — the
    tumbling-window aggregate a watermarked stream emits after late-data
    grace.

Scale shape: both partition by a bounded key (user_id / window start) —
per-user event history is human-bounded, so the lag/cumsum windows never
see web-scale partitions; the windowed aggregate is one map-side-combined
groupBy.  Skewed bot users are the exception: `max_events_per_user`
optionally truncates (warned, never silent).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    max_events_per_user: int | None = None,
) -> DataFrame:
    """[user_id, session_id, n_events, t_start, t_end, total_value] —
    gap-based sessions: a new session starts when the inactivity gap
    exceeds `gap_minutes`.  session_id is the per-user session ordinal
    (0-based); t_start/t_end are epoch seconds (bigint — engine-neutral
    across the oracle boundary).

    Identical grouping to streaming `F.session_window(ts, gap)`: sessions
    are maximal chains of events with consecutive gaps <= gap.

    total_value contract: each value is quantized to the 1e-6 grid FIRST
    (round-to-long), then summed exactly — i.e. `value` is treated as a
    fixed-point 6dp quantity.  This makes the sum order/partitioning/
    engine-independent; values carrying real sub-1e-6 precision can drift
    from round(float-sum, 6) by up to n·5e-7 per session, the price of
    determinism.  Same contract in `windowed_event_aggregate` and the
    streaming twin (streaming/events.py).
    """
    if max_events_per_user is not None:
        deg = events.groupBy(user_col).agg(F.count("*").alias("_n"))
        hot = deg.filter(F.col("_n") > max_events_per_user).count()
        if hot:
            warnings.warn(
                f"sessionize: {hot} users exceed {max_events_per_user} "
                "events; their excess events (by ts order) are dropped",
                RuntimeWarning,
                stacklevel=2,
            )
        w_cap = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
        events = (
            events.withColumn("_rn", F.row_number().over(w_cap))
            .filter(F.col("_rn") <= max_events_per_user)
            .drop("_rn")
        )
    # both windows order by FULL-precision ts (ties by event_id); the gap
    # itself compares second-truncated epochs (engine-neutral integers)
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    gap_s = gap_minutes * 60.0
    epoch = F.unix_timestamp(F.col(ts_col))
    marked = events.select(
        F.col(user_col),
        F.col(ts_col),
        epoch.alias("_ep"),
        F.col(value_col),
        F.when(
            (epoch - F.lag(epoch).over(w)).isNull()
            | ((epoch - F.lag(epoch).over(w)) <= gap_s),
            F.lit(0),
        )
        .otherwise(F.lit(1))
        .alias("_new"),
        F.col("event_id"),
    )
    sess = marked.withColumn("session_id", F.sum("_new").over(w))
    # total_value sums INTEGER-scaled values (x1e6 -> long) so the sum is
    # exact and shard-order-independent, then divides back at the end —
    # the FastRP determinism trick (round(sum(double),6) flips on sessions
    # whose float sum lands within 1 ulp of a 6dp boundary; seen as the
    # r3 driver hash-fail).
    scaled = F.round(F.col(value_col) * F.lit(1e6)).cast("long")
    return (
        sess.groupBy(user_col, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("_ep").alias("t_start"),
            F.max("_ep").alias("t_end"),
            (F.sum(scaled) / F.lit(1e6)).alias("total_value"),
        )
    )


def windowed_event_aggregate(
    events: DataFrame,
    window_minutes: int = 60,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """[window_start, event_type, n_events, total_value, max_value] —
    tumbling-window aggregate (window_start = epoch seconds, bigint).
    Matches `groupBy(F.window(ts, size), type)` in a watermarked stream;
    one shuffle, map-side combined.
    """
    win_s = window_minutes * 60
    epoch = F.unix_timestamp(F.col(ts_col))
    # exact integer-scaled sum — see sessionize (same latent 6dp-boundary
    # risk; max is order-independent so a plain round stays correct there)
    scaled = F.round(F.col(value_col) * F.lit(1e6)).cast("long")
    return (
        events.select(
            (F.floor(epoch / win_s) * win_s).alias("window_start"),
            F.col(type_col),
            F.col(value_col),
            scaled.alias("_v6"),
        )
        .groupBy("window_start", type_col)
        .agg(
            F.count("*").alias("n_events"),
            (F.sum("_v6") / F.lit(1e6)).alias("total_value"),
            F.round(F.max(value_col), 6).alias("max_value"),
        )
    )
