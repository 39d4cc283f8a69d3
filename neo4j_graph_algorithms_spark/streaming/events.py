"""Structured-Streaming event analytics: the tumbling-window aggregate as
an incremental stream.

The batch twin is `pipeline/events.py:windowed_event_aggregate`; this module
runs the SAME aggregation as a watermarked streaming query so a 100 TB event
feed (the Iceberg-append / Kafka analogue) keeps the window table current
without per-batch full rescans.  The reference has no streaming surface
(SURVEY.md §5); this follows the repo's streaming/ingest.py conventions.

Exactness contract: every aggregate is order- and batch-boundary-independent
(count, MAX, and the integer-scaled value sum — the same exact-sum trick as
the batch side), so the drained stream equals the batch aggregate
row-for-row and both share one DuckDB oracle (windowed_event_aggregate_sql).

Modes:
  * production: append output after the watermark closes each window —
    late rows beyond the watermark are dropped (completeness/latency trade);
  * gate/drain: `run_windowed_events` uses COMPLETE output mode into a
    memory sink — complete mode keeps all window state (watermark does not
    evict), which is exactly what an equality gate needs: the final table
    covers every window regardless of file arrival order.

Scale notes: streaming state is one row per (window, event_type) — bounded
by time-range/window-size × type cardinality, not by |events|; with the
production watermark the state is further bounded to the watermark horizon.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def stream_events(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """readStream over a directory of events parquet (new files = new
    micro-batches).  `max_files_per_trigger` bounds each micro-batch so an
    availableNow drain of a backlog exercises cross-batch window state.

    Standard Spark file-source layout rules apply: files at the top level
    and under `key=value` partition directories are picked up; other
    subdirectories are ignored (no recursiveFileLookup)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def windowed_event_stream(
    events: DataFrame,
    window_minutes: int = 60,
    watermark: str = "2 hours",
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """[window_start, event_type, n_events, total_value, max_value] as a
    streaming aggregation — column-identical to the batch
    `windowed_event_aggregate` (window_start = epoch seconds, bigint;
    total_value summed on the integer-scaled grid, exact and
    batch-boundary-independent)."""
    scaled = F.round(F.col(value_col) * F.lit(1e6)).cast("long")
    agg = (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, f"{window_minutes} minutes").alias("_w"),
            F.col(type_col),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(scaled).alias("_v6"),
            F.round(F.max(value_col), 6).alias("max_value"),
        )
    )
    return agg.select(
        F.unix_timestamp(F.col("_w.start")).alias("window_start"),
        F.col(type_col),
        "n_events",
        (F.col("_v6") / F.lit(1e6)).alias("total_value"),
        "max_value",
    )


def run_windowed_events(
    spark: SparkSession,
    input_dir: str,
    window_minutes: int = 60,
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = 1,
    timeout_s: int = 600,
) -> DataFrame:
    """Drain `input_dir` with an availableNow trigger through the windowed
    aggregation in COMPLETE mode and return the final window table (batch
    DataFrame).  Complete mode retains all window state, so the result is
    the exact aggregate over every input row — the gate contract."""
    stream = stream_events(spark, input_dir, max_files_per_trigger)
    windows = windowed_event_stream(
        stream, window_minutes=window_minutes, watermark=watermark
    )
    name = f"windowed_events_{uuid.uuid4().hex[:12]}"
    q = (
        windows.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"availableNow drain did not finish within {timeout_s}s — "
            "refusing to return a partial window table"
        )
    return spark.table(name)
