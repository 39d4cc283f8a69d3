"""Structured-Streaming ingest: the corpus → edge-table pipeline as an
incremental stream.

The reference is batch-only (SURVEY.md §5: "no streaming state needed"),
but a 10^12-file corpus is ingested continuously in production — commits
arrive, and re-deriving the co-commit graph from scratch per batch is a
full O(corpus) rescan.  This module maintains the edge table INCREMENTALLY:

  * `stream_corpus`       — readStream over a growing directory of corpus
                            parquet (the Iceberg-append analogue);
  * `cocommit_increments` — the custom stateful operator
                            (applyInPandasWithState keyed by (repo, commit)):
                            state = the file set seen so far for the commit;
                            each update emits only the NEW pairs
                            (new×old ∪ new×new), so the co-commit clique is
                            built incrementally and exactly once — commits
                            spanning micro-batches never re-emit old pairs;
  * `merge_edge_increments`— writeStream.foreachBatch sink folding the pair
                            increments into the persistent [src,dst,weight]
                            edge table (sum-merge, atomic swap; MERGE INTO
                            on Iceberg);
  * `commit_activity`     — watermarked sliding-window commit-rate
                            aggregation (late data handled by watermark).

The stateless text operators (token_count / quality_score / language_id)
are pure column expressions and run on streaming DataFrames unchanged —
no streaming twin needed.

Scale notes: state is keyed by (repo, commit) and holds ≤
`max_files_per_commit` vids (the same clique cap as sources/derive.py —
a vendored-checkin commit is a clique bomb); pair emission is
O(new×seen) per update, bounded by the cap; the merge sink shuffles only
the per-batch increment aggregate, never the full edge table.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

CORPUS_SCHEMA = (
    "repo string, path string, commit string, lang string, content string"
)

_INCREMENT_SCHEMA = StructType(
    [
        StructField("src", LongType()),
        StructField("dst", LongType()),
        StructField("weight", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("vids", ArrayType(LongType()))])


def stream_corpus(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """readStream over a directory of corpus parquet files (new files =
    new micro-batches; on Iceberg this is the incremental-append scan).
    `max_files_per_trigger` bounds each micro-batch — availableNow triggers
    honor it, so a backlog drains as MANY batches (exercising cross-batch
    state) instead of one giant one."""
    reader = spark.readStream.schema(CORPUS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def _touch_vids(corpus: DataFrame, id_mode: str) -> DataFrame:
    from neo4j_graph_algorithms_spark.sources.derive import _vid

    return corpus.select("repo", "commit", "path").withColumn("vid", _vid(id_mode))


def cocommit_increments(
    corpus_stream: DataFrame,
    max_files_per_commit: int = 1000,
    id_mode: str = "xxhash",
) -> DataFrame:
    """[src, dst, weight] PAIR INCREMENTS, emitted exactly once per
    (repo, commit, file-pair) — the stateful heart of the incremental
    ingest.

    applyInPandasWithState keyed (repo, commit); state = the commit's file
    vids seen so far.  A new arrival emits pairs against everything already
    seen plus the other new arrivals, so Σ increments over time equals the
    batch `cocommit_edges` weights regardless of how files are split
    across micro-batches.  Commits already at the clique cap ignore further
    files (same skew guard as the batch path, arrival order standing in
    for path order).
    """
    touches = _touch_vids(corpus_stream, id_mode)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen: list[int] = list(state.get[0]) if state.exists else []
        seen_set = set(seen)
        rows_src: list[int] = []
        rows_dst: list[int] = []
        for pdf in pdfs:
            for v in pdf["vid"]:
                v = int(v)
                if v in seen_set or len(seen) >= max_files_per_commit:
                    continue
                for u in seen:
                    a, b = (u, v) if u < v else (v, u)
                    rows_src.append(a)
                    rows_dst.append(b)
                seen.append(v)
                seen_set.add(v)
        state.update((seen,))
        if rows_src:
            yield pd.DataFrame(
                {"src": rows_src, "dst": rows_dst, "weight": [1.0] * len(rows_src)}
            )

    return touches.groupBy("repo", "commit").applyInPandasWithState(
        update,
        outputStructType=_INCREMENT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def merge_edge_increments(
    increments: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    trigger_available_now: bool = False,
) -> Any:
    """writeStream sink: fold pair increments into the persistent
    [src, dst, weight] edge table.  Each micro-batch aggregates its own
    increments (tiny) and sum-merges them into the store — the Iceberg
    `MERGE INTO ... WHEN MATCHED UPDATE SET weight = weight + inc`
    expressed as a full-outer merge + atomic directory swap on parquet."""

    def _last_applied(path: str) -> int:
        meta = os.path.join(path, "_last_batch_id")
        if os.path.exists(meta):
            with open(meta) as fh:
                return int(fh.read().strip())
        return -1

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        # foreachBatch is at-least-once: a micro-batch replayed after a crash
        # between the swap below and the checkpoint commit must NOT be
        # sum-merged twice.  The applied batch_id travels INSIDE the table
        # directory (written before the atomic swap), so data + marker commit
        # together; batch_id <= marker ⇒ already applied, skip.
        if os.path.exists(table_path) and batch_id <= _last_applied(table_path):
            # Still DRAIN the batch: the upstream stateful operator's state
            # stores only commit when every partition is processed (Spark
            # validates this); the noop sink consumes without side effects.
            batch.write.format("noop").mode("overwrite").save()
            return
        inc = batch.groupBy("src", "dst").agg(F.sum("weight").alias("_inc"))
        if os.path.exists(table_path):
            existing = spark.read.parquet(table_path)
            merged = (
                existing.join(inc, on=["src", "dst"], how="full_outer")
                .select(
                    "src",
                    "dst",
                    (
                        F.coalesce(F.col("weight"), F.lit(0.0))
                        + F.coalesce(F.col("_inc"), F.lit(0.0))
                    ).alias("weight"),
                )
            )
        else:
            merged = inc.select("src", "dst", F.col("_inc").alias("weight"))
        tmp = f"{table_path}.tmp-{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)
        # underscore-prefixed ⇒ invisible to parquet directory scans
        with open(os.path.join(tmp, "_last_batch_id"), "w") as fh:
            fh.write(str(batch_id))
        if os.path.exists(table_path):
            old = f"{table_path}.old-{uuid.uuid4().hex[:8]}"
            os.rename(table_path, old)
            os.rename(tmp, table_path)
            shutil.rmtree(old)
        else:
            os.rename(tmp, table_path)

    writer = (
        increments.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def commit_activity(
    corpus_stream: DataFrame,
    ts_col: str = "event_time",
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """[window, repo, n_touches, n_files] watermarked windowed commit
    activity — the late-data-tolerant ingest monitor (files arriving later
    than `watermark` past their event time are dropped from the closed
    window, the standard completeness/latency trade)."""
    w = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        corpus_stream.withWatermark(ts_col, watermark)
        .groupBy(w, "repo")
        .agg(
            F.count("*").alias("n_touches"),
            F.approx_count_distinct("path").alias("n_files"),
        )
    )
