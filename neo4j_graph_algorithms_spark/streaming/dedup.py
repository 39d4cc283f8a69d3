"""Structured-Streaming exact dedup: the canonical-document table as an
incremental stream.

The batch twin is `pipeline/dedup.py:exact_dedup`; this module maintains
the SAME canonical mapping as a streaming aggregation so a continuously
ingested corpus keeps its dedup index current without per-batch full
rescans — the streaming half of the ingestion story next to
streaming/ingest.py (edges), events.py (windows), and sessions.py.

Design: the state is keyed by full-content hash (sha2-256) and carries
(min doc_id, row count) — a pure commutative/associative aggregate, so the
drained result is independent of micro-batch boundaries and file arrival
order (unlike streaming `dropDuplicates`, whose survivor is
first-arrival-ordered and therefore not oracle-checkable).  The output is
the canonical table [content_hash, canonical_id, n_copies]; joining it
back to the id stream reproduces exact_dedup's per-row verdicts.

Scale notes: streaming state is one row per DISTINCT document (hash +
two longs — the minimal dedup index any service must hold); content never
enters the state, only its 64-hex digest.  In production, append mode with
a watermark on the ingest timestamp bounds the state horizon; the
gate/drain path uses COMPLETE mode into a memory sink (retains all state)
because an equality gate needs the full table regardless of arrival order.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def stream_docs(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """readStream over a directory of documents parquet (new files = new
    micro-batches)."""
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def canonical_stream(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """[content_hash, canonical_id, n_copies] as a streaming aggregation —
    min-id + count per sha2(text, 256), the batch exact_dedup grouping
    (pipeline/dedup.py:exact_dedup / oracles exact_dedup_sql)."""
    return (
        docs.select(
            F.sha2(F.col(text_col), 256).alias("content_hash"), F.col(id_col)
        )
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
    )


def run_canonical_dedup(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int | None = 1,
    timeout_s: int = 600,
) -> DataFrame:
    """Drain `input_dir` with an availableNow trigger through the
    canonical-dedup aggregation in COMPLETE mode and return the final
    canonical table (batch DataFrame) — exact over every input row."""
    stream = stream_docs(spark, input_dir, max_files_per_trigger)
    canon = canonical_stream(stream)
    name = f"canonical_dedup_{uuid.uuid4().hex[:12]}"
    q = (
        canon.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"availableNow drain did not finish within {timeout_s}s — "
            "refusing to return a partial canonical table"
        )
    # copy the memory-sink table out and drop the uuid-named temp view —
    # otherwise every call (gate + bench + tests) retains its full canonical
    # table in driver memory for the session lifetime
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out
