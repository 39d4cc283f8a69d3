"""Sequence packing — the pack-and-chop stage of an LLM pretraining
pipeline (GPT-2/3, LLaMA recipes: concatenate documents in a fixed order,
chop the token stream into fixed-budget training sequences; a document may
span two sequences).

Deterministic by construction: the stream order is the global ascending
id order, so the packing is a pure function of (corpus, budget) — reruns,
resumes, and re-sharded inputs produce identical sequence assignments.

Scale shape: one distributed two-phase prefix sum (functions/rank.py
prefix_sums — range partition + parallel windows + broadcast offsets,
never a single-partition global window) and one bounded explode (a doc
spans at most n_tokens/budget + 1 sequences).  No joins of anything
|corpus|-sized against itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from neo4j_graph_algorithms_spark.functions.rank import prefix_sums


def pack_sequences(
    docs_tokens: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """[id, seq_id, doc_offset, seq_offset, n_tokens] — assignment of each
    document's token span onto fixed-`budget` training sequences, chopping
    at sequence boundaries (one output row per (document, sequence)
    overlap; `doc_offset`/`seq_offset` locate the copied slice in the
    document / the sequence, `n_tokens` is the slice length).

    Input rows must be distinct on `id_col` with a non-negative token
    count; zero-token documents produce no rows.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    pre = prefix_sums(
        docs_tokens.select(id_col, tokens_col).filter(F.col(tokens_col) > 0),
        id_col,
        tokens_col,
    )
    start = F.col("_pre")
    end = F.col("_pre") + F.col(tokens_col)
    first = (start / budget).cast("long")
    last = ((end - 1) / budget).cast("long")
    exploded = pre.select(
        id_col,
        tokens_col,
        "_pre",
        F.explode(F.sequence(first, last)).alias("seq_id"),
    )
    seq_lo = F.col("seq_id") * budget
    slice_lo = F.greatest(F.col("_pre"), seq_lo)
    slice_hi = F.least(F.col("_pre") + F.col(tokens_col), seq_lo + budget)
    return exploded.select(
        id_col,
        "seq_id",
        (slice_lo - F.col("_pre")).alias("doc_offset"),
        (slice_lo - seq_lo).alias("seq_offset"),
        (slice_hi - slice_lo).alias("n_tokens"),
    )
