"""End-to-end corpus curation: the standard pre-training data pipeline
composed from this package's operators.

    quality gate → exact dedup → near-dup (MinHash-LSH) removal →
    optional language filter

All stages stay DataFrame-lazy until the caller materializes; `stats` are
computed with one count per stage boundary (each a cheap aggregate over
the already-planned stage).  At 10^12 rows each stage is a bucket-join or
hash-aggregate — no all-pairs work anywhere (see dedup.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from neo4j_graph_algorithms_spark.pipeline.dedup import exact_dedup, minhash_lsh_dedup
from neo4j_graph_algorithms_spark.pipeline.text import language_id, quality_score


@dataclass
class CurationResult:
    curated: DataFrame
    stats: dict


def curate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    near_dup_threshold: float = 0.8,
    ngram: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    keep_langs: list[str] | None = None,
    compute_stats: bool = True,
    hash_mode: str = "xxhash",
) -> CurationResult:
    """Run the full curation pipeline; duplicates keep the smallest id
    (deterministic).  Returns the curated docs plus per-stage row counts."""
    stats: dict = {}
    if compute_stats:
        stats["input"] = docs.count()

    # 1. quality gate
    q = quality_score(docs, id_col, text_col).filter(F.col("quality") >= min_quality)
    docs1 = docs.join(q.select(id_col), on=id_col, how="left_semi")
    if compute_stats:
        stats["after_quality"] = docs1.count()

    # 2. exact dedup (keep canonical = min id)
    ex = exact_dedup(docs1, id_col, text_col).filter(~F.col("is_duplicate"))
    docs2 = docs1.join(ex.select(id_col), on=id_col, how="left_semi")
    if compute_stats:
        stats["after_exact_dedup"] = docs2.count()

    # 3. near-dup removal: LSH-verified pairs (a<b) drop the larger id
    pairs = minhash_lsh_dedup(
        docs2,
        num_hashes=num_hashes,
        bands=bands,
        threshold=near_dup_threshold,
        ngram=ngram,
        hash_mode=hash_mode,
        id_col=id_col,
        text_col=text_col,
    )
    drop = pairs.select(F.col("b").alias(id_col)).distinct()
    docs3 = docs2.join(drop, on=id_col, how="left_anti")
    if compute_stats:
        stats["after_near_dedup"] = docs3.count()

    # 4. language filter
    if keep_langs is not None:
        lid = language_id(docs3, id_col, text_col).filter(
            F.col("lang_pred").isin(keep_langs)
        )
        docs3 = docs3.join(lid.select(id_col), on=id_col, how="left_semi")
        if compute_stats:
            stats["after_lang_filter"] = docs3.count()

    return CurationResult(curated=docs3, stats=stats)
