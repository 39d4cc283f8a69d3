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


@dataclass
class EventCurationResult:
    sessions: DataFrame
    user_features: DataFrame
    stats: dict


#: Default bot cap for the COMPOSED event pipeline (`curate_events`).  The
#: raw `events.sessionize` operator keeps `max_events_per_user=None`
#: (truncation changes semantics, so it stays opt-in there), but the 100 TB
#: preset path must never run an unbounded per-user window: 100k events is
#: ~1 event/30 s for 3 years — beyond it a "user" is a bot or an ingest
#: error, and sessionize warns with the affected user count when it trims.
EVENTS_MAX_PER_USER = 100_000


def curate_events(
    events: DataFrame,
    gap_minutes: float = 30.0,
    max_events_per_user: int | None = EVENTS_MAX_PER_USER,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    type_col: str = "event_type",
    compute_stats: bool = True,
) -> EventCurationResult:
    """Event-stream curation preset: bot-capped sessionization + the
    per-user engagement feature block, composed with a FINITE
    `max_events_per_user` by default (`EVENTS_MAX_PER_USER`) so the
    per-user lag/cumsum window inside `sessionize` is bounded on the
    100 TB path without opt-in.  `user_activity_features` is pure
    hash-aggregation (no per-user window), so it runs over the UNCAPPED
    events — features describe the user's true history; only the
    window-shaped session computation is trimmed."""
    from neo4j_graph_algorithms_spark.pipeline.events import (
        sessionize,
        user_activity_features,
    )

    stats: dict = {}
    if compute_stats:
        stats["input"] = events.count()
    sessions = sessionize(
        events,
        gap_minutes=gap_minutes,
        user_col=user_col,
        ts_col=ts_col,
        value_col=value_col,
        max_events_per_user=max_events_per_user,
    )
    feats = user_activity_features(
        events, user_col=user_col, ts_col=ts_col, type_col=type_col,
        value_col=value_col,
    )
    if compute_stats:
        stats["sessions"] = sessions.count()
        stats["users"] = feats.count()
    return EventCurationResult(sessions=sessions, user_features=feats, stats=stats)


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
