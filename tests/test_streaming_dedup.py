"""Streaming canonical dedup (streaming/dedup.py) — drain == batch."""

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_streaming_dedup_equal_batch_and_order_independent(spark, tmp_path):
    """availableNow drain of the canonical-dedup stream == the batch
    grouping — including a duplicate whose SMALLER id arrives in a LATER
    micro-batch (first-arrival dropDuplicates would keep the wrong row;
    the min-id aggregate must not)."""
    rows = [
        (10, "alpha beta", "en", "web", 10),
        (11, "gamma", "en", "web", 5),
        (12, "alpha beta", "en", "web", 10),  # dup of 10 (same wave)
        (13, "delta", "en", "web", 5),
        (3, "gamma", "en", "web", 5),  # dup of 11, SMALLER id, later wave
        (14, "alpha beta", "en", "web", 10),  # third copy, last wave
    ]
    docs = _docs(spark, rows)
    for i, ids in enumerate([[10, 11, 12], [13, 3], [14]]):
        docs.filter(F.col("doc_id").isin(ids)).coalesce(1).write.parquet(
            str(tmp_path / "in" / f"wave={i}")
        )
    from neo4j_graph_algorithms_spark.streaming.dedup import run_canonical_dedup

    got = run_canonical_dedup(spark, str(tmp_path / "in"))
    want = (
        docs.select(F.sha2("text", 256).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_copies"))
    )
    g = sorted(map(tuple, got.collect()))
    assert g == sorted(map(tuple, want.collect()))
    by_canon = {r[1]: r[2] for r in g}
    assert by_canon[10] == 3  # alpha beta ×3
    assert by_canon[3] == 2  # gamma canonicalizes to the LATE smaller id
    assert by_canon[13] == 1


def test_streaming_dedup_consistency_with_batch_exact_dedup(spark, tmp_path):
    """Joining the canonical table back to the ids reproduces
    pipeline/dedup.py:exact_dedup verdict-for-verdict."""
    from neo4j_graph_algorithms_spark.pipeline.dedup import exact_dedup
    from neo4j_graph_algorithms_spark.streaming.dedup import run_canonical_dedup

    rows = [
        (1, "x y", "en", "web", 3),
        (2, "x y", "en", "web", 3),
        (5, "z", "en", "web", 1),
    ]
    docs = _docs(spark, rows)
    docs.coalesce(1).write.parquet(str(tmp_path / "in" / "wave=0"))
    canon = run_canonical_dedup(spark, str(tmp_path / "in"))
    rejoined = (
        docs.select(F.sha2("text", 256).alias("content_hash"), "doc_id")
        .join(canon, on="content_hash")
        .select(
            "doc_id",
            "canonical_id",
            (F.col("doc_id") != F.col("canonical_id")).alias("is_duplicate"),
        )
    )
    assert sorted(map(tuple, rejoined.collect())) == sorted(
        map(tuple, exact_dedup(docs).collect())
    )
