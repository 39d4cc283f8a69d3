"""End-to-end curation pipeline test."""

from __future__ import annotations

import pytest

from neo4j_graph_algorithms_spark.pipeline.curate import curate

GOOD = "the cat sat on the mat and then the cat ran to the barn door again ok"

DOCS = [
    (0, GOOD),                       # keeper
    (1, GOOD),                       # exact duplicate of 0
    (2, GOOD.replace("barn", "red")),  # near-duplicate of 0
    (3, "zz qq"),                    # low quality (too short, no stopwords)
    (4, "a completely different story is told in this other document about the sea and the wind and a ship"),
]


def test_curate_pipeline(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    res = curate(
        docs, min_quality=0.75, near_dup_threshold=0.6, ngram=3,
        num_hashes=16, bands=8,
    )
    kept = {r.doc_id for r in res.curated.collect()}
    assert kept == {0, 4}
    assert res.stats["input"] == 5
    assert res.stats["after_quality"] == 4          # drops 3
    assert res.stats["after_exact_dedup"] == 3      # drops 1
    assert res.stats["after_near_dedup"] == 2       # drops 2


def test_curate_language_filter(spark):
    docs = spark.createDataFrame(
        [(0, GOOD), (1, "le chat est sur le tapis et la table est la aussi ok bien sur oui")],
        "doc_id long, text string",
    )
    res = curate(docs, min_quality=0.0, keep_langs=["en"])
    assert {r.doc_id for r in res.curated.collect()} == {0}
    assert res.stats["after_lang_filter"] == 1
