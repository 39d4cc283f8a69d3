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


def test_curate_events_preset_caps_by_default(spark):
    """The composed event pipeline (r4 verdict #6) must pass a FINITE
    sessionize cap without opt-in: a bot user above EVENTS_MAX_PER_USER is
    trimmed (warned), sessions equal sessionize with the explicit cap, and
    user features still describe the UNCAPPED history."""
    import datetime as dt

    from neo4j_graph_algorithms_spark.pipeline.curate import (
        EVENTS_MAX_PER_USER,
        curate_events,
    )
    from neo4j_graph_algorithms_spark.pipeline.events import sessionize

    assert EVENTS_MAX_PER_USER == 100_000
    t0 = dt.datetime(2024, 1, 1)
    rows = (
        [(i, t0 + dt.timedelta(minutes=2 * i), 1, "bot", 0.5) for i in range(40)]
        + [(100, t0, 2, "view", 1.0),
           (101, t0 + dt.timedelta(minutes=95), 2, "view", 4.0)]
    )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    # tiny cap override to exercise the trim on a test-sized bot
    with pytest.warns(RuntimeWarning, match="exceed"):
        res = curate_events(ev, gap_minutes=30, max_events_per_user=10)
        got = sorted(
            (r.user_id, r.session_id, r.n_events) for r in res.sessions.collect()
        )
    want = sorted(
        (r.user_id, r.session_id, r.n_events)
        for r in sessionize(ev, gap_minutes=30, max_events_per_user=10).collect()
    )
    assert got == want
    # features run over the UNCAPPED events: the bot keeps all 40
    feats = {r.user_id: r.n_events for r in res.user_features.collect()}
    assert feats[1] == 40 and feats[2] == 2
    assert res.stats["input"] == 42 and res.stats["users"] == 2
    # default path: cap is finite (no warning at test scale, nothing trimmed)
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        res2 = curate_events(ev, gap_minutes=30, compute_stats=False)
        n = res2.sessions.count()
    assert n == sessionize(ev, gap_minutes=30).count()
