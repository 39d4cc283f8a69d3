"""Event sessionization + tumbling windows (pipeline/events.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from neo4j_graph_algorithms_spark.pipeline.events import (
    sessionize,
    windowed_event_aggregate,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    """rows: (event_id, minutes_offset, user_id, event_type, value)"""
    data = [
        (eid, T0 + dt.timedelta(minutes=m), uid, et, v)
        for eid, m, uid, et, v in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_sessionize_gap_splits(spark):
    ev = _events(spark, [
        (0, 0.0, 1, "view", 1.0),
        (1, 10.0, 1, "click", 2.0),     # 10 min gap → same session
        (2, 50.0, 1, "view", 4.0),      # 40 min gap → new session
        (3, 55.0, 1, "buy", 8.0),
        (4, 0.0, 2, "view", 1.5),       # other user: own sessions
    ])
    got = {(r.user_id, r.session_id): r for r in sessionize(ev, gap_minutes=30).collect()}
    assert got[(1, 0)].n_events == 2 and got[(1, 0)].total_value == 3.0
    assert got[(1, 1)].n_events == 2 and got[(1, 1)].total_value == 12.0
    assert got[(2, 0)].n_events == 1
    # session bounds are epoch seconds
    assert got[(1, 1)].t_end - got[(1, 1)].t_start == 5 * 60


def test_sessionize_gap_boundary_inclusive(spark):
    # exactly-30-min gap stays in the same session (<= gap)
    ev = _events(spark, [(0, 0.0, 1, "a", 1.0), (1, 30.0, 1, "b", 1.0)])
    out = sessionize(ev, gap_minutes=30).collect()
    assert len(out) == 1 and out[0].n_events == 2


def test_sessionize_hot_user_cap_warns(spark):
    ev = _events(spark, [(i, float(i), 1, "x", 1.0) for i in range(10)])
    with pytest.warns(RuntimeWarning, match="exceed"):
        out = sessionize(ev, gap_minutes=30, max_events_per_user=4).collect()
    assert sum(r.n_events for r in out) == 4


def test_sessionize_sum_partition_invariant(spark):
    # total_value is an integer-scaled exact sum: bit-identical under any
    # partitioning.  Values like 0.0000005 would flip round(sum(double),6)
    # depending on accumulation order; the scaled-long path cannot.
    rows = [
        (i, float(i % 7) * 0.1, 1, "x", 0.1 + (i % 13) * 1e-7)
        for i in range(500)
    ]
    ev = _events(spark, rows)
    a = sessionize(ev.repartition(1), gap_minutes=30).collect()
    b = sessionize(ev.repartition(64), gap_minutes=30).collect()
    key = lambda r: (r.user_id, r.session_id)
    va = {key(r): r.total_value for r in a}
    vb = {key(r): r.total_value for r in b}
    assert va == vb  # exact ==, not approx


def test_windowed_aggregate_hand_values(spark):
    ev = _events(spark, [
        (0, 0.0, 1, "view", 1.0),
        (1, 59.0, 2, "view", 2.0),      # same hour, same type
        (2, 61.0, 3, "view", 4.0),      # next hour
        (3, 5.0, 4, "click", 8.0),      # same hour, other type
    ])
    got = {(r.window_start, r.event_type): r for r in
           windowed_event_aggregate(ev, window_minutes=60).collect()}
    base = int(T0.replace(tzinfo=dt.timezone.utc).timestamp())
    # note: unix_timestamp uses the session tz; recompute base from output
    starts = sorted({k[0] for k in got})
    first, second = starts[0], starts[-1]
    assert second - first == 3600
    assert got[(first, "view")].n_events == 2
    assert got[(first, "view")].total_value == 3.0
    assert got[(second, "view")].n_events == 1
    assert got[(first, "click")].max_value == 8.0


def test_sessionize_bot_user_truncation_matches_oracle(spark):
    # skew hardening (VERDICT r3 item 9): a bot user far above the cap is
    # truncated to its first max_events (by ts, event_id) BEFORE gap
    # sessionization; a DuckDB twin of cap-then-sessionize must agree on
    # every output row, not just the warned count
    import duckdb

    rows = (
        # bot user 1: 40 events every 2 min (one giant session uncapped)
        [(i, 2.0 * i, 1, "bot", 0.5 + i * 1e-6) for i in range(40)]
        # human user 2: two sessions split by a 90-min gap
        + [(100, 0.0, 2, "view", 1.0), (101, 5.0, 2, "click", 2.0),
           (102, 95.0, 2, "view", 4.0)]
    )
    ev = _events(spark, rows)
    with pytest.warns(RuntimeWarning, match="exceed"):
        got = sorted(
            (r.user_id, r.session_id, r.n_events, r.t_start, r.t_end,
             r.total_value)
            for r in sessionize(ev, gap_minutes=30,
                                max_events_per_user=10).collect()
        )

    pdf = ev.toPandas()
    con = duckdb.connect()
    con.register("ev", pdf)
    want = sorted(
        tuple(r)
        for r in con.execute("""
WITH capped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS rn FROM ev)
  WHERE rn <= 10),
m AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep, value, event_id,
         CASE WHEN floor(epoch(ts))
                   - lag(floor(epoch(ts))) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                   <= 1800 THEN 0
              WHEN lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) IS NULL THEN 0
              ELSE 1 END AS new_s
  FROM capped),
s AS (
  SELECT user_id, ep, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ep, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
  FROM m)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events, min(ep) AS t_start, max(ep) AS t_end,
       CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
         / 1000000.0 AS total_value
FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id
""").fetchall()
    )
    assert got == want


def test_funnel_hand_values(spark):
    from neo4j_graph_algorithms_spark.pipeline.events import funnel

    ev = _events(spark, [
        # user 1: full funnel in order
        (0, 0.0, 1, "view", 0.0),
        (1, 5.0, 1, "click", 0.0),
        (2, 9.0, 1, "purchase", 0.0),
        # user 2: click BEFORE view → stops after view
        (3, 0.0, 2, "click", 0.0),
        (4, 5.0, 2, "view", 0.0),
        # user 3: view + click, purchase outside the 60-min window
        (5, 0.0, 3, "view", 0.0),
        (6, 10.0, 3, "click", 0.0),
        (7, 90.0, 3, "purchase", 0.0),
        # user 4: never views
        (8, 0.0, 4, "purchase", 0.0),
    ])
    got = {r.step: r.n_users for r in
           funnel(ev, ["view", "click", "purchase"], window_minutes=60.0).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_same_second_ties_use_event_id(spark):
    from neo4j_graph_algorithms_spark.pipeline.events import funnel

    # both events in the same epoch second: the later event_id counts as after
    ev = _events(spark, [
        (0, 0.0, 1, "view", 0.0),
        (1, 0.0, 1, "click", 0.0),
    ])
    got = {r.step: r.n_users for r in
           funnel(ev, ["view", "click"], window_minutes=60.0).collect()}
    assert got == {"view": 1, "click": 1}
    # reversed ids → click is BEFORE the view anchor, funnel stalls
    ev2 = _events(spark, [
        (5, 0.0, 1, "view", 0.0),
        (1, 0.0, 1, "click", 0.0),
    ])
    got2 = {r.step: r.n_users for r in
            funnel(ev2, ["view", "click"], window_minutes=60.0).collect()}
    assert got2 == {"view": 1, "click": 0}


def test_retention_cohorts_hand_values(spark):
    from neo4j_graph_algorithms_spark.pipeline.events import retention_cohorts

    day = 24 * 60.0
    ev = _events(spark, [
        (0, 0.0, 1, "a", 0.0),          # u1 first day 0
        (1, day, 1, "a", 0.0),          # active day 1
        (2, 2 * day, 1, "a", 0.0),      # active day 2
        (3, 0.0, 2, "a", 0.0),          # u2 first day 0, never returns
        (4, day, 3, "a", 0.0),          # u3 first day 1
        (5, 2 * day, 3, "a", 0.0),      # active day 2
    ])
    got = {(r.cohort_start, r.period_offset): r.n_users
           for r in retention_cohorts(ev, period_days=1).collect()}
    d0 = int(T0.timestamp())  # conftest T0 is midnight → on the daily grid
    assert got[(d0, 0)] == 2 and got[(d0, 1)] == 1 and got[(d0, 2)] == 1
    assert got[(d0 + 86400, 0)] == 1 and got[(d0 + 86400, 1)] == 1
    assert (d0, 3) not in got


def test_event_transitions_hand_values(spark):
    from neo4j_graph_algorithms_spark.pipeline.events import event_transitions

    ev = _events(spark, [
        (0, 0.0, 1, "view", 0.0),
        (1, 1.0, 1, "click", 0.0),
        (2, 2.0, 1, "view", 0.0),
        (3, 0.0, 2, "view", 0.0),
        (4, 1.0, 2, "click", 0.0),
    ])
    got = {(r.from_type, r.to_type): r.n_pairs
           for r in event_transitions(ev).collect()}
    assert got == {("view", "click"): 2, ("click", "view"): 1}


def test_user_activity_features_hand_values(spark):
    from neo4j_graph_algorithms_spark.pipeline.events import user_activity_features

    day = 24 * 60.0
    ev = _events(spark, [
        (0, 0.0, 1, "view", 1.5),
        (1, 10.0, 1, "click", 2.25),
        (2, day + 5.0, 1, "view", 0.25),
        (3, 0.0, 2, "view", 4.0),
    ])
    got = {r.user_id: r for r in user_activity_features(ev).collect()}
    u1 = got[1]
    assert u1.n_events == 3 and u1.n_types == 2 and u1.n_active_days == 2
    assert u1.last_ep - u1.first_ep == int((day + 5.0) * 60)
    assert u1.total_value == 4.0
    assert got[2].n_events == 1 and got[2].n_active_days == 1


def test_asof_join_basic_and_unmatched(spark):
    from neo4j_graph_algorithms_spark.pipeline.events import asof_join

    ev = _events(spark, [
        (0, 0.0, 1, "click", 0.0),
        (1, 5.0, 1, "click", 0.0),
        (2, 7.0, 1, "purchase", 9.0),   # matches click 1 (t=5)
        (3, 9.0, 1, "purchase", 9.0),   # also matches click 1
        (4, 2.0, 2, "purchase", 9.0),   # user 2 has no click → unmatched
    ])
    got = {r.event_id: (r.matched_event_id, r.lag_us)
           for r in asof_join(ev, "purchase", "click").collect()}
    assert got[2] == (1, 2 * 60 * 1_000_000)
    assert got[3] == (1, 4 * 60 * 1_000_000)
    assert got[4] == (None, None)


def test_asof_join_same_instant_and_tie_break(spark):
    from neo4j_graph_algorithms_spark.pipeline.events import asof_join

    ev = _events(spark, [
        (0, 3.0, 1, "click", 0.0),
        (1, 3.0, 1, "click", 0.0),      # tied clicks at t=3: max event_id wins
        (2, 3.0, 1, "purchase", 9.0),   # same-instant click IS visible (ts ≤)
        (3, 1.0, 1, "purchase", 9.0),   # before any click → unmatched
    ])
    got = {r.event_id: (r.matched_event_id, r.lag_us)
           for r in asof_join(ev, "purchase", "click").collect()}
    assert got[2] == (1, 0)
    assert got[3] == (None, None)


def test_asof_join_never_crosses_users(spark):
    from neo4j_graph_algorithms_spark.pipeline.events import asof_join

    ev = _events(spark, [
        (0, 0.0, 1, "click", 0.0),
        (1, 5.0, 2, "purchase", 9.0),   # user 2: user 1's click invisible
    ])
    rows = asof_join(ev, "purchase", "click").collect()
    assert len(rows) == 1 and rows[0].matched_event_id is None


def test_burstiness_periodic_vs_bursty(spark):
    from datetime import datetime, timedelta

    from neo4j_graph_algorithms_spark.pipeline.events import burstiness

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    # user 1: clockwork every 60 s -> sd 0, B = (0-60)/(0+60) = -1
    for i in range(5):
        rows.append((eid, t0 + timedelta(seconds=60 * i), 1, "view", 0.0, "{}"))
        eid += 1
    # user 2: gaps 1, 1, 598 -> bursty, B > 0
    for s in (0, 1, 2, 600):
        rows.append((eid, t0 + timedelta(seconds=s), 2, "view", 0.0, "{}"))
        eid += 1
    # user 3: a single event -> no gaps -> dropped
    rows.append((eid, t0, 3, "view", 0.0, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r.user_id: r for r in burstiness(ev).collect()}
    assert got[1].n_gaps == 4 and got[1].mean_gap_s == 60.0
    assert got[1].burstiness == -1.0
    assert got[2].n_gaps == 3 and got[2].burstiness > 0
    assert 3 not in got
    # replay user 2 exactly: gaps 1,1,598
    import math

    mu = 600 / 3
    sd = math.sqrt((1 + 1 + 598 * 598 - 600 * 600 / 3) / 3)
    assert got[2].burstiness == round((sd - mu) / (sd + mu), 6)


def test_burstiness_subsecond_all_zero_gaps_null(spark):
    from datetime import datetime, timedelta

    from neo4j_graph_algorithms_spark.pipeline.events import burstiness

    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0 + timedelta(microseconds=100 * i), 7, "view", 0.0, "{}")
        for i in range(4)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = burstiness(ev).collect()
    assert len(got) == 1 and got[0].n_gaps == 3
    assert got[0].mean_gap_s == 0.0 and got[0].burstiness is None


def test_value_percentiles_hand_values(spark):
    from datetime import datetime

    from neo4j_graph_algorithms_spark.pipeline.events import value_percentiles

    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0, 1, "view", float(v), "{}")
        for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 100.0])
    ] + [(10, t0, 1, "click", 7.5, "{}")]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r.event_type: r for r in value_percentiles(ev).collect()}
    v = got["view"]
    # n=5: p50 -> ceil(2.5)=3rd value = 3.0; p90 -> ceil(4.5)=5th = 100.0
    assert (v.n, v.p50_value, v.p90_value, v.p99_value) == (5, 3.0, 100.0, 100.0)
    c = got["click"]
    assert (c.n, c.p50_value, c.p99_value) == (1, 7.5, 7.5)


def test_value_percentiles_partition_invariant(spark):
    import random
    from datetime import datetime, timedelta

    from neo4j_graph_algorithms_spark.pipeline.events import value_percentiles

    rng = random.Random(61)
    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0 + timedelta(seconds=i), rng.randrange(5),
         rng.choice(["a", "b"]), round(rng.uniform(0, 50), 2), "{}")
        for i in range(300)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    a = sorted(map(tuple, value_percentiles(ev.repartition(1)).collect()))
    b = sorted(map(tuple, value_percentiles(ev.repartition(16)).collect()))
    assert a == b
