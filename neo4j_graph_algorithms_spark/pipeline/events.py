"""Event-stream analytics over the events table: sessionization + windowed
aggregation.

The reference is a static-graph engine, but its production context (a
commit/event log feeding the link graph) makes these the two standard
stream-shaped queries; both are expressed here as BATCH DataFrame ops whose
semantics match their Structured Streaming twins exactly:

  * `sessionize`  == `groupBy(user, F.session_window(ts, gap))` in a
    stream (same gap-merge semantics), expressed with lag/cumsum windows so
    the DuckDB oracle reproduces it bit-for-bit;
  * `windowed_event_aggregate` == `groupBy(F.window(ts, size))` — the
    tumbling-window aggregate a watermarked stream emits after late-data
    grace.

Scale shape: both partition by a bounded key (user_id / window start) —
per-user event history is human-bounded, so the lag/cumsum windows never
see web-scale partitions; the windowed aggregate is one map-side-combined
groupBy.  Skewed bot users are the exception: `max_events_per_user`
optionally truncates (warned, never silent).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    max_events_per_user: int | None = None,
) -> DataFrame:
    """[user_id, session_id, n_events, t_start, t_end, total_value] —
    gap-based sessions: a new session starts when the inactivity gap
    exceeds `gap_minutes`.  session_id is the per-user session ordinal
    (0-based); t_start/t_end are epoch seconds (bigint — engine-neutral
    across the oracle boundary).

    Identical grouping to streaming `F.session_window(ts, gap)`: sessions
    are maximal chains of events with consecutive gaps <= gap.

    total_value contract: each value is quantized to the 1e-6 grid FIRST
    (round-to-long), then summed exactly — i.e. `value` is treated as a
    fixed-point 6dp quantity.  This makes the sum order/partitioning/
    engine-independent; values carrying real sub-1e-6 precision can drift
    from round(float-sum, 6) by up to n·5e-7 per session, the price of
    determinism.  Same contract in `windowed_event_aggregate` and the
    streaming twin (streaming/events.py).
    """
    if max_events_per_user is not None:
        deg = events.groupBy(user_col).agg(F.count("*").alias("_n"))
        hot = deg.filter(F.col("_n") > max_events_per_user).count()
        if hot:
            warnings.warn(
                f"sessionize: {hot} users exceed {max_events_per_user} "
                "events; their excess events (by ts order) are dropped",
                RuntimeWarning,
                stacklevel=2,
            )
        w_cap = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
        events = (
            events.withColumn("_rn", F.row_number().over(w_cap))
            .filter(F.col("_rn") <= max_events_per_user)
            .drop("_rn")
        )
    # both windows order by FULL-precision ts (ties by event_id); the gap
    # itself compares second-truncated epochs (engine-neutral integers)
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    gap_s = gap_minutes * 60.0
    epoch = F.unix_timestamp(F.col(ts_col))
    marked = events.select(
        F.col(user_col),
        F.col(ts_col),
        epoch.alias("_ep"),
        F.col(value_col),
        F.when(
            (epoch - F.lag(epoch).over(w)).isNull()
            | ((epoch - F.lag(epoch).over(w)) <= gap_s),
            F.lit(0),
        )
        .otherwise(F.lit(1))
        .alias("_new"),
        F.col("event_id"),
    )
    sess = marked.withColumn("session_id", F.sum("_new").over(w))
    # total_value sums INTEGER-scaled values (x1e6 -> long) so the sum is
    # exact and shard-order-independent, then divides back at the end —
    # the FastRP determinism trick (round(sum(double),6) flips on sessions
    # whose float sum lands within 1 ulp of a 6dp boundary; seen as the
    # r3 driver hash-fail).
    scaled = F.round(F.col(value_col) * F.lit(1e6)).cast("long")
    return (
        sess.groupBy(user_col, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("_ep").alias("t_start"),
            F.max("_ep").alias("t_end"),
            (F.sum(scaled) / F.lit(1e6)).alias("total_value"),
        )
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    window_minutes: float = 24 * 60.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """[step_idx, step, n_users] — ordered conversion funnel: a user counts
    for step i iff they performed steps[0..i] in order, each event strictly
    after the previous one (ties on the second grid broken by event_id) and
    all within `window_minutes` of their FIRST step-0 event.

    Semantics pinned for exact cross-engine parity: the step-i anchor is
    the lexicographic MIN (epoch, event_id) among qualifying events —
    deterministic under any partitioning.  Epochs compare on the second
    grid (engine-neutral integers, same convention as `sessionize`).

    Scale shape: one groupBy per step on the user key over the PRE-FILTERED
    single-type slice (each step touches only its own event type — the
    filter pushes to the scan), then a user-key join per step.  len(steps)
    is a small constant (funnels are 3-6 steps), so the plan is a short
    chain of co-partitioned shuffles; no windows over raw history, no
    per-user explode.
    """
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    ep = F.unix_timestamp(F.col(ts_col))
    ev = events.select(
        F.col(user_col).alias("_u"),
        ep.alias("_ep"),
        F.col("event_id").alias("_eid"),
        F.col(type_col).alias("_t"),
    )
    win_s = int(round(window_minutes * 60.0))
    # step 0: first matching event per user (min struct = lexicographic)
    cur = (
        ev.filter(F.col("_t") == steps[0])
        .groupBy("_u")
        .agg(F.min(F.struct("_ep", "_eid")).alias("_a"))
        .select(
            "_u",
            F.col("_a._ep").alias("_ep"),
            F.col("_a._eid").alias("_eid"),
            F.col("_a._ep").alias("_ep0"),
        )
    ).localCheckpoint(eager=True)  # truncate lineage: each step's count and
    # the next join read the materialized survivors, not a re-run of the
    # whole prefix chain (the superstep-runner convention)
    counts = [cur.count()]
    for step in steps[1:]:
        nxt = ev.filter(F.col("_t") == step).select(
            "_u", F.col("_ep").alias("_nep"), F.col("_eid").alias("_neid")
        )
        # shuffle_hash on a PROJECTION of the (shrinking) survivor side —
        # both sides are corpus-sized at scale, so Catalyst must never pick
        # a broadcast build here (repo convention, CLAUDE.md / BENCH notes;
        # hinting the localCheckpoint'ed frame itself is what trips the
        # Spark 4.1 Catalyst NoSuchElementException, a projection is safe)
        cur_p = cur.select("_u", "_ep", "_eid", "_ep0").hint("shuffle_hash")
        cur = (
            cur_p.join(nxt, on="_u")
            .filter(
                (
                    (F.col("_nep") > F.col("_ep"))
                    | ((F.col("_nep") == F.col("_ep")) & (F.col("_neid") > F.col("_eid")))
                )
                & (F.col("_nep") <= F.col("_ep0") + F.lit(win_s))
            )
            .groupBy("_u", "_ep0")
            .agg(F.min(F.struct(F.col("_nep"), F.col("_neid"))).alias("_a"))
            .select(
                "_u",
                F.col("_a._nep").alias("_ep"),
                F.col("_a._neid").alias("_eid"),
                "_ep0",
            )
        ).localCheckpoint(eager=True)
        counts.append(cur.count())
    spark = events.sparkSession
    return spark.createDataFrame(
        [(i, s, int(n)) for i, (s, n) in enumerate(zip(steps, counts))],
        "step_idx int, step string, n_users long",
    )


def retention_cohorts(
    events: DataFrame,
    period_days: int = 1,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """[cohort_start, period_offset, n_users] — classic cohort retention:
    users are cohorted by the period of their first event (period_start =
    epoch seconds on the `period_days` grid), and n_users counts distinct
    cohort members active in the period `period_offset` periods later
    (offset 0 = the cohort period itself, so offset-0 rows equal cohort
    sizes).

    Pure integer arithmetic end to end (epoch // period), so the gate is
    exact.  Scale shape: first-event agg is one user-key groupBy; activity
    is a distinct over (user, period) — both map-side combinable; the
    cohort join broadcasts nothing |V|-sized (user→cohort is user-keyed and
    co-partitions with activity).
    """
    period_s = period_days * 86400
    ep = F.unix_timestamp(F.col(ts_col))
    pstart = (F.floor(ep / period_s) * period_s).cast("long")
    base = events.select(F.col(user_col).alias("_u"), pstart.alias("_p"))
    first = base.groupBy("_u").agg(F.min("_p").alias("cohort_start"))
    active = base.distinct()
    # user→cohort is |users|-sized (vertex-state analog): pin a shuffle
    # join so Catalyst never broadcasts it at scale; both aggregations
    # already share the _u key, so the join is co-partitioned
    return (
        active.join(first.select("_u", "cohort_start").hint("shuffle_hash"), on="_u")
        .select(
            "cohort_start",
            ((F.col("_p") - F.col("cohort_start")) / period_s)
            .cast("long")
            .alias("period_offset"),
            "_u",
        )
        .groupBy("cohort_start", "period_offset")
        .agg(F.count("*").alias("n_users"))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """[from_type, to_type, n_pairs] — first-order Markov transition counts
    between consecutive event types within each user's timeline (ordered by
    full-precision ts, ties by event_id — the repo's event-order
    convention).  The sequence-model / behavioral-features primitive.

    Scale shape: one lag window per user partition (per-user history is
    human-bounded) + one tiny (|types|²-row) aggregation; the window and
    the groupBy share no key, but the transition table is map-side combined
    to |types|² rows per task before the final shuffle.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    return (
        events.select(
            F.col(user_col),
            F.col(ts_col),
            F.col("event_id"),
            F.col(type_col).alias("to_type"),
        )
        .withColumn("from_type", F.lag("to_type").over(w))
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n_pairs"))
    )


def windowed_event_aggregate(
    events: DataFrame,
    window_minutes: int = 60,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """[window_start, event_type, n_events, total_value, max_value] —
    tumbling-window aggregate (window_start = epoch seconds, bigint).
    Matches `groupBy(F.window(ts, size), type)` in a watermarked stream;
    one shuffle, map-side combined.
    """
    win_s = window_minutes * 60
    epoch = F.unix_timestamp(F.col(ts_col))
    # exact integer-scaled sum — see sessionize (same latent 6dp-boundary
    # risk; max is order-independent so a plain round stays correct there)
    scaled = F.round(F.col(value_col) * F.lit(1e6)).cast("long")
    return (
        events.select(
            (F.floor(epoch / win_s) * win_s).alias("window_start"),
            F.col(type_col),
            F.col(value_col),
            scaled.alias("_v6"),
        )
        .groupBy("window_start", type_col)
        .agg(
            F.count("*").alias("n_events"),
            (F.sum("_v6") / F.lit(1e6)).alias("total_value"),
            F.round(F.max(value_col), 6).alias("max_value"),
        )
    )


def user_activity_features(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """[user_id, n_events, n_types, n_active_days, first_ep, last_ep,
    total_value] — the classic per-user RFM/engagement feature block
    (recency = last_ep, frequency = n_events / n_active_days, monetary =
    total_value) that behavioral models train on.

    One user-keyed aggregation, map-side combined; total_value uses the
    repo's exact integer-scaled 1e-6-grid sum (order/engine-independent);
    day counts are epoch // 86400 integers.
    """
    ep = F.unix_timestamp(F.col(ts_col))
    scaled = F.round(F.col(value_col) * F.lit(1e6)).cast("long")
    return events.groupBy(user_col).agg(
        F.count("*").alias("n_events"),
        F.countDistinct(type_col).alias("n_types"),
        F.countDistinct(F.floor(ep / 86400)).alias("n_active_days"),
        F.min(ep).alias("first_ep"),
        F.max(ep).alias("last_ep"),
        (F.sum(scaled) / F.lit(1e6)).alias("total_value"),
    )


def asof_join(
    events: DataFrame,
    left_type: str,
    right_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """[event_id, user_id, ts_us, matched_event_id, matched_ts_us, lag_us] —
    per-user AS-OF join: each `left_type` event is joined to the most recent
    `right_type` event by the same user with ts ≤ the left event's ts (the
    attribution primitive: "last click before this purchase").  Timestamps
    are returned as BIGINT epoch microseconds (the sessionize convention —
    engine-neutral integers across the oracle boundary); unmatched left
    events keep NULL matched columns.

    Semantics match DuckDB's native `ASOF JOIN` / kdb `aj` with a
    DETERMINISTIC tie-break the native forms leave unspecified: right
    events sort before left events at equal ts (a same-instant right event
    IS visible), and among right events tied on (user, ts) the one with the
    greatest `event_id` wins.

    Scale shape: NO inequality join anywhere (a naive range join is
    O(|L|·|R|) per user) — both sides are union-tagged and scanned once
    under a per-user running `last(..., ignoreNulls)` window, so the cost
    is ONE shuffle on user_id plus a per-user sort: identical shape to
    sessionize, bounded by per-user event counts, skew-splittable by AQE
    on the user key.
    """
    ev = events.select(
        F.col(id_col).alias("eid"),
        F.col(user_col),
        # parquet TIMESTAMP_NTZ → cast through TIMESTAMP under the session's
        # pinned UTC zone (session.py:45), matching DuckDB's naive-as-UTC
        # epoch_us — same convention as sessionize's unix_timestamp
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        F.col(type_col),
    )
    tagged = (
        ev.filter(F.col(type_col) == right_type)
        .select(user_col, "ts_us", "eid", F.lit(0).alias("side"))
        .unionByName(
            ev.filter(F.col(type_col) == left_type).select(
                user_col, "ts_us", "eid", F.lit(1).alias("side")
            )
        )
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy("ts_us", "side", "eid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = tagged.select(
        user_col,
        "ts_us",
        "eid",
        "side",
        F.last(F.when(F.col("side") == 0, F.col("eid")), ignorenulls=True)
        .over(w)
        .alias("matched_event_id"),
        F.last(F.when(F.col("side") == 0, F.col("ts_us")), ignorenulls=True)
        .over(w)
        .alias("matched_ts_us"),
    )
    return runs.filter(F.col("side") == 1).select(
        F.col("eid").alias("event_id"),
        F.col(user_col),
        "ts_us",
        "matched_event_id",
        "matched_ts_us",
        (F.col("ts_us") - F.col("matched_ts_us")).alias("lag_us"),
    )


def burstiness(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    min_gaps: int = 2,
) -> DataFrame:
    """[user_id, n_gaps, mean_gap_s, burstiness] — the Goh-Barabasi
    burstiness index B = (sigma - mu)/(sigma + mu) of each user's
    inter-event times ("Burstiness and memory in complex systems", EPL 81,
    2008).  B -> -1 for clockwork regularity, 0 for Poisson arrivals,
    -> +1 for extreme bursts — the behavioral twin of the repo's bot-user
    sessionize cap (bots are near-periodic, humans bursty).

    Exactness contract: gaps are second-truncated epoch integers under the
    family's (ts, event_id) ordering (sessionize's convention), summed in
    BIGINT (gap^2 sums stay < 2^63 for multi-year second-grained spans);
    mu/sigma/B derive from those exact integers through a fixed expression
    shape mirrored in the oracle, so every engine sees identical doubles.
    sqrt is IEEE-correctly-rounded everywhere (unlike ln).  Users with
    fewer than `min_gaps` gaps are dropped; all-zero gaps (sub-second
    bursts only) yield NULL (0/0 has no burstiness).

    Plan shape: one per-user lag window + one map-side-combined aggregate.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    ep = F.unix_timestamp(F.col(ts_col))
    gaps = (
        events.select(user_col, "event_id", ts_col, ep.alias("_ep"))
        .withColumn("_gap", F.col("_ep") - F.lag("_ep").over(w))
        .filter(F.col("_gap").isNotNull())
    )
    agg = gaps.groupBy(user_col).agg(
        F.count("*").alias("n_gaps"),
        F.sum("_gap").alias("_s1"),
        F.sum(F.col("_gap") * F.col("_gap")).alias("_s2"),
    ).filter(F.col("n_gaps") >= min_gaps)
    n = F.col("n_gaps").cast("double")
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / n
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    return agg.select(
        user_col,
        "n_gaps",
        F.round(mean, 6).alias("mean_gap_s"),
        F.when(
            (sd + mean) > 0, F.round((sd - mean) / (sd + mean), 6)
        ).alias("burstiness"),
    )


def value_percentiles(
    events: DataFrame,
    percentiles: tuple[int, ...] = (50, 90, 99),
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """[event_type, n, p50_value, p90_value, p99_value] — EXACT discrete
    per-type value percentiles: p(q) = min value whose cumulative count
    >= ceil(n*q/100), computed on the integer-scaled value histogram
    (round(value*1e6), the family grid).  The outlier-threshold audit
    behind event-value capping; exact where approx_percentile is
    nondeterministic across partitionings.

    Engine-exactness mirrors degree_distribution: the percentile pick is
    the pure-BIGINT comparison 100*cum >= n*q (no float division), the
    cumulative window runs over the per-type value HISTOGRAM (bounded by
    value cardinality, not |events|), and outputs descale by one exact
    /1e6 division.
    """
    v6 = F.round(F.col(value_col) * F.lit(1e6)).cast("long")
    hist = events.groupBy(F.col(type_col), v6.alias("_v6")).agg(
        F.count("*").alias("cnt")
    )
    w = (
        Window.partitionBy(type_col)
        .orderBy("_v6")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    tot = hist.groupBy(type_col).agg(F.sum("cnt").alias("n"))
    joined = cum.join(tot.hint("shuffle_hash"), on=type_col)
    aggs = [
        F.min(
            F.when(F.col("cum") * 100 >= F.col("n") * q, F.col("_v6"))
        ).alias(f"_p{q}")
        for q in percentiles
    ]
    return (
        joined.groupBy(type_col, "n")
        .agg(*aggs)
        .select(
            type_col,
            "n",
            *[
                (F.col(f"_p{q}") / F.lit(1e6)).alias(f"p{q}_value")
                for q in percentiles
            ],
        )
    )
