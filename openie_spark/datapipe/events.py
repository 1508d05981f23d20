"""Temporal operators over the ``events`` stream table
(event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type VARCHAR,
value DOUBLE, props VARCHAR-JSON).

* ``sessionize`` — gap-based sessionization: per user, a new session
  starts when the gap to the previous event exceeds ``gap_minutes``.
  The classic lag-flag + running-sum formulation: one shuffle on
  user_id (the window partition key), everything else linear scans.
* ``session_stats`` — one row per session with count/bounds/duration
  and the value sum.
* ``windowed_counts`` — tumbling-window counts + value sums per
  event_type via ``F.window``; the identical expression runs under
  Structured Streaming with a watermark (see streaming/ingest.py's
  windowed triple counts for the streaming twin of this shape).
* ``props_k`` — typed extraction from the JSON props column
  (``get_json_object``), the schema-on-read path for semi-structured
  payload columns.

Engine-portability conventions (same rationale as textstats' integer
ppm ratios): all time arithmetic is integer microseconds
(``unix_micros`` ≙ DuckDB ``epoch_us``) — no float timestamp math —
and value sums are summed as integer cents, so the DuckDB oracles
(plans/datapipe_oracles.py) reproduce every output bit-for-bit.

Scale notes: sessionization's only shuffle is the hash partition on
user_id; a power-law user is a straggler, not a correctness problem —
AQE splits oversized partitions, and the window functions stream
within a partition (no per-user materialization). Tumbling-window
aggregation is a plain partial-aggregated groupBy — the map-side
combine means the shuffle carries one row per (window, type, input
partition), never one per event.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MINUTES = 30
WINDOW_MINUTES = 5

_US_PER_SEC = 1_000_000


def _cents(col: Column) -> Column:
    return F.round(col * 100).cast("long")


def _with_tz(events: DataFrame) -> DataFrame:
    """The parquet ts is TIMESTAMP_NTZ; unix_micros/F.window need
    TIMESTAMP. The session timezone is pinned to UTC (session factory
    and driver _tune both set it), so the cast is the identity on the
    underlying micros — the same naive-as-UTC reading DuckDB's
    epoch_us applies."""
    return events.withColumn("ts", F.col("ts").cast("timestamp"))


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """+ session_idx (0-based per user, chronological): a session break
    is a gap > gap_minutes since the user's previous event. Ordering is
    (ts, event_id) — event_id breaks exact-timestamp ties
    deterministically."""
    events = _with_tz(events)
    gap_us = gap_minutes * 60 * _US_PER_SEC
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    # two steps — a window expression cannot be the argument of another
    # window aggregate (both run over the SAME user_id partition, so
    # this is still a single shuffle)
    brk = F.when(
        us - F.lag(us).over(w) > F.lit(gap_us), F.lit(1)
    ).otherwise(F.lit(0))  # first row per user: lag NULL -> otherwise(0)
    return (
        events.withColumn("brk", brk)
        .withColumn(
            "session_idx",
            F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"),
        )
        .drop("brk")
    )


def session_stats(events: DataFrame,
                  gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """(user_id, session_idx, n_events, t_start, t_end, duration_sec,
    sum_value_cents) — one row per session; times are epoch seconds."""
    s = sessionize(events, gap_minutes)
    us = F.unix_micros("ts")
    return (
        s.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.min(us) / _US_PER_SEC).cast("long").alias("t_start"),
            (F.max(us) / _US_PER_SEC).cast("long").alias("t_end"),
            ((F.max(us) - F.min(us)) / _US_PER_SEC).cast("long").alias("duration_sec"),
            F.sum(_cents(F.col("value"))).alias("sum_value_cents"),
        )
    )


def session_window_stats(events: DataFrame,
                         gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """Gap-based sessions via Spark's NATIVE ``F.session_window``
    (the engine merges per-event [ts, ts+gap] windows; a break happens
    only at gap > gap — verified empirically to match ``sessionize``'s
    strict-> boundary, an exact-gap event still merges).  Output is
    keyed by (user_id, t_start) instead of a per-user ordinal: the session's
    own start second is the stable identifier the merge produces, and —
    unlike a running-count ordinal — it stays stable under streaming
    incremental emission.

    The groupBy below is EXACTLY what runs under Structured Streaming —
    streaming/ingest.streaming_session_stats wraps this same function
    around a watermarked stream (session-window aggregation is one of
    the few stateful shapes the engine can merge incrementally).

    Scale: one shuffle on user_id; state per OPEN session only (closed
    sessions are emitted and dropped once the watermark passes), so
    state size is bounded by concurrent-user count, not event count.
    """
    e = events if events.isStreaming else _with_tz(events)
    us = F.unix_micros("ts")
    return (
        e.groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("sw"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.min(us) / _US_PER_SEC).cast("long").alias("t_start"),
            (F.max(us) / _US_PER_SEC).cast("long").alias("t_end"),
            F.sum(_cents(F.col("value"))).alias("sum_value_cents"),
        )
        .select("user_id", "t_start", "t_end", "n_events", "sum_value_cents")
    )


def windowed_counts(events: DataFrame,
                    window_minutes: int = WINDOW_MINUTES) -> DataFrame:
    """(bucket_start, event_type, n, sum_value_cents) per tumbling
    window; bucket_start is the window's epoch second. Streaming-ready:
    the same expression under readStream + withWatermark('ts', ...)
    yields the incremental version."""
    win = F.window("ts", f"{window_minutes} minutes")
    return (
        _with_tz(events).groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents(F.col("value"))).alias("sum_value_cents"),
        )
        .select(
            (F.unix_micros(F.col("w.start")) / _US_PER_SEC).cast("long").alias("bucket_start"),
            "event_type", "n", "sum_value_cents",
        )
    )


SLIDE_MINUTES = 5
SLIDING_WINDOW_MINUTES = 20


def sliding_counts(events: DataFrame,
                   window_minutes: int = SLIDING_WINDOW_MINUTES,
                   slide_minutes: int = SLIDE_MINUTES) -> DataFrame:
    """(window_start, event_type, n, n_users, sum_value_cents) per
    SLIDING window — length ``window_minutes``, advancing every
    ``slide_minutes`` (must divide it). The moving-aggregate view of
    the stream: each event lands in exactly L/S windows, so Spark's
    native ``F.window(ts, L, S)`` explodes it L/S ways and the rest is
    the same partial-aggregated groupBy as the tumbling operator —
    the shuffle carries one row per (window, type, input partition),
    never one per event, and output is bounded by
    (time span / slide) x types regardless of corpus size.

    n_users is an exact COUNT(DISTINCT user_id) — fine in batch where
    the aggregate runs per final window; a streaming twin would swap
    it for approx_count_distinct or drop it (exact distinct is not
    incrementally maintainable without keeping the id set in state).

    window_start is the window's epoch second (integer — engine-
    portable, same convention as windowed_counts)."""
    if window_minutes % slide_minutes:
        raise ValueError("slide_minutes must divide window_minutes")
    win = F.window("ts", f"{window_minutes} minutes",
                   f"{slide_minutes} minutes")
    return (
        _with_tz(events).groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(_cents(F.col("value"))).alias("sum_value_cents"),
        )
        .select(
            (F.unix_micros(F.col("w.start")) / _US_PER_SEC).cast("long")
            .alias("window_start"),
            "event_type", "n", "n_users", "sum_value_cents",
        )
    )


def props_k(events: DataFrame) -> DataFrame:
    """(event_id, event_type, k) — typed JSON field extraction from the
    props column."""
    return events.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


ASOF_REF_TYPE = "error"
INTERVAL_MINUTES = 15


def asof_last_ref(events: DataFrame, ref_type: str = ASOF_REF_TYPE) -> DataFrame:
    """As-of join: for every event, the most recent ``ref_type`` event
    of the SAME user at-or-before it (by ts; a reference at the exact
    same timestamp counts, so a reference event matches itself).

    -> (event_id, user_id, event_type, last_ref_id, us_since_ref)
    with the -1 sentinel in BOTH columns when the user has no
    reference yet (never NULL: a NULL floats the int64 column under a
    pandas conversion — the driver-hash contract all integer outputs
    follow).

    Implemented as the union-marker formulation — reference rows and
    probe rows are unioned with a marker and ONE window over ONE
    shuffle on user_id carries the latest reference forward via
    last(ignorenulls) — NOT a per-key loop, NOT a theta join (which
    Spark would plan as a broadcast-nested-loop at scale). Ordering is
    (us, is_probe, event_id): references sort before probes at the
    same microsecond (at-or-before includes ties) and among several
    same-microsecond references the largest event_id wins — a pinned,
    engine-portable tie rule.

    Scale: identical profile to sessionize — one hash partition on
    user_id, window streams within the partition; a power-law user is
    a straggler AQE can split, never a correctness problem.
    """
    e = _with_tz(events)
    us = F.unix_micros("ts")
    probe = e.select(
        "user_id", us.alias("us"), "event_id", "event_type",
        F.lit(1).alias("is_probe"),
        F.lit(None).cast("long").alias("ref_id"),
        F.lit(None).cast("long").alias("ref_us"),
    )
    ref = e.where(F.col("event_type") == ref_type).select(
        "user_id", us.alias("us"), "event_id", "event_type",
        F.lit(0).alias("is_probe"),
        F.col("event_id").alias("ref_id"),
        us.alias("ref_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "is_probe", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        probe.unionAll(ref)
        .withColumn("last_ref_id", F.last("ref_id", ignorenulls=True).over(w))
        .withColumn("last_ref_us", F.last("ref_us", ignorenulls=True).over(w))
        .where(F.col("is_probe") == 1)
        .select(
            "event_id", "user_id", "event_type",
            F.coalesce("last_ref_id", F.lit(-1).cast("long"))
            .alias("last_ref_id"),
            F.coalesce(F.col("us") - F.col("last_ref_us"),
                       F.lit(-1).cast("long")).alias("us_since_ref"),
        )
    )


def interval_events(events: DataFrame, ref_type: str = ASOF_REF_TYPE,
                    minutes: int = INTERVAL_MINUTES) -> DataFrame:
    """Bounded-length interval range join: every ``ref_type`` event
    opens a per-user interval [ts, ts + minutes); emit one row per
    (interval, event) pair where the event's ts falls inside an
    interval of the same user (the opener matches itself at offset 0;
    overlapping intervals each emit their own row).

    -> (interval_id, event_id, user_id, offset_us)

    This is the scalable RANGE-JOIN pattern: because interval length
    equals the bucket width, an interval overlaps AT MOST TWO tumbling
    time buckets, so expanding each interval to its covered buckets
    (explode of a <=2-element sequence) turns the range predicate into
    an EQUI-join on (user_id, bucket) plus a residual filter — one
    hash shuffle instead of the O(n^2) broadcast-nested-loop Spark
    plans for a raw theta join. A probe lands in exactly one bucket,
    so no dedup is needed.
    """
    e = _with_tz(events)
    us = F.unix_micros("ts")
    len_us = minutes * 60 * _US_PER_SEC
    ivl = (
        e.where(F.col("event_type") == ref_type)
        .select(
            F.col("event_id").alias("interval_id"), "user_id",
            us.alias("start_us"), (us + len_us).alias("end_us"),
        )
        .withColumn(
            "bucket",
            F.explode(F.sequence(
                F.expr(f"start_us DIV {len_us}"),
                F.expr(f"(end_us - 1) DIV {len_us}"),
            )),
        )
    )
    probe = e.select(
        "event_id", "user_id", us.alias("us"),
        F.expr(f"unix_micros(ts) DIV {len_us}").alias("bucket"),
    )
    return (
        probe.join(ivl, ["user_id", "bucket"])
        .where((F.col("us") >= F.col("start_us")) & (F.col("us") < F.col("end_us")))
        .select(
            "interval_id", "event_id", "user_id",
            (F.col("us") - F.col("start_us")).alias("offset_us"),
        )
    )


FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_progress(events: DataFrame,
                    steps: tuple[str, ...] = FUNNEL_STEPS) -> DataFrame:
    """Ordered-sequence funnel per user: t1 = first ``steps[0]`` event,
    t_i = first ``steps[i]`` event STRICTLY AFTER t_{i-1}. Emits one
    row per user who reached step 1: (user_id, t1_us…tK_us nullable,
    reached).

    ONE shuffle total: a running-min window per step flags each event
    with "the earliest completion time of the previous step before
    me" (rows-unbounded-preceding window over (user_id, ts, event_id)
    ordering), so step-i candidacy is a per-row predicate; the final
    groupBy(user_id) reuses the window's hash partitioning. This is
    the textbook funnel without per-user event-list materialization —
    state per user is K running minima, never the event list, so a
    power-law user is a straggler, not an OOM.

    Tie semantics are pinned: "after" is strict on the event's
    microsecond timestamp (equal-ts events cannot chain), matching the
    oracle bit-for-bit."""
    e = _with_tz(events).select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us"))
    w = (Window.partitionBy("user_id")
         .orderBy("us", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    prev_col = None
    cand_cols = []
    for i, step in enumerate(steps):
        if i == 0:
            cand = F.when(F.col("event_type") == step, F.col("us"))
        else:
            run_prev = F.min(prev_col).over(w)
            cand = F.when(
                (F.col("event_type") == step) & (F.col("us") > run_prev),
                F.col("us"))
        e = e.withColumn(f"_c{i}", cand)
        prev_col = F.col(f"_c{i}")
        cand_cols.append(f"_c{i}")
    aggs = [F.min(c).alias(f"t{i + 1}_us") for i, c in enumerate(cand_cols)]
    out = e.groupBy("user_id").agg(*aggs)
    reached = F.lit(0)
    for i in range(len(steps)):
        reached = F.when(F.col(f"t{i + 1}_us").isNotNull(), i + 1).otherwise(reached)
    return (out.withColumn("reached", reached.cast("int"))
            .where(F.col("t1_us").isNotNull()))


_US_PER_DAY = 86_400_000_000


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Day-granularity cohort retention — the standard product-analytics
    rollup: users are cohorted by their first active day; each
    (cohort_day, offset_days) cell counts how many of them were active
    again ``offset`` days later, with an exact round-half-up integer-ppm
    retention rate (n_active / n_cohort — no float division to drift
    between engines). Days are integer epoch-day buckets
    (unix_micros DIV us-per-day), so no date/timezone arithmetic exists
    to diverge either.

    Scale shape: one (user_id, day) dedup shuffle — after it each user
    contributes one row per active day, so the per-cell count is
    already a distinct-user count (no countDistinct state) — one
    user-sized min-aggregate, a user-keyed equi-join (both sides hash
    on user_id; AQE broadcasts the cohort side when small), and one
    partial-aggregated (cohort, offset) rollup whose result is bounded
    by days², independent of corpus size."""
    day = F.expr(f"unix_micros(ts) DIV {_US_PER_DAY}")
    days = (
        _with_tz(events)
        .select("user_id", day.alias("day"))
        .distinct()
        # feeds cohort, the activity join, and (via cohort) the size
        # aggregate: without the pin each branch re-scans the raw
        # events table — 3 full scans of the 100 TB input for a
        # users x days sized intermediate
        .localCheckpoint(eager=False)
    )
    cohort = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    act = (
        days.join(cohort, "user_id")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day"))
                 .cast("int").alias("offset_days"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    size = cohort.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("n_cohort"))
    return act.join(size, "cohort_day").select(
        "cohort_day", "offset_days", "n_active", "n_cohort",
        F.expr("(2 * n_active * 1000000 + n_cohort) DIV (2 * n_cohort)")
        .alias("retained_ppm"),
    )


ANOM_K = 3   # modified z-score style cutoff: |x - med| > K * MAD


def daily_anomalies(events: DataFrame, k: int = ANOM_K) -> DataFrame:
    """Robust per-type daily volume anomaly flags — the monitoring
    rollup over the event stream: counts per (event_type, epoch-day),
    scored against the type's median and MAD (median absolute
    deviation), both as LOWER NEAREST-RANK medians in pure integers —
    no interpolation, no float, so the DuckDB oracle is bit-exact.
    A day is anomalous when |n - med| > k·MAD, or when MAD is zero and
    the day deviates at all (the degenerate constant-series rule of
    the modified z-score).

    Scale shape: ONE corpus-scale shuffle (the partial-aggregated
    (event_type, day) count); everything after runs on the types×days
    table — two rank windows and two type-keyed joins AQE broadcasts.
    """
    day = F.expr(f"unix_micros(ts) DIV {_US_PER_DAY}")
    daily = (
        _with_tz(events)
        .groupBy("event_type", day.alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .localCheckpoint(eager=False)   # tiny; feeds both median passes
    )
    bytype = Window.partitionBy("event_type")

    def lower_median(df: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy(col, "day")
        return (
            df.withColumn("rn", F.row_number().over(w))
            .withColumn("cnt", F.count(F.lit(1)).over(bytype))
            .filter(F.expr("rn = (cnt + 1) DIV 2"))
            .select("event_type", F.col(col).alias(out))
        )

    med = lower_median(daily, "n_events", "med")
    d2 = (daily.join(med, "event_type")
          .withColumn("adev", F.abs(F.col("n_events") - F.col("med"))))
    mad = lower_median(d2, "adev", "mad")
    return (
        d2.join(mad, "event_type")
        .withColumn(
            "is_anomaly",
            ((F.col("mad") > 0) & (F.col("adev") > k * F.col("mad")))
            | ((F.col("mad") == 0) & (F.col("adev") > 0)),
        )
        .select("event_type", "day", "n_events", "med", "mad", "is_anomaly")
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """Per-user event-type Markov transition matrix -> (from_type,
    to_type, n_transitions, row_ppm): counts of chronologically
    adjacent event-type pairs within each user's stream, plus the
    exact round-down row-normalized share (ppm of all transitions
    leaving from_type). The first-order behavioral model product
    analytics builds (what follows a view? where do checkouts come
    from?) and the input to next-event prediction baselines; the
    funnel operator answers "did the ordered sequence happen",
    this answers "what are ALL the observed orderings".

    Ordering within a user is (ts, event_id) — a total key, so
    simultaneous events (same timestamp) pair deterministically at
    any parallelism and the DuckDB oracle matches bit-for-bit.

    Scale shape: ONE corpus-scale shuffle — the user_id window
    partition (same key and cost class as sessionize); the bigram
    collapse is a partial-aggregated groupBy whose output is bounded
    by types² regardless of corpus size, and the row totals attach
    via a types-sized broadcast join. Power-law users are stragglers
    inside a streaming window partition, not a blow-up.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        _with_tz(events)
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .select(F.col("event_type").alias("from_type"), "to_type")
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .localCheckpoint(eager=False)  # types²-sized; feeds two branches
    )
    totals = pairs.groupBy("from_type").agg(
        F.sum("n_transitions").alias("n_from"))
    return (
        pairs.join(totals, "from_type")
        .select(
            "from_type", "to_type", "n_transitions",
            F.expr("n_transitions * 1000000 div n_from").alias("row_ppm"),
        )
    )


def user_profiles(events: DataFrame) -> DataFrame:
    """Per-user behavioral feature table -> (user_id, n_events,
    n_active_days, n_types, top_type, first_us, last_us, span_days,
    value_cents_sum): the standard entity-feature rollup a
    personalization/abuse model consumes. top_type is the most
    frequent event type, ties broken lexicographically (min_by on a
    (-count, type) struct — the LPA vote pattern, partial-aggregated,
    so a power-law user is combined map-side, never a window
    partition). All integers: epoch-micros bounds, integer epoch-day
    activity counts, value summed as exact cents.

    Scale shape: TWO corpus-scale partial-agg shuffles (the (user,
    day) dedup and the (user, type) counts) + user-sized rollup joins
    — no windows anywhere."""
    ev = _with_tz(events)
    us = F.unix_micros(F.col("ts"))
    base = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(us).alias("first_us"),
        F.max(us).alias("last_us"),
        F.sum(_cents(F.col("value"))).alias("value_cents_sum"),
    )
    days = (
        ev.select("user_id", F.expr(f"unix_micros(ts) DIV {_US_PER_DAY}")
                  .alias("day")).distinct()
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n_active_days"))
    )
    types = (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.min_by(
                "event_type",
                F.struct((-F.col("n")).alias("nn"),
                         F.col("event_type").alias("t"))).alias("top_type"),
        )
    )
    return (
        base.join(days, "user_id").join(types, "user_id")
        .select(
            "user_id", "n_events", "n_active_days", "n_types", "top_type",
            "first_us", "last_us",
            F.expr(f"(last_us - first_us) DIV {_US_PER_DAY}").alias("span_days"),
            "value_cents_sum",
        )
    )


WAU_WINDOW_DAYS = 7


def active_users(events: DataFrame,
                 window_days: int = WAU_WINDOW_DAYS) -> DataFrame:
    """(day, dau, wau, stickiness_ppm) — rolling engagement: for each
    ACTIVE epoch day, the distinct users active that day (DAU), the
    distinct users active in the trailing ``window_days`` window
    ending that day (WAU), and the exact round-down integer-ppm
    DAU/WAU stickiness ratio — the standard product-engagement rollup
    (no float division, no date/timezone arithmetic: integer epoch-day
    buckets like retention_cohorts).

    Scale shape: one (user_id, day) dedup shuffle; after it each user
    contributes one row per active day, so DAU is a plain count. The
    rolling side maps each (user, day) to the ``window_days`` window
    END days it supports (a bounded explode, x7 on user-days — NOT on
    events) and counts distinct users per end day; that is the one
    countDistinct in the module and its state per group is bounded by
    the window's active users. Output is bounded by distinct active
    days, independent of corpus size. Days with zero activity emit
    nothing (inner join on the DAU side), so trailing ghost windows
    past the data's end never appear."""
    ud = (
        _with_tz(events)
        .select("user_id",
                F.expr(f"unix_micros(ts) DIV {_US_PER_DAY}").alias("day"))
        .distinct()
        # feeds both the DAU count and the window expansion
        .localCheckpoint(eager=False)
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    wau = (
        ud.select(
            "user_id",
            F.explode(F.sequence(
                F.col("day"),
                F.col("day") + F.lit(window_days - 1))).alias("day"))
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return dau.join(wau, "day").select(
        "day", "dau", "wau",
        # wau >= dau >= 1 on every emitted day, so never div-by-zero
        F.expr("(1000000 * dau) DIV wau").alias("stickiness_ppm"),
    )


AFFINITY_MIN_SESSIONS = 2


def type_affinity(events: DataFrame,
                  gap_minutes: int = SESSION_GAP_MINUTES,
                  min_sessions: int = AFFINITY_MIN_SESSIONS) -> DataFrame:
    """Event-type affinity -> (ta, tb, n_sessions, n_a, n_b,
    dice_ppm): which event types co-occur within the same user
    session, scored by the exact-integer Dice coefficient
    2*n_ab/(n_a + n_b) over session support — transitions capture
    ADJACENT pairs, this captures same-intent co-membership at any
    distance inside the session (the market-basket view of the event
    stream, types as items, sessions as baskets). A min-session floor
    drops singleton noise; the marginals stop merely-frequent types
    from out-ranking genuinely affine ones (the collocations/
    assoc_dice rationale, same round-half-up ppm arithmetic).

    Scale shape: sessionize's ONE user-window shuffle, a
    (user, session, type) dedup shuffle, a within-session type
    self-join whose fan-out is bounded by the TYPE VOCABULARY per
    session (not session length), and type²-bounded aggregates with
    AQE-broadcastable marginal joins."""
    st = (
        sessionize(events, gap_minutes)
        .select("user_id", "session_idx", "event_type")
        .distinct()
        .localCheckpoint(eager=False)   # pairs + marginals, one lineage
    )
    marg = st.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_e"))
    l = st.select("user_id", "session_idx",
                  F.col("event_type").alias("ta"))
    r = st.select("user_id", "session_idx",
                  F.col("event_type").alias("tb"))
    pairs = (
        l.join(r, ["user_id", "session_idx"])
        .where(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .where(F.col("n_sessions") >= min_sessions)
    )
    ma = marg.select(F.col("event_type").alias("ta"),
                     F.col("n_e").alias("n_a"))
    mb = marg.select(F.col("event_type").alias("tb"),
                     F.col("n_e").alias("n_b"))
    return (
        pairs.join(ma, "ta").join(mb, "tb")
        .select(
            "ta", "tb", "n_sessions", "n_a", "n_b",
            F.expr("(2 * (2 * n_sessions) * 1000000 + (n_a + n_b))"
                   " DIV (2 * (n_a + n_b))").alias("dice_ppm"),
        )
    )


VQ_K = 256          # sample size per type (stderr ~ sqrt(p(1-p)/k))
VQ_SALTS = 32       # first-level top-k fan-out
VQ_PCTS = (50, 90, 99)


def value_quantiles(events: DataFrame, k: int = VQ_K,
                    salts: int = VQ_SALTS,
                    pcts: tuple = VQ_PCTS) -> DataFrame:
    """Per-event-type value quantile sketch -> (event_type, n_events,
    n_sample, min_cents, max_cents, p50, p90, p99): the grouped twin
    of textstats.sampled_quantiles — deterministic bottom-k-by-
    md5h60(event_id) sampling (value-independent, so uniform), then
    NEAREST-RANK integer-cents quantiles over the sample; exact
    n/min/max come from a map-side partial pass. Every output is an
    integer — no quantile interpolation to drift between engines.
    This is the revenue/latency distribution readout per event class
    (medians and tails that plain avg aggregates hide).

    Scale shape: the value column never shuffles at occurrence scale —
    exact aggregates are partial, and the sample uses the salted
    two-level top-k (per-(type, h%salts) row_number, then a final
    window over <= salts*k survivors), so a hot event type spreads
    over ``salts`` external sorts and two-level == global bottom-k at
    any parallelism. Windows order by (h, cents): deterministic under
    hash ties."""
    from openie_spark.datapipe.hashing import md5h60

    stats = events.select(
        "event_type",
        _cents(F.col("value")).alias("cents"),
        md5h60(F.col("event_id").cast("string")).alias("h"),
    )
    exact = stats.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
    )
    d = stats.withColumn("salt", F.pmod(F.col("h"), F.lit(salts)))
    w1 = Window.partitionBy("event_type", "salt").orderBy("h", "cents")
    w2 = Window.partitionBy("event_type").orderBy("h", "cents")
    kept = (
        d.withColumn("r", F.row_number().over(w1)).filter(F.col("r") <= k)
        .select("event_type", "cents", "h")
        .withColumn("r", F.row_number().over(w2)).filter(F.col("r") <= k)
    )
    samp = kept.groupBy("event_type").agg(
        F.count("*").cast("int").alias("n_sample"),
        F.sort_array(F.collect_list(F.struct("cents", "h"))).alias("vals"),
    )
    out = samp.join(exact, "event_type")
    for p in pcts:
        out = out.withColumn(
            f"p{p}",
            F.element_at(
                "vals", F.expr(f"CAST((n_sample * {p} + 99) DIV 100 AS INT)")
            )["cents"],
        )
    return out.select("event_type", "n_events", "n_sample",
                      "min_cents", "max_cents",
                      *[f"p{p}" for p in pcts])


TRIGRAM_MIN_COUNT = 2   # singleton trigrams are noise at any scale


def event_trigrams(events: DataFrame,
                   min_count: int = TRIGRAM_MIN_COUNT) -> DataFrame:
    """Per-user event-type trigram mining -> (t1, t2, t3, n_occurrences,
    n_users): counts of chronologically adjacent type TRIPLES within
    each user's stream — the order-3 extension of event_transitions
    (the first-order matrix answers "what follows a view?"; this
    answers "what three-step paths actually happen", the sequential-
    pattern table funnel design and anomalous-flow detection read).
    n_users is the distinct-user support, the classic
    sequential-pattern-mining support axis (GSP, Srikant & Agrawal
    1996) that separates one power-user's loop from a common path.

    Ordering within a user is (ts, event_id) — a total key, so
    simultaneous events chain deterministically at any parallelism
    and the DuckDB oracle matches bit-for-bit.

    Scale shape: ONE corpus-scale shuffle (the user_id window
    partition, same key and cost class as event_transitions — the two
    leads ride the same window); the trigram collapse is a partial-
    aggregated groupBy bounded by types³ with countDistinct state
    bounded by the users actually exhibiting the path. The min-count
    floor drops the singleton tail."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _with_tz(events)
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("t2", F.lead("event_type", 1).over(w))
        .withColumn("t3", F.lead("event_type", 2).over(w))
        .filter(F.col("t3").isNotNull())
        .select(F.col("event_type").alias("t1"), "t2", "t3", "user_id")
        .groupBy("t1", "t2", "t3")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .where(F.col("n_occurrences") >= min_count)
    )


def hourly_profile(events: DataFrame) -> DataFrame:
    """Hour-of-day activity profile -> (hour, event_type, n, n_users,
    share_ppm): event counts and distinct-user reach per UTC
    hour-of-day x type, plus each hour's exact round-half-up ppm share
    of its type's total — the diurnal-seasonality readout capacity
    planning and anomaly baselining consume (daily_anomalies flags
    day-level outliers; this is the within-day shape they are read
    against). hour = (epoch_us DIV 3600e6) mod 24: pure integer
    arithmetic on the pinned-UTC timestamp, no calendar functions to
    diverge between engines.

    Scale shape: ONE partial-aggregated groupBy bounded by 24 x types
    (countDistinct state bounded by the users active in that cell);
    type totals attach via a types-sized broadcast join."""
    cells = (
        _with_tz(events)
        .withColumn("hour", F.expr(
            f"(unix_micros(ts) DIV {3600 * _US_PER_SEC}) % 24").cast("int"))
        .groupBy("hour", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .localCheckpoint(eager=False)   # 24·types rows; feeds two branches
    )
    totals = cells.groupBy("event_type").agg(F.sum("n").alias("n_type"))
    return (
        cells.join(totals, "event_type")
        .select(
            "hour", "event_type", "n", "n_users",
            F.expr("(2 * n * 1000000 + n_type) DIV (2 * n_type)")
            .alias("share_ppm"),
        )
    )


def gap_histogram(events: DataFrame) -> DataFrame:
    """Inter-event gap profile -> (bin, n_gaps, min_sec, max_sec,
    sum_sec): per-user chronologically adjacent gaps in integer
    seconds, log2-binned by bit length (zero-second gaps in bin 0) —
    the empirical evidence behind a sessionization gap threshold: the
    'valley' between the within-session bins and the between-session
    tail is where SESSION_GAP_MINUTES should sit, per corpus, not by
    folklore. <= 64 rows at any corpus size.

    Scale shape: the same ONE user_id window shuffle as sessionize,
    then a <= 64-group partial-agg collapse."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return (
        _with_tz(events)
        .select("user_id", "ts", "event_id")
        .withColumn("gap_us", us - F.lag(us).over(w))
        # pure integer division (gaps are non-negative under the window
        # order, so DIV == floor): bit-exact vs the DuckDB '//' twin at
        # any gap magnitude — no double intermediate
        .withColumn("gap_sec", F.expr(f"gap_us DIV {_US_PER_SEC}"))
        .where(F.col("gap_sec").isNotNull())
        .withColumn("bin", F.when(F.col("gap_sec") == 0, 0)
                    .otherwise(F.length(F.bin("gap_sec"))).cast("int"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("gap_sec").alias("min_sec"),
            F.max("gap_sec").alias("max_sec"),
            F.sum("gap_sec").alias("sum_sec"),
        )
    )


def growth_accounting(events: DataFrame) -> DataFrame:
    """Daily growth accounting -> (day, n_active, n_new, n_retained,
    n_resurrected): the standard user-lifecycle decomposition (every
    active user on day D is exactly one of: first-ever seen = new,
    active on D-1 = retained, gap > 1 day = resurrected). Churn for
    day D reads off the same table as n_active(D-1) - n_retained(D) —
    no extra column needed. Integer epoch-day buckets; engine-exact.

    Scale shape: one (user, day) dedup shuffle (the active_users
    shape), ONE user window for the previous-active-day lag, then a
    day-bounded rollup. No corpus-scale joins."""
    ud = (
        _with_tz(events)
        .select("user_id", F.expr(
            f"unix_micros(ts) DIV {86400 * _US_PER_SEC}").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    flagged = (
        ud.withColumn("prev_day", F.lag("day").over(w))
        .select(
            "day",
            F.when(F.col("prev_day").isNull(), 1).otherwise(0).alias("is_new"),
            F.when(F.col("prev_day") == F.col("day") - 1, 1)
            .otherwise(0).alias("is_retained"),
            F.when(F.col("prev_day").isNotNull()
                   & (F.col("prev_day") < F.col("day") - 1), 1)
            .otherwise(0).alias("is_resurrected"),
        )
    )
    return (
        flagged.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum("is_new").alias("n_new"),
            F.sum("is_retained").alias("n_retained"),
            F.sum("is_resurrected").alias("n_resurrected"),
        )
    )
