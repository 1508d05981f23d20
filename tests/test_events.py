"""Temporal operators over the events table (datapipe/events.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def ev(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: three events, 10-min gaps -> one session
        (0, t0, 1, "click", 1.00, '{"k": 1}'),
        (1, t0 + dt.timedelta(minutes=10), 1, "view", 2.50, '{"k": 2}'),
        (2, t0 + dt.timedelta(minutes=20), 1, "click", 0.25, '{"k": 3}'),
        # user 1: 31-min gap -> new session
        (3, t0 + dt.timedelta(minutes=51), 1, "error", 4.00, '{"k": 4}'),
        # user 2: exact-30-min gap is NOT a break (> is strict)
        (4, t0, 2, "view", 1.10, '{"k": 5}'),
        (5, t0 + dt.timedelta(minutes=30), 2, "view", 2.20, '{"k": 6}'),
        # user 2: same-timestamp tie -> event_id order, still same session
        (6, t0 + dt.timedelta(minutes=30), 2, "click", 3.30, '{"k": 7}'),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")


def test_sessionize_boundaries(ev):
    from openie_spark.datapipe.events import sessionize

    got = {r.event_id: r.session_idx for r in sessionize(ev).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 0, 5: 0, 6: 0}


def test_session_stats(ev):
    from openie_spark.datapipe.events import session_stats

    rows = {(r.user_id, r.session_idx): r for r in session_stats(ev).collect()}
    s = rows[(1, 0)]
    assert s.n_events == 3 and s.duration_sec == 1200
    assert s.sum_value_cents == 375
    assert rows[(1, 1)].n_events == 1 and rows[(1, 1)].duration_sec == 0
    s2 = rows[(2, 0)]
    assert s2.n_events == 3 and s2.duration_sec == 1800
    assert s2.sum_value_cents == 660


def test_session_window_stats_boundaries(ev):
    """Native F.session_window merge: boundary semantics match
    sessionize's strict > — the fixture's user 2 pins that an
    EXACT-30-min gap still merges (verified engine behavior)."""
    from openie_spark.datapipe.events import session_window_stats

    epoch0 = 1704067200  # 2024-01-01 00:00:00 UTC
    got = {(r.user_id, r.t_start): (r.t_end, r.n_events, r.sum_value_cents)
           for r in session_window_stats(ev).collect()}
    assert got == {
        (1, epoch0): (epoch0 + 1200, 3, 375),          # events 0-2
        (1, epoch0 + 3060): (epoch0 + 3060, 1, 400),   # event 3 (min 51)
        (2, epoch0): (epoch0 + 1800, 3, 660),          # exact gap merges
    }


def test_windowed_counts(ev):
    from openie_spark.datapipe.events import windowed_counts

    got = {(r.bucket_start, r.event_type): (r.n, r.sum_value_cents)
           for r in windowed_counts(ev).collect()}
    epoch0 = 1704067200  # 2024-01-01 00:00:00 UTC
    assert got[(epoch0, "click")] == (1, 100)         # event 0
    assert got[(epoch0, "view")] == (1, 110)          # event 4
    assert got[(epoch0 + 600, "view")] == (1, 250)    # event 1 (min 10)
    assert got[(epoch0 + 1800, "view")] == (1, 220)   # event 5 (min 30)
    assert got[(epoch0 + 1800, "click")] == (1, 330)  # event 6
    assert got[(epoch0 + 3000, "error")] == (1, 400)  # event 3 (min 51)


def test_sliding_counts(ev):
    """Sliding 20-min/5-min windows: exhaustive python twin (every
    event lands in exactly L/S = 4 slide-aligned windows) plus
    hand-checked overlap cells."""
    from openie_spark.datapipe.events import sliding_counts

    L_div_S, S = 4, 300
    exp = {}
    for r in ev.collect():
        t = int(r.ts.replace(tzinfo=dt.timezone.utc).timestamp())
        for k in range(L_div_S):
            ws = (t // S - k) * S
            n, users, cents = exp.get((ws, r.event_type), (0, set(), 0))
            exp[(ws, r.event_type)] = (
                n + 1, users | {r.user_id}, cents + round(r.value * 100))
    expected = {k: (n, len(u), c) for k, (n, u, c) in exp.items()}

    got = {(r.window_start, r.event_type): (r.n, r.n_users, r.sum_value_cents)
           for r in sliding_counts(ev).collect()}
    assert got == expected and expected
    epoch0 = 1704067200
    # window [15, 35): clicks at min 20 (user 1, 25c) and min 30
    # (user 2, 330c) — the cross-user overlap cell
    assert got[(epoch0 + 900, "click")] == (2, 2, 355)
    assert got[(epoch0 + 1800, "view")] == (1, 1, 220)

    with pytest.raises(ValueError):
        sliding_counts(ev, window_minutes=20, slide_minutes=7)


def test_props_k(ev):
    from openie_spark.datapipe.events import props_k

    got = {r.event_id: r.k for r in props_k(ev).collect()}
    assert got == {i: i + 1 for i in range(7)}


# ---------------------------------------------------- as-of / range join

@pytest.fixture(scope="module")
def ev_asof(spark):
    """Edge-case fixture: ties at the same microsecond, users with no
    reference, a reference matching itself, multiple same-ts refs."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: error at t+5; events straddling it
        (0, t0, 1, "view", 1.0, "{}"),
        (1, t0 + 5 * m, 1, "error", 1.0, "{}"),      # matches itself
        (2, t0 + 5 * m, 1, "click", 1.0, "{}"),      # same-ts tie: error counts
        (3, t0 + 9 * m, 1, "view", 1.0, "{}"),
        # user 2: no errors at all
        (4, t0, 2, "view", 1.0, "{}"),
        # user 3: two errors at the SAME microsecond -> larger id wins
        (5, t0, 3, "error", 1.0, "{}"),
        (6, t0, 3, "error", 1.0, "{}"),
        (7, t0 + 20 * m, 3, "view", 1.0, "{}"),      # beyond the 15-min interval
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")


def test_asof_last_ref_edges(ev_asof):
    from openie_spark.datapipe.events import asof_last_ref

    got = {r.event_id: (r.last_ref_id, r.us_since_ref)
           for r in asof_last_ref(ev_asof).collect()}
    assert got[0] == (-1, -1)               # before any error (sentinel)
    assert got[1] == (1, 0)                 # an error matches itself
    assert got[2] == (1, 0)                 # same-ts tie includes the ref
    assert got[3] == (1, 4 * 60_000_000)
    assert got[4] == (-1, -1)               # user with no refs (sentinel)
    assert got[5] == (6, 0)                 # same-ts refs: max event_id wins
    assert got[6] == (6, 0)
    assert got[7] == (6, 20 * 60_000_000)


def test_interval_events_boundaries(ev_asof):
    from openie_spark.datapipe.events import interval_events

    got = {(r.interval_id, r.event_id): r.offset_us
           for r in interval_events(ev_asof).collect()}
    # user 1: error 1 opens [t+5, t+20); events 1, 2, 3 fall inside,
    # event 0 is before it
    assert got == {
        (1, 1): 0, (1, 2): 0, (1, 3): 4 * 60_000_000,
        # user 3: both same-ts errors open overlapping intervals; each
        # contains both openers; event 7 at exactly +20 min is OUTSIDE
        # the 15-min interval (end-exclusive)
        (5, 5): 0, (5, 6): 0, (6, 5): 0, (6, 6): 0,
    }


def test_interval_events_matches_naive_theta_join(spark):
    """Randomized parity: the bucketed equi-join must equal the naive
    range predicate (incl. intervals spanning two buckets and events
    landing exactly on bucket edges)."""
    import random

    from openie_spark.datapipe.events import INTERVAL_MINUTES, interval_events

    rng = random.Random(7)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(400):
        # second-resolution offsets up to 2h; ~1/6 errors
        ts = t0 + dt.timedelta(seconds=rng.randrange(7200))
        rows.append((i, ts, rng.randrange(5),
                     "error" if rng.random() < 1 / 6 else "view", 1.0, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    got = {(r.interval_id, r.event_id): r.offset_us
           for r in interval_events(ev).collect()}
    len_us = INTERVAL_MINUTES * 60 * 1_000_000
    us = {i: int(ts.timestamp() * 1_000_000) for i, ts, *_ in rows}
    want = {
        (r[0], e[0]): us[e[0]] - us[r[0]]
        for r in rows if r[3] == "error"
        for e in rows
        if e[2] == r[2] and us[r[0]] <= us[e[0]] < us[r[0]] + len_us
    }
    assert got == want


def test_asof_matches_duckdb_oracle(ev_asof, spark):
    """The registered oracle SQL (plans/datapipe_oracles.asof_last_ref_sql)
    reproduces the Spark output on the edge-case fixture."""
    import duckdb

    from openie_spark.datapipe.events import asof_last_ref
    from openie_spark.plans.datapipe_oracles import asof_last_ref_sql

    pdf = ev_asof.toPandas()
    con = duckdb.connect()
    con.register("events", pdf)
    want = {
        (r.event_id): (r.last_ref_id, r.us_since_ref)
        for r in con.sql(asof_last_ref_sql()).df().itertuples()
    }
    got = asof_last_ref(ev_asof).toPandas()
    for row in got.itertuples():
        w = want[row.event_id]
        g = (None if row.last_ref_id != row.last_ref_id or row.last_ref_id is None
             else int(row.last_ref_id),
             None if row.us_since_ref != row.us_since_ref or row.us_since_ref is None
             else int(row.us_since_ref))
        w = tuple(None if x != x or x is None else int(x) for x in w)
        assert g == w, (row.event_id, g, w)


def test_funnel_progress_hand_values(spark):
    """Sequential funnel semantics: each step must be STRICTLY after
    the previous step's earliest completion; same-ts events cannot
    chain; users with no step-1 event emit nothing."""
    import datetime as dt

    from openie_spark.datapipe.events import funnel_progress

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        # user 1: full funnel in order
        (0, at(0), 1, "view", 0.0, "{}"),
        (1, at(1), 1, "click", 0.0, "{}"),
        (2, at(2), 1, "purchase", 0.0, "{}"),
        # user 2: click precedes the only view; purchase after view but
        # no click-after-view -> reached 1
        (3, at(0), 2, "click", 0.0, "{}"),
        (4, at(1), 2, "view", 0.0, "{}"),
        (5, at(2), 2, "purchase", 0.0, "{}"),
        # user 3: clicks only -> filtered out entirely
        (6, at(0), 3, "click", 0.0, "{}"),
        # user 4: view and click share a timestamp -> strict 'after'
        # rejects the chain
        (7, at(0), 4, "view", 0.0, "{}"),
        (8, at(0), 4, "click", 0.0, "{}"),
        # user 5: view, click, purchase-before-click, purchase-after
        (9, at(0), 5, "view", 0.0, "{}"),
        (10, at(1), 5, "purchase", 0.0, "{}"),
        (11, at(2), 5, "click", 0.0, "{}"),
        (12, at(3), 5, "purchase", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    got = {r.user_id: r for r in funnel_progress(ev).collect()}
    us = lambda m: int(at(m).timestamp() * 1_000_000)  # noqa: E731
    assert set(got) == {1, 2, 4, 5}
    assert (got[1].t1_us, got[1].t2_us, got[1].t3_us, got[1].reached) == \
        (us(0), us(1), us(2), 3)
    assert (got[2].t1_us, got[2].t2_us, got[2].reached) == (us(1), None, 1)
    assert (got[4].t2_us, got[4].reached) == (None, 1)
    assert (got[5].t2_us, got[5].t3_us, got[5].reached) == (us(2), us(3), 3)


def test_retention_cohorts_hand_golden(spark):
    """Two cohorts, same-day dedup, exact-ppm halves."""
    from openie_spark.datapipe.events import retention_cohorts

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    d = dt.timedelta(days=1)
    rows = [
        # u1: first day 0 (two events same day -> dedup), then 1, 3
        (0, t0, 1, "view", 0.0, "{}"),
        (1, t0 + dt.timedelta(hours=3), 1, "click", 0.0, "{}"),
        (2, t0 + d, 1, "view", 0.0, "{}"),
        (3, t0 + 3 * d, 1, "view", 0.0, "{}"),
        # u2: day 0 only
        (4, t0, 2, "view", 0.0, "{}"),
        # u3: first day 1, then 2
        (5, t0 + d, 3, "view", 0.0, "{}"),
        (6, t0 + 2 * d, 3, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    base = dt.date(2024, 1, 1).toordinal() - dt.date(1970, 1, 1).toordinal()
    got = {(r.cohort_day - base, r.offset_days):
           (r.n_active, r.n_cohort, r.retained_ppm)
           for r in retention_cohorts(df).collect()}
    assert got == {
        (0, 0): (2, 2, 1000000),
        (0, 1): (1, 2, 500000),
        (0, 3): (1, 2, 500000),
        (1, 0): (1, 1, 1000000),
        (1, 1): (1, 1, 1000000),
    }


def test_retention_partition_invariance(spark, ev):
    from openie_spark.datapipe.events import retention_cohorts

    a = sorted(tuple(r) for r in retention_cohorts(ev).collect())
    b = sorted(tuple(r) for r in retention_cohorts(ev.repartition(5)).collect())
    assert a == b and a


def test_daily_anomalies_hand_golden(spark):
    """Type A: 5 quiet days (1/day) + one 10x spike -> only the spike
    flags. Type B: constant series, MAD=0 -> any deviation flags."""
    from openie_spark.datapipe.events import daily_anomalies

    t0 = dt.datetime(2024, 1, 1, 6, 0, 0)
    d = dt.timedelta(days=1)
    rows = []
    eid = 0
    for i in range(5):                 # A: one event/day, days 0-4
        rows.append((eid, t0 + i * d, 1, "A", 0.0, "{}")); eid += 1
    for j in range(10):                # A: 10 events on day 5
        rows.append((eid, t0 + 5 * d + dt.timedelta(minutes=j), 1, "A", 0.0, "{}")); eid += 1
    for i in range(4):                 # B: 2/day, days 0-3
        rows.append((eid, t0 + i * d, 2, "B", 0.0, "{}")); eid += 1
        rows.append((eid + 100, t0 + i * d + dt.timedelta(hours=1), 2, "B", 0.0, "{}")); eid += 1
    rows.append((999, t0 + 4 * d, 2, "B", 0.0, "{}"))   # B: 1 on day 4
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    base = dt.date(2024, 1, 1).toordinal() - dt.date(1970, 1, 1).toordinal()
    got = {(r.event_type, r.day - base): (r.n_events, r.med, r.mad, r.is_anomaly)
           for r in daily_anomalies(df).collect()}
    # A: sorted counts (1,1,1,1,1,10): lower median = 1, adevs
    # (0,0,0,0,0,9): MAD = 0 -> spike flags via the degenerate rule
    assert got[("A", 5)] == (10, 1, 0, True)
    assert all(got[("A", i)] == (1, 1, 0, False) for i in range(5))
    # B: counts (1,2,2,2,2): median 2, adevs (0,0,0,0,1): MAD 0 ->
    # the 1-event day deviates and flags
    assert got[("B", 4)] == (1, 2, 0, True)
    assert all(got[("B", i)] == (2, 2, 0, False) for i in range(4))


def test_daily_anomalies_mad_cutoff(spark):
    """Non-degenerate MAD: spread series where only > k*MAD flags."""
    from openie_spark.datapipe.events import daily_anomalies

    t0 = dt.datetime(2024, 1, 1, 6, 0, 0)
    d = dt.timedelta(days=1)
    # counts per day: 1,2,3,4,5,30 -> lower median 3 (n=6, rank 3),
    # adevs 2,1,0,1,2,27 sorted 0,1,1,2,2,27 -> MAD (rank 3) = 1
    # flag iff adev > 3*1: only the 30-count day (adev 27)
    rows, eid = [], 0
    for day, n in enumerate([1, 2, 3, 4, 5, 30]):
        for j in range(n):
            rows.append((eid, t0 + day * d + dt.timedelta(minutes=j),
                         1, "C", 0.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    got = {r.n_events: r.is_anomaly for r in daily_anomalies(df).collect()}
    assert got == {1: False, 2: False, 3: False, 4: False, 5: False, 30: True}


def test_event_transitions_hand_golden(spark):
    """Two users: bigrams stay within a user, simultaneous events
    order by event_id, ppm is exact round-down."""
    from openie_spark.datapipe.events import event_transitions

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = [
        # u1: view -> click -> view   (same-ts pair ordered by id)
        (10, t0, 1, "view", 0.0, "{}"),
        (11, t0, 1, "click", 0.0, "{}"),
        (12, t0 + s, 1, "view", 0.0, "{}"),
        # u2: view -> purchase ; no cross-user (click->view) bigram
        (20, t0, 2, "view", 0.0, "{}"),
        (21, t0 + s, 2, "purchase", 0.0, "{}"),
        # u3: single event -> contributes nothing
        (30, t0, 3, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    got = {(r.from_type, r.to_type): (r.n_transitions, r.row_ppm)
           for r in event_transitions(df).collect()}
    assert got == {
        ("view", "click"): (1, 500_000),
        ("view", "purchase"): (1, 500_000),
        ("click", "view"): (1, 1_000_000),
    }


def test_event_transitions_partition_invariance(spark, ev):
    from openie_spark.datapipe.events import event_transitions

    a = sorted(tuple(r) for r in event_transitions(ev).collect())
    b = sorted(tuple(r) for r in event_transitions(ev.repartition(13)).collect())
    assert a == b and len(a) > 0
    # row shares of each from_type sum to <= 1e6 (round-down), > 0 each
    from collections import defaultdict
    tot = defaultdict(int)
    for ft, _tt, n, ppm in a:
        assert n > 0 and ppm > 0
        tot[ft] += ppm
    assert all(v <= 1_000_000 for v in tot.values())


def test_user_profiles_hand_golden(spark):
    from openie_spark.datapipe.events import user_profiles

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    d = dt.timedelta(days=1)
    rows = [
        (0, t0, 1, "view", 1.25, "{}"),
        (1, t0 + d, 1, "view", 0.50, "{}"),
        (2, t0 + d, 1, "click", 0.00, "{}"),   # view 2 > click 1
        (3, t0 + 2 * d, 1, "click", 0.25, "{}"),  # tie 2-2 -> 'click' wins lexicographically? no: counts 2-2, min type
        (4, t0, 2, "view", 10.00, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    got = {r.user_id: r.asDict() for r in user_profiles(df).collect()}
    u1 = got[1]
    assert (u1["n_events"], u1["n_active_days"], u1["n_types"]) == (4, 3, 2)
    assert u1["top_type"] == "click"     # 2-2 tie -> lexicographic min
    assert u1["span_days"] == 2
    assert u1["value_cents_sum"] == 200
    u2 = got[2]
    assert (u2["n_events"], u2["n_active_days"], u2["top_type"],
            u2["span_days"], u2["value_cents_sum"]) == (1, 1, "view", 0, 1000)


def test_user_profiles_partition_invariance(spark, ev):
    from openie_spark.datapipe.events import user_profiles

    a = sorted(tuple(r) for r in user_profiles(ev).collect())
    b = sorted(tuple(r) for r in user_profiles(ev.repartition(11)).collect())
    assert a == b and len(a) > 0


def test_active_users_hand_and_window(spark):
    """u1 active days 0 and 2, u2 day 0, u3 day 8: only ACTIVE days
    emit; day 2's trailing-7 window reaches back to u2 (and counts u1
    once despite two active days); day 8's window still sees day 2 but
    not day 0."""
    from openie_spark.datapipe.events import active_users

    d0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def at(days, user, eid):
        return (eid, d0 + dt.timedelta(days=days), user, "view", 1.0, "{}")

    ev = spark.createDataFrame(
        [at(0, 1, 0), at(0, 1, 1), at(2, 1, 2), at(0, 2, 3), at(8, 3, 4)],
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string")
    day0 = (int(d0.replace(tzinfo=dt.timezone.utc).timestamp())
            // 86400)
    got = {r.day: (r.dau, r.wau, r.stickiness_ppm)
           for r in active_users(ev).collect()}
    assert got == {
        day0: (2, 2, 1_000_000),
        day0 + 2: (1, 2, 500_000),
        day0 + 8: (1, 2, 500_000),
    }


def test_active_users_random_python_twin(spark):
    import random

    from openie_spark.datapipe.events import active_users

    rnd = random.Random(82)
    d0 = dt.datetime(2024, 3, 1)
    rows = [
        (i, d0 + dt.timedelta(days=rnd.randrange(20),
                              hours=rnd.randrange(24)),
         rnd.randrange(8), "view", 1.0, "{}")
        for i in range(120)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    ud = {(r[2], int(r[1].replace(tzinfo=dt.timezone.utc).timestamp())
           // 86400) for r in rows}
    days = sorted({d for _, d in ud})
    expected = {}
    for d in days:
        dau = {u for u, ad in ud if ad == d}
        wau = {u for u, ad in ud if d - 6 <= ad <= d}
        expected[d] = (len(dau), len(wau), 1_000_000 * len(dau) // len(wau))

    got = {r.day: (r.dau, r.wau, r.stickiness_ppm)
           for r in active_users(ev).collect()}
    assert got == expected and len(expected) > 5

    again = {r.day: (r.dau, r.wau, r.stickiness_ppm)
             for r in active_users(ev.repartition(9)).collect()}
    assert again == expected


def test_type_affinity_hand_golden(spark):
    """u1 has two sessions {click,view,error}+{click,view}; u2 one
    session {click,view}: (click,view) in 3 sessions; error pairs
    appear once each -> dropped by the min-session floor; marginals
    count SESSIONS (click in 3, view in 3, dice = 2*3/(3+3) = 1e6)."""
    from openie_spark.datapipe.events import type_affinity

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (0, t0, 1, "click", 1.0, "{}"),
        (1, t0 + dt.timedelta(minutes=5), 1, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=10), 1, "error", 1.0, "{}"),
        # 31-min gap -> u1 session 2
        (3, t0 + dt.timedelta(minutes=41), 1, "click", 1.0, "{}"),
        (4, t0 + dt.timedelta(minutes=45), 1, "view", 1.0, "{}"),
        (5, t0, 2, "view", 1.0, "{}"),
        (6, t0 + dt.timedelta(minutes=3), 2, "click", 1.0, "{}"),
        (7, t0 + dt.timedelta(minutes=4), 2, "click", 1.0, "{}"),  # dup type
    ]
    ev2 = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    got = {(r.ta, r.tb): (r.n_sessions, r.n_a, r.n_b, r.dice_ppm)
           for r in type_affinity(ev2).collect()}
    assert got == {("click", "view"): (3, 3, 3, 1_000_000)}
    # floor off: the error pairs surface with session support 1
    loose = {(r.ta, r.tb): r.n_sessions
             for r in type_affinity(ev2, min_sessions=1).collect()}
    assert loose[("click", "error")] == 1 and loose[("error", "view")] == 1


def test_value_quantiles_python_twin(ev):
    """Sample = whole corpus when n < k: nearest-rank quantiles over
    (cents, h)-sorted values must match an independent python
    recompute (incl. md5h60 tie order and exact n/min/max)."""
    import hashlib

    from openie_spark.datapipe.events import VQ_PCTS, value_quantiles

    def h60(x):
        return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)

    rows = ev.collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(
            (round(r.value * 100), h60(r.event_id)))
    expected = {}
    for t, vals in by_type.items():
        vals.sort()
        n = len(vals)
        picks = tuple(vals[(n * p + 99) // 100 - 1][0] for p in VQ_PCTS)
        expected[t] = (n, n, min(v for v, _ in vals),
                       max(v for v, _ in vals)) + picks

    got = {r.event_type: (r.n_events, r.n_sample, r.min_cents,
                          r.max_cents, r.p50, r.p90, r.p99)
           for r in value_quantiles(ev).collect()}
    assert got == expected and len(expected) == 3


def test_event_trigrams_hand_golden(spark):
    """Adjacent type triples per user on the (ts, event_id) total
    order; occurrence + distinct-user support; min-count floor drops
    the singleton tail."""
    import datetime as dt

    from openie_spark.datapipe.events import event_trigrams

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: a b c a b c -> abc, bca, cab, abc
    for i, t in enumerate(["a", "b", "c", "a", "b", "c"]):
        rows.append((i, t0 + dt.timedelta(minutes=i), 1, t, 0.0, "{}"))
    # user 2: a b c (same ts for the last two -> event_id breaks tie)
    rows.append((10, t0, 2, "a", 0.0, "{}"))
    rows.append((11, t0 + dt.timedelta(minutes=1), 2, "b", 0.0, "{}"))
    rows.append((12, t0 + dt.timedelta(minutes=1), 2, "c", 0.0, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    got = {(r.t1, r.t2, r.t3): (r.n_occurrences, r.n_users)
           for r in event_trigrams(ev).collect()}
    assert got == {("a", "b", "c"): (3, 2)}
    # min_count=1 keeps the singletons too
    got1 = {(r.t1, r.t2, r.t3): (r.n_occurrences, r.n_users)
            for r in event_trigrams(ev, min_count=1).collect()}
    assert got1 == {("a", "b", "c"): (3, 2),
                    ("b", "c", "a"): (1, 1), ("c", "a", "b"): (1, 1)}


def test_hourly_profile_hand_golden(spark):
    """Integer hour-of-day cells; distinct-user reach; ppm shares sum
    per type against the round-half-up rule."""
    import datetime as dt

    from openie_spark.datapipe.events import hourly_profile

    rows = [
        (0, dt.datetime(2024, 1, 1, 9, 15), 1, "click", 0.0, "{}"),
        (1, dt.datetime(2024, 1, 2, 9, 45), 2, "click", 0.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 9, 59), 1, "click", 0.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 23, 5), 1, "click", 0.0, "{}"),
        (4, dt.datetime(2024, 1, 1, 23, 30), 1, "view", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    got = {(r.hour, r.event_type): (r.n, r.n_users, r.share_ppm)
           for r in hourly_profile(ev).collect()}
    assert got == {
        (9, "click"): (3, 2, 750000),
        (23, "click"): (1, 1, 250000),
        (23, "view"): (1, 1, 1000000),
    }


def test_gap_histogram_hand_golden(spark):
    """Whole-second floor gaps, per-user adjacency, zero gap in bin 0,
    first event of each user contributes nothing."""
    import datetime as dt

    from openie_spark.datapipe.events import gap_histogram

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (0, t0, 1, "a", 0.0, "{}"),
        (1, t0 + dt.timedelta(seconds=3), 1, "a", 0.0, "{}"),   # gap 3
        (2, t0 + dt.timedelta(seconds=3, microseconds=900000), 1,
         "a", 0.0, "{}"),                                       # gap 0 (floor)
        (3, t0 + dt.timedelta(seconds=67, microseconds=900000), 1,
         "a", 0.0, "{}"),                                       # gap 64
        (4, t0, 2, "a", 0.0, "{}"),                             # no gap
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    got = {r.bin: (r.n_gaps, r.min_sec, r.max_sec, r.sum_sec)
           for r in gap_histogram(ev).collect()}
    assert got == {0: (1, 0, 0, 0), 2: (1, 3, 3, 3), 7: (1, 64, 64, 64)}


def test_growth_accounting_hand_golden(spark):
    """Every active (user, day) is exactly one of new / retained /
    resurrected; multiple same-day events dedup."""
    import datetime as dt

    from openie_spark.datapipe.events import growth_accounting

    d = dt.datetime(2024, 1, 1)

    def at(days, eid, uid):
        return (eid, d + dt.timedelta(days=days), uid, "a", 0.0, "{}")

    rows = [
        at(0, 0, 1), at(0, 1, 1),     # u1 day0 (dup events) -> new
        at(1, 2, 1),                  # u1 day1 -> retained
        at(3, 3, 1),                  # u1 day3 -> resurrected (gap 2)
        at(1, 4, 2),                  # u2 day1 -> new
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double, props string")
    got = {r.day: (r.n_active, r.n_new, r.n_retained, r.n_resurrected)
           for r in growth_accounting(ev).collect()}
    d0 = int(d.replace(tzinfo=dt.timezone.utc).timestamp()) // 86400
    assert got == {
        d0: (1, 1, 0, 0),
        d0 + 1: (2, 1, 1, 0),
        d0 + 3: (1, 0, 0, 1),
    }
    # identity: every active decomposes exactly
    for n_active, n_new, n_ret, n_res in got.values():
        assert n_active == n_new + n_ret + n_res
