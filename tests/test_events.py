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


def test_props_k(ev):
    from openie_spark.datapipe.events import props_k

    got = {r.event_id: r.k for r in props_k(ev).collect()}
    assert got == {i: i + 1 for i in range(7)}
