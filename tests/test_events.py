"""Event-stream operators (events.py): gap sessionization semantics,
tie-breaks, boundary behavior, freshness lags — exact integer-micros
arithmetic throughout."""

from __future__ import annotations

import pytest


def _events(spark, rows, ts_type="timestamp_ntz"):
    # rows: (event_id, ts_string, user_id, event_type)
    vals = ", ".join(
        f"({eid}, CAST('{ts}' AS {ts_type}), {uid}, '{et}')"
        for eid, ts, uid, et in rows)
    return spark.sql(
        f"SELECT * FROM VALUES {vals} "
        f"AS t(event_id, ts, user_id, event_type)")


def test_sessionize_gaps_and_boundary(spark):
    from canned_yaml_spark import events as ev
    rows = [
        (0, "2024-01-01 00:00:00", 1, "a"),
        (1, "2024-01-01 00:10:00", 1, "a"),   # +600 s  → same session
        (2, "2024-01-01 00:40:00", 1, "a"),   # +1800 s → boundary: SAME
        (3, "2024-01-01 01:10:01", 1, "a"),   # +1801 s → NEW session
        (4, "2024-01-01 00:00:00", 2, "a"),   # other user independent
    ]
    df = _events(spark, rows)
    got = {(r.user_id, r.event_id): r.session_idx
           for r in ev.sessionize(df, gap_s=1800.0).collect()}
    assert got[(1, 0)] == got[(1, 1)] == got[(1, 2)] == 1
    assert got[(1, 3)] == 2
    assert got[(2, 4)] == 1


def test_session_stats_durations(spark):
    from canned_yaml_spark import events as ev
    rows = [
        (0, "2024-01-01 00:00:00.000001", 1, "a"),
        (1, "2024-01-01 00:10:00.500001", 1, "a"),
        (2, "2024-01-02 00:00:00", 1, "a"),
    ]
    df = _events(spark, rows)
    stats = {(r.user_id, r.session_idx): (r.n_events, r.duration_s)
             for r in ev.session_stats(df, gap_s=1800.0).collect()}
    assert stats[(1, 1)] == (2, 600.5)      # exact micros difference
    assert stats[(1, 2)] == (1, 0.0)


def test_sessionize_tiebreak_on_equal_ts(spark):
    from canned_yaml_spark import events as ev
    rows = [
        (5, "2024-01-01 00:00:00", 1, "a"),
        (2, "2024-01-01 00:00:00", 1, "a"),  # same ts: event_id orders
        (9, "2024-01-01 02:00:00", 1, "a"),
    ]
    df = _events(spark, rows)
    s = ev.sessionize(df, gap_s=1800.0)
    got = {r.event_id: r.session_idx for r in s.collect()}
    assert got[2] == got[5] == 1 and got[9] == 2


def test_sessionize_ltz_and_ntz_agree(spark):
    from canned_yaml_spark import events as ev
    rows = [(0, "2024-01-01 00:00:00", 1, "a"),
            (1, "2024-01-01 09:00:00", 1, "a")]
    for tt in ("timestamp_ntz", "timestamp"):
        df = _events(spark, rows, ts_type=tt)
        s = ev.session_stats(df, gap_s=1800.0).collect()
        assert {r.session_idx for r in s} == {1, 2}, tt


def test_freshness_lags_and_breach(spark):
    from canned_yaml_spark import events as ev
    rows = [
        (0, "2024-01-01 00:00:00", 1, "stale"),
        (1, "2024-01-01 01:00:00", 1, "edge"),    # lag exactly 1800 s
        (2, "2024-01-01 01:30:00", 1, "fresh"),   # global max
    ]
    df = _events(spark, rows)
    rep = {r.group: (r.lag_s, r.breach)
           for r in ev.freshness_report(df, max_lag_s=1800.0).collect()}
    assert rep["fresh"] == (0.0, False)
    assert rep["edge"] == (1800.0, False)         # strictly greater breaches
    assert rep["stale"] == (5400.0, True)


def test_freshness_null_ts_excluded(spark):
    from canned_yaml_spark import events as ev
    df = spark.sql(
        "SELECT * FROM VALUES "
        "(0, CAST('2024-01-01 00:00:00' AS timestamp_ntz), 1, 'a'), "
        "(1, CAST(NULL AS timestamp_ntz), 1, 'b') "
        "AS t(event_id, ts, user_id, event_type)")
    rep = ev.freshness_report(df, max_lag_s=10.0)
    assert [r.group for r in rep.collect()] == ["a"]
