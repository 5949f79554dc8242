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


def test_asof_join_semantics(spark):
    from canned_yaml_spark import events as ev
    left = _events(spark, [
        (10, "2024-01-01 01:00:00", 1, "l"),
        (11, "2024-01-01 03:00:00", 1, "l"),
        (12, "2024-01-01 00:30:00", 2, "l"),   # before any right → null
        (13, "2024-01-01 02:00:00", 3, "l"),   # key absent on right
    ])
    right = _events(spark, [
        (0, "2024-01-01 00:00:00", 1, "r"),
        (1, "2024-01-01 01:00:00", 1, "r"),    # AT left ts → matches (<=)
        (2, "2024-01-01 02:30:00", 1, "r"),
        (3, "2024-01-01 01:00:00", 2, "r"),
    ])
    out = {r.event_id: (r.asof_event_id, r.asof_gap_s)
           for r in ev.asof_join(left, right,
                                 right_cols=("event_id",)).collect()}
    assert out[10] == (1, 0.0)          # equal timestamp matches
    assert out[11] == (2, 1800.0)       # latest at-or-before
    assert out[12] == (None, None)      # nothing before → left join null
    assert out[13] == (None, None)      # key missing on right


def test_asof_join_tolerance(spark):
    from canned_yaml_spark import events as ev
    left = _events(spark, [(10, "2024-01-01 02:00:00", 1, "l")])
    right = _events(spark, [(0, "2024-01-01 00:00:00", 1, "r")])
    out = ev.asof_join(left, right, right_cols=("event_id",),
                       tolerance_s=3600.0).collect()[0]
    assert out.asof_event_id is None    # 7200 s > 3600 s tolerance
    out2 = ev.asof_join(left, right, right_cols=("event_id",),
                        tolerance_s=7200.0).collect()[0]
    assert out2.asof_event_id == 0 and out2.asof_gap_s == 7200.0


def test_asof_join_keeps_left_columns(spark):
    from canned_yaml_spark import events as ev
    left = _events(spark, [(10, "2024-01-01 02:00:00", 1, "payload")])
    right = _events(spark, [(0, "2024-01-01 00:00:00", 1, "r")])
    row = ev.asof_join(left, right,
                       right_cols=("event_id", "event_type")).collect()[0]
    assert row.event_type == "payload"          # left columns intact
    assert row.asof_event_type == "r"           # right payload carried


# --------------------------------------------------- x-monotonic (r5)
def test_monotonic_violations_hand_case(spark):
    from canned_yaml_spark.checks import MonotonicCheck, Severity
    from canned_yaml_spark.events import monotonic_violations
    df = spark.createDataFrame(
        [  # user 1: 10, 10, 9, 12  ordered by event_id
         (1, 1, 10.0), (2, 1, 10.0), (3, 1, 9.0), (4, 1, 12.0),
         # user 2: clean ascent + a NULL in the middle (not validated,
         # not a previous value: 5 -> NULL -> 7 is clean)
         (5, 2, 5.0), (6, 2, None), (7, 2, 7.0)],
        "event_id long, user_id long, v double")
    mc = MonotonicCheck(rule_id="x-monotonic.v", column="v",
                        partition_by="user_id", order_by="event_id")
    got = monotonic_violations(df, mc).collect()
    assert [(r.clip_id, r.part_id) for r in got] == [(3, 1)]
    assert got[0].rule_id == "x-monotonic.v"
    # strict mode also flags the 10 -> 10 plateau
    mc2 = MonotonicCheck(rule_id="x-monotonic.v", column="v",
                         partition_by="user_id", order_by="event_id",
                         strict=True)
    got2 = sorted(r.clip_id for r in
                  monotonic_violations(df, mc2).collect())
    assert got2 == [2, 3]


def test_x_monotonic_spec_compile(spark):
    from canned_yaml_spark.compile import compile_spec
    from canned_yaml_spark.errors import SpecError
    import pytest as _pytest
    schema = spark.createDataFrame(
        [(1, 1, 1.0)], "event_id long, user_id long, v double").schema
    suite = compile_spec(
        {"type": "object",
         "x-monotonic": {"column": "v", "partition_by": "user_id",
                         "order_by": "event_id", "severity": "WARN"}},
        schema)
    [mc] = suite.monotonic_checks
    assert (mc.column, mc.partition_by, mc.order_by, mc.strict) \
        == ("v", "user_id", "event_id", False)
    for bad in ({"column": "v"},
                {"column": "nope", "partition_by": "user_id",
                 "order_by": "event_id"},
                {"column": "v", "partition_by": "user_id",
                 "order_by": 7},
                "nope"):
        with _pytest.raises(SpecError):
            compile_spec({"type": "object", "x-monotonic": bad}, schema)


def test_x_monotonic_wired_into_job(spark):
    from canned_yaml_spark import job
    df = spark.createDataFrame(
        [("a", 0, 1, 10.0), ("b", 0, 2, 9.0), ("c", 1, 3, 5.0)],
        "clip_id string, part_id int, seq long, v double")
    spec = {"type": "object",
            "x-monotonic": {"column": "v", "partition_by": "part_id",
                            "order_by": "seq"}}
    from canned_yaml_spark.compile import compile_spec
    suite = compile_spec(spec, df.schema)
    out = job.all_violations(df, suite).collect()
    assert [(r.clip_id, r.part_id, r.rule_id) for r in out] \
        == [("b", 0, "x-monotonic.v")]
