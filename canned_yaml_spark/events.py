"""Event-stream operators over the events table: gap sessionization
and freshness validation.

The reference has no event/time concepts; these are the operations the
validation engine's USERS run right next to it on the same cluster
(sessionize the interaction log, gate on ingestion freshness), so they
ship as first-class, oracle-gated operators like everything else.

Scale notes:
- sessionize shuffles ONCE on the user key; the per-user window is the
  textbook plan (session logic is order-dependent, so salting cannot
  apply — a power user's events must meet in one task ordered by
  time). Per-user event counts bound task memory, not table size; AQE
  skew handling splits oversized user groups' FILE partitions but a
  single user's ordering task is irreducible — that bound is the
  operator's contract, and matches every production sessionizer.
- freshness is one algebraic aggregate to one row per group, then a
  global-frame window over that tiny frame (same one-scan shape as
  dataset.partition_anomaly).

Time arithmetic runs in exact INTEGER MICROSECONDS end-to-end
(timestampdiff vs a fixed naive epoch — works for both TIMESTAMP and
TIMESTAMP_NTZ columns); only the final exact integer difference is
divided once into seconds. Differences cancel the epoch choice AND
timezone conventions, and one division of an exact int64 is
bit-deterministic, so the DuckDB oracle (epoch_us-based) reproduces
every value exactly — per-row double conversions would wobble in the
last ulp between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_US = 1_000_000


def _micros(ts_col: str) -> Column:
    """Naive-epoch integer microseconds of a timestamp column (NTZ or
    LTZ; a constant offset from the Unix epoch that cancels in every
    difference this module emits)."""
    return F.expr(
        f"timestampdiff(MICROSECOND, "
        f"CAST('2000-01-01 00:00:00' AS TIMESTAMP_NTZ), "
        f"CAST(`{ts_col}` AS TIMESTAMP_NTZ))")


def sessionize(events: DataFrame, *, gap_s: float = 1800.0,
               user_col: str = "user_id",
               ts_col: str = "ts",
               order_tiebreak: str = "event_id") -> DataFrame:
    """Events + (session_idx, _us): gap-based session assignment.

    A new session starts at a user's first event and wherever the gap
    to the previous event exceeds ``gap_s`` seconds. session_idx is
    the per-user 1-based session ordinal — (user, session_idx) is the
    session key. Ordering is (time, tiebreak) so runs are
    deterministic even with tied timestamps.
    """
    us = _micros(ts_col)
    w = (Window.partitionBy(user_col)
               .orderBy(us, F.col(order_tiebreak)))
    gap = us - F.lag(us).over(w)
    new_session = (gap.isNull()
                   | (gap > int(round(gap_s * _US)))).cast("long")
    return (events.withColumn("_us", us)
                  .withColumn("session_idx",
                              F.sum(new_session).over(
                                  w.rowsBetween(Window.unboundedPreceding,
                                                0))))


def session_stats(events: DataFrame, *, gap_s: float = 1800.0,
                  user_col: str = "user_id",
                  ts_col: str = "ts",
                  order_tiebreak: str = "event_id") -> DataFrame:
    """(user_id, session_idx, n_events, duration_s) per session —
    duration as an epoch-second difference (timezone-free)."""
    s = sessionize(events, gap_s=gap_s, user_col=user_col,
                   ts_col=ts_col, order_tiebreak=order_tiebreak)
    return (s.groupBy(F.col(user_col).alias("user_id"), "session_idx")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.round((F.max("_us") - F.min("_us")) / F.lit(1e6), 6)
                   .alias("duration_s")))


def freshness_report(events: DataFrame, *, group_col: str = "event_type",
                     ts_col: str = "ts",
                     max_lag_s: float = 3600.0) -> DataFrame:
    """(group, lag_s, breach) — x-freshness: how far each group's
    newest event trails the table's newest event. A group whose
    pipeline stalled shows a growing lag while the healthy groups keep
    the global max moving. One algebraic agg at table scale; the
    global max is a window over the one-row-per-group frame (single
    scan — same shape as partition_anomaly's median/MAD)."""
    g = (events.filter(F.col(ts_col).isNotNull())
               .groupBy(F.col(group_col).alias("group"))
               .agg(F.max(_micros(ts_col)).alias("_gmax")))
    rep = g.withColumn("_amax", F.expr("max(_gmax) OVER ()"))
    lag_us = F.col("_amax") - F.col("_gmax")         # exact int64
    return rep.select("group",
                      F.round(lag_us / F.lit(1e6), 6).alias("lag_s"),
                      (lag_us > int(round(max_lag_s * _US)))
                      .alias("breach"))


def asof_join(left: DataFrame, right: DataFrame, *,
              key_col: str = "user_id",
              ts_col: str = "ts",
              right_cols: tuple = ("event_id",),
              tolerance_s: float | None = None) -> DataFrame:
    """As-of join: every left row picks the LATEST right row with
    right.ts <= left.ts on the same key — the timeseries primitive
    Spark has no built-in for (point-in-time joins: match an event to
    the prevailing rate/state/previous action).

    Spark-first plan (the union+window form every production
    point-in-time join uses, e.g. Databricks tempo): tag both sides,
    union, ONE shuffle on the key, and per key a time-ordered window
    where `last(right_value, ignorenulls)` carries the most recent
    right payload forward onto each left row. No range join, no
    per-row probe: cost is one shuffle + one sort of |L|+|R|, the
    optimal bound for this operator. Ties at the same instant order
    right-before-left, so a right row AT the left timestamp matches
    (<= semantics, matching DuckDB's ASOF JOIN — the gate's oracle).

    Output: left rows + `asof_<col>` for each right payload column +
    `asof_gap_s` (exact integer-micros difference / 1e6). With
    ``tolerance_s``, matches older than the tolerance are nulled
    (pandas merge_asof semantics).
    """
    us = _micros(ts_col)
    lt = left.select(F.col(key_col).alias("_k"), us.alias("_us"),
                     F.lit(1).alias("_side"), F.struct("*").alias("_l"),
                     *[F.lit(None).cast(right.schema[c].dataType)
                        .alias(f"_r_{c}") for c in right_cols],
                     F.lit(None).cast("long").alias("_r_us"))
    rt = right.select(F.col(key_col).alias("_k"), us.alias("_us"),
                      F.lit(0).alias("_side"),
                      F.lit(None).cast(lt.schema["_l"].dataType)
                       .alias("_l"),
                      *[F.col(c).alias(f"_r_{c}") for c in right_cols],
                      us.alias("_r_us"))
    u = lt.unionByName(rt)
    w = (Window.partitionBy("_k")
               .orderBy("_us", "_side")
               .rowsBetween(Window.unboundedPreceding, 0))
    carried = [F.last(f"_r_{c}", ignorenulls=True).over(w)
                .alias(f"asof_{c}") for c in right_cols]
    carried_us = F.last("_r_us", ignorenulls=True).over(w)
    out = (u.select("_l", "_us", "_side", carried_us.alias("_m_us"),
                    *carried)
            .filter(F.col("_side") == 1))
    gap_us = F.col("_us") - F.col("_m_us")
    if tolerance_s is not None:
        tol = int(round(tolerance_s * _US))
        keep = gap_us <= tol
        out = out.select(
            "_l",
            *[F.when(keep, F.col(f"asof_{c}")).alias(f"asof_{c}")
              for c in right_cols],
            F.when(keep, F.round(gap_us / F.lit(1e6), 6))
             .alias("asof_gap_s"))
    else:
        out = out.select(
            "_l", *[F.col(f"asof_{c}") for c in right_cols],
            F.round(gap_us / F.lit(1e6), 6).alias("asof_gap_s"))
    return out.select("_l.*",
                      *[f"asof_{c}" for c in right_cols], "asof_gap_s")


def monotonic_violations(df: DataFrame, check,
                         id_col: str = "event_id") -> DataFrame:
    """Rows that break an ordering invariant: within each
    ``check.partition_by`` group, ordered by ``check.order_by``,
    ``check.column`` must be non-decreasing (strictly increasing with
    ``check.strict``) — "event time never goes backwards in write
    order", "version counters only go up".

    Output: (clip_id, part_id, rule_id, severity, message) — the
    violation surface every other check family emits; clip_id carries
    the row's ``id_col``, part_id the group key.

    Semantics:
    - NULL ``column`` values are absent-not-validated: dropped BEFORE
      the window, so they neither violate nor serve as anyone's
      previous value (the same convention as every value rule).
    - the window ordering is (order_by, column, id) — fully
      deterministic even with order_by ties, so the engine and the
      DuckDB oracle flag the IDENTICAL rows. With non-strict
      semantics the tie-break on column means equal-order rows sort
      by value and never false-fire.

    Scale shape: ONE shuffle on the group key + a per-group sorted
    window — the sessionize plan. Ordering is inherently per-group
    serial (salting cannot apply); per-group row counts bound task
    memory, which is the operator's contract, same as every
    production ordering validator.

    Wiring note (job.all_violations): part_id carries the ORDERING
    group (``partition_by``), so verdicts aggregate it per that group;
    declare ``partition_by`` = the job's part_col when you want the
    rule to roll up into the same per-partition verdicts as the row
    suite — that also makes it resume-safe (a resume scope never
    splits an ordering group).
    """
    c, ob, pb = check.column, check.order_by, check.partition_by
    w = (Window.partitionBy(pb)
               .orderBy(F.col(ob), F.col(c), F.col(id_col)))
    pv = F.col("_prev")
    breach = (F.col(c) <= pv) if check.strict else (F.col(c) < pv)
    kind = "did not increase" if check.strict else "decreased"
    return (df.filter(F.col(c).isNotNull())
              .withColumn("_prev", F.lag(c).over(w))
              .filter(pv.isNotNull() & breach)
              .select(F.col(id_col).alias("clip_id"),
                      F.col(pb).alias("part_id"),
                      F.lit(check.rule_id).alias("rule_id"),
                      F.lit(int(check.severity)).alias("severity"),
                      F.lit(f"{c} {kind} vs previous row "
                            f"({ob} order within {pb})").alias("message")))
