"""Exact-gap boundary pin for operators/relational.sessionize (round-12
mutation audit, mutant M06): the sf0.01 events table happens to contain
no gap of EXACTLY gap_minutes, so the oracle gate cannot distinguish
`gap > threshold` from `gap >= threshold` — a boundary flip survived
the whole net. This test plants the exact-boundary gap and pins the
contract shared by the Spark operator AND the DuckDB oracle SQL
(events_queries.py events_sessionize renders `> 30 * 60`): a gap of
EXACTLY gap_minutes does NOT start a new session; one second more does.

Note this is the OPPOSITE half-openness of Spark's built-in
session_window (new session when ts - last >= gap) — the registry's
streaming entries use that contract; the batch gaps-and-islands
operator uses strict-greater. Both are pinned (this file and
tests/test_streaming.py respectively) so neither can silently drift
onto the other.
"""

from __future__ import annotations

from datetime import datetime

from citegraph_spark.operators.relational import sessionize


def _sessions(spark, ts_offsets_s):
    base = datetime(2024, 1, 1, 12, 0, 0)
    rows = [(1, datetime.fromtimestamp(base.timestamp() + o)) for o in ts_offsets_s]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sessionize(df, "user_id", "ts", gap_minutes=30)
    return [r["session_id"] for r in out.orderBy("ts").collect()]


def test_exact_gap_does_not_split(spark):
    # gaps: 1799 s, exactly 1800 s, 1800 s again — all within-session
    assert _sessions(spark, [0, 1799, 3599, 5399]) == [1, 1, 1, 1]


def test_one_second_past_gap_splits(spark):
    # 1801 s starts a new session; a later exact-1800 s gap still doesn't
    assert _sessions(spark, [0, 1801, 3601]) == [1, 2, 2]


def test_first_event_opens_session_one(spark):
    # the isNull() term (mutant M07): the first event is session 1, not 0
    assert _sessions(spark, [0]) == [1]
