"""Tie-determinism pin for events_scd2_history (gaps-and-islands SCD2).

The testdata has zero (user_id, ts) collisions at every SF, so the
entry's lead(valid_from) was green while silently tie-dependent: two
same-user segments CAN share valid_from when events tie on ts (routine
in real event streams). This fixture manufactures exactly that tie and
asserts (a) the unique correct interval chain, and (b) Spark/DuckDB hash
agreement on tied data — the differential the registry's own sweep can
never exercise on this testdata. Found by the plan fuzzer's window-tie
audit (BASELINE.md round-10 fuzzer entry).
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from tools.oracle_check import table_hash

T1 = dt.datetime(2024, 1, 1, 10, 0, 0)
T2 = dt.datetime(2024, 1, 1, 11, 0, 0)


def _write_events(path):
    # user 1: two SAME-ts events of different types (A then B by
    # event_id), then a later A — three one-event segments, the first
    # two sharing valid_from == T1. user 2: a single event.
    rows = {
        "event_id": [1, 2, 3, 4],
        "ts": [T1, T1, T2, T1],
        "user_id": [1, 1, 1, 2],
        "event_type": ["A", "B", "A", "A"],
        "value": [1.0, 2.0, 3.0, 4.0],
        "props": ["{}", "{}", "{}", "{}"],
    }
    tbl = pa.table(rows, schema=pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("value", pa.float64()), ("props", pa.string()),
    ]))
    pq.write_table(tbl, path)


def test_scd2_interval_chain_under_ts_ties(spark, tmp_path):
    from citegraph_spark.plans.events_queries import events_scd2_history

    _write_events(str(tmp_path / "events.parquet"))
    got = {
        tuple(r)
        for r in events_scd2_history(spark, str(tmp_path)).collect()
    }
    want = {
        (1, "A", "2024-01-01 10:00:00", "2024-01-01 10:00:00", 1, False),
        (1, "B", "2024-01-01 10:00:00", "2024-01-01 11:00:00", 1, False),
        (1, "A", "2024-01-01 11:00:00", "", 1, True),
        (2, "A", "2024-01-01 10:00:00", "", 1, True),
    }
    assert got == want


def test_scd2_engines_agree_on_tied_data(spark, tmp_path):
    import __spark_entry__ as e
    from citegraph_spark.plans.events_queries import events_scd2_history

    _write_events(str(tmp_path / "events.parquet"))
    sdf = events_scd2_history(spark, str(tmp_path))
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{tmp_path}/events.parquet')"
    )
    res = con.execute(e.oracle_sql()["events_scd2_history"])
    dcols = [d[0] for d in res.description]
    drows = [tuple(r) for r in res.fetchall()]
    con.close()
    assert len(srows) == len(drows)
    assert table_hash(sdf.columns, srows) == table_hash(dcols, drows)
