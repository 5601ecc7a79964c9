"""Streaming == batch equivalence on the replayed events table."""

from __future__ import annotations

from pyspark.sql import functions as F

from citegraph_spark.plans.entry_queries import QUERIES
from citegraph_spark.streaming import (
    run_stateful_counts_demo,
    run_windowed_stream_demo,
)

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_windowed_equals_batch(spark):
    stream_rows = {
        tuple(r)
        for r in run_windowed_stream_demo(spark, SF_DIR)
        .select("window_start", "event_type", "n", "value_sum")
        .collect()
    }
    batch_rows = {
        tuple(r)
        for r in QUERIES["events_windowed_agg"](spark, SF_DIR)
        .select("window_start", "event_type", "n", "value_sum")
        .collect()
    }
    assert stream_rows == batch_rows


def test_stateful_counts_equal_batch_groupby(spark):
    got = {
        r["user_id"]: (r["n_events"], r["value_sum"])
        for r in run_stateful_counts_demo(spark, SF_DIR).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    expected = {
        r["user_id"]: (r["n"], r["s"])
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
        .collect()
    }
    assert got == expected


def test_append_mode_emits_finalized_windows_once(spark):
    from citegraph_spark.streaming.events import run_windowed_append_demo

    emitted = run_windowed_append_demo(spark, SF_DIR).collect()
    assert emitted, "watermark never finalized any window"
    keys = [(r["window_start"], r["event_type"]) for r in emitted]
    assert len(keys) == len(set(keys)), "append mode re-emitted a window"
    batch = {
        (r["window_start"], r["event_type"]): (r["n"], r["value_sum"])
        for r in QUERIES["events_windowed_agg"](spark, SF_DIR).collect()
    }
    for r in emitted:
        k = (r["window_start"], r["event_type"])
        assert batch[k] == (r["n"], r["value_sum"]), f"finalized window wrong: {k}"


def test_stateful_sessionize_closed_sessions_match_batch(spark):
    from citegraph_spark.operators.relational import sessionize
    from citegraph_spark.streaming.events import run_stateful_sessionize_demo

    closed = run_stateful_sessionize_demo(spark, SF_DIR).collect()
    # batch truth: all sessions per user; the stream emits every session
    # except each user's LAST (still open in state at replay end)
    from citegraph_spark.streaming.events import _events_read_schema, _normalize_ts

    _, ts_is_long = _events_read_schema(spark, f"{SF_DIR}/events.parquet")
    ev = _normalize_ts(
        spark.read.parquet(f"{SF_DIR}/events.parquet"), ts_is_long
    ).select("user_id", "ts")
    s = sessionize(ev, "user_id", "ts", gap_minutes=30)
    batch = {
        (r["user_id"], r["session_start"], r["n"])
        for r in s.groupBy("user_id", "session_id")
        .agg(
            F.min(F.col("ts").cast("long")).alias("session_start"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    got = {(r["user_id"], r["session_start"], r["n_events"]) for r in closed}
    assert got <= batch, f"stream emitted a session batch doesn't have: {got - batch}"
    # every non-final batch session must have been closed and emitted
    last_per_user = {}
    for u, start, n in batch:
        if u not in last_per_user or start > last_per_user[u][0]:
            last_per_user[u] = (start, n)
    expected_closed = {
        (u, s0, n) for u, s0, n in batch if (s0, n) != last_per_user[u]
    }
    assert got == expected_closed


def test_streaming_dedup_drops_duplicate_delivery(spark):
    from citegraph_spark.streaming.events import run_dedup_stream_demo

    got = {
        r["event_type"]: r["n_after_dedup"]
        for r in run_dedup_stream_demo(spark, SF_DIR).collect()
    }
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = {
        r["event_type"]: r["n"]
        for r in batch.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    # doubled delivery, single-delivery counts: every duplicate suppressed
    assert got == want


def test_stream_stream_join_equals_batch_interval_join(spark):
    from citegraph_spark.streaming.events import run_stream_stream_join_demo

    got = {
        (r["user_id"], r["n_pairs"])
        for r in run_stream_stream_join_demo(spark, SF_DIR).collect()
    }
    expected = {
        (r["user_id"], r["n_pairs"])
        for r in QUERIES["events_click_attribution"](spark, SF_DIR).collect()
    }
    assert got == expected
    assert got, "no click->purchase pairs in the replay"


def test_stream_static_enrich_equals_batch_join(spark):
    from citegraph_spark.streaming.events import run_stream_static_enrich_demo

    got = {
        (r["nationkey"], r["n_events"])
        for r in run_stream_static_enrich_demo(spark, SF_DIR).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    dim = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"), F.col("c_nationkey").alias("nationkey")
    )
    expected = {
        (r["nationkey"], r["n_events"])
        for r in ev.join(dim, "user_id")
        .groupBy("nationkey")
        .agg(F.count("*").alias("n_events"))
        .collect()
    }
    assert got == expected and got


def test_streaming_incremental_rollup_matches_batch(spark):
    from pyspark.sql import functions as F

    from citegraph_spark.plans.entry_queries import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["streaming_incremental_rollup"](spark, sf).collect()
    batch = {
        (r["day"], r["event_type"]): (r["n"], r["v"])
        for r in spark.read.parquet(f"{sf}/events.parquet")
        .groupBy(
            F.to_date("ts").cast("string").alias("day"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"))
        .collect()
    }
    got = {
        (r["day"], r["event_type"]): (r["n_events"], r["value_sum"]) for r in rows
    }
    assert got == batch and got


def test_windowed_state_tracks_keyspace_not_volume(spark, tmp_path):
    """The 100x rehearsal's headline claim, pinned at test scale: replay
    the same event-time range at 1x and 3x volume (user/event ids
    shifted, ts unchanged) and the windowed aggregate's state row count
    is IDENTICAL — state ~ windows x types, never ~ events — while the
    result still equals the batch aggregate on the same input."""
    import json as _json

    from citegraph_spark.streaming.events import (
        _events_read_schema,
        _normalize_ts,
        streaming_windowed_agg,
    )

    _, ts_is_long = _events_read_schema(spark, f"{SF_DIR}/events.parquet")
    ev = _normalize_ts(
        spark.read.parquet(f"{SF_DIR}/events.parquet"), ts_is_long
    ).select("event_id", "ts", "user_id", "event_type", "value")

    state_rows = {}
    for copies in (1, 3):
        parts = [
            ev.select(
                (F.col("event_id") + F.lit(i * 10_000_000)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(i * 10_000_000)).alias("user_id"),
                "event_type",
                "value",
            )
            for i in range(copies)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        indir = str(tmp_path / f"in_{copies}x")
        df.repartition(2).write.mode("overwrite").parquet(indir)
        static = spark.read.parquet(indir)
        stream = (
            spark.readStream.format("parquet")
            .schema(static.schema)
            .option("maxFilesPerTrigger", "1")
            .load(indir)
        )
        name = f"state_keyspace_{copies}x"
        q = (
            streaming_windowed_agg(stream)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"ck_{copies}x"))
            .start()
        )
        q.processAllAvailable()
        progress = [
            p if isinstance(p, dict) else _json.loads(
                p.json() if callable(p.json) else p.json
            )
            for p in q.recentProgress
        ]
        q.stop()
        q.awaitTermination(30)
        ops = [p["stateOperators"] for p in reversed(progress) if p.get("stateOperators")]
        state_rows[copies] = sum(o["numRowsTotal"] for o in ops[0])
        got = {tuple(r) for r in spark.table(name).collect()}
        batch = {
            tuple(r)
            for r in static.groupBy(
                F.window("ts", "15 minutes").alias("w"), "event_type"
            )
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("value"), 2).alias("value_sum"),
            )
            .select(
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                    "window_start"
                ),
                "event_type",
                "n",
                "value_sum",
            )
            .collect()
        }
        assert got == batch, f"stream != batch at {copies}x"
    assert state_rows[1] == state_rows[3] > 0, state_rows


def test_watermark_tolerance_accepts_late_rows_inside_30min(spark, tmp_path):
    """Round-12 mutation audit, mutant M16: shrinking the 30-min
    watermark to 0 survived every gate — the sf replay arrives nearly
    in order, so the tolerance was never exercised. Sharpened finding
    (first version of this test ALSO survived the mutant): Spark only
    enforces lateness against groups whose window was ALREADY finalized
    — a late row for a never-emitted group is aggregated regardless of
    the watermark. So the planted late row must target a group the
    0-min watermark has already emitted: under the contracted 30-min
    tolerance the group is still open and the late row folds in (one
    row, n=3); under a 0-min watermark the window was finalized at n=2
    and the late row is dropped or double-emitted — either way not one
    (click, n=3) row.
    """
    import os
    import time as _time
    from datetime import datetime, timezone

    from citegraph_spark.streaming.events import streaming_windowed_agg

    def ts(h, m):
        return datetime(2024, 1, 1, h, m, tzinfo=timezone.utc)

    # Finalization lags the watermark by one batch (eviction uses the
    # watermark in effect DURING a batch, which is computed from the
    # batch before), so the late row must arrive a FULL batch after the
    # mutant's watermark passes its window:
    #   b1 max 12:30 → wm30 after b1 = 12:00, wm0 = 12:30
    #   b2 max 12:40 → wm30 = 12:10 (click window still open),
    #                   wm0  = 12:40 (click window EMITTED during b2)
    #   b3 late click 12:12 — ≥ the 12:10 contracted watermark, so it
    #      must fold in (n=3); under wm0 the group is long finalized
    #      (dropped or duplicate-emitted, never one n=3 row)
    #   b4 pushes the watermark past 12:15 so the click window emits
    b1 = [(ts(12, 0), "click", 1.0), (ts(12, 5), "click", 1.0),
          (ts(12, 30), "view", 1.0)]
    b2 = [(ts(12, 40), "view", 1.0)]
    b3 = [(ts(12, 12), "click", 1.0), (ts(13, 30), "view", 1.0)]
    b4 = [(ts(14, 0), "view", 1.0)]
    schema = "ts timestamp, event_type string, value double"
    in_dir = tmp_path / "in"
    os.makedirs(in_dir)
    for i, rows in enumerate((b1, b2, b3, b4)):
        part = tmp_path / f"b{i}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite").parquet(str(part))
        [f] = [f for f in os.listdir(part) if f.endswith(".parquet")]
        os.rename(part / f, in_dir / f"{i:02d}.parquet")
        _time.sleep(1.1)  # distinct mtimes pin the micro-batch order

    raw = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(str(in_dir))
    )
    q = (
        streaming_windowed_agg(raw)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_tolerance_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    emitted = [
        ((r["window_start"], r["event_type"]), r["n"])
        for r in spark.sql("SELECT * FROM wm_tolerance_out").collect()
    ]
    clicks = [n for k, n in emitted if k == ("2024-01-01 12:00:00", "click")]
    assert clicks == [3], (
        "the 23-min-late click did not fold into its still-open window "
        "— watermark tolerance is not the contracted 30 minutes "
        f"(click emissions: {clicks}; all: {sorted(emitted)})"
    )
    # 12:30 and 12:40 share the [12:30, 12:45) window
    assert (("2024-01-01 12:30:00", "view"), 2) in emitted
