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
