"""Streaming differential fuzzer: random windowed-aggregation configs,
Structured Streaming replay vs batch semantics, one comparison contract.

The registry's ten streaming entries certify stream == batch for FIXED
configurations (citegraph_spark/plans/events_queries.py). This tool
randomizes the configuration space — window duration, tumbling vs
sliding, watermark delay, grouping key, aggregate set, pre-filter,
number of chronological replay files, and output mode — and requires the
streaming result to hash-match the batch computation of the same spec:

- complete mode: every window, straight groupBy(F.window(...)).
- append mode: ONLY the windows the advancing watermark finalized, i.e.
  window_end <= max(event time) - delay (the contract the fixed
  streaming_windowed_append entry states declaratively; replay files are
  chronological so the watermark advances monotonically and the final
  emission set is deterministic).

This exercises the stateful streaming aggregation + watermark eviction
machinery against the hash-aggregate path across the parameter space —
a window emitted twice, an unfinalized window leaking into the sink, a
watermark boundary off by one microbatch, or a slide/assignment mismatch
all hash-mismatch. For TUMBLING configs a third leg runs in DuckDB
(time_bucket) so the window-assignment arithmetic is also cross-engine.

Determinism policy mirrors tools/plan_fuzz.py: double sums round(…,2)
on every side, group keys are low-cardinality columns, emission cutoffs
are computed from the data, never the clock.

Usage:
  python tools/stream_fuzz.py [--n 30] [--seed0 0] [--sf-dir DIR]

tests/test_stream_fuzz.py pins a seed block as a standing gate.
"""

from __future__ import annotations

import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.oracle_check import table_hash  # noqa: E402

SF_DIR_DEFAULT = "/root/testdata/sf0.001"

WINDOW_MIN = [5, 12, 15, 30, 60, 120]
# Cross-engine window assignment only agrees when every width divides a
# day: Spark's F.window aligns buckets to the 1970-01-01 epoch while
# DuckDB's time_bucket uses the 2000-01-03 origin — both are midnight-
# aligned, so day-dividing widths land on identical boundaries, but a
# width like 7 or 17 minutes would desync the two origins and raise
# false FAILs. Guard the invariant rather than leave it implicit.
assert all(1440 % w == 0 for w in WINDOW_MIN), (
    "WINDOW_MIN widths must divide 1440 min — Spark (1970 epoch) and "
    "DuckDB time_bucket (2000-01-03 origin) only align on day-dividing "
    "windows; pass an explicit origin to time_bucket before relaxing this"
)
DELAY_MIN = [1, 10, 30, 90]
N_FILES = [2, 3, 4]


def gen_config(seed: int) -> dict:
    rng = random.Random(seed)
    w = rng.choice(WINDOW_MIN)
    slide = None
    if rng.random() < 0.35:
        slide = rng.choice([m for m in (w // 2, w // 3, w // 4) if m >= 1])
    cfg = {
        "seed": seed,
        "kind": "fixed",
        "window_min": w,
        "slide_min": slide,
        "delay_min": rng.choice(DELAY_MIN),
        "key": rng.choice([None, "event_type", "user_mod"]),
        "sum_value": rng.random() < 0.7,
        "max_event_id": rng.random() < 0.4,
        "filter": rng.choice([None, "value_pos", "type_in"]),
        "n_files": rng.choice(N_FILES),
        "mode": "append" if rng.random() < 0.7 else "complete",
    }
    if rng.random() < 0.3:
        # session windows: merging window state (a different streaming
        # machinery than fixed windows). Complete mode — the final
        # merged table is the well-defined comparison point; a key is
        # required (global sessions over the whole corpus are one giant
        # session, vacuous).
        cfg.update(
            kind="session",
            slide_min=None,
            window_min=rng.choice([5, 17, 30, 60]),  # the session GAP
            key=rng.choice(["event_type", "user_mod"]),
            mode="complete",
        )
    return cfg


# --------------------------------------------------------------------------
# shared spec application (the SAME functions build both sides)
# --------------------------------------------------------------------------


def _prep(df, cfg, F):
    """Pre-aggregation columns + filter — applied identically to the
    batch frame and the streaming frame."""
    if cfg["key"] == "user_mod":
        df = df.withColumn("user_mod", (F.col("user_id") % 7).cast("int"))
    if cfg["filter"] == "value_pos":
        df = df.filter(F.col("value") > 0.5)
    elif cfg["filter"] == "type_in":
        df = df.filter(F.col("event_type").isin("click", "view", "purchase"))
    return df


def _window_expr(cfg, F):
    w = f"{cfg['window_min']} minutes"
    if cfg["kind"] == "session":
        return F.session_window(F.col("ts"), w).alias("window")
    if cfg["slide_min"]:
        return F.window("ts", w, f"{cfg['slide_min']} minutes").alias("window")
    return F.window("ts", w).alias("window")


def _aggs(cfg, F):
    aggs = [F.count(F.lit(1)).alias("n")]
    if cfg["sum_value"]:
        aggs.append(F.round(F.sum("value"), 2).alias("value_sum"))
    if cfg["max_event_id"]:
        aggs.append(F.max("event_id").alias("max_eid"))
    return aggs


def _finalize(df, cfg, F):
    """window struct -> sortable string columns (shared by both sides)."""
    cols = [
        F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("ws"),
        F.date_format("window.end", "yyyy-MM-dd HH:mm:ss").alias("we"),
    ]
    if cfg["key"]:
        cols.append(F.col(cfg["key"]))
    return df.select(*cols, "n",
                     *(["value_sum"] if cfg["sum_value"] else []),
                     *(["max_eid"] if cfg["max_event_id"] else []))


def run_config(spark, cfg: dict, sf_dir: str) -> tuple[bool, str]:
    from pyspark.sql import functions as F

    from citegraph_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    # ---- stage chronological replay files ------------------------------
    pdf = events.orderBy("ts", "event_id").toPandas()
    # micros + UTC, not naive nanos: the session reads TIMESTAMP(NANOS)
    # parquet as long (nanosAsLong) and naive micros as TIMESTAMP_NTZ —
    # both break withWatermark, which demands TIMESTAMP(LTZ)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]").dt.tz_localize("UTC")
    max_ts = pdf["ts"].max().tz_localize(None)
    tmp = tempfile.mkdtemp(prefix="stream_fuzz_")
    try:
        os.makedirs(f"{tmp}/in")
        k = cfg["n_files"]
        step = (len(pdf) + k - 1) // k
        import pyarrow as pa
        import pyarrow.parquet as pq

        for i in range(k):
            chunk = pdf.iloc[i * step: (i + 1) * step]
            pq.write_table(
                pa.Table.from_pandas(chunk, preserve_index=False),
                f"{tmp}/in/{i:02d}.parquet",
            )
        schema = spark.read.parquet(f"{tmp}/in/00.parquet").schema

        # ---- streaming side --------------------------------------------
        raw = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", "1")
            .load(f"{tmp}/in")
        )
        # watermark FIRST, prep after: the watermark node must observe
        # every row (a pre-watermark filter would under-advance it vs the
        # batch cutoff, which is computed from the unfiltered max ts)
        src = _prep(
            raw.withWatermark("ts", f"{cfg['delay_min']} minutes"), cfg, F
        )
        keys = [_window_expr(cfg, F)] + ([cfg["key"]] if cfg["key"] else [])
        agg = src.groupBy(*keys).agg(*_aggs(cfg, F))
        out = _finalize(agg, cfg, F)
        name = f"stream_fuzz_{cfg['seed']}"
        with tempfile.TemporaryDirectory() as ckpt:
            q = (
                out.writeStream.outputMode(cfg["mode"])
                .format("memory")
                .queryName(name)
                .option("checkpointLocation", ckpt)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            q.awaitTermination(30)
        res = spark.table(name)
        scols = res.columns
        srows = [tuple(r) for r in res.collect()]
        spark.catalog.dropTempView(name)

        # ---- batch side (same spec functions) ---------------------------
        b = _prep(events, cfg, F)
        bagg = b.groupBy(*[_window_expr(cfg, F)]
                         + ([cfg["key"]] if cfg["key"] else [])).agg(
            *_aggs(cfg, F)
        )
        if cfg["mode"] == "append":
            # append emits exactly the watermark-finalized windows
            import datetime as dt

            cutoff = max_ts.to_pydatetime() - dt.timedelta(
                minutes=cfg["delay_min"]
            )
            bagg = bagg.filter(F.col("window.end") <= F.lit(cutoff))
        bout = _finalize(bagg, cfg, F)
        bcols = bout.columns
        brows = [tuple(r) for r in bout.collect()]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    if len(srows) != len(brows):
        return False, f"rowcount stream={len(srows)} batch={len(brows)}"
    if sorted(scols) != sorted(bcols):
        return False, f"cols stream={sorted(scols)} batch={sorted(bcols)}"
    hs, hb = table_hash(scols, srows), table_hash(bcols, brows)
    if hs != hb:
        diff = ""
        for a, bb in zip(sorted(map(str, srows)), sorted(map(str, brows))):
            if a != bb:
                diff = f"\n  stream: {a}\n  batch : {bb}"
                break
        return False, f"value-hash {hs} != {hb}{diff}"

    # third leg: DuckDB — tumbling assignment arithmetic, or
    # gaps-and-islands sessionization for session windows
    if cfg["kind"] == "session":
        ok, msg = _duckdb_session_leg(cfg, sf_dir, scols, srows)
        if not ok:
            return False, f"duckdb session leg: {msg}"
    elif not cfg["slide_min"]:
        ok, msg = _duckdb_leg(cfg, sf_dir, scols, srows)
        if not ok:
            return False, f"duckdb leg: {msg}"
    return True, f"{len(srows)} windows ({cfg['mode']})"


def _duckdb_leg(cfg, sf_dir: str, scols, srows) -> tuple[bool, str]:
    import duckdb

    w = cfg["window_min"]
    sel = ["strftime(tb, '%Y-%m-%d %H:%M:%S') AS ws",
           f"strftime(tb + INTERVAL '{w} minutes', '%Y-%m-%d %H:%M:%S') AS we"]
    grp = ["tb"]
    if cfg["key"] == "event_type":
        sel.append("event_type")
        grp.append("event_type")
    elif cfg["key"] == "user_mod":
        sel.append("CAST(user_id % 7 AS INT) AS user_mod")
        grp.append("user_id % 7")
    sel.append("count(*) AS n")
    if cfg["sum_value"]:
        sel.append('round(sum("value"), 2) AS value_sum')
    if cfg["max_event_id"]:
        sel.append("max(event_id) AS max_eid")
    where = ""
    if cfg["filter"] == "value_pos":
        where = 'WHERE "value" > 0.5'
    elif cfg["filter"] == "type_in":
        where = "WHERE event_type IN ('click', 'view', 'purchase')"
    having = ""
    if cfg["mode"] == "append":
        having = (f"HAVING tb + INTERVAL '{w} minutes' <= "
                  f"(SELECT max(ts) FROM ev) - INTERVAL '{cfg['delay_min']} minutes'")
    sql = f"""
      WITH ev AS (SELECT * FROM read_parquet('{sf_dir}/events.parquet')),
      b AS (SELECT time_bucket(INTERVAL '{w} minutes', ts) AS tb, *
            FROM ev {where})
      SELECT {', '.join(sel)} FROM b GROUP BY {', '.join(grp)} {having}
    """
    con = duckdb.connect()
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = [tuple(r) for r in res.fetchall()]
    con.close()
    if len(srows) != len(drows):
        return False, f"rowcount stream={len(srows)} duckdb={len(drows)}"
    if table_hash(scols, srows) != table_hash(dcols, drows):
        return False, "value-hash mismatch vs duckdb"
    return True, "ok"


def _duckdb_session_leg(cfg, sf_dir: str, scols, srows) -> tuple[bool, str]:
    """Gaps-and-islands sessionization, matching Spark's half-open
    session semantics: an event joins the open session iff
    ts < last_ts + gap (so a break is ts - last_ts >= gap); the session
    window is [min_ts, max_ts + gap)."""
    import duckdb

    gap = cfg["window_min"]
    key_sql = ("event_type" if cfg["key"] == "event_type"
               else "CAST(user_id % 7 AS INT)")
    where = ""
    if cfg["filter"] == "value_pos":
        where = 'WHERE "value" > 0.5'
    elif cfg["filter"] == "type_in":
        where = "WHERE event_type IN ('click', 'view', 'purchase')"
    sel = ["strftime(min_ts, '%Y-%m-%d %H:%M:%S') AS ws",
           f"strftime(max_ts + INTERVAL '{gap} minutes', "
           "'%Y-%m-%d %H:%M:%S') AS we",
           f"k AS {cfg['key']}", "n"]
    if cfg["sum_value"]:
        sel.append("value_sum")
    if cfg["max_event_id"]:
        sel.append("max_eid")
    sql = f"""
      WITH ev AS (SELECT {key_sql} AS k, ts, "value", event_id
                  FROM read_parquet('{sf_dir}/events.parquet') {where}),
      m AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w >= INTERVAL '{gap} minutes'
                      THEN 1 ELSE 0 END AS brk
            FROM ev WINDOW w AS (PARTITION BY k ORDER BY ts, event_id)),
      s AS (SELECT *, sum(brk) OVER (PARTITION BY k ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS seg FROM m),
      g AS (SELECT k, seg, min(ts) AS min_ts, max(ts) AS max_ts,
                   count(*) AS n, round(sum("value"), 2) AS value_sum,
                   max(event_id) AS max_eid
            FROM s GROUP BY k, seg)
      SELECT {', '.join(sel)} FROM g
    """
    con = duckdb.connect()
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = [tuple(r) for r in res.fetchall()]
    con.close()
    if len(srows) != len(drows):
        return False, f"rowcount stream={len(srows)} duckdb={len(drows)}"
    if sorted(scols) != sorted(dcols):
        return False, f"cols stream={sorted(scols)} duckdb={sorted(dcols)}"
    if table_hash(scols, srows) != table_hash(dcols, drows):
        return False, "value-hash mismatch vs duckdb"
    return True, "ok"


def main(argv: list[str]) -> int:
    n, seed0 = 30, 0
    sf_dir = os.environ.get("FUZZ_SF_DIR", SF_DIR_DEFAULT)
    it = iter(argv)
    for a in it:
        if a == "--n":
            n = int(next(it))
        elif a == "--seed0":
            seed0 = int(next(it))
        elif a == "--sf-dir":
            sf_dir = next(it)

    from citegraph_spark.session import get_spark

    spark = get_spark(app_name="stream_fuzz")
    t0 = time.time()
    n_fail = 0
    for seed in range(seed0, seed0 + n):
        cfg = gen_config(seed)
        ok, msg = run_config(spark, cfg, sf_dir)
        tag = "ok" if ok else "FAIL"
        if not ok:
            n_fail += 1
            print(f"FAIL seed={seed}: {msg}\n  cfg: {cfg}")
        elif (seed - seed0) % 10 == 9:
            print(f"  ... {seed - seed0 + 1}/{n} {tag} ({time.time() - t0:.0f}s)")
    print(
        f"stream_fuzz: {n - n_fail}/{n} configs agree "
        f"(seeds {seed0}..{seed0 + n - 1}, sf_dir={sf_dir}, "
        f"{time.time() - t0:.0f}s)"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
