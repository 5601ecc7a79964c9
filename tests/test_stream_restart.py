"""Streaming checkpoint RESTART recovery — the crash-recovery contract.

The executor-kill probe (tests/_kill_probe.py, BASELINE.md round-9
record) covers BATCH iterative round state; this probe covers the other
operational claim streaming/events.py makes and never exercised: a
watermarked stateful windowed aggregate (append mode) driven over a
4-file chronological replay with maxFilesPerTrigger=1 is killed
MID-BATCH by an injected foreachBatch exception — AFTER the sink write
of the poisoned batch, BEFORE its commit-log entry — and restarted from
the SAME checkpoint directory. Structured Streaming must

  (a) restore window + watermark state from the state store,
  (b) re-execute the uncommitted batch with the SAME batch id and the
      SAME contents (the offset-log WAL pins the file set and watermark),
  (c) then finish the remaining files,

and the batch-id-scoped dynamic partition overwrite in the foreachBatch
sink must make the re-delivery invisible — the exactly-once recipe for a
non-transactional parquet store.

Negative control (the probe has teeth): the identical crash with a plain
APPEND sink double-lands exactly the poisoned batch's rows — the failure
mode the idempotent sink exists to prevent, observed, not assumed.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from citegraph_spark.streaming.events import (
    _count_state_fn,
    _events_read_schema,
    _normalize_ts,
    streaming_windowed_agg,
)

SF_DIR = "/root/testdata/sf0.001"
N_FILES = 4
POISON = 2  # 0-indexed micro-batch to crash in: two committed before, one file after


def _write_replay(spark, in_dir: str):
    """Split the events table into N_FILES chronological parquet files
    (same recipe as run_windowed_append_demo) so each micro-batch
    advances the watermark and finalizes earlier windows."""
    schema, ts_is_long = _events_read_schema(spark, f"{SF_DIR}/events.parquet")
    batch = _normalize_ts(
        spark.read.parquet(f"{SF_DIR}/events.parquet"), ts_is_long
    ).orderBy("ts")
    rows = batch.collect()
    os.makedirs(in_dir, exist_ok=True)
    step = (len(rows) + N_FILES - 1) // N_FILES
    tmp = tempfile.mkdtemp()
    for i in range(N_FILES):
        chunk = rows[i * step: (i + 1) * step]
        spark.createDataFrame(chunk, batch.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/f{i}")
        for f in os.listdir(f"{tmp}/f{i}"):
            if f.endswith(".parquet"):
                os.rename(f"{tmp}/f{i}/{f}", f"{in_dir}/{i:02d}.parquet")
    shutil.rmtree(tmp, ignore_errors=True)
    return batch.schema


def _run_stream(
    spark,
    in_dir: str,
    schema,
    out_dir: str,
    ckpt: str,
    poison_marker: str | None,
    idempotent: bool,
) -> Exception | None:
    """One streaming run to quiescence (or to the injected crash).
    Returns the crash exception when the poison fired, else None."""
    raw = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(in_dir)
    )
    agg = streaming_windowed_agg(raw)

    def write_batch(bdf, bid: int) -> None:
        part = bdf.withColumn("_batch", F.lit(bid))
        if idempotent:
            (
                part.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch")
                .parquet(out_dir)
            )
        else:
            part.write.mode("append").parquet(out_dir)
        # crash AFTER the sink write, BEFORE Spark writes batch `bid`'s
        # commit-log entry: the exact window a real executor/driver loss
        # hits; the marker makes the poison fire once so the restarted
        # query survives its re-delivery of the same batch
        if poison_marker and bid == POISON and not os.path.exists(poison_marker):
            with open(poison_marker, "w") as fh:
                fh.write(str(bid))
            raise RuntimeError("injected crash after sink write")

    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    except Exception as ex:  # the injected crash surfaces here
        try:
            q.awaitTermination(30)  # re-raises the failure cause; drain it
        except Exception:
            pass
        return ex
    q.stop()
    q.awaitTermination(30)
    return None


def _merged(spark, out_dir: str):
    """Sink rows minus the batch-id column, as a sorted multiset."""
    return sorted(
        map(
            tuple,
            spark.read.parquet(out_dir)
            .select("window_start", "event_type", "n", "value_sum")
            .collect(),
        )
    )


def test_restart_from_checkpoint_is_exactly_once(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    schema = _write_replay(spark, in_dir)

    # ---- reference: uninterrupted run
    ref_out, ref_ckpt = str(tmp_path / "ref_out"), str(tmp_path / "ref_ckpt")
    assert _run_stream(spark, in_dir, schema, ref_out, ref_ckpt, None, True) is None
    ref = _merged(spark, ref_out)
    assert ref, "reference run emitted nothing — replay layout broken"

    # ---- crash mid-batch, restart from the SAME checkpoint dir
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    marker = str(tmp_path / "poison_fired")
    ex = _run_stream(spark, in_dir, schema, out, ckpt, marker, True)
    assert ex is not None and "injected crash" in str(ex)
    assert os.path.exists(marker), "poison never fired — probe is vacuous"
    # restart: same checkpoint, same sink; the poisoned batch re-delivers
    assert _run_stream(spark, in_dir, schema, out, ckpt, marker, True) is None

    # the poisoned batch emitted rows and its re-delivery was absorbed
    per_batch = dict(
        spark.read.parquet(out).groupBy("_batch").count().collect()
    )
    assert per_batch.get(POISON, 0) > 0, (
        "poisoned batch finalized no windows — move POISON"
    )
    assert _merged(spark, out) == ref


def _run_counts_stream(
    spark,
    in_dir: str,
    schema,
    out_dir: str,
    ckpt: str,
    poison_marker: str | None,
) -> Exception | None:
    """Like _run_stream but over the applyInPandasWithState per-user
    counter (GroupState), always with the idempotent batch-id sink —
    this probe targets STATE recovery, not sink idempotence (test 2
    already owns that axis)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    raw = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .load(in_dir)
    )
    counted = raw.groupBy("user_id").applyInPandasWithState(
        _count_state_fn,
        outputStructType="user_id bigint, n_events bigint, value_sum double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def write_batch(bdf, bid: int) -> None:
        (
            bdf.withColumn("_batch", F.lit(bid))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch")
            .parquet(out_dir)
        )
        if poison_marker and bid == POISON and not os.path.exists(poison_marker):
            with open(poison_marker, "w") as fh:
                fh.write(str(bid))
            raise RuntimeError("injected crash after sink write")

    q = (
        counted.writeStream.outputMode("update")
        .foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    except Exception as ex:
        try:
            q.awaitTermination(30)
        except Exception:
            pass
        return ex
    q.stop()
    q.awaitTermination(30)
    return None


def _final_totals(spark, out_dir: str) -> dict:
    """Per-user final (n_events, value_sum): update mode emits a row only
    for users PRESENT in a micro-batch, so the row from each user's
    maximum _batch is their final counter state."""
    rows = (
        spark.read.parquet(out_dir)
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.col("_batch").desc())
            ),
        )
        .filter(F.col("_rn") == 1)
        .select("user_id", "n_events", "value_sum")
        .collect()
    )
    return {r[0]: (r[1], r[2]) for r in rows}


def test_restart_recovers_group_state_exactly_once(spark, tmp_path):
    """applyInPandasWithState (GroupState) across a crash+restart — the
    state-recovery surface the windowed-append probe does NOT cover:
    the state store must roll back the failed batch-2 attempt's state
    delta (its version never committed) and re-execute batch 2 from the
    post-batch-1 state. A leaked delta double-counts every batch-2 user
    (n_events inflated); a lost store under-counts — the batch ground
    truth over the full input catches both directions."""
    in_dir = str(tmp_path / "in")
    schema = _write_replay(spark, in_dir)

    # ground truth, computed in BATCH over the whole replay input
    truth = {
        r[0]: (r[1], r[2])
        for r in spark.read.parquet(in_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }

    # reference: uninterrupted stateful run
    ref_out, ref_ckpt = str(tmp_path / "ref_out"), str(tmp_path / "ref_ckpt")
    assert _run_counts_stream(spark, in_dir, schema, ref_out, ref_ckpt, None) is None
    ref = _final_totals(spark, ref_out)
    assert ref, "reference stateful run emitted nothing"

    # crash inside batch 2, restart from the same checkpoint
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    marker = str(tmp_path / "poison_fired")
    ex = _run_counts_stream(spark, in_dir, schema, out, ckpt, marker)
    assert ex is not None and "injected crash" in str(ex)
    assert os.path.exists(marker), "poison never fired — probe is vacuous"
    assert _run_counts_stream(spark, in_dir, schema, out, ckpt, marker) is None

    got = _final_totals(spark, out)
    # exact equality vs the uninterrupted streaming run: the WAL pins
    # identical per-batch file sets, so even float accumulation order
    # matches batch-for-batch
    assert got == ref
    # ...and both agree with the batch ground truth (float tolerance:
    # streaming accumulates per-batch pandas partial sums, batch sums in
    # one pass — same values, different association)
    assert set(got) == set(truth)
    for user, (n, s) in got.items():
        tn, ts = truth[user]
        assert n == tn, f"user {user}: n_events {n} != batch truth {tn}"
        assert abs(s - round(float(ts), 2)) < 1e-6, (
            f"user {user}: value_sum {s} != batch truth {ts}"
        )
    # the poisoned batch really exercised state continuity: some batch-2
    # user must ALSO appear in an earlier batch (its counter crossed the
    # crash), otherwise the re-execution never read restored state
    by_batch = (
        spark.read.parquet(out)
        .select("user_id", "_batch")
        .distinct()
        .collect()
    )
    earlier = {r[0] for r in by_batch if r[1] < POISON}
    poisoned = {r[0] for r in by_batch if r[1] == POISON}
    assert earlier & poisoned, (
        "no user spans the crash boundary — replay layout makes the probe vacuous"
    )


def test_restart_recovers_group_state_under_rocksdb(spark, tmp_path):
    """Same GroupState crash+restart contract on the RocksDB state store
    provider WITH changelog checkpointing — the configuration a large
    keyspace actually runs (the default HDFSBackedStateStore keeps every
    state row on the JVM heap; RocksDB spills to local disk and
    changelog mode uploads per-batch deltas instead of full snapshots).
    A checkpoint is bound to its provider for its lifetime, so the probe
    uses fresh checkpoint dirs and keeps the provider constant across
    the crash+restart pair."""
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    changelog_key = (
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    )
    old_provider = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    spark.conf.set(changelog_key, "true")
    try:
        in_dir = str(tmp_path / "in")
        schema = _write_replay(spark, in_dir)
        truth = {
            r[0]: (r[1], r[2])
            for r in spark.read.parquet(in_dir)
            .groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
            .collect()
        }
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        marker = str(tmp_path / "poison_fired")
        ex = _run_counts_stream(spark, in_dir, schema, out, ckpt, marker)
        assert ex is not None and "injected crash" in str(ex)
        assert os.path.exists(marker)
        assert _run_counts_stream(spark, in_dir, schema, out, ckpt, marker) is None

        got = _final_totals(spark, out)
        assert set(got) == set(truth)
        for user, (n, s) in got.items():
            tn, ts = truth[user]
            assert n == tn
            assert abs(s - round(float(ts), 2)) < 1e-6
    finally:
        if old_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old_provider)
        spark.conf.unset(changelog_key)


def test_restart_without_idempotent_sink_duplicates_poisoned_batch(
    spark, tmp_path
):
    """Negative control: a plain append sink double-lands EXACTLY the
    poisoned batch's rows across the crash+restart — same batch id, same
    contents (the WAL pins both), landed twice."""
    in_dir = str(tmp_path / "in")
    schema = _write_replay(spark, in_dir)

    ref_out, ref_ckpt = str(tmp_path / "ref_out"), str(tmp_path / "ref_ckpt")
    assert (
        _run_stream(spark, in_dir, schema, ref_out, ref_ckpt, None, False)
        is None
    )
    ref_rows = spark.read.parquet(ref_out)
    n_ref = ref_rows.count()
    n_poison = ref_rows.filter(F.col("_batch") == POISON).count()
    assert n_poison > 0

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    marker = str(tmp_path / "poison_fired")
    ex = _run_stream(spark, in_dir, schema, out, ckpt, marker, False)
    assert ex is not None and os.path.exists(marker)
    assert _run_stream(spark, in_dir, schema, out, ckpt, marker, False) is None

    dup = spark.read.parquet(out)
    assert dup.count() == n_ref + n_poison
    assert (
        dup.filter(F.col("_batch") == POISON).count() == 2 * n_poison
    ), "re-delivered batch was not identical to the original"
    assert _merged(spark, out) != _merged(spark, ref_out)
