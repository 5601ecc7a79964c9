"""Lineage truncation for iterative round state — local-fast by default,
reliable-checkpoint behind one session knob.

Every iterative operator in this engine (pagerank/hits/sssp/BFS
frontiers, star-contraction CC, Borůvka MSF, k-truss peeling, LPA,
HyperBall, MIS/matching, BPE merge rounds, k-center, and the
partition-carry relational idioms) truncates its per-round plan lineage
so round N+1's plan does not embed round N's. `DataFrame.localCheckpoint`
is the right default on local[*] and for short jobs: blocks live in
executor storage, no DFS round-trip. It is NOT fault-tolerant — the
truncated lineage cannot recompute lost blocks, so on a multi-hour
1000-executor job a single executor loss kills the query (Spark's own
API docs carry this caveat).

At cluster scale, flip ONE knob instead of editing operators:

    spark.sparkContext.setCheckpointDir("hdfs://.../checkpoints")
    spark.conf.set("spark.citegraph.reliableCheckpoint", "true")

and every operator's round state goes through reliable
`DataFrame.checkpoint` (DFS-backed, survives executor loss; cost is one
write+read of the round state per round — the standard durability trade
for long iterative jobs). Call sites use `df.transform(cut_lineage)` —
the same chain position as the `.localCheckpoint(eager=True)` they
replace, and the default path forwards to exactly that call
(test-pinned in tests/test_lineage.py).

Operational note for long jobs: reliable checkpoints accumulate one
directory per round under the checkpoint dir. Set
`spark.cleaner.referenceTracking.cleanCheckpoints=true` so checkpoints
whose DataFrames go out of scope are deleted by the ContextCleaner, or
point the dir at a storage-lifecycle-managed path — otherwise a
1000-round job leaves 1000 round-state snapshots on the DFS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

RELIABLE_FLAG = "spark.citegraph.reliableCheckpoint"


def cut_lineage(df: DataFrame) -> DataFrame:
    """Materialize `df` and truncate its plan lineage.

    Default: `localCheckpoint(eager=True)` (fast, executor-local, not
    fault-tolerant). With `spark.citegraph.reliableCheckpoint=true` and
    a checkpoint dir set on the SparkContext: `checkpoint(eager=True)`
    (DFS-backed, survives executor loss). Always eager — every caller
    is per-round state that is counted or joined immediately, and lazy
    truncation would re-plan the round on first use.
    """
    spark = df.sparkSession
    if str(spark.conf.get(RELIABLE_FLAG, "false")).lower() == "true":
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


# --------------------------------------------------------------------------
# driver-loss recovery: durable round snapshots
# --------------------------------------------------------------------------
#
# Honest scope note, probe-verified (tests/test_driver_loss.py): neither
# localCheckpoint nor reliable DataFrame.checkpoint survives DRIVER loss.
# Reliable checkpoint files are serialized InternalRow partitions keyed by
# the owning SparkContext's id; Spark exposes no public API to rehydrate
# them into a NEW driver (RDD#checkpointFile is private[spark], and the
# DataFrame layer has nothing at all). Executor loss: covered (round-9
# kill probe). Driver loss: the application must own its durable state —
# which is standard practice for long iterative Spark jobs (the cluster
# manager re-submits the app; the app resumes from its own snapshots).
#
# `resumable_rounds` is that ownership, factored once: each round's state
# is written as parquet under <state_dir>/round=K (the _SUCCESS marker
# commits the snapshot atomically — a snapshot interrupted by the crash
# has no marker and is ignored on resume), and a fresh driver restarts
# the loop from the newest COMMITTED round instead of round 0. Reading
# the snapshot back also truncates lineage, so inside this loop no extra
# cut_lineage is needed.


def _fs_exists(spark, path: str) -> bool:
    """Existence check through the JVM Hadoop FileSystem, so DFS paths
    (hdfs://, s3a://) work the same as local ones."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)


def resumable_rounds(
    spark,
    state_dir: str,
    init,
    step,
    rounds: int,
    snapshot_every: int = 1,
    on_round=None,
) -> DataFrame:
    """Run `rounds` iterations of `step`, driver-loss-recoverably.

    init() -> DataFrame               initial round-0 state
    step(state, k) -> DataFrame       state after round k (1-based);
                                      must be deterministic given state
                                      (all engine operators are — pinned
                                      by the scan-scramble boards)
    snapshot_every                    snapshot cadence; rounds between
                                      snapshots are recomputed on resume
                                      (cost/durability trade — same knob
                                      shape as checkpoint_every on the
                                      iterative operators)
    on_round(k)                       optional progress hook (the kill
                                      probe keys its SIGKILL off it)

    Resume contract: a fresh driver pointed at the same state_dir skips
    every round at-or-before the newest committed snapshot. The final
    state is ALWAYS snapshotted so a completed run is a no-op to re-run.
    """
    start, state = 0, None
    for k in range(rounds, 0, -1):
        if k % snapshot_every and k != rounds:
            continue
        if _fs_exists(spark, f"{state_dir}/round={k}/_SUCCESS"):
            state = spark.read.parquet(f"{state_dir}/round={k}")
            start = k
            break
    if state is None:
        state = init()
    for k in range(start + 1, rounds + 1):
        state = step(state, k)
        if k % snapshot_every == 0 or k == rounds:
            state.write.mode("overwrite").parquet(f"{state_dir}/round={k}")
            state = spark.read.parquet(f"{state_dir}/round={k}")
        else:
            state = cut_lineage(state)
        if on_round is not None:
            on_round(k)
    return state
