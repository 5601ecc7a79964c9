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
