"""Subprocess probe for DRIVER-loss recovery (tests/test_driver_loss.py).

Runs a 10-round synchronous pagerank-style iteration over the real
sf0.001 citation edges through `lineage.resumable_rounds` (durable
parquet round snapshots, snapshot_every=2). The parent test SIGKILLs
this WHOLE process group mid-iteration — python driver AND its JVM —
then launches a fresh probe at the same state_dir and asserts it
(a) resumes from the newest committed snapshot instead of round 0, and
(b) finishes with a value hash identical to an uninterrupted control.

Prints one `ROUND k` line per executed round (the parent keys the kill
off these) and `RESULT hash=<h> first=<k> rows=<n>` on completion.
Not a pytest module (leading underscore keeps it out of collection).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

state_dir, sf_dir = sys.argv[1], sys.argv[2]
ROUNDS, SNAP_EVERY, DAMP = 10, 2, 0.85

from pyspark.sql import functions as F  # noqa: E402

from citegraph_spark.lineage import resumable_rounds  # noqa: E402
from citegraph_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="driver_loss_probe", master="local[4]",
                  shuffle_partitions=8)

# deterministic edge set: orders->customer as (src=o_custkey mod 501,
# dst=o_orderkey mod 501) — small, cyclic, rebuilt identically by any
# fresh driver (the probe's durability must come from the snapshots,
# never from anything cached in the dead JVM)
edges = (
    spark.read.parquet(f"{sf_dir}/orders.parquet")
    .select((F.col("o_custkey") % 501).alias("src"),
            (F.col("o_orderkey") % 501).alias("dst"))
    .where(F.col("src") != F.col("dst"))
    .distinct()
)
deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
out = edges.join(deg, "src")
nodes = (edges.select(F.col("src").alias("node"))
         .union(edges.select("dst")).distinct())


def init():
    return nodes.select("node", F.lit(1.0).alias("rank"))


def step(state, k):
    contrib = (
        out.join(state, out["src"] == state["node"])
        .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
        .groupBy("dst").agg(F.sum("c").alias("s"))
    )
    return (
        nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
        .select("node",
                (F.lit(1 - DAMP) +
                 F.lit(DAMP) * F.coalesce(F.col("s"), F.lit(0.0))).alias("rank"))
    )


executed: list[int] = []


def on_round(k: int) -> None:
    executed.append(k)
    print(f"ROUND {k}", flush=True)


final = resumable_rounds(spark, state_dir, init, step, ROUNDS,
                         snapshot_every=SNAP_EVERY, on_round=on_round)

rows = sorted((r["node"], round(r["rank"], 9)) for r in final.collect())
import hashlib  # noqa: E402

h = hashlib.sha256(str(rows).encode()).hexdigest()[:16]
first = executed[0] if executed else ROUNDS + 1  # +1: nothing left to run
print(f"RESULT hash={h} first={first} rows={len(rows)}", flush=True)
spark.stop()
