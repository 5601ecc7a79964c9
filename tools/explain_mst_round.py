"""Dump the physical plan of one Borůvka pointer-doubling jump (plus the
convergence check it pays) for the plans/r13 evidence files.

The registered gate's own explain is a trivial driver-side
createDataFrame (the gate returns one certificate row), so the
meaningful plan for optimization evidence is the per-jump join the
pointer-doubling loop executes — this reproduces round 1 of
minimum_spanning_forest exactly as the operator builds it (canonical
edge table pinned on `a`, comp init, min_by nomination, 2-cycle-broken
initial parents), then prints the jump plan:

- BEFORE the r13 optimization the loop ran TWO jobs per convergence
  check: the doubling jump itself plus a separate jumped-vs-parent
  join + count (every 2nd jump).
- AFTER, the convergence count rides the jump's checkpoint
  materialization as a CollectMetrics observation — one job per jump,
  checked every jump.

The script detects which state it is imported against (the optimized
operator imports `Observation`), so the same file dumps before/after
around the optimization commit.

Usage: python tools/explain_mst_round.py > plans/r13/...txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

from citegraph_spark.lineage import cut_lineage  # noqa: E402
from citegraph_spark.plans.entry_queries import _citations  # noqa: E402
from citegraph_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="explain_mst_round")
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    import citegraph_spark.operators.mst as mst_mod

    optimized = hasattr(mst_mod, "Observation")

    # same induced weighted edge set as the graph_mst_gate entry
    edges = (
        _citations(spark, sf_dir)
        .filter(
            (F.col("from") % 4 == 0)
            & (F.col("to") % 4 == 0)
            & (F.col("from") != F.col("to"))
        )
        .select(
            F.least("from", "to").alias("a"),
            F.greatest("from", "to").alias("b"),
        )
        .distinct()
        .withColumn(
            "weight",
            ((F.col("a") * 31 + F.col("b") * 17) % 997 + 1).cast("double"),
        )
        .select(F.col("a").alias("src"), F.col("b").alias("dst"), "weight")
    )
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col("weight"),
        )
        .groupBy("a", "b")
        .agg(F.min("weight").alias("weight"))
        .repartition(n_shuffle, "a")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e.count()
    comp = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .transform(cut_lineage)
    )
    ca = comp.select(F.col("node").alias("a"), F.col("comp").alias("ca"))
    cb = comp.select(F.col("node").alias("b"), F.col("comp").alias("cb"))
    ec = e.join(ca, "a").join(cb, "b").filter(F.col("ca") != F.col("cb"))
    cand = ec.select(
        F.col("ca").alias("comp"), F.col("cb").alias("other"), "a", "b", "weight"
    ).unionByName(
        ec.select(
            F.col("cb").alias("comp"), F.col("ca").alias("other"), "a", "b", "weight"
        )
    )
    chosen = (
        cand.groupBy("comp")
        .agg(
            F.min_by(
                F.struct("a", "b", "weight", "other"), F.struct("weight", "a", "b")
            ).alias("e")
        )
        .select("comp", "e.a", "e.b", "e.weight", "e.other")
    )
    p = chosen.select("comp", "other")
    parent = (
        p.alias("x")
        .join(p.alias("y"), F.col("x.other") == F.col("y.comp"))
        .select(
            F.col("x.comp").alias("comp"),
            F.when(
                F.col("y.other") == F.col("x.comp"),
                F.least(F.col("x.comp"), F.col("x.other")),
            )
            .otherwise(F.col("y.other"))
            .alias("parent"),
        )
        .transform(cut_lineage)
    )

    if optimized:
        from pyspark.sql import Observation

        obs = Observation("msf_jump_0")
        jumped = (
            parent.alias("x")
            .join(
                parent.select(
                    F.col("comp").alias("parent"), F.col("parent").alias("grand")
                ),
                "parent",
            )
            .select(
                "comp",
                F.col("grand").alias("parent"),
                (F.col("parent") != F.col("grand")).alias("_moved"),
            )
            .observe(obs, F.sum(F.col("_moved").cast("bigint")).alias("moved"))
        )
        print(
            "== msf pointer-doubling jump (r13: convergence rides the jump "
            "as a CollectMetrics observation — ONE job per jump) =="
        )
        jumped.explain("formatted")
    else:
        jumped = (
            parent.alias("x")
            .join(
                parent.select(
                    F.col("comp").alias("parent"), F.col("parent").alias("grand")
                ),
                "parent",
            )
            .select("comp", F.col("grand").alias("parent"))
        )
        print("== msf pointer-doubling jump (pre-r13: job 1 of 2) ==")
        jumped.explain("formatted")
        jc = jumped.transform(cut_lineage)
        changed = (
            jc.alias("n")
            .join(parent.alias("o"), "comp")
            .filter(F.col("n.parent") != F.col("o.parent"))
        )
        print(
            "\n== separate convergence check (pre-r13: job 2 of 2, "
            "every 2nd jump — a full jumped-vs-parent join + count) =="
        )
        changed.explain("formatted")
    return 0


if __name__ == "__main__":
    sys.exit(main())
