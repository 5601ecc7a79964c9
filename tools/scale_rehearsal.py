"""10x scale rehearsal for the heavy-tier graph operators.

Builds an sf1-equivalent citation graph by deterministic replication of
the sf0.1 lineitem mapping (K shifted disjoint copies — 10x nodes, 10x
edges, identical per-copy topology so per-round shapes are comparable),
then runs each heavy operator once at 1x and at Kx, recording wall time,
total shuffle read/write bytes, and peak JVM memory from the Spark UI
REST API. Purpose (VERDICT r3 item 6): document that round counts and
broadcast-budget fallbacks behave as designed at 10x, instead of arguing
it from docstrings. Results land in BASELINE.md.

Usage: python tools/scale_rehearsal.py [K]   (default 10)
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

SF_DIR = "/root/testdata/sf0.1"
OFFSET = 100_000_000  # far above any sf0.1 key, keeps copies disjoint


def _rest(port: int, path: str):
    with urllib.request.urlopen(f"http://localhost:{port}/api/v1/{path}") as r:
        return json.load(r)


def _metrics(spark):
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
    [app] = _rest(port, "applications")
    stages = _rest(port, f"applications/{app['id']}/stages?status=complete")
    execs = _rest(port, f"applications/{app['id']}/executors")
    return {
        "shuffle_read_mb": sum(s["shuffleReadBytes"] for s in stages) >> 20,
        "shuffle_write_mb": sum(s["shuffleWriteBytes"] for s in stages) >> 20,
        "n_stages": len(stages),
        "peak_jvm_heap_mb": max(
            (e.get("peakMemoryMetrics", {}) or {}).get("JVMHeapMemory", 0)
            for e in execs
        )
        >> 20,
    }


def _delta(after: dict, before: dict) -> dict:
    out = {k: after[k] - before[k] for k in ("shuffle_read_mb", "shuffle_write_mb", "n_stages")}
    out["peak_jvm_heap_mb"] = after["peak_jvm_heap_mb"]
    return out


def main(k: int = 10) -> int:
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from citegraph_spark.operators.graph import (
        bidirectional,
        connected_components_star,
        connected_pairs_by_distance,
        pagerank,
    )
    from citegraph_spark.operators.mst import minimum_spanning_forest
    from citegraph_spark.functions.sketches import hyperball_hopplot
    from citegraph_spark.session import get_spark

    spark = get_spark(
        app_name="scale_rehearsal", extra_conf={"spark.ui.enabled": "true"}
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        F.col("l_orderkey").cast("long").alias("from"),
        F.col("l_partkey").cast("long").alias("to"),
    )

    def citations(copies: int):
        parts = [
            li.select(
                (F.col("from") + F.lit(i * OFFSET)).alias("from"),
                (F.col("to") + F.lit(i * OFFSET)).alias("to"),
            )
            for i in range(copies)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def heavy_ops(cit):
        edges = bidirectional(cit, dedup=False)
        ded = bidirectional(cit, dedup=True)
        und = cit.filter(F.col("from") != F.col("to")).select(
            F.least("from", "to").alias("a"), F.greatest("from", "to").alias("b")
        ).distinct()
        mst_edges = (
            und.filter((F.col("a") % 4 == 0) & (F.col("b") % 4 == 0))
            .withColumn(
                "weight", ((F.col("a") * 31 + F.col("b") * 17) % 997 + 1).cast("double")
            )
            .select(F.col("a").alias("src"), F.col("b").alias("dst"), "weight")
        )
        return {
            "hyperball_d2": lambda: len(hyperball_hopplot(edges, p=6, max_d=2)),
            "pagerank_10it": lambda: pagerank(
                cit.select(F.col("from").alias("src"), F.col("to").alias("dst")),
                iterations=10,
            ).count(),
            "cc_star": lambda: connected_components_star(
                ded.select(F.col("src"), F.col("dst"))
            ).count(),
            "mst_boruvka": lambda: minimum_spanning_forest(mst_edges).count(),
            "hopplot_d2_exact": lambda: connected_pairs_by_distance(ded, max_d=2)[-1][1],
        }

    results: dict[str, dict] = {}
    for scale, copies in (("1x", 1), ("%dx" % k, k)):
        cit = citations(copies).localCheckpoint(eager=True)
        n_edges = cit.count()
        for name, fn in heavy_ops(cit).items():
            before = _metrics(spark)
            t0 = time.time()
            out = fn()
            wall = round(time.time() - t0, 1)
            m = _delta(_metrics(spark), before)
            results[f"{name}@{scale}"] = {
                "wall_s": wall,
                "result": out,
                "n_edges": n_edges,
                **m,
            }
            print(json.dumps({f"{name}@{scale}": results[f"{name}@{scale}"]}))
    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 10))
