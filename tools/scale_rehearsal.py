"""10x scale rehearsal for the heavy-tier graph operators.

Builds an sf1-equivalent citation graph by deterministic replication of
the sf0.1 lineitem mapping (K shifted disjoint copies — 10x nodes, 10x
edges, identical per-copy topology so per-round shapes are comparable),
then runs each heavy operator once at 1x and at Kx, recording wall time,
total shuffle read/write bytes, and peak JVM memory from the Spark UI
REST API. Purpose (VERDICT r3 item 6): document that round counts and
broadcast-budget fallbacks behave as designed at 10x, instead of arguing
it from docstrings. Results land in BASELINE.md.

Usage: python tools/scale_rehearsal.py [K] [tier]   (default 10 graph)
       tier: "graph" (heavy graph operators over the citation mapping)
             or "pipeline" (dedup/similarity LLM-pipeline tier over
             documents/embeddings; copies are deterministically
             perturbed — a copy-index token appended to each text —
             so replicas are NEAR-duplicates, the realistic worst case
             for LSH candidate volume, not byte-identical ones)
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


def pipeline_tier(spark, k: int) -> dict:
    """1x vs Kx over the dedup/similarity layer. Documents replicate with
    a per-copy suffix token (near-dup clusters of size K — LSH's
    realistic stress); embeddings replicate with the copy index added to
    one dimension (distinct but locally clustered vectors)."""
    from pyspark.sql import functions as F

    from citegraph_spark.functions.dedup import (
        exact_canonical,
        minhash_lsh_pairs,
        simhash_near_pairs,
    )
    from citegraph_spark.functions.similarity import ivf_topk

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def docs_x(copies: int):
        parts = [
            docs.select(
                (F.col("doc_id") + F.lit(i * OFFSET)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" copytok{i}")).alias("text"),
            )
            for i in range(copies)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def emb_x(copies: int):
        parts = [
            emb.select(
                (F.col("vec_id") + F.lit(i * OFFSET)).alias("vec_id"),
                F.transform(
                    "embedding", lambda x, j: x + F.when(j == 0, i * 0.01).otherwise(0.0)
                ).alias("embedding"),
            )
            for i in range(copies)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    results: dict[str, dict] = {}
    for scale, copies in (("1x", 1), ("%dx" % k, k)):
        d = docs_x(copies).localCheckpoint(eager=True)
        e = emb_x(copies).localCheckpoint(eager=True)
        ops = {
            "dedup_exact": lambda: exact_canonical(d, "doc_id", "text").count(),
            "minhash_lsh_pairs": lambda: minhash_lsh_pairs(d, threshold=0.8).count(),
            "simhash_near_pairs": lambda: simhash_near_pairs(d, max_hamming=3).count(),
            "ivf_topk": lambda: ivf_topk(e, k=3).count(),
        }
        for name, fn in ops.items():
            before = _metrics(spark)
            t0 = time.time()
            out = fn()
            wall = round(time.time() - t0, 1)
            m = _delta(_metrics(spark), before)
            results[f"{name}@{scale}"] = {"wall_s": wall, "result": out, **m}
            print(json.dumps({f"{name}@{scale}": results[f"{name}@{scale}"]}))
    return results


def main(k: int = 10, tier: str = "graph") -> int:
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

    if tier == "pipeline":
        results = pipeline_tier(spark, k)
        print(json.dumps(results, indent=1))
        return 0

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
    sys.exit(
        main(
            int(sys.argv[1]) if len(sys.argv) > 1 else 10,
            sys.argv[2] if len(sys.argv) > 2 else "graph",
        )
    )
