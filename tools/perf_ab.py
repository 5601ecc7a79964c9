"""Quiet-machine perf A/B for the heavy graph trio (VERDICT r2 item 3).

Runs N repetitions of each named query at sf0.1 in a fresh warm session,
mimicking bench.py's isolation (clearCache + JVM GC between runs), and
prints per-query medians as one JSON line.

Usage: python tools/perf_ab.py [query ...]   (default: the graph trio)
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = ["graph_hopplot_d2", "graph_hyperball", "graph_pagerank"]
RUNS = int(os.environ.get("PERF_AB_RUNS", "3"))


def main() -> int:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from citegraph_spark.plans.entry_queries import QUERIES
    from citegraph_spark.session import get_spark

    spark = get_spark(app_name="perf_ab")
    QUERIES["distinct_flag_status"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, dict] = {}
    for name in names:
        ts = []
        for _ in range(RUNS):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.time() - t0, 2))
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
        out[name] = {"runs": ts, "median": statistics.median(ts)}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
