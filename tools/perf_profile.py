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


def _job_timeline(spark, label: str) -> list[dict]:
    """Pull this query's per-job timeline from the UI REST API (jobs are
    matched by the thread-local description set below)."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs") as r:
        jobs = json.load(r)
    out = []
    for j in jobs:
        if label not in (j.get("description") or "") and label not in (
            j.get("name") or ""
        ):
            continue
        sub = j.get("submissionTime", "")
        comp = j.get("completionTime", "")
        dur = None
        try:
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            dur = round(
                (
                    datetime.strptime(comp, fmt) - datetime.strptime(sub, fmt)
                ).total_seconds(),
                3,
            )
        except Exception:
            pass
        out.append(
            {
                "job": j["jobId"],
                "secs": dur,
                "tasks": j.get("numTasks"),
                "stages": len(j.get("stageIds", [])),
                "sub": sub[11:23],
            }
        )
    return sorted(out, key=lambda d: d["job"])


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 1
    want_jobs = "--jobs" in sys.argv[1:]
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from citegraph_spark.plans.entry_queries import QUERIES
    from citegraph_spark.session import get_spark

    # the UI (off by default in get_spark) is the only place per-job
    # submission/completion times live; --jobs needs its REST API
    spark = get_spark(
        app_name="perf_profile",
        extra_conf={"spark.ui.enabled": "true"} if want_jobs else None,
    )
    QUERIES["distinct_flag_status"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, list[float]] = {}
    for name in args:
        ts = []
        for i in range(runs):
            label = f"profile:{name}:{i}"
            spark.sparkContext.setJobDescription(label)
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.time() - t0, 2))
            spark.sparkContext.setJobDescription(None)
            if want_jobs:
                for row in _job_timeline(spark, label):
                    print(f"  {name}[{i}] {row}")
            spark.catalog.clearCache()
            gc.collect()
            spark._jvm.System.gc()
        out[name] = ts
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
