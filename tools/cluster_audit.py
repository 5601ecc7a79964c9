"""Multi-executor plan-parity audit (round-11 verdict item 3).

Every registry entry is certified on `local[32]` — one JVM, one block
manager, zero network shuffles. A real cluster differs in ways local
mode cannot see: executors are separate JVMs (serialization actually
runs), shuffle blocks cross process boundaries, broadcast variables are
physically shipped, and Python workers start fresh per executor. This
tool runs the heaviest bench entries under BOTH masters, asserts
value-hash parity, and diffs the final (post-AQE) executed plans for
surprise join-strategy flips (BroadcastNestedLoopJoin / CartesianProduct
appearing in one mode only).

Two layers:
  worker  — `--mode local|cluster`: boots the session, runs each entry,
            collects rows, hashes with tools.oracle_check.table_hash,
            captures the final executed plan, writes a JSON report.
            Runs in a SUBPROCESS so each master gets a clean JVM (Spark
            config does not reliably reset across getOrCreate()).
  orchestrator (default) — runs both workers serially, compares hashes
            and plan-node histograms, prints the audit table, exits
            nonzero on any hash mismatch or cluster-only red-flag node.

`local-cluster[2,4,4096]` = 2 separate executor JVMs x 4 cores x 4 GiB —
the same fault-injection topology tests/_kill_probe.py proved out for
the executor-kill probes (reference semantics unchanged; this audits
the plan/value surface rather than recovery).

Usage:
  python tools/cluster_audit.py [--entries a,b,...] [--sf-dir DIR]
                                [--json OUT.json]
  python tools/cluster_audit.py --mode local --entries ... --json OUT
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.oracle_check import table_hash  # noqa: E402

SF_DIR_DEFAULT = os.environ.get("AUDIT_SF_DIR", "/root/testdata/sf0.01")

# BENCH_r10 top12 — the per-round heaviest entries (VERDICT r10 item 3).
DEFAULT_ENTRIES = [
    "graph_mst_gate",
    "pca_power_gate",
    "graph_hyperball",
    "graph_hopplot_d2",
    "graph_pagerank",
    "graph_hits",
    "graph_mis_gate",
    "graph_diameter_double_sweep",
    "graph_link_prediction",
    "graph_ktruss_gate",
    "graph_cc_star_gate",
    "logreg_train_gate",
]

# Join/exchange physical operators worth histogramming. BNLJ and
# CartesianProduct are red flags anywhere; the rest are strategy
# signals whose LOCAL-vs-CLUSTER drift we want surfaced.
PLAN_NODES = [
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BroadcastExchange",
    "Exchange",
]
RED_FLAGS = {"BroadcastNestedLoopJoin", "CartesianProduct"}


def plan_histogram(plan: str) -> dict[str, int]:
    hist = {}
    for node in PLAN_NODES:
        # the (?<![A-Za-z]) lookbehind already keeps 'Exchange' from
        # matching inside 'BroadcastExchange'
        n = len(re.findall(rf"(?<![A-Za-z]){node}(?![a-z])", plan))
        if n:
            hist[node] = n
    return hist


def run_worker(mode: str, entries: list[str], sf_dir: str, out: str) -> None:
    from citegraph_spark.session import get_spark

    if mode == "cluster":
        spark = get_spark(
            app_name="cluster_audit",
            master="local-cluster[2,4,4096]",
            shuffle_partitions=16,
            extra_conf={
                "spark.executor.memory": "3g",
                "spark.default.parallelism": "16",
            },
        )
    else:
        spark = get_spark(app_name="cluster_audit")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    report: dict[str, dict] = {}
    for name in entries:
        rec: dict = {}
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            rows = [tuple(r) for r in sdf.collect()]
            rec["rows"] = len(rows)
            rec["hash"] = table_hash(sdf.columns, rows)
            # executedPlan AFTER the action → AdaptiveSparkPlan has
            # mutated to its final physical plan (isFinalPlan=true),
            # so the histogram reflects what actually ran, not the
            # pre-AQE guess.
            plan = sdf._jdf.queryExecution().executedPlan().toString()
            rec["plan_nodes"] = plan_histogram(plan)
            rec["red_flags"] = sorted(set(rec["plan_nodes"]) & RED_FLAGS)
            rec["secs"] = round(time.time() - t0, 2)
            print(f"  {mode:7s} {name}: {rec['rows']} rows "
                  f"hash={rec['hash']} {rec['secs']}s {rec['plan_nodes']}")
        except Exception as ex:  # noqa: BLE001 — report, don't crash the sweep
            rec["error"] = f"{type(ex).__name__}: {ex}"
            print(f"  {mode:7s} {name}: ERROR {rec['error']}")
        report[name] = rec
    spark.stop()
    with open(out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)


def orchestrate(entries: list[str], sf_dir: str, json_out: str | None) -> int:
    tmp = {m: os.path.join(ROOT, f".cluster_audit_{m}.json")
           for m in ("local", "cluster")}
    for mode in ("local", "cluster"):
        print(f"== running {len(entries)} entries, mode={mode}, "
              f"sf_dir={sf_dir}")
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--mode", mode, "--entries", ",".join(entries),
             "--sf-dir", sf_dir, "--json", tmp[mode]],
            cwd=ROOT,
        ).returncode
        if rc != 0:
            print(f"FAIL: {mode} worker exited {rc}")
            return 1

    loc = json.load(open(tmp["local"]))
    clu = json.load(open(tmp["cluster"]))
    n_bad = 0
    print(f"\n{'entry':32s} {'hash==':6s} {'local_s':>8s} {'clus_s':>8s}  "
          f"plan drift / red flags")
    for name in entries:
        a, b = loc.get(name, {}), clu.get(name, {})
        if "error" in a or "error" in b:
            n_bad += 1
            print(f"{name:32s} ERROR  {a.get('error', '')} "
                  f"{b.get('error', '')}")
            continue
        ok = a["hash"] == b["hash"] and a["rows"] == b["rows"]
        drift = {
            k: (a["plan_nodes"].get(k, 0), b["plan_nodes"].get(k, 0))
            for k in set(a["plan_nodes"]) | set(b["plan_nodes"])
            if a["plan_nodes"].get(k, 0) != b["plan_nodes"].get(k, 0)
        }
        new_red = sorted(set(b.get("red_flags", [])) -
                         set(a.get("red_flags", [])))
        if not ok or new_red:
            n_bad += 1
        print(f"{name:32s} {'OK' if ok else 'MISMATCH':6s} "
              f"{a['secs']:8.2f} {b['secs']:8.2f}  "
              f"{drift or ''}{' RED:' + str(new_red) if new_red else ''}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "local": loc, "cluster": clu},
                      f, indent=1, sort_keys=True)
    print(f"\ncluster_audit: {len(entries) - n_bad}/{len(entries)} parity"
          f"{', ' + str(n_bad) + ' FAILURES' if n_bad else ''}")
    return 1 if n_bad else 0


def main(argv: list[str]) -> int:
    mode, entries, sf_dir, json_out = None, DEFAULT_ENTRIES, SF_DIR_DEFAULT, None
    it = iter(argv)
    for a in it:
        if a == "--mode":
            mode = next(it)
        elif a == "--entries":
            entries = next(it).split(",")
        elif a == "--sf-dir":
            sf_dir = next(it)
        elif a == "--json":
            json_out = next(it)
    if mode:
        run_worker(mode, entries, sf_dir, json_out or "/dev/stdout")
        return 0
    return orchestrate(entries, sf_dir, json_out)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
