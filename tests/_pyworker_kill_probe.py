"""Subprocess probe: executor loss mid-query for the PYTHON-WORKER
families (round-12 verdict item 4).

The round-9 kill probes predate the addPyFile package-shipping fix and
exercised JVM-side plans only. The families the round-11 cluster audit
exposed — mapInPandas sketches and applyInPandasWithState streaming —
re-create Python workers when a lost executor is replaced, so executor
loss for them additionally proves that (a) Spark re-ships the
addPyFile'd package zip to the REPLACEMENT executor (the driver serves
tracked files to every newly registered executor) and (b) the fresh
Python workers can re-import `citegraph_spark` there. A regression in
either re-introduces the round-11 ModuleNotFoundError class, but only
after a fault — invisible to the steady-state cluster parity board.

Runs a registry entry under local-cluster[2,4,4096] (separate executor
JVMs) and, unless --no-kill, SIGKILLs one CoarseGrainedExecutorBackend
the moment executor-side Python daemons exist (i.e. a Python-worker
stage is actually executing — killing before any Python stage runs
would prove nothing about the worker re-import path).

Usage: _pyworker_kill_probe.py <entry_name> <sf_dir> [--no-kill]
Prints `RESULT <sha16> rows=N killed=PID|None secs=S` and exits 0, or
`FAILED killed=PID: <error>` and exits 1. Leading underscore keeps it
out of pytest collection.
"""

from __future__ import annotations

import hashlib
import os
import signal
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

entry_name, sf_dir = sys.argv[1], sys.argv[2]
do_kill = "--no-kill" not in sys.argv

from citegraph_spark.session import get_spark  # noqa: E402

spark = get_spark(
    app_name=f"pyworker_kill_{entry_name}",
    master="local-cluster[2,4,4096]",
    shuffle_partitions=8,
    extra_conf={
        "spark.default.parallelism": "8",
        # survive one executor's death without failing the app: with 2
        # executors the default maxFailures=4 already suffices for task
        # retry; the replacement executor comes from the worker's
        # restart of the backend process
        "spark.task.maxFailures": "8",
    },
)

import __spark_entry__ as entry_mod  # noqa: E402

killed: dict = {"pid": None}
start = time.time()


# Scope every ps scan to THIS app (r12 ADVICE): under concurrent Spark
# runs (pytest -n, parallel audits) a machine-global grep could SIGKILL
# another job's executor — flaking that job while this probe's parity
# check passes vacuously (killed=PID reported, but our own executor
# never died).
APP_ID = spark.sparkContext.applicationId


def _our_executors() -> list[int]:
    """Executor JVMs of THIS application: CoarseGrainedExecutorBackend is
    launched with `--app-id <applicationId>` on its command line."""
    out = subprocess.run(
        ["ps", "-eo", "pid,args"], capture_output=True, text=True
    ).stdout
    return [
        int(line.split(None, 1)[0])
        for line in out.splitlines()
        if "CoarseGrainedExecutorBackend" in line and APP_ID in line
    ]


def _our_daemons() -> list[int]:
    """pyspark.daemon processes whose PARENT is one of our executor JVMs
    (the daemon carries no app id itself; ancestry scopes it)."""
    execs = set(_our_executors())
    if not execs:
        return []
    out = subprocess.run(
        ["ps", "-eo", "pid,ppid,args"], capture_output=True, text=True
    ).stdout
    pids = []
    for line in out.splitlines():
        parts = line.split(None, 2)
        if len(parts) == 3 and "pyspark.daemon" in parts[2]:
            try:
                if int(parts[1]) in execs:
                    pids.append(int(parts[0]))
            except ValueError:
                continue
    return pids


def _watcher() -> None:
    deadline = time.time() + 300
    while time.time() < deadline:
        time.sleep(0.05)
        # executor-side Python daemons exist => a Python-worker stage is
        # mid-flight RIGHT NOW; this is the moment whose loss matters
        if _our_daemons():
            break
    pids = _our_executors()
    if pids:
        killed["pid"] = pids[0]
        print(f"WATCHER: killing executor pid {pids[0]} of {pids}", flush=True)
        os.kill(pids[0], signal.SIGKILL)
    else:
        print("WATCHER: no executor JVM found", flush=True)


if do_kill:
    threading.Thread(target=_watcher, daemon=True).start()

try:
    df = entry_mod.queries()[entry_name](spark, sf_dir)
    rows = sorted(tuple(str(c) for c in r) for r in df.collect())
    digest = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
    print(
        f"RESULT {digest} rows={len(rows)} killed={killed['pid']} "
        f"secs={time.time() - start:.0f}",
        flush=True,
    )
    spark.stop()
    sys.exit(0)
except Exception as ex:  # noqa: BLE001 — the probe's contract is exit status
    print(
        f"FAILED killed={killed['pid']}: {type(ex).__name__}: {str(ex)[:800]}",
        flush=True,
    )
    spark.stop()
    sys.exit(1)
