"""Executor loss mid-query for the Python-worker families (round-12
verdict item 4): mapInPandas sketches and applyInPandasWithState
streaming re-create Python workers on the replacement executor, so a
kill exercises the addPyFile re-ship + worker re-import path that the
round-11 ModuleNotFoundError class lived in. Each test runs the probe
twice under local-cluster[2,4,4096] — control (no kill) and kill — and
asserts value-hash parity plus that the kill actually landed.

sf0.01 keeps the wall per probe ~1 min; the Python stage at that scale
is still long enough (seconds) for the daemon-sighting watcher to land
the SIGKILL mid-stage (the probe asserts it did: killed=PID).
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

import pytest

_PROBE = os.path.join(os.path.dirname(__file__), "_pyworker_kill_probe.py")
_SF = os.environ.get("KILLTEST_SF_DIR", "/root/testdata/sf0.01")


def _run(entry: str, kill: bool) -> dict:
    cmd = [sys.executable, _PROBE, entry, _SF] + ([] if kill else ["--no-kill"])
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "4g")
    p = subprocess.run(cmd, capture_output=True, text=True, timeout=600, env=env)
    m = re.search(
        r"RESULT (\w{16}) rows=(\d+) killed=(\S+) secs=(\d+)", p.stdout
    )
    assert p.returncode == 0 and m, (
        f"probe failed for {entry} kill={kill}:\n"
        f"{p.stdout[-2000:]}\n{p.stderr[-2000:]}"
    )
    return {"hash": m.group(1), "rows": int(m.group(2)), "killed": m.group(3)}


@pytest.mark.parametrize(
    "entry", ["heavy_hitters_cms", "streaming_stateful_counts"]
)
def test_pyworker_family_survives_executor_kill_with_parity(entry):
    control = _run(entry, kill=False)
    assert control["killed"] == "None"
    killed = _run(entry, kill=True)
    assert killed["killed"] != "None", (
        "watcher never landed a kill — probe proves nothing; check the "
        "pyspark.daemon sighting trigger"
    )
    assert killed["hash"] == control["hash"], (
        f"{entry}: post-kill result diverged from control "
        f"({killed} vs {control})"
    )
    assert killed["rows"] == control["rows"]
