"""Driver-loss recovery probe (round-11 verdict item 6) — the last
fault class: executor kill (round 9) and streaming restart (round 10)
are covered; this kills the DRIVER of a batch iterative job.

The honest negative first (pinned in lineage.py's module docstring):
neither localCheckpoint nor reliable DataFrame.checkpoint survives
driver loss — reliable checkpoint files are serialized InternalRow
partitions owned by the dead SparkContext, and Spark has no public API
to rehydrate them into a new driver. What DOES survive is application-
level state: `lineage.resumable_rounds` snapshots round state as
parquet with _SUCCESS-marker commit semantics, so a re-submitted
application resumes from the newest committed round.

The probe (tests/_driver_loss_probe.py) runs 10 pagerank-style rounds
(snapshot_every=2) in its own process group; the tests SIGKILL the
whole group — python driver and JVM together — mid-iteration, then
re-launch and assert resume-not-restart plus value-hash parity with an
uninterrupted control. The negative control wipes the state dir and
shows the fresh driver starts over from round 1, proving the recovery
came from the snapshots and nothing else.
"""

from __future__ import annotations

import os
import shutil
import signal
import subprocess
import sys
import threading

_PROBE = os.path.join(os.path.dirname(__file__), "_driver_loss_probe.py")
_SF = os.environ.get("KILLTEST_SF_DIR", "/root/testdata/sf0.001")


def _launch(state_dir):
    return subprocess.Popen(
        [sys.executable, _PROBE, str(state_dir), _SF],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        start_new_session=True,  # own process group: killpg takes the JVM too
    )


def _run_to_completion(state_dir, timeout=420):
    p = _launch(state_dir)
    out, _ = p.communicate(timeout=timeout)
    assert p.returncode == 0, f"probe failed:\n{out[-3000:]}"
    return _parse(out)


def _parse(out: str) -> dict:
    rec = {"rounds": []}
    for line in out.splitlines():
        if line.startswith("ROUND "):
            rec["rounds"].append(int(line.split()[1]))
        elif line.startswith("RESULT "):
            for kv in line.split()[1:]:
                k, v = kv.split("=")
                rec[k] = v
    assert "hash" in rec, f"no RESULT line:\n{out[-3000:]}"
    return rec


def _kill_after_round(state_dir, kill_round: int, timeout=420):
    """Launch the probe, SIGKILL its whole process group right after it
    reports ROUND `kill_round`. Returns the rounds seen before death.

    The stdout read runs under an overall watchdog deadline (round-11
    ADVICE): the old per-line timeout check only ran AFTER a line
    arrived, so a probe that wedged before printing anything (e.g. JVM
    startup hang) blocked `for line in p.stdout` forever. The watchdog
    kills the process group at the deadline, which closes the pipe and
    unblocks the read; the test then FAILS instead of hanging."""
    p = _launch(state_dir)
    seen = []
    expired = threading.Event()

    def _expire():
        expired.set()
        try:
            os.killpg(os.getpgid(p.pid), signal.SIGKILL)
        except ProcessLookupError:
            pass

    watchdog = threading.Timer(timeout, _expire)
    watchdog.start()
    try:
        for line in p.stdout:
            if line.startswith("ROUND "):
                seen.append(int(line.split()[1]))
                if seen[-1] >= kill_round:
                    os.killpg(os.getpgid(p.pid), signal.SIGKILL)
                    break
        # r12 ADVICE race: the timer can fire in the window between a
        # successful kill-round break and this check — if the kill round
        # WAS observed, the run succeeded regardless of the expired flag;
        # only a watchdog firing with the kill round never reached is a
        # genuine hang.
        if expired.is_set() and not (seen and seen[-1] >= kill_round):
            raise AssertionError(
                f"probe hung before the kill round (watchdog fired after "
                f"{timeout}s; rounds seen: {seen})"
            )
    finally:
        watchdog.cancel()
        try:
            p.wait(timeout=60)
        except subprocess.TimeoutExpired:
            os.killpg(os.getpgid(p.pid), signal.SIGKILL)
            p.wait(timeout=60)
    assert p.returncode != 0, "probe exited 0 despite the SIGKILL"
    return seen


def test_fresh_driver_resumes_from_snapshots_with_hash_parity(tmp_path):
    control = _run_to_completion(tmp_path / "control")
    assert control["rounds"] == list(range(1, 11))
    assert control["first"] == "1"

    state = tmp_path / "killed"
    seen = _kill_after_round(state, kill_round=5)
    assert max(seen) >= 5

    resumed = _run_to_completion(state)
    first = int(resumed["first"])
    # snapshot_every=2, killed right after ROUND 5 was reported: the
    # newest committed snapshot is round 4 (or 6 if the round-6 write
    # raced the SIGKILL) — a fresh driver must resume there, not at 1
    assert 5 <= first <= 7, (
        f"expected resume mid-iteration, got first executed round {first} "
        f"(rounds={resumed['rounds']})"
    )
    assert resumed["hash"] == control["hash"], (
        "resumed run diverged from the uninterrupted control: "
        f"{resumed} vs {control}"
    )
    assert resumed["rows"] == control["rows"]


def test_completed_state_dir_is_a_noop_rerun(tmp_path):
    done = _run_to_completion(tmp_path / "s")
    again = _run_to_completion(tmp_path / "s")
    assert again["rounds"] == [], (
        f"re-run of a completed job re-executed rounds: {again['rounds']}"
    )
    assert again["hash"] == done["hash"]


def test_negative_control_wiped_state_restarts_from_round_one(tmp_path):
    """Proves the recovery comes from the durable snapshots and nothing
    else: same kill, but the state dir is wiped before relaunch — the
    fresh driver must start over at round 1 (this is exactly what a
    localCheckpoint/reliable-checkpoint-only job experiences on driver
    loss: all round progress gone)."""
    state = tmp_path / "killed"
    _kill_after_round(state, kill_round=5)
    shutil.rmtree(state)
    redone = _run_to_completion(state)
    assert int(redone["first"]) == 1
    assert redone["rounds"] == list(range(1, 11))
