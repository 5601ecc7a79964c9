"""tools/staleness.py — the machine-checked freshness ledger.

Round-8 verdict item 5: the driver-sweep rotation order in
`__spark_entry__.py` must be generated/verified by tooling, and the
freshness rule ("no entry's last driver check predates the code it
runs") must be machine-checked every round. `test_rotation_in_sync` IS
that check: it fails the suite whenever registry code changes without
re-running `python tools/staleness.py sync`.
"""

from __future__ import annotations

import subprocess
import sys
import time
from datetime import datetime, timezone
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
import staleness  # noqa: E402


def _git_available() -> bool:
    try:
        subprocess.run(
            ["git", "-C", str(staleness.ROOT), "rev-parse", "HEAD"],
            capture_output=True, check=True,
        )
        return True
    except Exception:
        return False


# --------------------------------------------------------------------------
# the enforcement test
# --------------------------------------------------------------------------

@pytest.mark.skipif(not _git_available(), reason="no git history")
def test_rotation_in_sync():
    d = staleness.derive()
    if d["last_round"] is not None and not d["freshness_enforced"]:
        # The latest CORRECTNESS_r*.json exists only in the worktree (the
        # driver drops artifacts uncommitted at the round boundary), so the
        # derived order legitimately differs from the committed _ROTATION
        # and stale-now detection cannot run. This is the documented
        # round-open state, not a code drift: `tools/staleness.py check`
        # still exits 1 loudly, and the round-open step (commit artifacts →
        # `python tools/staleness.py sync` → commit) restores enforcement.
        # Bound the skip (round-11 ADVICE): the round-open state is
        # legitimate only BRIEFLY. If the uncommitted artifact has been
        # sitting in the worktree while work continued (commits landed
        # after it appeared) or for days, the round-open step was
        # forgotten and the gate must FAIL, not skip forever.
        art = staleness.ROOT / f"CORRECTNESS_r{d['last_round']:02d}.json"
        age_h = (time.time() - art.stat().st_mtime) / 3600 if art.exists() else 0.0
        commits_after = 0
        if art.exists():
            since = datetime.fromtimestamp(art.stat().st_mtime, tz=timezone.utc)
            out = subprocess.run(
                ["git", "rev-list", "--count",
                 f"--since={since.isoformat()}", "HEAD"],
                capture_output=True, text=True, cwd=staleness.ROOT,
            )
            commits_after = int(out.stdout.strip() or 0) if out.returncode == 0 else 0
        assert age_h <= 48 and commits_after <= 2, (
            f"CORRECTNESS_r{d['last_round']:02d}.json has been uncommitted "
            f"for {age_h:.1f}h with {commits_after} commits made after it "
            "appeared — the round-open step (commit artifacts, then "
            "`python tools/staleness.py sync`) was skipped; the freshness "
            "gate is silently disabled. Run the round-open step now."
        )
        pytest.skip(
            f"CORRECTNESS_r{d['last_round']:02d}.json is uncommitted — "
            "rotation sync is pending the round-open step "
            "(commit artifacts, then `python tools/staleness.py sync`); "
            "the freshness rule is not enforceable until then"
        )
    committed = staleness.committed_rotation()
    assert committed is not None, "__spark_entry__.py lost its _ROTATION block"
    assert committed == d["order"], (
        "committed _ROTATION drifted from the derived order — code changed "
        "without re-running `python tools/staleness.py sync`; stale-now="
        f"{d['stale_now']}"
    )
    # the freshness rule itself: every entry whose closure changed since
    # the last sweep sits inside the next sweep window
    window = committed[:50]
    if len(d["stale_now"]) > len(window):
        # whole-closure change (e.g. the session factory is in every
        # entry's fingerprint): more stale entries than the window
        # holds. The best a 50-slot window can do — and what sync's
        # ordering guarantees — is that EVERY slot goes to a stale
        # entry (cheapest/oldest first); the overflow drains over
        # subsequent rounds. The compensating control for the interim
        # is the local full-board sweep recorded in BASELINE.md.
        stale = set(d["stale_now"])
        wasted = [n for n in window if n not in stale]
        assert not wasted, (
            f"stale-now ({len(stale)}) exceeds the window but these "
            f"window slots went to fresh entries: {wasted}"
        )
    else:
        missed = [n for n in d["stale_now"] if n not in window]
        assert not missed, (
            f"stale-now entries outside the 50-slot window: {missed}"
        )


@pytest.mark.skipif(not _git_available(), reason="no git history")
def test_rotation_covers_registry():
    d = staleness.derive()
    from citegraph_spark.plans import entry_queries

    assert sorted(d["order"]) == sorted(entry_queries.QUERIES), (
        "static @register discovery disagrees with the runtime registry"
    )


def test_latest_green_rounds_ignore_err_rows(tmp_path):
    # Pinned against a FIXTURE artifact set, not the repo's live
    # CORRECTNESS files — the rotation is designed to advance per-entry
    # latest rounds, so any live-entry round pin goes red the moment the
    # driver re-certifies that entry (round-9 verdict item 1).
    def art(rnd: int, rows: dict) -> tuple[int, "Path"]:
        p = tmp_path / f"CORRECTNESS_r{rnd:02d}.json"
        p.write_text(__import__("json").dumps(rows))
        return rnd, p

    green = {"err": None, "hash_match": True}
    fixtures = [
        art(1, {"a": {"err": "boom", "hash_match": None},   # err never certifies
                "b": green,
                "c": {"err": None, "hash_match": False}}),  # mismatch never certifies
        art(2, {"a": green, "c": {"err": "late", "hash_match": None}}),
    ]
    latest = staleness.latest_green_rounds(fixtures)
    assert latest == {"a": 2, "b": 1}
    assert "c" not in latest  # never green in any round


@pytest.mark.skipif(not _git_available(), reason="no git history")
def test_latest_green_rounds_live_invariants():
    # Only invariants that survive rotation advancement touch live data:
    # every certified name is a registered entry, and rounds are sane.
    latest = staleness.latest_green_rounds()
    from citegraph_spark.plans import entry_queries

    unknown = set(latest) - set(entry_queries.QUERIES)
    assert not unknown, f"certified names not in the registry: {unknown}"
    max_rnd = max(r for r, _ in staleness.artifact_paths())
    assert all(1 <= r <= max_rnd for r in latest.values())


@pytest.mark.skipif(not _git_available(), reason="no git history")
def test_sync_refuses_uncommitted_latest_artifact(monkeypatch):
    # ADVICE r9: running `sync` while the newest CORRECTNESS file is
    # uncommitted must fail loudly, not silently write a rotation with no
    # freshness head.
    monkeypatch.setattr(staleness, "artifact_commit", lambda rnd: None)
    with pytest.raises(SystemExit, match="no resolvable commit"):
        staleness.sync()
    assert staleness.check() == 1


# --------------------------------------------------------------------------
# taint-machinery unit tests on a synthetic package
# --------------------------------------------------------------------------

_PKG_FILES = {
    "citegraph_spark/__init__.py": "",
    "citegraph_spark/session.py": "CONF = 1\n",
    "citegraph_spark/helpers.py": (
        "LIMIT = 10\n"
        "def shared(x):\n    return x + LIMIT\n"
        "def unrelated(x):\n    return x - 1\n"
    ),
    "citegraph_spark/plans.py": (
        "from .helpers import shared\n"
        "def register(name, oracle=None):\n"
        "    def deco(fn):\n        return fn\n    return deco\n"
        "@register('entry_a', 'SELECT 1 AS one')\n"
        "def entry_a(spark, sf):\n    return shared(1)\n"
        "@register('entry_b')\n"
        "def entry_b(spark, sf):\n"
        "    from . import helpers\n"
        "    return helpers.unrelated(2)\n"
    ),
}


def _snap(overrides: dict[str, str] | None = None) -> staleness.Snapshot:
    files = dict(_PKG_FILES)
    files.update(overrides or {})
    return staleness.Snapshot(files)


def test_fingerprint_tracks_transitive_helper():
    base = _snap()
    # change shared()'s body → entry_a (calls it) must change,
    # entry_b (calls only unrelated) must not
    changed = _snap({
        "citegraph_spark/helpers.py": _PKG_FILES[
            "citegraph_spark/helpers.py"
        ].replace("x + LIMIT", "x + LIMIT + 1")
    })
    assert base.fingerprint("entry_a") != changed.fingerprint("entry_a")
    assert base.fingerprint("entry_b") == changed.fingerprint("entry_b")


def test_fingerprint_tracks_module_constant():
    base = _snap()
    changed = _snap({
        "citegraph_spark/helpers.py": _PKG_FILES[
            "citegraph_spark/helpers.py"
        ].replace("LIMIT = 10", "LIMIT = 20")
    })
    assert base.fingerprint("entry_a") != changed.fingerprint("entry_a")


def test_fingerprint_tracks_oracle_sql_in_decorator():
    base = _snap()
    changed = _snap({
        "citegraph_spark/plans.py": _PKG_FILES[
            "citegraph_spark/plans.py"
        ].replace("SELECT 1 AS one", "SELECT 2 AS one")
    })
    assert base.fingerprint("entry_a") != changed.fingerprint("entry_a")
    assert base.fingerprint("entry_b") == changed.fingerprint("entry_b")


def test_fingerprint_tracks_session_globally():
    base = _snap()
    changed = _snap({"citegraph_spark/session.py": "CONF = 2\n"})
    for entry in ("entry_a", "entry_b"):
        assert base.fingerprint(entry) != changed.fingerprint(entry)


def test_function_local_module_import_resolves():
    # entry_b reaches helpers.unrelated through a function-local
    # `from . import helpers` — verify that path is followed
    base = _snap()
    changed = _snap({
        "citegraph_spark/helpers.py": _PKG_FILES[
            "citegraph_spark/helpers.py"
        ].replace("x - 1", "x - 2")
    })
    assert base.fingerprint("entry_b") != changed.fingerprint("entry_b")
    assert base.fingerprint("entry_a") == changed.fingerprint("entry_a")


def test_missing_entry_returns_none():
    assert _snap().fingerprint("nope") is None
