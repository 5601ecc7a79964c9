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
    missed = [n for n in d["stale_now"] if n not in window]
    assert not missed, f"stale-now entries outside the 50-slot window: {missed}"


@pytest.mark.skipif(not _git_available(), reason="no git history")
def test_rotation_covers_registry():
    d = staleness.derive()
    from citegraph_spark.plans import entry_queries

    assert sorted(d["order"]) == sorted(entry_queries.QUERIES), (
        "static @register discovery disagrees with the runtime registry"
    )


def test_latest_green_rounds_ignore_err_rows():
    latest = staleness.latest_green_rounds()
    # r1 recorded an err row for graph_hyperball; its first GREEN row is
    # later — an err row must never certify
    assert latest["graph_hyperball"] >= 6
    # entries certified once in r1 and never since
    assert latest["events_cohort_retention"] == 1


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
