"""Freshness/staleness ledger for the driver-certification rotation.

The driver's per-round correctness sweep checks the FIRST ~50 entries of
`__spark_entry__.queries()`; rotation order therefore decides which
certifications stay fresh. Through round 8 that order was hand-maintained
comment blocks (_R1_CHECKED ...) — this tool replaces them with a
machine-derived order (round-8 verdict item 5):

  latest green round  — parsed from the committed CORRECTNESS_r*.json
                        artifacts (a row is green iff err is null AND
                        hash_match is true; err/rows-only rows do not
                        certify).
  entry fingerprint   — SHA-256 over the entry's transitive code
                        closure: starting from its @register'd function
                        (decorator included, so the oracle SQL literal is
                        in scope), an AST walk collects every referenced
                        top-level function / class / module constant in
                        the citegraph_spark package, following symbol and
                        module imports (including function-local ones)
                        transitively. session.py is always included
                        (every query runs under its config). Locals can
                        shadow module names, so the closure may
                        over-approximate — extra sensitivity re-queues an
                        entry early, never hides a change.
  stale-now           — fingerprint differs between the worktree and the
                        git tree of the LATEST correctness artifact's
                        commit: the entry's code path changed after the
                        most recent driver sweep, so it must re-certify
                        THIS round (the round-7/8 freshness rule,
                        machine-checked).
  stale-since-cert    — fingerprint differs vs the commit of the entry's
                        OWN latest green round (reported for the
                        histogram; ordering already handles it because
                        older rounds sort first).

Rotation order: stale-now entries (oldest cert round first), then
never-certified entries, then everything else by (cert round asc, cost
asc). Cost is the measured per-entry wall time from
tools/registry_costs.json when present (cheap-first maximizes entries
certified under a time-budgeted sweep), else name order.

Commands (run from the repo root):
  python tools/staleness.py check   # histogram + verify __spark_entry__'s
                                    # generated _ROTATION block is in sync;
                                    # exit 1 if stale order is not committed
  python tools/staleness.py sync    # regenerate the _ROTATION block
  python tools/staleness.py order   # print the derived order
tests/test_staleness.py runs `check` so an out-of-sync rotation fails the
suite — the rule "no entry's last driver check predates the code it runs"
is enforced by machinery, not comments.
"""

from __future__ import annotations

import ast
import hashlib
import io
import json
import re
import subprocess
import sys
import tarfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PKG = "citegraph_spark"
ENTRY_FILE = ROOT / "__spark_entry__.py"
COSTS_FILE = ROOT / "tools" / "registry_costs.json"
MARK_BEGIN = "# --- BEGIN GENERATED ROTATION (python tools/staleness.py sync) ---"
MARK_END = "# --- END GENERATED ROTATION ---"


# --------------------------------------------------------------------------
# artifact parsing
# --------------------------------------------------------------------------

def artifact_paths() -> list[tuple[int, Path]]:
    out = []
    for p in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        m = re.match(r"CORRECTNESS_r(\d+)\.json", p.name)
        if m:
            out.append((int(m.group(1)), p))
    return out


def latest_green_rounds(
    paths: list[tuple[int, Path]] | None = None,
) -> dict[str, int]:
    """Per entry, the most recent round whose driver row is green
    (err is null AND hash_match true). Non-green rows never certify.

    `paths` overrides the repo's live artifacts — tests pin behavior
    against fixture artifact sets instead of live files the rotation is
    designed to advance.
    """
    latest: dict[str, int] = {}
    for rnd, p in (artifact_paths() if paths is None else paths):
        for name, row in json.loads(p.read_text()).items():
            if row.get("err") is None and row.get("hash_match") is True:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def artifact_commit(rnd: int) -> str | None:
    """Commit whose tree the round-`rnd` sweep certified (the artifact is
    committed on top of the code it tested). None when the artifact has
    never been committed (e.g. the driver just wrote it to the worktree)
    — callers must treat that as "freshness rule unenforceable", not as
    "nothing stale"."""
    try:
        out = subprocess.run(
            ["git", "-C", str(ROOT), "log", "-1", "--format=%H", "--",
             f"CORRECTNESS_r{rnd:02d}.json"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
        return out or None
    except (subprocess.CalledProcessError, FileNotFoundError, OSError):
        return None


# --------------------------------------------------------------------------
# package snapshots (worktree or a git tree)
# --------------------------------------------------------------------------

class _Module:
    def __init__(self, dotted: str, source: str):
        self.dotted = dotted
        self.source = source
        self.lines = source.splitlines()
        self.tree = ast.parse(source)
        self.defs: dict[str, ast.AST] = {}
        self.assigns: dict[str, ast.AST] = {}
        self.imports: dict[str, tuple] = {}  # alias -> ("mod", m) | ("sym", m, s)
        for node in self.tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                self.defs[node.name] = node
            elif isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name):
                        self.assigns[t.id] = node
            elif isinstance(node, ast.AnnAssign) and isinstance(node.target,
                                                                ast.Name):
                self.assigns[node.target.id] = node
            elif isinstance(node, (ast.Import, ast.ImportFrom)):
                self._add_import(node)

    def _add_import(self, node) -> None:
        self.imports.update(parse_import(node, self.dotted))

    def segment(self, node: ast.AST) -> str:
        start = node.lineno
        if getattr(node, "decorator_list", None):
            start = min(d.lineno for d in node.decorator_list)
        return "\n".join(self.lines[start - 1:node.end_lineno])


def parse_import(node, in_module: str) -> dict[str, tuple]:
    """Resolve an Import/ImportFrom inside `in_module` to alias targets,
    keeping only citegraph_spark-internal ones."""
    out: dict[str, tuple] = {}
    if isinstance(node, ast.Import):
        for a in node.names:
            if a.name == PKG or a.name.startswith(PKG + "."):
                out[(a.asname or a.name.split(".")[0])] = ("mod", a.name)
    elif isinstance(node, ast.ImportFrom):
        if node.level:
            parts = in_module.split(".")
            base = parts[: len(parts) - node.level]
            mod = ".".join(base + (node.module.split(".") if node.module else []))
        else:
            mod = node.module or ""
        if mod == PKG or mod.startswith(PKG + "."):
            for a in node.names:
                out[a.asname or a.name] = ("sym", mod, a.name)
    return out


class Snapshot:
    """All package sources at a point in history, plus the taint machinery."""

    def __init__(self, files: dict[str, str]):
        self.modules: dict[str, _Module] = {}
        for rel, src in files.items():
            dotted = rel[:-3].replace("/", ".")
            if dotted.endswith(".__init__"):
                dotted = dotted[: -len(".__init__")]
            try:
                self.modules[dotted] = _Module(dotted, src)
            except SyntaxError:
                pass
        self._fp_cache: dict[str, str] = {}
        self._registry: dict[str, tuple[str, str]] | None = None

    @classmethod
    def worktree(cls) -> "Snapshot":
        files = {
            str(p.relative_to(ROOT)): p.read_text()
            for p in (ROOT / PKG).rglob("*.py")
        }
        return cls(files)

    @classmethod
    def at_commit(cls, rev: str) -> "Snapshot":
        data = subprocess.run(
            ["git", "-C", str(ROOT), "archive", "--format=tar", rev, PKG],
            capture_output=True, check=True,
        ).stdout
        files: dict[str, str] = {}
        with tarfile.open(fileobj=io.BytesIO(data)) as tf:
            for m in tf.getmembers():
                if m.isfile() and m.name.endswith(".py"):
                    files[m.name] = tf.extractfile(m).read().decode()
        return cls(files)

    # -- registry discovery (static: scan for @register("name", ...)) -----

    def registry(self) -> dict[str, tuple[str, str]]:
        """entry name -> (module, function name)."""
        if self._registry is None:
            reg: dict[str, tuple[str, str]] = {}
            for dotted, mod in self.modules.items():
                for fname, node in mod.defs.items():
                    for dec in getattr(node, "decorator_list", []):
                        if (
                            isinstance(dec, ast.Call)
                            and isinstance(dec.func, ast.Name)
                            and dec.func.id == "register"
                            and dec.args
                            and isinstance(dec.args[0], ast.Constant)
                        ):
                            reg[dec.args[0].value] = (dotted, fname)
            self._registry = reg
        return self._registry

    # -- transitive closure / fingerprint ----------------------------------

    def _node_deps(self, mod: _Module, node: ast.AST):
        """(module, symbol) and whole-module deps referenced by `node`."""
        local_imports: dict[str, tuple] = {}
        for sub in ast.walk(node):
            if isinstance(sub, (ast.Import, ast.ImportFrom)):
                local_imports.update(parse_import(sub, mod.dotted))
        sym_deps: set[tuple[str, str]] = set()
        mod_deps: set[str] = set()

        def resolve(alias: str, attr: str | None) -> None:
            tgt = local_imports.get(alias) or mod.imports.get(alias)
            if tgt is None:
                if alias in mod.defs or alias in mod.assigns:
                    sym_deps.add((mod.dotted, alias))
                return
            if tgt[0] == "mod":
                if attr is not None:
                    sym_deps.add((tgt[1], attr))
                else:
                    mod_deps.add(tgt[1])
            else:  # symbol import: may name a submodule or a symbol
                _, src_mod, src_sym = tgt
                sub = f"{src_mod}.{src_sym}"
                if sub in self.modules:  # `from ..pkg import module`
                    if attr is not None:
                        sym_deps.add((sub, attr))
                    else:
                        mod_deps.add(sub)
                else:
                    sym_deps.add((src_mod, src_sym))

        attr_bases: set[int] = set()
        for sub in ast.walk(node):
            if isinstance(sub, ast.Attribute) and isinstance(sub.value, ast.Name):
                attr_bases.add(id(sub.value))
                resolve(sub.value.id, sub.attr)
        for sub in ast.walk(node):
            if (
                isinstance(sub, ast.Name)
                and isinstance(sub.ctx, ast.Load)
                and id(sub) not in attr_bases
            ):
                resolve(sub.id, None)
        return sym_deps, mod_deps

    def fingerprint(self, entry: str) -> str | None:
        """Hash of the entry's transitive code closure, or None if the
        entry is not registered in this snapshot."""
        if entry in self._fp_cache:
            return self._fp_cache[entry]
        reg = self.registry()
        if entry not in reg:
            return None
        seen_syms: set[tuple[str, str]] = set()
        seen_mods: set[str] = set()
        work: list[tuple[str, str]] = [reg[entry]]
        parts: list[str] = []
        # every query runs under the session config — include it globally
        for always in (f"{PKG}.session",):
            if always in self.modules:
                seen_mods.add(always)
                parts.append(f"{always}::*::" + _sha(self.modules[always].source))
        while work:
            dotted, sym = work.pop()
            if (dotted, sym) in seen_syms or dotted in seen_mods:
                continue
            seen_syms.add((dotted, sym))
            mod = self.modules.get(dotted)
            if mod is None:
                continue
            node = mod.defs.get(sym) or mod.assigns.get(sym)
            if node is None:
                # unresolved attribute (e.g. dynamic) — be conservative:
                # depend on the whole module
                seen_mods.add(dotted)
                parts.append(f"{dotted}::*::" + _sha(mod.source))
                continue
            parts.append(f"{dotted}::{sym}::" + _sha(mod.segment(node)))
            sym_deps, mod_deps = self._node_deps(mod, node)
            for d in sym_deps:
                work.append(d)
            for m in mod_deps:
                if m not in seen_mods and m in self.modules:
                    seen_mods.add(m)
                    parts.append(f"{m}::*::" + _sha(self.modules[m].source))
        fp = _sha("\n".join(sorted(parts)))
        self._fp_cache[entry] = fp
        return fp


def _sha(text: str) -> str:
    return hashlib.sha256(text.encode()).hexdigest()[:16]


# --------------------------------------------------------------------------
# derivation
# --------------------------------------------------------------------------

def load_costs() -> dict[str, float]:
    if COSTS_FILE.exists():
        return json.loads(COSTS_FILE.read_text())
    return {}


def derive() -> dict:
    wt = Snapshot.worktree()
    names = sorted(wt.registry())
    latest = latest_green_rounds()
    rounds = sorted({r for r, _ in artifact_paths()})
    last_rnd = rounds[-1] if rounds else None

    stale_now: set[str] = set()
    freshness_enforced = False
    if last_rnd is not None:
        rev = artifact_commit(last_rnd)
        if rev:
            try:
                snap = Snapshot.at_commit(rev)
                for n in names:
                    if wt.fingerprint(n) != snap.fingerprint(n):
                        stale_now.add(n)
                freshness_enforced = True
            except subprocess.CalledProcessError:
                pass

    # stale vs the entry's OWN certification commit (reporting only;
    # ordering already puts old rounds first)
    stale_since_cert: set[str] = set()
    by_round: dict[int, list[str]] = {}
    for n in names:
        if n in latest and latest[n] != last_rnd:
            by_round.setdefault(latest[n], []).append(n)
    for rnd, group in by_round.items():
        rev = artifact_commit(rnd)
        if not rev:
            continue
        try:
            snap = Snapshot.at_commit(rev)
        except subprocess.CalledProcessError:
            continue
        for n in group:
            if wt.fingerprint(n) != snap.fingerprint(n):
                stale_since_cert.add(n)
    stale_since_cert |= stale_now

    costs = load_costs()
    big = 10 ** 9

    def cost_key(n: str):
        return (costs.get(n, big), n)

    head = sorted((n for n in names if n in stale_now),
                  key=lambda n: (latest.get(n, 0),) + cost_key(n))
    never = sorted((n for n in names if n not in latest and n not in stale_now),
                   key=cost_key)
    tail = sorted(
        (n for n in names if n in latest and n not in stale_now),
        key=lambda n: (latest[n],) + cost_key(n),
    )
    return {
        "order": head + never + tail,
        "stale_now": sorted(stale_now),
        "stale_since_cert": sorted(stale_since_cert),
        "never": never,
        "latest": latest,
        "last_round": last_rnd,
        # False = the latest artifact has no resolvable commit (uncommitted
        # worktree file / git unavailable) so stale-now detection could not
        # run — the freshness rule is NOT being enforced for this round.
        "freshness_enforced": freshness_enforced,
    }


# --------------------------------------------------------------------------
# sync / check against __spark_entry__.py
# --------------------------------------------------------------------------

def committed_rotation() -> list[str] | None:
    """Parse _ROTATION from __spark_entry__.py without importing it."""
    tree = ast.parse(ENTRY_FILE.read_text())
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "_ROTATION":
                    return list(ast.literal_eval(node.value))
    return None


def render_block(d: dict) -> str:
    lines = [MARK_BEGIN]
    lines.append("# Derived from CORRECTNESS_r*.json + git-tree fingerprints; do not")
    lines.append("# hand-edit. Head block = entries whose transitive code closure")
    lines.append(f"# changed since the round-{d['last_round']} sweep "
                 f"({len(d['stale_now'])} entries); then never-certified"
                 f" ({len(d['never'])});")
    lines.append("# then oldest-certification-first (cheap-first within a round).")
    lines.append("_ROTATION = [")
    for n in d["order"]:
        lines.append(f"    {n!r},")
    lines.append("]")
    lines.append(MARK_END)
    return "\n".join(lines)


_FRESHNESS_WARNING = (
    "WARNING: the latest CORRECTNESS artifact (r{rnd}) has no resolvable "
    "commit — it exists in the worktree but was never committed, or git is "
    "unavailable. Stale-now detection DID NOT RUN: a rotation written now "
    "has no freshness head. Commit the artifact first, then re-run."
)


def sync() -> None:
    d = derive()
    if d["last_round"] is not None and not d["freshness_enforced"]:
        raise SystemExit(_FRESHNESS_WARNING.format(rnd=d["last_round"]))
    text = ENTRY_FILE.read_text()
    block = render_block(d)
    if MARK_BEGIN in text:
        pre, rest = text.split(MARK_BEGIN, 1)
        _, post = rest.split(MARK_END, 1)
        ENTRY_FILE.write_text(pre + block + post)
    else:
        raise SystemExit(
            f"no generated-rotation markers in {ENTRY_FILE}; add them first"
        )
    print(f"synced _ROTATION: {len(d['order'])} entries, "
          f"{len(d['stale_now'])} stale-now at head, "
          f"{len(d['never'])} never-certified")


def check() -> int:
    d = derive()
    if d["last_round"] is not None and not d["freshness_enforced"]:
        print(_FRESHNESS_WARNING.format(rnd=d["last_round"]))
        return 1
    hist: dict[int, int] = {}
    for n in d["order"]:
        hist[d["latest"].get(n, 0)] = hist.get(d["latest"].get(n, 0), 0) + 1
    print("latest-green-round histogram (0 = never):",
          dict(sorted(hist.items())))
    print(f"stale-now (changed since r{d['last_round']} sweep): "
          f"{len(d['stale_now'])} {d['stale_now']}")
    only_cert = [n for n in d["stale_since_cert"] if n not in set(d["stale_now"])]
    print(f"stale-since-own-cert (re-validated by later local sweeps, "
          f"ordering handles): {len(only_cert)}")
    if len(d["stale_now"]) > 50:
        print("WARNING: stale-now exceeds the ~50-entry sweep window; "
              "entries past the window will miss this round's re-check")
    committed = committed_rotation()
    if committed is None:
        print("FAIL: __spark_entry__.py has no _ROTATION block")
        return 1
    if committed != d["order"]:
        drift = [
            (i, c, e)
            for i, (c, e) in enumerate(zip(committed, d["order"]))
            if c != e
        ][:10]
        print("FAIL: committed _ROTATION is out of sync with the derived "
              "order — run `python tools/staleness.py sync`")
        print("  first drifts:", drift)
        print("  committed-only:", sorted(set(committed) - set(d["order"]))[:10])
        print("  derived-only:", sorted(set(d["order"]) - set(committed))[:10])
        return 1
    print(f"OK: rotation in sync ({len(committed)} entries)")
    return 0


def main(argv: list[str]) -> int:
    cmd = argv[0] if argv else "check"
    if cmd == "check":
        return check()
    if cmd == "sync":
        sync()
        return 0
    if cmd == "order":
        for n in derive()["order"]:
            print(n)
        return 0
    print(__doc__)
    return 2


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
