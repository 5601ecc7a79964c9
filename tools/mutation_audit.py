"""Mutation audit of the verification net (round-12 verdict item 3).

20,600 green fuzz seeds and 229 green oracles prove the CODE passes the
GATES; this tool probes the converse — would the gates actually fail if
the code were wrong? Each MUTANT below is a single-site, plausibly-
harmful edit (off-by-one boundaries, dropped null handling, join-kind
swaps, float-rounding drops, hash-ring shifts, config regressions)
applied to a SCRATCH COPY of the repo under .mutants/; the audit then
runs the repo's own gates against the mutant, in-place, and records
which gate kills it.

A mutant that survives every declared gate is a REAL coverage hole in
the verification net (or a provably-equivalent mutation — each survivor
is adjudicated by hand in BASELINE.md's kill matrix and either closed
with a new oracle/test or documented as equivalent).

Gates (all run per mutant; every kill is recorded, not just the first):
  oracle    tools/oracle_check.py on the entries the mutant touches
            (the driver's t2 hash gate — Spark vs DuckDB at sf0.01)
  pytest    the pinning test file(s) for CLI/driver-side mutants
  lint      tools/plan_lint.py (plan anti-pattern gate; the only gate
            that can kill a VALUE-preserving perf regression)
  fuzz      tools/plan_fuzz.py, 300 seeds at sf0.001 (differential
            grammar gate — kills engine-config mutations that leave
            every curated oracle green)
  boundary  oracle_check at a degenerate boundary replica (the 30x-class
            net; kills merge-residue/degeneracy defects that are
            EQUIVALENT at every clean SF)

Usage:
  python tools/mutation_audit.py                 # all mutants
  python tools/mutation_audit.py M04 M11         # subset
  python tools/mutation_audit.py --json OUT.json # write the kill matrix

The scratch copies import ONLY themselves (oracle_check resolves the
repo root from its own location; pytest runs with cwd=the copy), so
mutants never touch the real tree and the staleness ledger never sees
them.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = os.path.join(ROOT, ".mutants")
SF01 = "/root/testdata/sf0.01"
SF001 = "/root/testdata/sf0.001"
# degenerate-corpus replica for the boundary gate (built on demand by
# tools/make_boundary_replica.py; the heaps degeneracy class needs a
# replicated corpus where bigram vocab is constant across checkpoints)
BOUNDARY_DIR = os.environ.get("MUT_BOUNDARY_DIR", os.path.join(ROOT, ".scale30"))

COPY_ITEMS = ["citegraph_spark", "tools", "tests", "__spark_entry__.py"]

# --------------------------------------------------------------------------
# the mutant corpus: single-site edits, each with the defect class it
# represents and the gates that SHOULD be able to see it
# --------------------------------------------------------------------------

MUTANTS: list[dict] = [
    dict(
        id="M01", cls="off-by-one/string-slice",
        desc="11-prefix normalization slices from char 2 instead of 3",
        file="citegraph_spark/sources/citations.py",
        old='(F.length(s) == 9) & s.startswith("11"), F.substring(s, 3, 7)',
        new='(F.length(s) == 9) & s.startswith("11"), F.substring(s, 2, 7)',
        gates={"oracle": ["loader_normalize_ids"]},
    ),
    dict(
        id="M02", cls="boundary-condition-widening",
        desc="prefix rule fires on length>=9 ids instead of exactly 9",
        file="citegraph_spark/sources/citations.py",
        old="(F.length(s) == 9) & s.startswith(\"11\"), F.substring(s, 3, 7)",
        new="(F.length(s) >= 9) & s.startswith(\"11\"), F.substring(s, 3, 7)",
        gates={"oracle": ["loader_normalize_ids"]},
    ),
    dict(
        id="M03", cls="dropped-dedup-rule",
        desc="published-dates dedupe picks MAX year instead of deterministic MIN",
        file="citegraph_spark/sources/citations.py",
        old='return df.groupBy("id").agg(F.min("year").alias("year"))',
        new='return df.groupBy("id").agg(F.max("year").alias("year"))',
        gates={"oracle": ["loader_normalize_ids"],
               "pytest": ["tests/test_cli_hepth.py::test_cli_density_reproduces_reference_golden",
                          "tests/test_cli.py"]},
    ),
    dict(
        id="M04", cls="join-kind-swap",
        desc="density edge-year join inner->left (reference quirk broken)",
        file="citegraph_spark/operators/graph.py",
        old='published.join(out_degree, published["id"] == out_degree["from"], "inner")',
        new='published.join(out_degree, published["id"] == out_degree["from"], "left")',
        gates={"oracle": ["graph_density", "fixture_density"]},
    ),
    dict(
        id="M05", cls="window-frame-off-by-one",
        desc="running-total window excludes the current row",
        file="citegraph_spark/operators/graph.py",
        old='w = Window.orderBy("year").rowsBetween(Window.unboundedPreceding, Window.currentRow)',
        new='w = Window.orderBy("year").rowsBetween(Window.unboundedPreceding, -1)',
        gates={"oracle": ["graph_density"]},
    ),
    dict(
        id="M06", cls="boundary-comparison-flip",
        desc="sessionize gap boundary > becomes >= (exact-gap events split)",
        file="citegraph_spark/operators/relational.py",
        old="is_new = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)",
        new="is_new = F.when(gap.isNull() | (gap >= gap_minutes * 60), 1).otherwise(0)",
        gates={"oracle": ["events_sessionize"],
               "pytest": ["tests/test_sessionize_boundary.py"]},
    ),
    dict(
        id="M07", cls="dropped-null-handling",
        desc="sessionize drops the isNull() first-event term",
        file="citegraph_spark/operators/relational.py",
        old="is_new = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)",
        new="is_new = F.when((gap > gap_minutes * 60), 1).otherwise(0)",
        gates={"oracle": ["events_sessionize"],
               "pytest": ["tests/test_sessionize_boundary.py"]},
    ),
    dict(
        id="M08", cls="float-rounding-drop",
        desc="money_sum_pair loses its round(...,2) (sub-cent tail; r12 "
             "adjudicated-equivalent under the float band, r13 killable: "
             "money sums run in exact DecimalType and emit BIGINT cents "
             "— plans/money.py)",
        file="citegraph_spark/plans/money.py",
        old="    s = F.round(F.sum(expr), 2)",
        new="    s = F.sum(expr)",
        gates={"oracle": ["q1_pricing_summary"]},
    ),
    dict(
        id="M09", cls="dedup-keep-rule-flip",
        desc="exact dedup canonical id becomes MAX instead of MIN",
        file="citegraph_spark/functions/dedup.py",
        old='canon = hashed.groupBy("h").agg(F.min(id_col).alias("canonical_id"))',
        new='canon = hashed.groupBy("h").agg(F.max(id_col).alias("canonical_id"))',
        gates={"oracle": ["dedup_exact"],
               "pytest": ["tests/test_functions.py"]},
    ),
    dict(
        id="M10", cls="canonicalization-flip",
        desc="canonical pair emits (greatest, least) instead of (least, greatest)",
        file="citegraph_spark/operators/graph.py",
        old='            F.least(F.col(a), F.col(b)).alias("a"),\n            F.greatest(F.col(a), F.col(b)).alias("b"),',
        new='            F.greatest(F.col(a), F.col(b)).alias("a"),\n            F.least(F.col(a), F.col(b)).alias("b"),',
        gates={"oracle": ["graph_canonical_pairs"]},
    ),
    dict(
        id="M11", cls="fused-anti-join-polarity",
        desc="BFS fused dedup/anti keeps min(_seen) (seen pairs re-counted as new)",
        file="citegraph_spark/operators/graph.py",
        old='            .unionByName(seen.select("a", "b", F.lit(1).alias("_seen")))\n            .groupBy("a", "b")\n            .agg(F.max("_seen").alias("_seen"))',
        new='            .unionByName(seen.select("a", "b", F.lit(1).alias("_seen")))\n            .groupBy("a", "b")\n            .agg(F.min("_seen").alias("_seen"))',
        gates={"oracle": ["graph_hopplot_d2"]},
    ),
    dict(
        id="M12", cls="interpolation-sign-flip",
        desc="effective diameter interpolates d MINUS the fraction",
        file="citegraph_spark/operators/graph.py",
        old="return lo.d + (0.9 - lo.percent) / (hi.percent - lo.percent)",
        new="return lo.d - (0.9 - lo.percent) / (hi.percent - lo.percent)",
        gates={"oracle": ["fixture_effective_diameter"]},
    ),
    dict(
        id="M13", cls="hash-slice-off-by-one",
        desc="minhash signature slices start one char early",
        file="citegraph_spark/functions/dedup.py",
        old="return lambda h: F.substring(h, 8 * i + 1, 8)",
        new="return lambda h: F.substring(h, 8 * i, 8)",
        gates={"oracle": ["dedup_minhash_lsh"],
               "pytest": ["tests/test_functions.py"]},
    ),
    dict(
        id="M14", cls="session-config-drop",
        desc="nanosAsLong reader config dropped (events ts path broken)",
        file="citegraph_spark/session.py",
        old='        .config("spark.sql.legacy.parquet.nanosAsLong", "true")',
        new='        # nanosAsLong config dropped by mutant',
        gates={"oracle": ["events_sessionize"]},
    ),
    dict(
        id="M15", cls="session-config-regression",
        desc="ANSI SQL mode disabled (silent-null semantics return)",
        file="citegraph_spark/session.py",
        old='        .config("spark.ui.enabled", "false")',
        new='        .config("spark.ui.enabled", "false")\n        .config("spark.sql.ansi.enabled", "false")',
        gates={"oracle": ["q1_pricing_summary", "text_heaps_law"],
               "fuzz": 300,
               "pytest": ["tests/test_session_defaults.py"]},  # now pins ANSI
    ),
    dict(
        id="M16", cls="watermark-drop",
        desc="streaming windowed agg watermark 30min -> 0min (late rows dropped)",
        file="citegraph_spark/streaming/events.py",
        old='    watermark — identical logical shape to the batch\n    `events_windowed_agg`."""\n    return (\n        events.withWatermark("ts", "30 minutes")',
        new='    watermark — identical logical shape to the batch\n    `events_windowed_agg`."""\n    return (\n        events.withWatermark("ts", "0 minutes")',
        gates={"oracle": ["streaming_windowed"],
               "pytest": ["tests/test_streaming.py::test_watermark_tolerance_accepts_late_rows_inside_30min"]},
    ),
    dict(
        id="M17", cls="bin-boundary-off-by-one",
        desc="sequence packing bins by //2047 instead of //2048",
        file="citegraph_spark/plans/pipeline_queries.py",
        old='.groupBy(F.floor(F.col("bef") / 2048).cast("int").alias("bin"))',
        new='.groupBy(F.floor(F.col("bef") / 2047).cast("int").alias("bin"))',
        gates={"oracle": ["pack_sequences"]},
    ),
    dict(
        id="M18", cls="hash-ring-off-by-one",
        desc="CMS bucket index mod (width-1) instead of mod width",
        file="citegraph_spark/functions/frequency.py",
        old="return [(h1 + r * h2) % width for r in range(depth)]",
        new="return [(h1 + r * h2) % (width - 1) for r in range(depth)]",
        gates={"oracle": ["heavy_hitters_cms"],
               "pytest": ["tests/test_sketches.py::test_cms_bucket_ring_golden"]},
    ),
    dict(
        id="M19", cls="approximation-budget-drop",
        desc="heaps checkpoint percentiles lose their exactness accuracy knob",
        file="citegraph_spark/plans/text_queries.py",
        old='F.percentile_approx("doc_id", x / 10.0, F.lit(2147483647))',
        new='F.percentile_approx("doc_id", x / 10.0, F.lit(100))',
        gates={"oracle": ["text_heaps_law"]},
    ),
    dict(
        id="M20", cls="value-preserving-perf-regression",
        desc="q1 disc_price routed through a row-at-a-time Python UDF (identical values)",
        file="citegraph_spark/plans/relational_queries.py",
        old='disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))',
        new='disc_price = F.udf(lambda e, d: e * (1.0 - d), "double")(F.col("l_extendedprice"), F.col("l_discount"))',
        gates={"oracle": ["q1_pricing_summary"],
               "lint": ["q1_pricing_summary"]},
    ),
    dict(
        id="M21", cls="loop-bound-off-by-one",
        desc="BFS distance loop stops one round early (range(2, max_d))",
        file="citegraph_spark/operators/graph.py",
        old="for d in range(2, max_d + 1):",
        new="for d in range(2, max_d):",
        gates={"oracle": ["graph_hopplot_d2"]},
    ),
    dict(
        id="M23", cls="deploy-regression/package-shipping",
        desc="addPyFile package shipping reverted (the r11 executor-import fix)",
        file="citegraph_spark/session.py",
        old="    if not spark.sparkContext.master.startswith(\"local[\"):\n        _ship_package(spark)",
        new="    # package shipping reverted by mutant",
        gates={"oracle": ["heavy_hitters_cms"],
               "cluster": ["heavy_hitters_cms"]},
    ),
    dict(
        id="M22", cls="degeneracy-guard-float-revert",
        desc="heaps fit_corr degeneracy re-tested on float variance (the r11 pre-fix bug)",
        file="citegraph_spark/plans/text_queries.py",
        old='    degenerate = (F.countDistinct("vocab") <= F.lit(1)) | (\n        F.countDistinct("n_doc") <= F.lit(1)\n    )',
        new='    degenerate = F.var_pop(ly) == F.lit(0.0)',
        gates={"oracle": ["text_heaps_law"], "boundary": ["text_heaps_law"],
               "determinism": ["text_heaps_law"]},
    ),
    dict(
        id="M24", cls="percentile-interpolation-flip",
        desc="grouped_exact_percentiles targets ceil(pos) for the LOW "
             "neighbor (the r13 bounded-state certificate operator: "
             "interpolation collapses to the upper neighbor at every "
             "fractional rank position)",
        file="citegraph_spark/operators/relational.py",
        old="        v_lo = F.max(F.when(rn == F.floor(pos), F.col(value_col)))",
        new="        v_lo = F.max(F.when(rn == F.ceil(pos), F.col(value_col)))",
        gates={"oracle": ["approx_percentile_prices"],
               "pytest": ["tests/test_asof_range_join.py::"
                          "test_grouped_exact_percentiles_matches_percentile"]},
    ),
]


# --------------------------------------------------------------------------
# harness
# --------------------------------------------------------------------------

def make_copy(mut_id: str) -> str:
    dst = os.path.join(SCRATCH, mut_id)
    if os.path.exists(dst):
        shutil.rmtree(dst)
    os.makedirs(dst)
    for item in COPY_ITEMS:
        src = os.path.join(ROOT, item)
        to = os.path.join(dst, item)
        if os.path.isdir(src):
            shutil.copytree(
                src, to,
                ignore=shutil.ignore_patterns("__pycache__", "*.pyc", ".pytest_cache"),
            )
        else:
            shutil.copy2(src, to)
    return dst


def apply_mutation(copy_root: str, mut: dict) -> None:
    path = os.path.join(copy_root, mut["file"])
    with open(path) as f:
        src = f.read()
    n = src.count(mut["old"])
    assert n == 1, f"{mut['id']}: old string occurs {n} times in {mut['file']}"
    with open(path, "w") as f:
        f.write(src.replace(mut["old"], mut["new"]))


def run_gate(copy_root: str, kind: str, spec) -> dict:
    """Run one gate inside the mutant copy. Returns {gate, killed, secs, note}."""
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "6g")
    env.setdefault("SPARK_GRAFT_CPUS", "8")
    if kind == "oracle":
        cmd = [sys.executable, "tools/oracle_check.py", *spec, "--sf-dirs", SF01]
    elif kind == "pytest":
        cmd = [sys.executable, "-m", "pytest", *spec, "-x", "-q"]
    elif kind == "lint":
        cmd = [sys.executable, "tools/plan_lint.py", *spec]
    elif kind == "fuzz":
        cmd = [sys.executable, "tools/plan_fuzz.py", "--n", str(spec),
               "--seed0", "0", "--sf-dir", SF001]
    elif kind == "boundary":
        if not os.path.isdir(BOUNDARY_DIR):
            return dict(gate=kind, killed=None, secs=0.0,
                        note=f"SKIPPED: no boundary replica at {BOUNDARY_DIR}")
        cmd = [sys.executable, "tools/oracle_check.py", *spec,
               "--sf-dirs", BOUNDARY_DIR]
    elif kind == "cluster":
        # multi-executor value parity — the only gate that executes
        # Python workers in SEPARATE executor JVMs, where package
        # shipping and pickled-by-reference imports actually matter
        cmd = [sys.executable, "tools/cluster_audit.py",
               "--entries", ",".join(spec),
               "--json", os.path.join(copy_root, ".cluster_gate.json")]
    elif kind == "determinism":
        # repeated-run hash-stability at the degenerate replica — the
        # only gate that reliably kills the merge-residue class (one
        # oracle shot can agree by coincidence; M22 proved it)
        if not os.path.isdir(BOUNDARY_DIR):
            return dict(gate=kind, killed=None, secs=0.0,
                        note=f"SKIPPED: no boundary replica at {BOUNDARY_DIR}")
        cmd = [sys.executable, "tools/determinism_check.py", *spec,
               "--sf-dir", BOUNDARY_DIR, "--runs", "5"]
    else:
        raise ValueError(kind)
    t0 = time.time()
    p = subprocess.run(
        cmd, cwd=copy_root, env=env, capture_output=True, text=True, timeout=3600
    )
    secs = time.time() - t0
    killed = p.returncode != 0
    tail = (p.stdout + p.stderr)[-400:].replace("\n", " | ")
    return dict(gate=kind, killed=killed, secs=round(secs, 1), note=tail if killed else "")


def main(argv: list[str]) -> int:
    json_out = None
    ids: list[str] = []
    it = iter(argv)
    for a in it:
        if a == "--json":
            json_out = next(it)
        else:
            ids.append(a)
    selected = [m for m in MUTANTS if not ids or m["id"] in ids]
    os.makedirs(SCRATCH, exist_ok=True)
    matrix: dict[str, dict] = {}
    for mut in selected:
        t0 = time.time()
        copy_root = make_copy(mut["id"])
        apply_mutation(copy_root, mut)
        results = []
        for kind, spec in mut["gates"].items():
            r = run_gate(copy_root, kind, spec)
            results.append(r)
            flag = {True: "KILLED", False: "survived", None: "skipped"}[r["killed"]]
            print(f"{mut['id']} {kind:8s} {flag:9s} {r['secs']:7.1f}s  {mut['desc']}",
                  flush=True)
        any_kill = any(r["killed"] for r in results)
        matrix[mut["id"]] = dict(
            cls=mut["cls"], desc=mut["desc"], file=mut["file"],
            gates=results, killed=any_kill,
            secs=round(time.time() - t0, 1),
        )
        shutil.rmtree(copy_root)  # keep disk bounded; the spec re-creates it
    survivors = [k for k, v in matrix.items() if not v["killed"]]
    print(f"\nmutation audit: {len(matrix) - len(survivors)}/{len(matrix)} killed; "
          f"survivors: {survivors or 'none'}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(matrix, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 0  # survivors are FINDINGS to adjudicate, not harness failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
