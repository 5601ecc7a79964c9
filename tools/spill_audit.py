"""Memory-pressure / spill-correctness board (round-12 verdict item 5).

Everything in the registry is certified on a 128 GiB box that rarely
spills, so the sort/agg/join SPILL code paths (ExternalSorter /
ExternalAppendOnlyMap merge-on-disk, UnsafeExternalSorter) are
value-verified almost never. This tool runs the 32 boundary-sensitive
entries (the boundary-net set: float-moment stats, percentiles,
windows, samplers — exactly the entries whose values could move if a
merge order changed) under a deliberately memory-starved multi-JVM
topology and asserts value-hash parity against the normal local[32]
run at the same SF (which the standing three-SF board certifies
against DuckDB — transitivity closes the chain to the oracle).

Starvation recipe:
  local-cluster[2,4,1024]            2 separate 1 GiB executor JVMs
  spark.memory.fraction=0.05         ~35 MiB unified memory per executor
  spark.sql.shuffle.partitions=4     big per-task partitions
  spark.sql.adaptive... left ON      same planner as production

Spills are PROVEN, not assumed: the starved worker enables the UI and
reads /api/v1/.../stages after each entry, recording
memoryBytesSpilled/diskBytesSpilled; the orchestrator fails the board
if NO entry spilled (a vacuous board) and reports per-entry spill
bytes next to the parity verdict.

Usage:
  python tools/spill_audit.py [--entries a,b,...] [--sf-dir DIR]
                              [--json OUT.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.oracle_check import table_hash  # noqa: E402

SF_DIR_DEFAULT = os.environ.get("SPILL_SF_DIR", "/root/testdata/sf0.1")

# the boundary-net entry set (tools/make_boundary_replica.py's consumers;
# the 32 entries whose values are float-order/boundary sensitive)
BOUNDARY_ENTRIES = [
    "ab_mann_whitney", "ab_welch_ttest", "approx_percentile_prices",
    "bootstrap_ci_daily_mean", "bpe_top_merges", "chi2_flag_status",
    "corr_lineitem_measures", "customer_rfm_segments",
    "dq_benford_first_digit", "dq_key_skew", "dq_psi_drift",
    "equidepth_histogram_prices", "events_autocorr", "events_ewma",
    "events_top_users_per_type", "events_twap", "events_user_entropy",
    "mad_outlier_prices", "ngram_top_bigrams", "percentile_prices",
    "q15_top_supplier", "regression_price_on_qty", "revenue_concentration",
    "sample_domain_mix", "sample_stratified", "sample_weighted",
    "text_heaps_law", "text_zipf_fit", "tfidf_top_terms",
    "window_ntile_cume", "window_rank_lag", "winsorized_prices",
]

UI_PORT = 4049  # fixed so the worker can scrape its own REST API


def _spill_totals() -> tuple[int, int]:
    """Sum (memoryBytesSpilled, diskBytesSpilled) across all completed
    stages of the live application via the UI REST API."""
    base = f"http://localhost:{UI_PORT}/api/v1/applications"
    with urllib.request.urlopen(base, timeout=10) as r:
        apps = json.load(r)
    app_id = apps[0]["id"]
    with urllib.request.urlopen(f"{base}/{app_id}/stages", timeout=10) as r:
        stages = json.load(r)
    mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    return mem, disk


def run_worker(mode: str, entries: list[str], sf_dir: str, out: str) -> None:
    from citegraph_spark.session import get_spark

    if mode == "starved":
        spark = get_spark(
            app_name="spill_audit",
            master="local-cluster[2,4,1024]",
            shuffle_partitions=4,
            extra_conf={
                "spark.executor.memory": "1g",
                "spark.default.parallelism": "4",
                "spark.memory.fraction": "0.05",
                "spark.ui.enabled": "true",
                "spark.ui.port": str(UI_PORT),
            },
        )
    else:
        spark = get_spark(app_name="spill_audit")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    report: dict[str, dict] = {}
    spilled_before = (0, 0)
    for name in entries:
        rec: dict = {}
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            rows = [tuple(r) for r in sdf.collect()]
            rec["rows"] = len(rows)
            rec["hash"] = table_hash(sdf.columns, rows)
            rec["secs"] = round(time.time() - t0, 2)
            if mode == "starved":
                mem, disk = _spill_totals()
                rec["mem_spilled"] = mem - spilled_before[0]
                rec["disk_spilled"] = disk - spilled_before[1]
                spilled_before = (mem, disk)
            print(f"  {mode:7s} {name}: {rec['rows']} rows hash={rec['hash']}"
                  f" {rec['secs']}s"
                  + (f" spill(mem={rec.get('mem_spilled', 0):,},"
                     f" disk={rec.get('disk_spilled', 0):,})"
                     if mode == "starved" else ""),
                  flush=True)
        except Exception as ex:  # noqa: BLE001 — report, don't crash the sweep
            rec["error"] = f"{type(ex).__name__}: {str(ex)[:300]}"
            print(f"  {mode:7s} {name}: ERROR {rec['error']}", flush=True)
        report[name] = rec
    spark.stop()
    with open(out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)


def orchestrate(entries: list[str], sf_dir: str, json_out: str | None) -> int:
    tmp = {m: os.path.join(ROOT, f".spill_audit_{m}.json")
           for m in ("local", "starved")}
    for mode in ("local", "starved"):
        print(f"== running {len(entries)} entries, mode={mode}, sf_dir={sf_dir}")
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--mode", mode, "--entries", ",".join(entries),
             "--sf-dir", sf_dir, "--json", tmp[mode]],
            cwd=ROOT,
        ).returncode
        if rc != 0:
            print(f"worker mode={mode} exited {rc}")
            return rc
    local = json.load(open(tmp["local"]))
    starved = json.load(open(tmp["starved"]))
    mismatches, errors = [], []
    total_spill = 0
    table = {}
    for name in entries:
        a, b = local.get(name, {}), starved.get(name, {})
        if "error" in a or "error" in b:
            errors.append(name)
            verdict = "ERROR"
        elif a.get("hash") != b.get("hash"):
            mismatches.append(name)
            verdict = "HASH-MISMATCH"
        else:
            verdict = "OK"
        spill = b.get("mem_spilled", 0) + b.get("disk_spilled", 0)
        total_spill += spill
        table[name] = dict(verdict=verdict, rows=a.get("rows"),
                           local_hash=a.get("hash"), starved_hash=b.get("hash"),
                           mem_spilled=b.get("mem_spilled", 0),
                           disk_spilled=b.get("disk_spilled", 0),
                           local_secs=a.get("secs"), starved_secs=b.get("secs"),
                           error=a.get("error") or b.get("error"))
        print(f"{name:32s} {verdict:13s} spill={spill:,}")
    n_spilled = sum(1 for v in table.values()
                    if v["mem_spilled"] + v["disk_spilled"] > 0)
    vacuous = total_spill == 0
    print(f"\nspill_audit: {len(entries) - len(mismatches) - len(errors)}"
          f"/{len(entries)} parity; {n_spilled} entries spilled "
          f"({total_spill:,} bytes total)"
          + ("; VACUOUS — nothing spilled, tighten the starvation"
             if vacuous else ""))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(dict(sf_dir=sf_dir, entries=table,
                           total_spill_bytes=total_spill,
                           n_entries_spilled=n_spilled), f,
                      indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if (mismatches or errors or vacuous) else 0


def main(argv: list[str]) -> int:
    mode = None
    entries: list[str] = []
    sf_dir = SF_DIR_DEFAULT
    json_out = None
    out = None
    it = iter(argv)
    for a in it:
        if a == "--mode":
            mode = next(it)
        elif a == "--entries":
            entries = next(it).split(",")
        elif a == "--sf-dir":
            sf_dir = next(it)
        elif a == "--json":
            json_out = out = next(it)
        else:
            raise SystemExit(f"unknown arg {a}")
    if not entries:
        entries = BOUNDARY_ENTRIES
    if mode:
        run_worker(mode, entries, sf_dir, out or f".spill_audit_{mode}.json")
        return 0
    return orchestrate(entries, sf_dir, json_out)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
