"""Repeated-run determinism gate (round-12 mutation audit, mutant M22).

The r11 text_heaps_law defect class — a degeneracy guard decided on
FLOAT moments, where parallel aggregate merges leave ~1e-31 variance
residue on constant columns and corr()/cov-based outputs become
RUN-TO-RUN NONDETERMINISTIC — is invisible to every single-shot gate:
one Spark run vs one DuckDB run can agree by coincidence (or both be
garbage that happens to hash alike), and the mutation audit proved it
(M22, the exact r11 pre-fix revert, SURVIVED a single oracle pass at
the degenerate 30x replica).

What does kill the class is REPETITION: run the same entry K times in
one session (task scheduling reshuffles the partial-aggregate merge
order between runs) and require every hash to be identical; same for
the DuckDB oracle (its parallel merge showed the -0.27..0.34 garbage
spread at 30x). This tool is that gate, factored for both the mutation
audit and the standing boundary net.

Usage:
  python tools/determinism_check.py entry1[,entry2...] [--sf-dir DIR]
                                    [--runs K] [--json OUT]
Exit 0: every entry produced ONE distinct hash across K Spark runs and
K DuckDB runs. Exit 1: any entry flapped (the defect class is present).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.oracle_check import table_hash  # noqa: E402

SF_DIR_DEFAULT = os.environ.get("DETERMINISM_SF_DIR", "/root/repo/.scale30")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main(argv: list[str]) -> int:
    entries: list[str] = []
    sf_dir, runs, json_out = SF_DIR_DEFAULT, 5, None
    it = iter(argv)
    for a in it:
        if a == "--sf-dir":
            sf_dir = next(it)
        elif a == "--runs":
            runs = int(next(it))
        elif a == "--json":
            json_out = next(it)
        else:
            entries.extend(a.split(","))
    if not entries:
        raise SystemExit("name at least one registry entry")

    import duckdb

    import __spark_entry__ as e
    from citegraph_spark.session import get_spark

    spark = get_spark(app_name="determinism_check")
    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    report: dict[str, dict] = {}
    flapped = []
    for name in entries:
        t0 = time.time()
        s_hashes, d_hashes = [], []
        for _ in range(runs):
            sdf = qs[name](spark, sf_dir)
            s_hashes.append(
                table_hash(sdf.columns, [tuple(r) for r in sdf.collect()]))
        if name in oracles:
            for _ in range(runs):
                res = con.execute(oracles[name])
                cols = [d[0] for d in res.description]
                d_hashes.append(table_hash(cols, res.fetchall()))
        rec = dict(
            spark_hashes=sorted(set(s_hashes)),
            duckdb_hashes=sorted(set(d_hashes)),
            runs=runs, secs=round(time.time() - t0, 1),
        )
        ok = len(set(s_hashes)) == 1 and len(set(d_hashes)) <= 1
        rec["deterministic"] = ok
        if not ok:
            flapped.append(name)
        print(f"{name}: {'OK' if ok else 'FLAPPED'} "
              f"spark={rec['spark_hashes']} duckdb={rec['duckdb_hashes']} "
              f"({rec['secs']}s)", flush=True)
        report[name] = rec
    spark.stop()
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    if flapped:
        print(f"NONDETERMINISTIC entries: {flapped}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
