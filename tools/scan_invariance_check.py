"""Scan-order invariance board: the full oracle gate under scrambled scans.

Every registry entry claims a deterministic result; the standing oracle
sweep proves it for the order parquet happens to arrive in. This tool
re-runs the ENTIRE Spark-vs-DuckDB gate with `sources.tables.load_table`
patched to round-robin-repartition every batch scan — the row-order a
1000-executor cluster actually delivers — so any entry whose value
depends on scan order (unkeyed first/last, tie-dependent windows,
collect-order assumptions) hash-mismatches against its oracle.

The patch is applied HERE, before `__spark_entry__` imports the plans
modules (they bind `load_table` by name at import time), so no product
code changes and no certification re-queues. Streaming entries stage
their own chronological replays after an explicit orderBy, so the
scramble exercises their batch prep too.

Usage: python tools/scan_invariance_check.py [names ...] [--k 13]
                                             [--sf-dir DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from tools.oracle_check import TABLES, check_one  # noqa: E402


def main(argv: list[str]) -> int:
    k = 13
    sf_dir = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
    names: list[str] = []
    it = iter(argv)
    for a in it:
        if a == "--k":
            k = int(next(it))
        elif a == "--sf-dir":
            sf_dir = next(it)
        else:
            names.append(a)

    # patch BEFORE the plans modules import load_table by name
    import citegraph_spark.sources.tables as tables_mod

    orig = tables_mod.load_table

    def scrambled_load(spark, sf_dir_, name):
        return orig(spark, sf_dir_, name).repartition(k)

    tables_mod.load_table = scrambled_load

    import __spark_entry__ as e
    from citegraph_spark.session import get_spark

    spark = get_spark(app_name="scan_invariance_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    selected = names or list(qs)
    t0 = time.time()
    per = {name: check_one(spark, con, qs, oracles, name, sf_dir)
           for name in selected}
    con.close()
    n_fail = sum(1 for r in per.values() if r["status"] == "FAIL")
    print(
        f"\nscan-invariance (repartition({k}) on every scan) at {sf_dir}: "
        f"{len(selected) - n_fail}/{len(selected)} passed "
        f"({time.time() - t0:.0f}s)"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
