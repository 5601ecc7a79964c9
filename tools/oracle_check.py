"""Local mimic of the driver's t2 correctness gate.

Runs every `queries()` entry at sf=0.01 via Spark AND its `oracle_sql()`
via DuckDB, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted,
floats rounded to 9 significant-ish decimals before hashing).

Usage: python tools/oracle_check.py [name ...]
Scale factor: set ORACLE_SF_DIR (default /root/testdata/sf0.01).
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import os

import duckdb

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main(names: list[str]) -> int:
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from citegraph_spark.session import get_spark

    spark = get_spark(app_name="oracle_check")
    # engine-version parity note (VERDICT r3 §7): a local-green /
    # driver-red hash divergence (the q12 case) is only attributable if
    # the engine builds are on record for every sweep.
    import pyspark

    print(
        f"engines: pyspark={pyspark.__version__} "
        f"duckdb={duckdb.__version__} (sf_dir={SF_DIR})"
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    selected = names or list(qs)
    n_fail = 0
    for name in selected:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = [tuple(r) for r in res.fetchall()]
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            hs, hd = table_hash(scols, srows), table_hash(dcols, drows)
            if hs != hd:
                problems.append(f"value-hash spark={hs} duckdb={hd}")
                for a, b in list(zip(sorted(map(str, srows)), sorted(map(str, drows))))[:300]:
                    if a != b:
                        problems.append(f"  first diff:\n  spark : {a}\n  duckdb: {b}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:3]))
            n_fail += 1
        else:
            print(f"OK    {name}: {len(srows)} rows, hash match ({time.time()-t0:.1f}s)")
    print(f"\n{len(selected) - n_fail}/{len(selected)} passed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
