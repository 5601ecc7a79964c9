"""Materialize a 10x boundary-collision replica of sf0.1 (round-10).

Round-9 verdict item 5: the sf0.1 sweep caught two defect classes
(sub-second truncation, .5-ulp engine rounding) invisible at sf0.01 —
the same class may hide above sf0.1, and no sf1 testdata exists. This
tool materializes a one-time DuckDB-built replica directory that
tools/oracle_check.py consumes via --sf-dirs, so the ~25
rounding/percentile/tie/sampling-sensitive entries can run their full
Spark-vs-DuckDB comparison at 10x the certified scale.

Replication recipe (same as tools/scale_rehearsal.py relational_tier):
K shifted disjoint copies, OFFSET=100M per copy. Only the PRIMARY keys
shift (l_orderkey / o_orderkey / event_id / doc_id); foreign keys that
reference unreplicated dimensions (o_custkey, user_id, l_partkey...)
are left alone ON PURPOSE — per-group row counts grow 10x, which is
exactly the tie/rounding/percentile-boundary stress this replica
exists to create (the rehearsal tool shifts those too because it
measures scaling, not boundaries). Both engines read the same files,
so referential semantics stay comparison-neutral.

Usage: python tools/make_boundary_replica.py [K] [OUT_DIR]
  defaults: K=10, OUT_DIR=/root/repo/.scale10
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import duckdb

SF_DIR = "/root/testdata/sf0.1"
OFFSET = 100_000_000
REPLICATED = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
}
COPIED = ["region", "nation", "customer", "supplier", "part", "embeddings"]


def build(k: int, out_dir: str) -> None:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t in COPIED:
        shutil.copyfile(f"{SF_DIR}/{t}.parquet", out / f"{t}.parquet")
        print(f"copied     {t}")
    for t, keys in REPLICATED.items():
        cols = [
            d[0]
            for d in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
            ).fetchall()
        ]
        selects = []
        for i in range(k):
            proj = ", ".join(
                f'"{c}" + {i * OFFSET} AS "{c}"' if c in keys else f'"{c}"'
                for c in cols
            )
            selects.append(
                f"SELECT {proj} FROM read_parquet('{SF_DIR}/{t}.parquet')"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) TO '{out}/{t}.parquet' "
            f"(FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"replicated {t} x{k}: {n} rows")


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale10"
    build(k, out_dir)
