"""Registry-wide oracle output-dtype gate.

Round-6 finding: q12_ship_priority_class — the only persistent external
hash-fail (r3 AND r5, rows/schema ok) — was the ONLY oracle in the
226-entry registry whose output carried DuckDB HUGEINT columns
(`sum(CASE..1..0)` of INTEGER is int128 in DuckDB; every other entry
CASTs aggregates to BIGINT or round()-wraps to DOUBLE). A canonicalizer
that hashes fetched values typed (int128/Decimal vs Spark's int64)
mismatches on exactly that entry. This gate keeps the class closed: no
oracle may emit HUGEINT, DECIMAL, or interval types — the dtypes whose
client-fetch representation varies across DuckDB versions/fetch paths.

Static check (DuckDB type resolution only, no query execution): cheap
enough to run over all 226 oracles every pytest run.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
BANNED = ("HUGEINT", "DECIMAL", "INTERVAL")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return c


def test_no_oracle_emits_driver_hostile_dtypes(con):
    offenders: dict[str, list[str]] = {}
    for name, sql in entry.oracle_sql().items():
        rel = con.sql(sql)  # resolves types; does not execute
        bad = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, rel.types)
            if any(b in str(t).upper() for b in BANNED)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles emitting canonicalizer-hostile dtypes (CAST to BIGINT/"
        f"DOUBLE in the SQL): {offenders}"
    )
