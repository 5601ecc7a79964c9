"""The HyperBall DuckDB replay oracle must be bit-exact where the sketch
is integer (hashes, registers) and rounding-stable where it is float
(estimates). These tests pin the two foundations: the SQL xxhash64
re-derivation and the end-to-end replay at fixture scale."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from citegraph_spark.plans.hll_oracle_sql import _hash_cte

PROBES = [0, 1, 2, 3, 42, 1000, 123456, 7654321, 2147483647]


def test_sql_xxhash64_matches_spark(spark):
    sdf = spark.createDataFrame([(i,) for i in PROBES], "node int")
    want = {r["node"]: r["h"] for r in sdf.select("node", F.xxhash64("node").alias("h")).collect()}

    con = duckdb.connect()
    values = ", ".join(f"({i})" for i in PROBES)
    rows = con.execute(
        f"WITH nodes(node) AS (SELECT * FROM (VALUES {values})), {_hash_cte().lstrip()} "
        "SELECT node, h7 FROM hs ORDER BY node"
    ).fetchall()
    got = {
        n: (int(h) - (1 << 64) if int(h) >= (1 << 63) else int(h))
        for n, h in rows
    }
    assert got == want


@pytest.mark.parametrize("entry", ["graph_hyperball"])
def test_hyperball_oracle_replays_spark(spark, entry):
    """End-to-end: the generated SQL over the sf0.001 lineitem mapping
    must reproduce the Spark entry's rows exactly (the sweep runs the
    same comparison at sf0.01; sf0.001 keeps this test fast)."""
    from citegraph_spark.plans.entry_queries import ORACLES, QUERIES

    sf = "/root/testdata/sf0.001"
    srows = sorted(tuple(r) for r in QUERIES[entry](spark, sf).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf}/lineitem.parquet')"
    )
    drows = sorted(tuple(r) for r in con.execute(ORACLES[entry]).fetchall())
    assert srows == drows
