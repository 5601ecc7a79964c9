"""Registry-level storage round-trip queries: value checks against
brute-force recomputation at sf0.001, plus the layout assertions an
oracle cannot make (partition pruning reaching the read-back scan)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from citegraph_spark.plans.entry_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_parquet_partitioned_roundtrip_matches_direct(spark):
    res = {
        r["month"]: (r["n_orders"], r["revenue"])
        for r in QUERIES["parquet_partitioned_roundtrip"](spark, SF_DIR).collect()
    }
    direct = {
        r["month"]: (r["n"], r["rev"])
        for r in (
            spark.read.parquet(f"{SF_DIR}/orders.parquet")
            .filter(F.year("o_orderdate") == 1995)
            .groupBy(F.month("o_orderdate").alias("month"))
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("rev"),
            )
            .collect()
        )
    }
    assert res == direct and res


def test_partitioned_readback_prunes_partitions(spark):
    """The year filter must reach the scan as a PartitionFilter — at
    100 TB this is the difference between reading one directory and
    listing the whole table."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate")
    )
    out = tempfile.mkdtemp(prefix="prune_test_")
    try:
        orders.write.mode("overwrite").partitionBy("o_year").parquet(f"{out}/o")
        plan = (
            spark.read.parquet(f"{out}/o")
            .filter(F.col("o_year") == 1995)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PartitionFilters: [" in plan
        # the filter must appear inside PartitionFilters, not (only) as
        # a post-scan row filter
        pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
        assert "o_year" in pf
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_upsert_merge_updates_every_third_key(spark):
    rows = QUERIES["parquet_upsert_merge"](spark, SF_DIR).collect()
    supplier = {
        r["s_suppkey"]: round(r["s_acctbal"], 2)
        for r in spark.read.parquet(f"{SF_DIR}/supplier.parquet").collect()
    }
    assert len(rows) == len(supplier)  # upsert never duplicates a key
    for r in rows:
        base = supplier[r["s_suppkey"]]
        if r["s_suppkey"] % 3 == 0:
            assert r["version"] == 2
            assert abs(r["s_acctbal"] - round(base + 100.0, 2)) < 1e-6
        else:
            assert r["version"] == 1
            assert abs(r["s_acctbal"] - base) < 1e-6


def test_zorder_roundtrip_key_math_and_filter(spark):
    rows = QUERIES["parquet_zorder_roundtrip"](spark, SF_DIR).collect()
    assert rows

    def interleave(x: int, y: int) -> int:
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for r in rows:
        assert 0 <= r["x"] <= 15 and 0 <= r["y"] <= 15
        assert r["zkey"] == interleave(r["x"], r["y"])
    # an aligned power-of-two square maps to a contiguous z-range
    # [0, 255] — the locality property file pruning relies on
    assert all(0 <= r["zkey"] <= interleave(15, 15) for r in rows)


def test_orc_and_json_roundtrips_match_parquet_direct(spark):
    orc = QUERIES["orc_sink_roundtrip"](spark, SF_DIR).collect()
    direct_n = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .groupBy("c_nationkey")
        .count()
        .collect()
    )
    assert {r["n_nationkey"]: r["n_customers"] for r in orc} == {
        r["c_nationkey"]: r["count"] for r in direct_n
    }

    js = QUERIES["json_sink_roundtrip"](spark, SF_DIR).collect()
    direct = {
        r["o_orderpriority"]: (r["n"], r["rev"], str(r["d"]))
        for r in (
            spark.read.parquet(f"{SF_DIR}/orders.parquet")
            .filter(F.col("o_orderstatus") == "O")
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("rev"),
                F.min("o_orderdate").alias("d"),
            )
            .collect()
        )
    }
    assert {
        r["o_orderpriority"]: (r["n"], r["revenue"], r["first_date"]) for r in js
    } == direct


def test_bucketed_join_roundtrip_matches_direct(spark):
    rows = QUERIES["bucketed_join_roundtrip"](spark, SF_DIR).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    direct = {
        r["o_orderstatus"]: (r["n"], r["q"])
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q")
        )
        .collect()
    }
    # the query raises internally if the bucketed join planned an Exchange
    assert {r["o_orderstatus"]: (r["n_items"], r["total_qty"]) for r in rows} == direct


def test_schema_evolution_nullfills_old_generation(spark):
    rows = QUERIES["parquet_schema_evolution"](spark, SF_DIR).collect()
    assert len(rows) == spark.read.parquet(f"{SF_DIR}/nation.parquet").count()
    for r in rows:
        if r["n_nationkey"] % 2 == 0:
            assert r["n_comment_len"] is None  # gen-1 files null-filled
        else:
            assert r["n_comment_len"] == len(r["n_name"])
