"""Pins for the r13 money-decimal fix (plans/money.py) — the closure of
mutation M08's float-band blind spot.

Claims pinned:
1. The DECIMAL(12,2) input casts are lossless: every money column in the
   testdata is an exact 2dp double (a 3dp value would be silently
   rounded by the cast, changing entry semantics).
2. Spark and DuckDB produce identical (dollars DOUBLE, cents BIGINT)
   pairs for the q1 money pattern — decimal stays internal (the dtype
   gate tests/test_oracle_dtypes.py bans DECIMAL on the wire after the
   r6 HUGEINT driver incident), and the int64 cents column is what any
   hasher compares exactly at any magnitude.
3. The oracle hasher sees a sub-cent defect through the cents column
   (the exact M08 shape the 9-sig-digit float band absorbed on the
   dollars column), and still compares raw Decimals exactly if one ever
   reaches it.
"""

import decimal

import duckdb
import pytest
from pyspark.sql import functions as F

from tools.oracle_check import _norm_cell, table_hash

SF = "/root/testdata/sf0.01"

MONEY_COLS = {
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "orders": ["o_totalprice"],
}


def test_money_columns_are_exact_2dp():
    con = duckdb.connect()
    for table, cols in MONEY_COLS.items():
        exprs = ", ".join(f"max(abs({c} - round({c}, 2)))" for c in cols)
        row = con.execute(
            f"SELECT {exprs} FROM read_parquet('{SF}/{table}.parquet')"
        ).fetchone()
        assert all(v == 0.0 for v in row), (table, row)


def test_q1_money_pairs_identical_across_engines(spark):
    import __spark_entry__ as e

    sdf = e.queries()["q1_pricing_summary"](spark, SF)
    # no DECIMAL reaches the wire (dtype-gate class), and every blind-band
    # dollars column has its BIGINT cents twin
    types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    assert not any(t.startswith("decimal") for t in types.values()), types
    for col in ("sum_base_price", "sum_disc_price", "sum_charge"):
        assert types[col] == "double"
        assert types[f"{col}_cents"] == "bigint"
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    for t in ("lineitem",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    drows = con.execute(e.oracle_sql()["q1_pricing_summary"]).fetchall()
    assert len(srows) == len(drows) > 0
    for s, d in zip(sorted(map(repr, srows)), sorted(map(repr, drows))):
        # repr equality = bit-identical doubles AND exact-equal ints
        assert s == d


def test_cents_column_sees_subcent_defect():
    """The M08 shape: dollars doubles alias under the 9-sig-digit band at
    ~5e8 magnitude, but the cents int64 differs -> hash differs."""
    good_d, good_c = 513158224.35, 51315822435
    bad_d, bad_c = 513158224.3456, 51315822434  # dropped round(...,2)
    assert _norm_cell(good_d) == _norm_cell(bad_d)  # the band is blind...
    cols = ["v", "v_cents"]
    assert table_hash(cols, [(good_d, good_c)]) != table_hash(
        cols, [(bad_d, bad_c)]
    )  # ...the cents twin is not


def test_hasher_sees_subcent_defect_on_large_decimal():
    good = decimal.Decimal("513158224.35")
    bad = decimal.Decimal("513158224.3456")  # dropped round(...,2): M08
    cols = ["v"]
    assert table_hash(cols, [(good,)]) != table_hash(cols, [(bad,)])
    # ...which the float band, by construction, cannot see:
    assert _norm_cell(float(good)) == _norm_cell(float(bad))


def test_hasher_decimal_scale_canonicalization():
    a = decimal.Decimal("513158224.3500")
    b = decimal.Decimal("513158224.35")
    assert _norm_cell(a) == _norm_cell(b)
    assert _norm_cell(decimal.Decimal("-0.00")) == "0"
    assert _norm_cell(decimal.Decimal("100")) == "100"


@pytest.mark.parametrize(
    "sv, expect",
    [
        (decimal.Decimal("0E-18"), "0"),
        (decimal.Decimal("-7.10"), "-7.1"),
        (decimal.Decimal("1000000000000.00"), "1000000000000"),
    ],
)
def test_hasher_decimal_edge_cases(sv, expect):
    assert _norm_cell(sv) == expect


def test_spark_money_pattern_internal_scale_is_2(spark):
    """F.round(F.sum(money-expr), 2) yields a scale-2 DecimalType — the
    invariant money_sum_pair relies on: *100 then cast long is exact."""
    from citegraph_spark.plans.money import (
        charge,
        disc_price,
        money,
        money_sum_pair,
    )
    from citegraph_spark.sources.tables import load_table

    li = load_table(spark, SF, "lineitem").limit(100)
    out = li.agg(
        F.round(F.sum(money("l_extendedprice")), 2).alias("a"),
        F.round(F.sum(disc_price()), 2).alias("b"),
        F.round(F.sum(charge()), 2).alias("c"),
    )
    for f in out.schema.fields:
        assert f.dataType.typeName() == "decimal", f
        assert f.dataType.scale == 2, f
    pair = li.agg(*money_sum_pair(disc_price(), "rev")).collect()[0]
    assert round(pair["rev"] * 100) == pair["rev_cents"]
