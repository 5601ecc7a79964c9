"""plans/date_filters.date_window: the TZ-proof predicate must select
exactly the same rows as the naive timestamp-window form on NTZ data
(the coarse one-day slack exists only for scan pushdown and must never
change membership), for two-sided and both one-sided shapes."""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from citegraph_spark.plans.date_filters import date_window

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate"
    )


def _naive(lo: date | None, hi: date | None):
    c = F.col("l_shipdate")
    pred = F.lit(True)
    if lo is not None:
        pred = pred & (c >= F.lit(str(lo)).cast("timestamp"))
    if hi is not None:
        pred = pred & (c < F.lit(str(hi)).cast("timestamp"))
    return pred


@pytest.mark.parametrize(
    "lo,hi",
    [
        (date(1996, 1, 1), date(1997, 1, 1)),   # q12/q6 window
        (date(1996, 3, 1), date(1996, 4, 1)),   # one-month (q14)
        (date(1996, 1, 1), None),               # lo-only (q22 shape)
        (None, date(1997, 1, 1)),               # hi-only (q1 shape)
    ],
)
def test_date_window_matches_naive_timestamp_window(lineitem, lo, hi):
    got = lineitem.filter(date_window("l_shipdate", lo, hi))
    want = lineitem.filter(_naive(lo, hi))
    assert got.count() == want.count()
    # membership, not just cardinality: symmetric difference is empty
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_date_window_requires_a_bound():
    with pytest.raises(ValueError):
        date_window("l_shipdate", None, None)


def test_boundary_midnight_rows_exist_and_are_kept(lineitem):
    """The failure mode this module exists for: rows at exactly the
    boundary midnight. Assert the testdata actually has them (otherwise
    these tests prove nothing) and that date_window keeps the lower
    boundary and excludes the upper."""
    lo, hi = date(1996, 1, 1), date(1997, 1, 1)
    kept = lineitem.filter(date_window("l_shipdate", lo, hi))
    at_lo = kept.filter(F.to_date("l_shipdate") == F.lit(lo)).count()
    at_hi = kept.filter(F.to_date("l_shipdate") == F.lit(hi)).count()
    all_at_lo = lineitem.filter(F.to_date("l_shipdate") == F.lit(lo)).count()
    assert all_at_lo > 0, "no boundary-day rows at this sf — test is vacuous"
    assert at_lo == all_at_lo and at_hi == 0
