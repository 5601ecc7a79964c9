"""Unit tests for the as-of and binned range join operators on tiny
hand-checkable inputs."""

from __future__ import annotations

from citegraph_spark.operators.relational import asof_join, range_join_binned


def test_asof_join_picks_latest_at_or_before(spark):
    trades = spark.createDataFrame(
        [(1, 100, "A"), (1, 250, "B"), (2, 50, "C"), (2, 400, "D")],
        "k int, t long, trade string",
    )
    quotes = spark.createDataFrame(
        [(1, 90, 10.0), (1, 200, 11.0), (1, 250, 12.0), (2, 100, 20.0)],
        "k int, t long, px double",
    )
    out = {
        r["trade"]: r["px"]
        for r in asof_join(
            trades, quotes, key="k", left_ts="t", right_ts="t", right_cols=["px"]
        ).collect()
    }
    # A: quote@90; B: tie at 250 resolves to the right row; C: no prior quote
    assert out == {"A": 10.0, "B": 12.0, "C": None, "D": 20.0}


def test_range_join_binned_matches_naive(spark):
    import random

    rng = random.Random(7)
    pts = [(i, rng.randrange(5), rng.randrange(0, 1000)) for i in range(200)]
    ivs = [
        (j, rng.randrange(5), lo := rng.randrange(0, 950), lo + rng.randrange(0, 120))
        for j in range(60)
    ]
    left = spark.createDataFrame(pts, "pid int, k int, p long")
    right = spark.createDataFrame(ivs, "iid int, k int, lo long, hi long")
    got = {
        (r["pid"], r["iid"])
        for r in range_join_binned(
            left, right, key="k", left_point="p", right_lo="lo", right_hi="hi",
            bin_width=100,
        ).collect()
    }
    want = {
        (pid, iid)
        for pid, pk, p in pts
        for iid, ik, lo, hi in ivs
        if pk == ik and lo <= p <= hi
    }
    assert got == want


def test_range_join_binned_no_key(spark):
    left = spark.createDataFrame([(1, 5), (2, 150), (3, 250)], "pid int, p long")
    right = spark.createDataFrame([(10, 0, 160), (11, 240, 300)], "iid int, lo long, hi long")
    got = {
        (r["pid"], r["iid"])
        for r in range_join_binned(
            left, right, key=None, left_point="p", right_lo="lo", right_hi="hi",
            bin_width=50,
        ).collect()
    }
    assert got == {(1, 10), (2, 10), (3, 11)}
