"""Unit tests for the as-of and binned range join operators on tiny
hand-checkable inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

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


def test_range_join_binned_subsecond_exact(spark):
    """The exact re-filter must honor sub-second timestamp order: a point
    60 ms BEFORE the interval's lower bound (same whole second) is OUT,
    one 60 ms after the upper bound (same whole second) is OUT, and the
    exact bounds are IN. Pins the sf0.1 cross-SF sweep finding where a
    second-granular re-filter admitted a purchase that preceded its
    click by 59.87 ms."""
    import datetime as dt

    base = dt.datetime(2024, 1, 14, 10, 49, 26, 417201)
    lo = base
    hi = base + dt.timedelta(minutes=30)
    right = spark.createDataFrame(
        [(1, lo, hi)], "k int, lo timestamp_ntz, hi timestamp_ntz"
    )
    pts = [
        (10, base - dt.timedelta(milliseconds=60)),   # same second, before lo
        (11, base),                                   # == lo: in
        (12, base + dt.timedelta(milliseconds=60)),   # in
        (13, hi),                                     # == hi: in
        (14, hi + dt.timedelta(milliseconds=60)),     # same second, past hi
    ]
    left = spark.createDataFrame(
        [(pid, 1, p) for pid, p in pts], "pid int, k int, p timestamp_ntz"
    )
    got = {
        r["pid"]
        for r in range_join_binned(
            left, right, key="k", left_point="p", right_lo="lo",
            right_hi="hi", bin_width=30 * 60,
        ).collect()
    }
    assert got == {11, 12, 13}


# ------------------------------------------------- global rank / histogram


def test_global_rank_matches_single_partition_sort(spark):
    """Distributed rank (range partitions + offsets) must equal the naive
    global-window row_number for every row."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from citegraph_spark.operators.relational import global_rank

    df = spark.range(0, 10_000).select(
        (F.col("id") * 2654435761 % 100_000).alias("v"), F.col("id").alias("k")
    )
    got = global_rank(df, ["v", "k"], num_partitions=16)
    naive = df.withColumn("rnk", F.row_number().over(Window.orderBy("v", "k")).cast("long"))
    assert got.join(naive, ["v", "k"]).filter(
        got["rnk"] != naive["rnk"]
    ).count() == 0


def test_equidepth_histogram_buckets_balanced(spark):
    from citegraph_spark.operators.relational import equidepth_histogram

    df = spark.range(0, 1003).selectExpr("id * 7 % 991 AS v", "id AS k")
    h = equidepth_histogram(df, "v", "k", n_buckets=8).collect()
    assert len(h) == 8
    sizes = [r["n_rows"] for r in h]
    assert sum(sizes) == 1003 and max(sizes) - min(sizes) <= 1
    # buckets must tile the value range in order
    for lo_r, hi_r in zip(h, h[1:]):
        assert lo_r["hi"] <= hi_r["lo"]


def test_edit_distance_pairs_blocking_is_lossless(spark):
    """Length-bucket blocking must find exactly the brute-force pairs."""
    from pyspark.sql import functions as F

    from citegraph_spark.operators.relational import edit_distance_pairs

    docs = spark.createDataFrame(
        [
            (1, "abcdefghij"),
            (2, "abcdefghiX"),          # dist 1 to doc 1
            (3, "abcdefghijklmnop"),    # dist 6 to doc 1 (appended)
            (4, "zzzzzzzzzz"),          # dist 10 to doc 1, > threshold 5
            (5, "abc"),                 # big length gap
        ],
        "doc_id long, text string",
    )
    got = {
        (r["a"], r["b"], r["dist"])
        for r in edit_distance_pairs(docs, max_dist=5).collect()
    }
    a = docs.select(F.col("doc_id").alias("a"), F.col("text").alias("ta"))
    b = docs.select(F.col("doc_id").alias("b"), F.col("text").alias("tb"))
    brute = {
        (r["a"], r["b"], r["dist"])
        for r in a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.levenshtein("ta", "tb").alias("dist"))
        .filter(F.col("dist") <= 5)
        .collect()
    }
    assert got == brute and (1, 2, 1) in got


def test_global_cumsum_matches_single_partition_window(spark):
    """global_cumsum (range-repartition + per-partition offsets) must equal
    the naive single-partition running sum."""
    from pyspark.sql import Window

    from citegraph_spark.operators.relational import global_cumsum

    df = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") % 37 + 1).alias("v")
    )
    got = {
        (r["k"], r["cum"])
        for r in global_cumsum(df, ["k"], "v", num_partitions=16).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        (r["k"], r["cum"])
        for r in df.withColumn("cum", F.sum("v").over(w).cast("long")).collect()
    }
    assert got == want


def test_pack_sequences_bin_invariants(spark):
    """Every doc lands in the bin where its token tape offset starts; bin
    token sums must cover the whole corpus exactly once."""
    from citegraph_spark.plans.entry_queries import QUERIES

    out = QUERIES["pack_sequences"](spark, "/root/testdata/sf0.001").collect()
    bins = [r["bin"] for r in out]
    assert bins == sorted(bins)
    assert all(r["n_docs"] >= 1 for r in out)
    total_tokens = sum(r["n_tokens"] for r in out)
    from citegraph_spark.functions import text

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = docs.select(
        F.sum(F.size(text.tokens(F.col("text")))).alias("s")
    ).first()["s"]
    assert total_tokens == want


def test_dedup_incremental_flags_planted_exact_dup(spark):
    """A new-batch doc whose text equals an existing doc must be flagged
    exact_dup; near-identical (one token changed) must be near_dup."""
    from citegraph_spark.functions import text as T
    from citegraph_spark.plans.pipeline_queries import dedup_incremental
    import inspect

    # drive the same logic through a planted frame via the module's
    # internals: bucket>=80 docs are "new"
    base = " ".join(f"word{i}" for i in range(40))
    rows = []
    # find ids whose bucket lands on each side deterministically
    import hashlib

    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100

    ex_id = next(i for i in range(1000) if bucket(i) < 80)
    new_exact = next(i for i in range(1000) if bucket(i) >= 80)
    new_near = next(
        i for i in range(1000) if bucket(i) >= 80 and i != new_exact
    )
    near_text = base.replace("word7 ", "wordx ", 1)
    df = spark.createDataFrame(
        [(ex_id, base), (new_exact, base), (new_near, near_text)],
        "doc_id long, text string",
    )
    import tempfile, os

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: r["status"] for r in dedup_incremental(spark, d).collect()}
    assert out[new_exact] == "exact_dup"
    assert out[new_near] == "near_dup"


def test_grouped_exact_percentiles_matches_percentile(spark):
    """Bounded-state exact percentiles (global_rank + rank-targeted
    aggregation; the r12 spill-board ERROR fix) must reproduce
    F.percentile's interpolated definition exactly — including
    fractional positions and the n=1 group edge."""
    import random

    from pyspark.sql import functions as F

    from citegraph_spark.operators.relational import grouped_exact_percentiles

    rnd = random.Random(7)
    rows = [("a", float(rnd.randint(0, 10_000)) / 100) for _ in range(997)]
    rows += [("b", float(v)) for v in (5.0, 1.0, 3.0, 2.0)]
    rows += [("c", 42.0)]  # single-element group: every q -> 42.0
    df = spark.createDataFrame(rows, "g string, v double")
    qs = [0.0, 0.25, 0.5, 0.9, 0.902, 1.0]
    names = [f"p{i}" for i in range(len(qs))]
    got = {
        r["g"]: [r[n] for n in names]
        for r in grouped_exact_percentiles(df, "g", "v", qs, names).collect()
    }
    want = {
        r["g"]: [r[n] for n in names]
        for r in df.groupBy("g")
        .agg(*[F.percentile("v", F.lit(q)).alias(n) for q, n in zip(qs, names)])
        .collect()
    }
    assert set(got) == {"a", "b", "c"}
    for g in got:
        for a, b in zip(got[g], want[g]):
            assert abs(a - b) < 1e-9, (g, got[g], want[g])
    assert got["c"] == [42.0] * len(qs)
