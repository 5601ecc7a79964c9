"""Unit tests for the round-3 analytics surface: multi-source BFS /
landmark closeness, time-range windows, winsorization, UDTF chunking,
null-safe join, JSON map parsing. Parity at sf0.01 is covered by the
driver's oracle gate; these pin exact semantics on tiny inputs."""

from __future__ import annotations

from collections import deque

from pyspark.sql import Window
from pyspark.sql import functions as F

# 3 - 4        7 - 8
# | x |        |
# 1 - 2 - 5 -- 6
EDGES = [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4), (3, 4), (2, 5), (5, 6), (6, 7), (7, 8)]


def _und(spark):
    both = EDGES + [(b, a) for a, b in EDGES]
    return spark.createDataFrame(both, "src long, dst long").distinct()


def _bfs_py(sources, max_hops):
    adj = {}
    for a, b in EDGES:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for s in sources:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= max_hops:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        for n, d in dist.items():
            out[(s, n)] = d
    return out


def test_multi_source_bfs_matches_bruteforce(spark):
    from citegraph_spark.operators.graph import multi_source_bfs

    got = {
        (r["src_id"], r["node"]): r["dist"]
        for r in multi_source_bfs(_und(spark), [1, 8], rounds=3).collect()
    }
    assert got == _bfs_py([1, 8], 3)


def test_closeness_from_landmarks_arithmetic(spark):
    from citegraph_spark.operators.graph import (
        closeness_from_landmarks,
        multi_source_bfs,
    )

    dist = multi_source_bfs(_und(spark), [1], rounds=10)
    row = closeness_from_landmarks(dist).collect()[0]
    # exact distances from 1: {2,3,4}=1, 5=2, 6=3, 7=4, 8=5 -> total 17
    assert row["reached"] == 7
    assert row["total_dist"] == 17
    assert abs(row["closeness"] - 7 / 17) < 1e-6
    assert row["eccentricity"] == 5


def test_time_range_window_excludes_stale_rows(spark):
    ev = spark.createDataFrame(
        [(1, 0, 10.0), (2, 1800, 20.0), (3, 5400, 60.0)],
        "event_id int, sec int, value double",
    )
    w = Window.partitionBy(F.lit(1)).orderBy("sec").rangeBetween(-3600, 0)
    got = {
        r["event_id"]: r["mav"]
        for r in ev.withColumn("mav", F.avg("value").over(w)).collect()
    }
    # row 3 at t=5400: frame [1800, 5400] keeps rows 2 and 3, drops row 1
    assert got == {1: 10.0, 2: 15.0, 3: 40.0}


def test_winsorized_prices_bounds(spark):
    from citegraph_spark.plans.analytics_queries import winsorized_prices

    rows = winsorized_prices(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 3
    for r in rows:
        # ~1% clipped each side of each group, never more than 2%
        assert 0 < r["n_clipped_low"] <= r["n_clipped_high"] * 3 + 50
        assert r["avg_winsorized"] > 0


def test_udtf_chunker_matches_python(spark):
    from citegraph_spark.plans.analytics_queries import udtf_chunk_split

    rows = udtf_chunk_split(spark, "/root/testdata/sf0.001").collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 500)
        .collect()
    }
    expect = []
    for doc_id in sorted(docs):
        words = docs[doc_id].split(" ")
        for i in range(0, len(words), 10):
            chunk = words[i : i + 10]
            expect.append((doc_id, i // 10, len(chunk), chunk[0]))
    assert [tuple(r) for r in rows] == expect


def test_null_safe_join_matches_null_keys(spark):
    a = spark.createDataFrame([(None, 1), ("x", 2)], "k string, va int")
    b = spark.createDataFrame([(None, 10), ("x", 20), ("y", 30)], "k string, vb int")
    got = {
        (r["va"], r["vb"])
        for r in a.join(b, a["k"].eqNullSafe(b["k"])).select("va", "vb").collect()
    }
    assert got == {(1, 10), (2, 20)}


def test_json_map_parse_types(spark):
    df = spark.createDataFrame([('{"a": 1, "b": 2}',), ('{"a": 5}',)], "props string")
    kv = df.select(F.explode(F.from_json("props", "map<string,int>")).alias("k", "v"))
    got = {(r["k"], r["v"]) for r in kv.collect()}
    assert got == {("a", 1), ("b", 2), ("a", 5)}


def test_stats_moments_deterministic_mode(spark):
    df = spark.createDataFrame(
        [("g", "b"), ("g", "a"), ("g", "a"), ("g", "b")], "grp string, v string"
    )
    # tie between a and b -> deterministic mode returns the smallest
    got = df.groupBy("grp").agg(F.mode("v", True).alias("m")).collect()[0]["m"]
    assert got == "a"


def _bpe_py(word_counts, n_merges):
    """Reference BPE (Sennrich et al. 2016 pseudo-code, public)."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    out = []
    for step in range(1, n_merges + 1):
        pairs = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get((syms[i], syms[i + 1]), 0) + c
        if not pairs:
            break
        # argmax, ties -> lexicographically smallest pair
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((step, a, b, c))
        new_vocab = {}
        for syms, cnt in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            new_vocab[tuple(merged)] = new_vocab.get(tuple(merged), 0) + cnt
        vocab = new_vocab
    return out


def test_bpe_train_matches_python_reference(spark):
    from citegraph_spark.functions.text import bpe_train

    words = {"lower": 5, "lowest": 2, "newer": 6, "wider": 3, "low": 7}
    vocab = spark.createDataFrame(list(words.items()), "tok string, cnt long")
    got = bpe_train(vocab, n_merges=6)
    assert got == _bpe_py(words, 6)


def test_bpe_merge_handles_overlapping_runs(spark):
    from citegraph_spark.functions.text import bpe_merge_pair, char_symbols

    df = spark.createDataFrame([("aaa",), ("aabaa",)], "tok string")
    got = {
        r["tok"]: r["m"]
        for r in df.select(
            "tok", bpe_merge_pair(char_symbols(F.col("tok")), "a", "a").alias("m")
        ).collect()
    }
    # greedy left-to-right, non-overlapping
    assert got == {"aaa": ["aa", "a"], "aabaa": ["aa", "b", "aa"]}


def test_pipeline_end_to_end_splits_sum_to_dedup_count(spark):
    from citegraph_spark.plans.analytics_queries import pipeline_end_to_end

    rows = pipeline_end_to_end(spark, "/root/testdata/sf0.001").collect()
    assert sum(r["n_docs"] for r in rows) > 0
    assert {r["split"] for r in rows} <= {"train", "val", "test"}


def test_file_lineage_counts_covers_all_rows(spark):
    from citegraph_spark.plans.analytics_queries import file_lineage_counts

    rows = file_lineage_counts(spark, "/root/testdata/sf0.001").collect()
    total = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").count()
    assert sum(r["n_rows"] for r in rows) == total


def test_salted_join_matches_plain_join(spark):
    """Salting must be result-invariant: same rows as the plain equi
    join, for a left side with one hot key and an unmatched key."""
    from citegraph_spark.operators.relational import salted_join

    left = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, i) for i in range(7)] + [(9, 0)],
        "k int, v int",
    )
    right = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, name string")
    got = sorted(map(tuple, salted_join(left, right, key="k", n_salts=8).collect()))
    expected = sorted(map(tuple, left.join(right, "k").collect()))
    assert got == expected
    assert len(got) == 507  # hot key kept whole, key 9 dropped (inner)


def test_sliding_window_matches_bruteforce(tmp_path, spark):
    """30-min/15-min sliding windows: every event must land in exactly
    the two windows [floor15(t)-15, floor15(t)] — checked end-to-end
    through the registered query on a tiny parquet events table."""
    import datetime as dt
    from collections import defaultdict

    from citegraph_spark.plans.entry_queries import QUERIES

    base = dt.datetime(2025, 1, 1, 0, 0, 0)
    rows = [
        (base + dt.timedelta(minutes=m, seconds=s), typ, float(val))
        for m, s, typ, val in [
            (0, 0, "a", 1), (7, 30, "a", 2), (14, 59, "b", 3),
            (15, 0, "a", 4), (29, 59, "b", 5), (30, 0, "a", 6),
            (44, 59, "a", 7), (45, 0, "b", 8),
        ]
    ]
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    ev.write.parquet(str(tmp_path / "events.parquet"))

    out = QUERIES["events_sliding_window"](spark, str(tmp_path)).collect()
    got = {(r["window_start"], r["event_type"]): (r["n"], r["value_sum"]) for r in out}

    expected = defaultdict(lambda: [0, 0.0])
    for t, typ, v in rows:
        f15 = t.replace(minute=(t.minute // 15) * 15, second=0)
        for start in (f15, f15 - dt.timedelta(minutes=15)):
            key = (start.strftime("%Y-%m-%d %H:%M:%S"), typ)
            expected[key][0] += 1
            expected[key][1] += v
    assert got == {k: (n, s) for k, (n, s) in expected.items()}


def test_events_anomaly_iqr_bruteforce(spark):
    import statistics

    from citegraph_spark.plans.entry_queries import QUERIES

    sf = "/root/testdata/sf0.001"
    ev = [
        (r["event_id"], r["event_type"], r["value"])
        for r in spark.read.parquet(f"{sf}/events.parquet").collect()
    ]
    by_type = {}
    for _eid, et, v in ev:
        by_type.setdefault(et, []).append(v)
    fences = {}
    for et, vals in by_type.items():
        # statistics.quantiles(n=4, method='inclusive') == linear-interp
        # quartiles, the percentile/quantile_cont definition
        q1, _q2, q3 = statistics.quantiles(sorted(vals), n=4, method="inclusive")
        iqr = q3 - q1
        fences[et] = (q1 - 1.5 * iqr, q3 + 1.5 * iqr)
    expected = {
        eid: ("low" if v < fences[et][0] else "high")
        for eid, et, v in ev
        if v < fences[et][0] or v > fences[et][1]
    }
    rows = QUERIES["events_anomaly_iqr"](spark, sf).collect()
    got = {r["event_id"]: r["side"] for r in rows}
    assert got == expected


def test_benford_distribution_sums_to_one(spark):
    from citegraph_spark.plans.entry_queries import QUERIES

    rows = QUERIES["dq_benford_first_digit"](spark, "/root/testdata/sf0.001").collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["observed"] for r in rows) - 1.0) < 1e-3
    import math

    for r in rows:
        assert abs(r["benford"] - round(math.log10(1 + 1 / r["digit"]), 6)) < 1e-9


def test_events_twap_bruteforce(spark):
    from collections import defaultdict

    from citegraph_spark.plans.entry_queries import QUERIES

    sf = "/root/testdata/sf0.001"
    ev = sorted(
        (r["user_id"], r["ts"], r["event_id"], r["value"])
        for r in spark.read.parquet(f"{sf}/events.parquet").collect()
    )
    by_user = defaultdict(list)
    for u, ts, eid, v in ev:
        by_user[u].append((ts, eid, v))
    expected = {}
    for u, seq in by_user.items():
        seq.sort()
        num = den = 0.0
        n = 0
        for (t0, _, v), (t1, _, _) in zip(seq, seq[1:]):
            dt = (t1 - t0).total_seconds() * 1e6
            if dt > 0:
                num += v * dt
                den += dt
                n += 1
        if den > 0:
            expected[u] = (round(num / den, 6), n)
    rows = QUERIES["events_twap"](spark, sf).collect()
    got = {r["user_id"]: (r["twap"], r["n_intervals"]) for r in rows}
    assert set(got) == set(expected)
    for u, (tw, n) in expected.items():
        assert got[u][1] == n
        assert abs(got[u][0] - tw) < 1e-4


def test_rfm_quartiles_and_decay_monotonicity(spark):
    from citegraph_spark.plans.entry_queries import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["customer_rfm_segments"](spark, sf).collect()
    n = len(rows)
    assert n == spark.read.parquet(f"{sf}/orders.parquet").select(
        "o_custkey"
    ).distinct().count()
    for dim in ("r", "f", "m"):
        counts = {}
        for r in rows:
            counts[r[dim]] = counts.get(r[dim], 0) + 1
        assert set(counts) == {1, 2, 3, 4}
        assert max(counts.values()) - min(counts.values()) <= 1  # ntile balance
    # best-recency quartile really is more recent than the worst
    r1 = [r["recency_days"] for r in rows if r["r"] == 1]
    r4 = [r["recency_days"] for r in rows if r["r"] == 4]
    assert max(r1) <= min(r4)

    dec = {
        r["event_type"]: r
        for r in QUERIES["events_decayed_counts"](spark, sf).collect()
    }
    for et, r in dec.items():
        # decayed count is bounded by the raw count and strictly positive
        assert 0 < r["decayed_count"] <= r["raw_count"]


def test_cdc_apply_and_temporal_reachability(spark):
    from citegraph_spark.plans.entry_queries import QUERIES

    sf = "/root/testdata/sf0.001"
    sup = {
        r["s_suppkey"]: round(r["s_acctbal"], 2)
        for r in spark.read.parquet(f"{sf}/supplier.parquet").collect()
    }
    rows = {r["key"]: r for r in QUERIES["cdc_apply_changes"](spark, sf).collect()}
    for k, bal in sup.items():
        if k % 2 == 0 and k % 7 == 0:
            assert k not in rows  # deleted
        elif k % 2 == 0 and k % 3 == 0:
            assert rows[k]["version"] == 2
            assert abs(rows[k]["acctbal"] - round(bal + 500.0, 2)) < 1e-6
        elif k % 2 == 0:
            assert rows[k]["version"] == 2
            assert abs(rows[k]["acctbal"] - bal) < 1e-6
        else:
            assert rows[k]["version"] == 1

    tr = QUERIES["graph_temporal_reachability"](spark, sf).collect()
    for r in tr:
        # time-respecting reach is monotone in depth and bounded by
        # static reach (checked structurally: reach_2 >= reach_1)
        assert r["reach_2"] >= r["reach_1"] > 0


def test_basket_lift_matches_bruteforce(spark):
    from collections import Counter
    from itertools import combinations

    from citegraph_spark.plans.entry_queries import QUERIES

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet").collect()
    baskets = {}
    for r in li:
        baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"] % 50)
    n = len(baskets)
    supp = Counter()
    pair = Counter()
    for items in baskets.values():
        for it in items:
            supp[it] += 1
        for x, y in combinations(sorted(items), 2):
            pair[(x, y)] += 1
    scored = [
        (round(c * n / (supp[x] * supp[y]), 6), x, y, c)
        for (x, y), c in pair.items()
        if c >= 5
    ]
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = [(x, y, c, l) for l, x, y, c in scored[:25]]
    got = [
        (r["x"], r["y"], r["support"], r["lift"])
        for r in QUERIES["basket_lift_top"](spark, sf).collect()
    ]
    assert got == want and got


def test_ewma_matches_bruteforce(spark):
    from collections import defaultdict

    from citegraph_spark.plans.entry_queries import QUERIES

    sf = "/root/testdata/sf0.001"
    ev = sorted(
        (r["user_id"], r["ts"], r["event_id"], r["value"])
        for r in spark.read.parquet(f"{sf}/events.parquet").collect()
    )
    by_user = defaultdict(list)
    for u, ts, eid, v in ev:
        by_user[u].append((ts, eid, v))
    expected = {}
    for u, seq in by_user.items():
        seq.sort()
        vals = [v for _, _, v in seq]
        for i, (_, eid, _) in enumerate(seq):
            w = vals[max(0, i - 19) : i + 1]
            s = w[0]
            for x in w[1:]:
                s = 0.3 * x + 0.7 * s
            expected[eid] = round(s, 6)
    got = {r["event_id"]: r["ewma"] for r in QUERIES["events_ewma"](spark, sf).collect()}
    assert set(got) == set(expected)
    for eid, v in expected.items():
        assert abs(got[eid] - v) < 1e-5
