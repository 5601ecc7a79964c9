"""Property-based tests (hypothesis): operator semantics vs brute-force
references on arbitrary small inputs. One shared SparkSession (conftest);
examples kept small so each property runs in seconds."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from citegraph_spark.operators.graph import canonical_pairs
from citegraph_spark.operators.relational import asof_join, range_join_binned

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

edges_st = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)), min_size=0, max_size=40
)


@given(edges=edges_st)
@SET
def test_canonical_pairs_property(spark, edges):
    df = spark.createDataFrame(edges or [(0, 0)], "src int, dst int")
    if not edges:
        df = df.limit(0)
    got = {(r["a"], r["b"]) for r in canonical_pairs(df).collect()}
    want = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    assert got == want


@given(
    lefts=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)), max_size=25),
    rights=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)), max_size=25),
)
@SET
def test_asof_join_property(spark, lefts, rights):
    # dedupe right on (k, t): operator contract requires unique right ts
    # per key for deterministic tie-break
    rmap = {}
    for i, (k, t) in enumerate(rights):
        rmap[(k, t)] = i
    rrows = [(k, t, v) for (k, t), v in rmap.items()]
    lrows = [(i, k, t) for i, (k, t) in enumerate(lefts)]
    left = spark.createDataFrame(lrows or [(0, 0, 0)], "lid int, k int, t int")
    right = spark.createDataFrame(rrows or [(0, 0, 0)], "k int, t int, v int")
    if not lrows:
        left = left.limit(0)
    if not rrows:
        right = right.limit(0)
    got = {
        r["lid"]: r["v"]
        for r in asof_join(left, right, key="k", left_ts="t", right_ts="t",
                           right_cols=["v"]).collect()
    }
    for lid, k, t in lrows:
        cands = [(rt, v) for (rk, rt), v in rmap.items() if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got.get(lid) == want, (lid, k, t, got.get(lid), want)


@given(
    pts=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 300)), max_size=25),
    ivs=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 280), st.integers(0, 60)),
        max_size=15,
    ),
    bin_width=st.sampled_from([7, 50, 128]),
)
@SET
def test_range_join_property(spark, pts, ivs, bin_width):
    lrows = [(i, k, p) for i, (k, p) in enumerate(pts)]
    rrows = [(j, k, lo, lo + span) for j, (k, lo, span) in enumerate(ivs)]
    left = spark.createDataFrame(lrows or [(0, 0, 0)], "pid int, k int, p long")
    right = spark.createDataFrame(rrows or [(0, 0, 0, 0)], "iid int, k int, lo long, hi long")
    if not lrows:
        left = left.limit(0)
    if not rrows:
        right = right.limit(0)
    got = {
        (r["pid"], r["iid"])
        for r in range_join_binned(left, right, key="k", left_point="p",
                                   right_lo="lo", right_hi="hi",
                                   bin_width=bin_width).collect()
    }
    want = {
        (pid, iid)
        for pid, pk, p in lrows
        for iid, ik, lo, hi in rrows
        if pk == ik and lo <= p <= hi
    }
    assert got == want


@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=30), min_size=2, max_size=10
    ),
    max_dist=st.integers(1, 8),
)
@SET
def test_edit_distance_cascade_lossless(spark, texts, max_dist):
    """The three-stage filter cascade (length blocking → 1-gram L1 count
    filter → banded levenshtein) must find EXACTLY the brute-force pair
    set — the L1/2 lower bound and the length bound are lossless."""
    import itertools

    from citegraph_spark.operators.relational import edit_distance_pairs

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["a"], r["b"], r["dist"])
        for r in edit_distance_pairs(df, max_dist=max_dist).collect()
    }
    want = {
        (i, j, lev(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if lev(a, b) <= max_dist
    }
    assert got == want


@given(
    vals=st.lists(st.integers(0, 100), min_size=1, max_size=60),
)
@SET
def test_global_cumsum_property(spark, vals):
    from citegraph_spark.operators.relational import global_cumsum

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {(r["k"], r["cum"]) for r in global_cumsum(df, ["k"], "v", num_partitions=4).collect()}
    acc, want = 0, set()
    for i, v in enumerate(vals):
        acc += v
        want.add((i, acc))
    assert got == want


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=30
    )
)
@SET
def test_skyline_2d_property(spark, pts):
    from citegraph_spark.operators.relational import skyline_2d

    rows = [(i, float(x), y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "pid int, x double, y int")
    got = sorted(r["pid"] for r in skyline_2d(df, "x", "y").collect())

    def dominated(p):
        return any(
            q[1] <= p[1] and q[2] <= p[2] and (q[1] < p[1] or q[2] < p[2])
            for q in rows
        )

    want = sorted(pid for pid, *_ in [p for p in rows if not dominated(p)])
    assert got == want


@given(
    coords=st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=20,
    )
)
@SET
def test_zorder_key_property(spark, coords):
    from pyspark.sql import functions as F

    from citegraph_spark.sources.sinks import zorder_key

    df = spark.createDataFrame(coords, "x long, y long").withColumn(
        "z", zorder_key(F.col("x"), F.col("y"), bits=8)
    )

    def interleave(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for r in df.collect():
        assert r["z"] == interleave(r["x"], r["y"])


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=1, max_size=25
    )
)
@SET
def test_motif_reciprocal_property(spark, edges):
    from citegraph_spark.operators.motif import find_motifs

    df = spark.createDataFrame(edges, "src int, dst int").distinct()
    es = set(edges)
    got = {(r["a"], r["b"]) for r in
           find_motifs(df, "(a)-[]->(b); (b)-[]->(a)").collect()}
    want = {(a, b) for a, b in es if (b, a) in es}
    assert got == want
