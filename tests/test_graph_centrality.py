"""Degree distribution, co-citation triangles, PageRank — validated
against brute-force references on the fixture graph (FIXTURES.md §1)."""

from __future__ import annotations

import collections
import itertools

from pyspark.sql import functions as F

from citegraph_spark.fixtures import fixture_citations
from citegraph_spark.operators.graph import (
    bidirectional,
    canonical_pairs,
    co_citation,
    degree_distribution,
    pagerank,
    triangle_stats,
)


def _raw_edges(spark):
    return [(r["from"], r["to"]) for r in fixture_citations(spark).collect()]


def test_degree_distribution_matches_bruteforce(spark):
    raw = _raw_edges(spark)
    und = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    deg = collections.Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    expected = dict(collections.Counter(deg.values()))

    got = {
        r["degree"]: r["n_nodes"]
        for r in degree_distribution(bidirectional(fixture_citations(spark))).collect()
    }
    assert got == expected


def test_triangle_stats_matches_bruteforce(spark):
    raw = _raw_edges(spark)
    und = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    deg = collections.Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    tri = sum(
        1
        for x, y, z in itertools.combinations(sorted(deg), 3)
        if (x, y) in und and (y, z) in und and (x, z) in und
    )
    wedges = sum(d * (d - 1) // 2 for d in deg.values())

    row = triangle_stats(canonical_pairs(fixture_citations(spark), "from", "to")).first()
    assert row["n_edges"] == len(und)
    assert row["n_wedges"] == wedges
    assert row["n_triangles"] == tri
    assert abs(row["clustering_coeff"] - 3.0 * tri / wedges) < 1e-6


def test_cocitation_projection_matches_bruteforce(spark):
    raw = _raw_edges(spark)
    by_src = collections.defaultdict(set)
    for a, b in raw:
        by_src[a].add(b)
    expected = {
        (x, y)
        for nbrs in by_src.values()
        for x, y in itertools.combinations(sorted(nbrs), 2)
    }
    got = {(r["a"], r["b"]) for r in co_citation(fixture_citations(spark)).collect()}
    assert got == expected


def test_pagerank_matches_bruteforce_iteration(spark):
    raw = _raw_edges(spark)
    nodes = sorted({x for e in raw for x in e})
    outd = collections.Counter(a for a, _ in raw)
    n = len(nodes)
    ranks = {v: 1.0 / n for v in nodes}
    for _ in range(10):
        nxt = {v: 0.15 / n for v in nodes}
        for a, b in raw:
            nxt[b] += 0.85 * ranks[a] / outd[a]
        ranks = nxt

    edges = fixture_citations(spark).selectExpr("`from` as src", "`to` as dst")
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=10).collect()}
    assert set(got) == set(nodes)
    assert max(abs(got[v] - ranks[v]) for v in nodes) < 1e-12


def test_pagerank_rank_mass_decays_with_dangling(spark):
    # the fixture graph has dangling nodes (no out-edges): with the
    # documented no-redistribution variant total rank must stay below 1
    # but above the pure-teleport floor
    edges = fixture_citations(spark).selectExpr("`from` as src", "`to` as dst")
    total = sum(r["rank"] for r in pagerank(edges, iterations=10).collect())
    assert 0.15 < total < 1.0


def _peel(und, k):
    edges = set(und)
    while True:
        deg = collections.Counter()
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        nxt = {(a, b) for a, b in edges if deg[a] >= k and deg[b] >= k}
        if nxt == edges:
            return deg
        edges = nxt


def test_kcore_matches_bruteforce_peel(spark):
    from citegraph_spark.operators.graph import k_core

    raw = _raw_edges(spark)
    und = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    pairs = canonical_pairs(fixture_citations(spark), "from", "to")
    for k in (2, 3):
        expected = dict(_peel(und, k))
        got = {r["node"]: r["core_deg"] for r in k_core(pairs, k=k).collect()}
        assert got == expected, f"k={k}"


def test_kcore_empty_when_k_exceeds_max_degree(spark):
    from citegraph_spark.operators.graph import k_core

    pairs = canonical_pairs(fixture_citations(spark), "from", "to")
    assert k_core(pairs, k=10_000).count() == 0


def test_label_propagation_separates_cliques(spark):
    from citegraph_spark.operators.graph import label_propagation

    # two 4-cliques bridged by a single edge (4-7)
    cliques = [(a, b) for grp in ([1, 2, 3, 4], [10, 11, 12, 7])
               for a, b in itertools.combinations(grp, 2)]
    edges = spark.createDataFrame(cliques + [(4, 7)], "src int, dst int")
    got = {r["node"]: r["community"] for r in label_propagation(edges).collect()}
    assert set(got) == {1, 2, 3, 4, 7, 10, 11, 12}
    # each clique collapses to one community; the bridge does not merge them
    left = {got[n] for n in (1, 2, 3, 4)}
    right = {got[n] for n in (7, 10, 11, 12)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_label_propagation_deterministic_under_repartition(spark):
    from citegraph_spark.operators.graph import label_propagation

    from citegraph_spark.plans.entry_queries import _citations

    e = _citations(spark, "/root/testdata/sf0.001").limit(400).select(
        F.col("from").alias("src"), F.col("to").alias("dst")
    )
    a = {(r["node"], r["community"]) for r in label_propagation(e, max_iter=3).collect()}
    b = {
        (r["node"], r["community"])
        for r in label_propagation(e.repartition(7), max_iter=3).collect()
    }
    assert a == b


def test_personalized_pagerank_localizes_to_seeds(spark):
    # chain 1->2->3 and isolated pair 10->11: seeding at 1 must leave
    # the disconnected component with zero rank
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src int, dst int"
    )
    r = {row["node"]: row["rank"] for row in pagerank(edges, iterations=8, seeds=[1]).collect()}
    assert r[10] == 0.0 and r[11] == 0.0
    assert r[1] > r[2] > r[3] > 0
    # decayed-dangling variant: total mass stays within (0, 1]
    assert 0 < sum(r.values()) <= 1.0 + 1e-9


def _tarjan(edges):
    import sys

    sys.setrecursionlimit(100000)
    adj = collections.defaultdict(list)
    nodes = set()
    for a, b in edges:
        adj[a].append(b)
        nodes.update((a, b))
    index, low, on, st, out = {}, {}, set(), [], []
    counter = [0]

    def strong(v):
        index[v] = low[v] = counter[0]
        counter[0] += 1
        st.append(v)
        on.add(v)
        for w in adj[v]:
            if w not in index:
                strong(w)
                low[v] = min(low[v], low[w])
            elif w in on:
                low[v] = min(low[v], index[w])
        if low[v] == index[v]:
            comp = []
            while True:
                w = st.pop()
                on.discard(w)
                comp.append(w)
                if w == v:
                    break
            out.append(frozenset(comp))

    for v in sorted(nodes):
        if v not in index:
            strong(v)
    return set(out)


def test_scc_on_crafted_graph(spark):
    from citegraph_spark.operators.graph import strongly_connected_components

    # cycle {1,2,3} -> cycle {4,5} -> singleton 6; back-edge free across
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 4), (5, 6)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = collections.defaultdict(set)
    for r in strongly_connected_components(df).collect():
        got[r["scc"]].add(r["node"])
    assert set(map(frozenset, got.values())) == {
        frozenset({1, 2, 3}),
        frozenset({4, 5}),
        frozenset({6}),
    }


def test_scc_matches_tarjan_on_random_graph(spark):
    import random

    from citegraph_spark.operators.graph import strongly_connected_components

    rng = random.Random(7)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(80)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = collections.defaultdict(set)
    for r in strongly_connected_components(df).collect():
        got[r["scc"]].add(r["node"])
    assert set(map(frozenset, got.values())) == _tarjan(edges)


def test_scc_emits_trimmed_nodes_as_singletons(spark):
    from citegraph_spark.operators.graph import strongly_connected_components

    # star 3->1, 3->2: the fixed peel bug — 1 and 2 must appear
    df = spark.createDataFrame([(3, 1), (3, 2)], "src int, dst int")
    got = {(r["node"], r["scc"]) for r in strongly_connected_components(df).collect()}
    assert got == {(1, 1), (2, 2), (3, 3)}


def test_scc_cycle_hanging_off_dag(spark):
    from citegraph_spark.operators.graph import strongly_connected_components

    edges = [(10, 1), (1, 2), (2, 3), (3, 1), (3, 20)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = collections.defaultdict(set)
    for r in strongly_connected_components(df).collect():
        got[r["scc"]].add(r["node"])
    assert set(map(frozenset, got.values())) == {
        frozenset({1, 2, 3}),
        frozenset({10}),
        frozenset({20}),
    }


def test_local_clustering_matches_bruteforce(spark):
    from citegraph_spark.operators.graph import local_clustering

    raw = _raw_edges(spark)
    by_src = collections.defaultdict(set)
    for a, b in raw:
        by_src[a].add(b)
    und = {
        (x, y)
        for nbrs in by_src.values()
        for x, y in itertools.combinations(sorted(nbrs), 2)
    }
    adj = collections.defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    expected = {}
    for v, nbrs in adj.items():
        d = len(nbrs)
        if d < 2:
            continue
        t = sum(
            1
            for x, y in itertools.combinations(sorted(nbrs), 2)
            if (min(x, y), max(x, y)) in und
        )
        expected[v] = (d, 2.0 * t / (d * (d - 1)))

    out = local_clustering(
        co_citation(fixture_citations(spark)), top_k=10**6
    ).collect()
    got = {r["node"]: (r["degree"], r["cc"]) for r in out}
    assert set(got) == set(expected)
    for v, (d, cc) in expected.items():
        assert got[v][0] == d, f"degree mismatch at {v}"
        assert abs(got[v][1] - cc) <= 5e-7, f"cc mismatch at {v}"
    # returned order is (cc desc, node asc)
    keys = [(-r["cc"], r["node"]) for r in out]
    assert keys == sorted(keys)


def test_local_clustering_hand_graph(spark):
    from citegraph_spark.operators.graph import local_clustering

    # triangle 1-2-3 plus pendant 3-4: cc(1)=cc(2)=1, cc(3)=1/3,
    # node 4 has degree 1 -> excluded
    und = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "a int, b int"
    )
    got = {
        r["node"]: (r["degree"], r["cc"])
        for r in local_clustering(und).collect()
    }
    assert got == {1: (2, 1.0), 2: (2, 1.0), 3: (3, round(1 / 3, 6))}
