"""HITS hubs/authorities and Adamic-Adar link prediction — validated
against brute-force references on the fixture graph (FIXTURES.md §1)."""

from __future__ import annotations

import collections
import math

from citegraph_spark.fixtures import fixture_citations
from citegraph_spark.operators.graph import canonical_pairs, hits, link_prediction


def _raw_edges(spark):
    return [(r["from"], r["to"]) for r in fixture_citations(spark).collect()]


def _brute_hits(edges, iterations):
    nodes = {n for e in edges for n in e}
    h = {n: 1.0 for n in nodes}
    a = {n: 1.0 for n in nodes}
    for _ in range(iterations):
        # simultaneous (Jacobi) update, matching the operator's contract
        na = {n: 0.0 for n in nodes}
        nh = {n: 0.0 for n in nodes}
        for u, v in edges:
            na[v] += h[u]
            nh[u] += a[v]
        h, a = nh, na
    return h, a


def test_hits_matches_bruteforce_iteration(spark):
    raw = _raw_edges(spark)
    h_exp, a_exp = _brute_hits(raw, 5)
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(fixture_citations(spark).selectExpr("`from` as src", "`to` as dst"), iterations=5).collect()}
    assert set(got) == set(h_exp)
    for n in h_exp:
        assert abs(got[n][0] - h_exp[n]) < 1e-9 * max(1.0, h_exp[n]), (n, "hub")
        assert abs(got[n][1] - a_exp[n]) < 1e-9 * max(1.0, a_exp[n]), (n, "auth")


def test_hits_authorities_track_indegree_on_star(spark):
    # star: 1..5 all cite 99 -> 99 is the unique authority, all others
    # equal hubs with zero authority
    edges = spark.createDataFrame(
        [(i, 99) for i in range(1, 6)], "src int, dst int"
    )
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(edges, iterations=3).collect()}
    assert got[99][1] > 0 and got[99][0] == 0.0
    hubs = {got[i][0] for i in range(1, 6)}
    assert len(hubs) == 1 and hubs.pop() > 0
    assert all(got[i][1] == 0.0 for i in range(1, 6))


def _brute_adamic_adar(und):
    nbrs = collections.defaultdict(set)
    for x, y in und:
        nbrs[x].add(y)
        nbrs[y].add(x)
    scores = {}
    nodes = sorted(nbrs)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1 :]:
            if v in nbrs[u]:
                continue
            common = nbrs[u] & nbrs[v]
            common = {z for z in common if len(nbrs[z]) >= 2}
            if common:
                scores[(u, v)] = (
                    len(common),
                    round(sum(1.0 / math.log(len(nbrs[z])) for z in common), 6),
                )
    return scores


def test_link_prediction_matches_bruteforce(spark):
    raw = _raw_edges(spark)
    und = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    expected = _brute_adamic_adar(und)

    got = {
        (r["a"], r["b"]): (r["cn"], r["adamic_adar"])
        for r in link_prediction(
            canonical_pairs(fixture_citations(spark), "from", "to"), top_k=1000
        ).collect()
    }
    assert got == expected


def test_link_prediction_excludes_existing_edges(spark):
    und = canonical_pairs(fixture_citations(spark), "from", "to")
    existing = {(r["a"], r["b"]) for r in und.collect()}
    predicted = {
        (r["a"], r["b"]) for r in link_prediction(und, top_k=1000).collect()
    }
    assert not (predicted & existing)


def test_sssp_matches_dijkstra_bruteforce(spark):
    import heapq

    from citegraph_spark.operators.graph import sssp_bounded

    raw = _raw_edges(spark)
    edges_w = [(u, v, float(1 + v % 3)) for u, v in raw]
    src = min(u for u, _ in raw)

    # Dijkstra gives true shortest distances; with rounds >= |V| the
    # bounded Bellman-Ford must agree exactly.
    adj = collections.defaultdict(list)
    for u, v, w in edges_w:
        adj[u].append((v, w))
    dist = {src: 0.0}
    pq = [(0.0, src)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj[u]:
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))

    df = spark.createDataFrame(edges_w, "src long, dst long, w double")
    got = {r["node"]: r["dist"] for r in sssp_bounded(df, src, rounds=20).collect()}
    assert got == dist


def test_sssp_unreachable_nodes_absent(spark):
    from citegraph_spark.operators.graph import sssp_bounded

    # 1->2, isolated pair 3->4: from source 1 only {1, 2} are reachable
    df = spark.createDataFrame(
        [(1, 2, 5.0), (3, 4, 1.0)], "src long, dst long, w double"
    )
    got = {r["node"]: r["dist"] for r in sssp_bounded(df, 1, rounds=5).collect()}
    assert got == {1: 0.0, 2: 5.0}
