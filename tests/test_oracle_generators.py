"""The round-4 SQL replay oracles are code too — these tests pin the
generators against pure-Python references on randomized inputs, so a
future edit to the SQL can't silently drift from the algorithm it
claims to replay. (The oracle gate only exercises them on the fixed
test corpus; these cover the input space.) No SparkSession needed —
DuckDB vs Python only."""

from __future__ import annotations

import random
from collections import defaultdict

import duckdb

from citegraph_spark.plans.bpe_oracle_sql import bpe_oracle_sql


def _py_bpe(words: list[str], n_merges: int) -> list[tuple[int, str, str, int]]:
    """Reference BPE: weighted vocab, (count desc, left, right) argmax,
    greedy left-to-right fold — mirrors functions/text.py bpe_train."""
    vocab: dict[str, int] = defaultdict(int)
    for w in words:
        vocab[w] += 1
    syms = {w: [c for c in w] for w in vocab}
    out = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = defaultdict(int)
        for w, s in syms.items():
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += vocab[w]
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((step, a, b, c))
        for w, s in syms.items():
            acc: list[str] = []
            for x in s:
                if acc and acc[-1] == a and x == b:
                    acc[-1] = a + b
                else:
                    acc.append(x)
            syms[w] = acc
    return out


def test_bpe_sql_matches_python_reference_on_random_corpora():
    for seed in (1, 7, 2026):
        rng = random.Random(seed)
        alphabet = "abc"  # small alphabet forces deep, overlapping merges
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 9)))
            for _ in range(rng.randrange(30, 80))
        ]
        want = _py_bpe(words, n_merges=8)

        con = duckdb.connect()
        values = ", ".join(f"('{w}')" for w in words)
        # each word is one "document": the oracle's vocab CTE tokenizes
        # on non-alphanumerics, so single-token docs reproduce `words`
        con.execute(f"CREATE VIEW documents AS SELECT * FROM (VALUES {values}) v(text)")
        got = [tuple(r) for r in con.execute(bpe_oracle_sql(8)).fetchall()]
        assert got == want, seed


def _py_betweenness_k2(pairs: list[tuple[int, int]], mod: int) -> dict[int, float]:
    """Closed-form k=2 Brandes: bc(v) = sum over sources s (s % mod == 0)
    and level-2 nodes w adjacent to level-1 v of 1/sigma(w)."""
    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    bc: dict[int, float] = defaultdict(float)
    for s in adj:
        if s % mod != 0:
            continue
        lvl1 = adj[s]
        sigma2: dict[int, int] = defaultdict(int)
        for v in lvl1:
            for w in adj[v]:
                if w != s and w not in lvl1:
                    sigma2[w] += 1
        for v in lvl1:
            for w in adj[v]:
                if w in sigma2:
                    bc[v] += 1.0 / sigma2[w]
    return {v: round(x, 6) for v, x in bc.items() if round(x, 6) > 0}


def test_betweenness_k2_sql_matches_python_reference():
    from citegraph_spark.plans.entry_queries import ORACLES

    sql = ORACLES["graph_betweenness_sampled"]
    for seed in (5, 13):
        rng = random.Random(seed)
        # ids as multiples of 1997 with probability ~1/4 so several
        # sources exist in a small graph
        ids = [rng.randrange(1, 50) * (1997 if rng.random() < 0.25 else 1)
               for _ in range(40)]
        pairs = [
            (rng.choice(ids), rng.choice(ids)) for _ in range(120)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        want = _py_betweenness_k2(pairs, mod=1997)

        con = duckdb.connect()
        values = ", ".join(f"({a}, {b})" for a, b in pairs)
        con.execute(
            "CREATE VIEW lineitem AS "
            f"SELECT f AS l_orderkey, t AS l_partkey FROM (VALUES {values}) v(f, t)"
        )
        got = {int(n): float(b) for n, b in con.execute(sql).fetchall()}
        assert got == want, seed


def _py_scc_size_distribution(pairs: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Reference (scc_size, n_sccs) via iterative Tarjan over the
    de-duplicated directed edge set — same contract as graph_scc."""
    adj: dict[int, list[int]] = defaultdict(list)
    nodes: set[int] = set()
    for a, b in set(pairs):
        adj[a].append(b)
        nodes.update((a, b))
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on: set[int] = set()
    st: list[int] = []
    sizes: list[int] = []
    counter = 0
    for root in sorted(nodes):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                st.append(v)
                on.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                n = 0
                while True:
                    w = st.pop()
                    on.discard(w)
                    n += 1
                    if w == v:
                        break
                sizes.append(n)
    dist: dict[int, int] = defaultdict(int)
    for s in sizes:
        dist[s] += 1
    return sorted(dist.items())


def test_scc_sql_matches_tarjan_on_random_digraphs():
    """The graph_scc oracle trims to the src-and-dst core before the
    transitive closure; these random digraphs (dense enough for several
    non-trivial SCCs, plus self-loops and pure-source/pure-sink fringe)
    pin that trim + closure + min-label pipeline against Tarjan."""
    from citegraph_spark.plans.entry_queries import ORACLES

    sql = ORACLES["graph_scc"]
    for seed in (3, 11, 404):
        rng = random.Random(seed)
        n = rng.randrange(15, 40)
        pairs = [
            (rng.randrange(1, n), rng.randrange(1, n))
            for _ in range(rng.randrange(n, 4 * n))
        ]
        # acyclic fringe: sources/sinks outside the core id range
        pairs += [(rng.randrange(100, 120), rng.randrange(1, n))
                  for _ in range(5)]
        pairs += [(rng.randrange(1, n), rng.randrange(200, 220))
                  for _ in range(5)]
        want = _py_scc_size_distribution(pairs)

        con = duckdb.connect()
        values = ", ".join(f"({a}, {b})" for a, b in pairs)
        con.execute(
            "CREATE VIEW lineitem AS "
            f"SELECT f AS l_orderkey, t AS l_partkey FROM (VALUES {values}) v(f, t)"
        )
        got = [(int(a), int(b)) for a, b in con.execute(sql).fetchall()]
        assert got == want, seed
