"""Graph analytics operators (SURVEY.md §2.9 G1-G10), Spark-idiomatic.

The reference implements these with RDD path enumeration and a
driver-collected adjacency map captured in task closures (reference
Analytics.scala:152-414). Here everything is DataFrame ops:

- density (G1): groupBy + window running totals + broadcast-able joins.
- snapshot (G2): double vertex join + year filter + bidirectional union.
- hop-plot (G4-G9): frontier BFS over *pairs* — the frontier carries
  12-byte (src, dst) rows instead of the reference's O(d)-length path
  arrays, the `seen` set is canonical (unordered) pairs, and lineage is
  truncated with cut_lineage (localCheckpoint by default; DFS-backed
  checkpoint behind spark.citegraph.reliableCheckpoint — lineage.py)
  so per-round counts don't recompute
  history (the reference recomputes the full lineage every round —
  SURVEY.md §4.3).

Scale notes (100 TB thinking): the BFS `seen` set is the true output
size — O(connected pairs) — and is unavoidable for exact hop-plots; every
round shuffles only the frontier joined against the (bidirectional) edge
table partitioned on `src`. Edges are repartitioned once on the join key
and persisted so every round's join reuses the same partitioning; with
AQE the frontier side coalesces as it shrinks. For approximate hop-plots
at extreme scale, see `functions.sketches.hyperball` (HyperLogLog-based).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..lineage import cut_lineage


import contextlib


@contextlib.contextmanager
def _aqe_off_for_rounds(spark, active: bool):
    """Turn AQE off around a zero-shuffle broadcast-round loop (r13,
    guide §1.2): with the static side pre-partitioned and the per-round
    state broadcast, a round's plan has NO exchange for AQE to adapt —
    its stage-by-stage materialization and replanning is pure per-job
    latency (~0.1 s/round measured on the pagerank/hits/sssp loops).
    `active=False` (the shuffled fallback) is a no-op: those rounds DO
    shuffle the per-round state and AQE's coalescing is load-bearing
    there. Restores the caller's setting on exit."""
    if not active:
        yield
        return
    before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", before)


# ---------------------------------------------------------------- density


def density(citations: DataFrame, published: DataFrame) -> DataFrame:
    """G1: per-year cumulative node count n(t) and edge count e(t).

    Reference semantics (Analytics.scala:77-142, docs/PA1.pdf p.2):
    - e(t) attributes each edge to the *citing* paper's year (out-degree);
      edges whose `from` id has no published date are dropped (inner join).
    - n(t) counts papers with pub-year <= t.
    - final result is the INNER join of the two running totals on year, so
      a year present in only one side drops out (reference quirk, kept).

    Plan shape: two shuffles (groupBy year on each side), one tiny
    broadcast join, and two single-partition windows over <=#years rows.
    The per-year aggregates are at most a few thousand rows at any scale,
    so the unpartitioned running-total window is safe.
    """
    out_degree = citations.groupBy("from").count()
    edge_years = (
        published.join(out_degree, published["id"] == out_degree["from"], "inner")
        .groupBy("year")
        .agg(F.sum("count").alias("e(t)"))
    )
    node_years = published.groupBy("year").agg(F.count("*").alias("n(t)"))

    w = Window.orderBy("year").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    nodes_running = node_years.select(
        F.col("year").alias("nodeYear"), F.sum("n(t)").over(w).alias("n(t)")
    )
    edges_running = edge_years.select(
        "year", F.sum("e(t)").over(w).alias("e(t)")
    )
    return (
        nodes_running.join(
            F.broadcast(edges_running),
            nodes_running["nodeYear"] == edges_running["year"],
            "inner",
        )
        .select(F.col("year"), F.col("n(t)"), F.col("e(t)"))
        .orderBy("year")
    )


# ------------------------------------------------------------- snapshots


def snapshot_edges(citations: DataFrame, published: DataFrame, year: int) -> DataFrame:
    """G2: undirected edge set of the graph "as of `year`" — directed edges
    whose BOTH endpoints have pub-year <= year (inner joins drop phantom
    endpoints), expanded to both orientations.

    The vertex table is broadcast: node-attribute tables are tiny relative
    to edges (37 k nodes vs 350 k+ edges in the reference's dataset; the
    same ratio holds at 100 TB edge scale), so both attribute joins are
    map-side with zero shuffle of the edge table.
    """
    pf = published.select(
        F.col("id").alias("_fid"), F.col("year").alias("fromYear")
    )
    pt = published.select(F.col("id").alias("_tid"), F.col("year").alias("toYear"))
    directed = (
        citations.join(F.broadcast(pf), citations["from"] == pf["_fid"], "inner")
        .join(F.broadcast(pt), citations["to"] == pt["_tid"], "inner")
        .filter((F.col("fromYear") <= year) & (F.col("toYear") <= year))
        .select("from", "to")
    )
    return bidirectional(directed)


def bidirectional(edges: DataFrame, dedup: bool = True) -> DataFrame:
    """P8: each directed edge expanded to both orientations → (src, dst).

    `dedup=False` skips the distinct (a full shuffle of 2×|E| rows) for
    consumers whose semantics are duplicate-insensitive — HyperBall's
    register max-union is idempotent, so duplicate edges only re-send an
    identical message. Counting/enumeration consumers need the default."""
    fwd = edges.select(F.col("from").alias("src"), F.col("to").alias("dst"))
    rev = edges.select(F.col("to").alias("src"), F.col("from").alias("dst"))
    out = fwd.unionByName(rev).filter(F.col("src") != F.col("dst"))
    return out.distinct() if dedup else out


def canonical_pairs(df: DataFrame, a: str = "src", b: str = "dst") -> DataFrame:
    """G4: unordered pair canonicalization — (least, greatest), deduped."""
    return (
        df.select(
            F.least(F.col(a), F.col(b)).alias("a"),
            F.greatest(F.col(a), F.col(b)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def adjacency(edges: DataFrame) -> DataFrame:
    """G3: node → sorted neighbor array. The reference collects this map to
    the driver and ships it in every task closure (Analytics.scala:171);
    we keep it distributed — it is only ever needed as a join side."""
    return edges.groupBy(F.col("src").alias("id")).agg(
        F.array_sort(F.collect_set("dst")).alias("neighbors")
    )


# ------------------------------------------------------------ BFS hop-plot


@dataclass
class HopPlotRow:
    d: int
    pairs: int
    percent: float


def _local_pairs_by_distance(
    edge_list: list[tuple], max_d: int
) -> list[tuple[int, int]]:
    """Exact all-pairs BFS on a driver-local edge list (both orientations
    present, as produced by `bidirectional`). Returns the same
    [(d, cumulative pairs)] contract as the distributed path."""
    from collections import defaultdict, deque

    adj: dict = defaultdict(set)
    for s, t in edge_list:
        if s != t:
            adj[s].add(t)
    per_d: dict = defaultdict(int)
    for s in adj:
        dist = {s: 0}
        dq = deque([s])
        while dq:
            u = dq.popleft()
            if dist[u] >= max_d:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        for t, d in dist.items():
            if t > s:  # each unordered pair counted once
                per_d[d] += 1
    counts: list[tuple[int, int]] = []
    acc = 0
    for d in sorted(per_d):
        acc += per_d[d]
        counts.append((d, acc))
    return counts


def connected_pairs_by_distance(
    edges: DataFrame,
    max_d: int = 20,
    checkpoint_every: int = 3,
    local_threshold: int = 2000,
) -> list[tuple[int, int]]:
    """Frontier BFS over pairs: returns [(d, cumulative #unordered connected
    pairs with shortest distance <= d)] until convergence or max_d.

    Invariant per round: `frontier` holds DIRECTED pairs at shortest
    distance exactly d (both orientations — needed so the next hop can
    extend from either end); `seen` holds CANONICAL pairs at distance <= d.
    A distance-(d+1) pair is always a distance-d pair extended by one edge,
    so candidates = frontier ⋈ edges, anti-joined against seen.

    Graphs at or below `local_threshold` edges take a driver-local exact
    BFS instead: the distributed loop costs ~8 Spark jobs per round
    (frontier join, fused dedup shuffle, checkpoint materializations) —
    pure fixed overhead when the whole graph fits in one pair of driver
    lists. Same cutover reasoning as broadcast-vs-shuffle join: below the
    threshold the data movement IS the cost. The fixture graphs (tens of
    edges) go from ~10 s to milliseconds; any real corpus is far above
    the threshold and unaffected.
    """
    spark = edges.sparkSession
    n_edges = edges.limit(local_threshold + 1).count()
    if n_edges <= local_threshold:
        rows = edges.collect()
        return _local_pairs_by_distance([(r[0], r[1]) for r in rows], max_d)
    edges = edges.repartition("src").persist(StorageLevel.MEMORY_AND_DISK)

    d1 = canonical_pairs(edges).persist(StorageLevel.MEMORY_AND_DISK)
    seen = d1
    frontier = d1.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        d1.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).persist(StorageLevel.MEMORY_AND_DISK)

    counts: list[tuple[int, int]] = []
    total = d1.count()
    if total == 0:
        edges.unpersist()
        return counts
    counts.append((1, total))

    # unpersist of a round's structures must wait until the NEXT round's
    # count has materialized `next_seen`/`next_frontier` (they read the
    # previous round's persisted blocks; releasing earlier forces a full
    # recompute of the round)
    pending_release: list[DataFrame] = []
    for d in range(2, max_d + 1):
        if d == 2:
            # Wedge-centered candidates for the first extension round
            # (r13 optimization, guide §2.3 — shuffle fewer bytes): at
            # d=2 the frontier IS the (symmetric, distinct) edge set, so
            # a distance-2 candidate is exactly an unordered pair of
            # distinct neighbors of a common center. The generic
            # frontier-extension join below emits every such pair TWICE
            # (once per traversal direction: (a,b)⋈(b,c) and
            # (c,b)⋈(b,a) both canonicalize to {a,c}); the self-join on
            # the center with a strict dst< dst order emits each pair
            # ONCE — half the candidate rows into the fused dedup
            # shuffle (measured 25.2M -> 12.6M at sf0.1, identical
            # result set). Both join sides are the src-partitioned
            # persisted edge cache, so the join itself adds NO exchange.
            e2 = edges.select(
                F.col("src").alias("c_src"), F.col("dst").alias("c_dst")
            )
            cand = edges.join(
                e2,
                (edges["src"] == e2["c_src"]) & (edges["dst"] < e2["c_dst"]),
            ).select(F.col("dst").alias("a"), F.col("c_dst").alias("b"))
        else:
            fr = frontier.select(
                F.col("src").alias("f_src"), F.col("dst").alias("f_dst")
            )
            cand = (
                fr.join(edges, fr["f_dst"] == edges["src"], "inner")
                .select(
                    F.least("f_src", "dst").alias("a"),
                    F.greatest("f_src", "dst").alias("b"),
                )
                .filter(F.col("a") != F.col("b"))
            )
        # dedup + seen-subtraction fused into ONE shuffle: tag candidates 0
        # and seen pairs 1, group once, keep groups with no seen member —
        # equivalent to distinct() followed by a left_anti join but a full
        # shuffle pass cheaper on the (large) candidate set
        new_pairs = (
            cand.select("a", "b", F.lit(0).alias("_seen"))
            .unionByName(seen.select("a", "b", F.lit(1).alias("_seen")))
            .groupBy("a", "b")
            .agg(F.max("_seen").alias("_seen"))
            .filter(F.col("_seen") == 0)
            .select("a", "b")
        )
        if d < max_d:
            # persisted because the next round unions it into `seen`; at the
            # final round the count below is the only consumer — skipping the
            # persist avoids serializing the full pair set once more
            new_pairs = new_pairs.persist(StorageLevel.MEMORY_AND_DISK)
        n_new = new_pairs.count()
        for df in pending_release:
            df.unpersist()
        pending_release = []
        if n_new == 0:
            new_pairs.unpersist()
            break

        next_seen = seen.unionByName(new_pairs)
        next_frontier = new_pairs.select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        ).unionByName(new_pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))

        if d % checkpoint_every == 0:
            # truncate lineage: each round unions onto the last, and without
            # this the d-th count recomputes all prior rounds (the
            # reference's unbounded-lineage flaw, SURVEY.md §4.3)
            next_seen = next_seen.transform(cut_lineage)
            next_frontier = next_frontier.transform(cut_lineage)
        else:
            next_seen = next_seen.persist(StorageLevel.MEMORY_AND_DISK)
            next_frontier = next_frontier.persist(StorageLevel.MEMORY_AND_DISK)

        pending_release = [seen, frontier, new_pairs]
        seen, frontier = next_seen, next_frontier
        counts.append((d, counts[-1][1] + n_new))

    for df in [edges, seen, frontier, d1, *pending_release]:
        df.unpersist()
    return counts


def hop_plot(
    edges: DataFrame,
    total_pairs: int | None = None,
    max_d: int = 20,
    strict_stop: bool = True,
) -> list[HopPlotRow]:
    """G8/G9: per-distance hop-plot rows (d, g(d), percent_of_total).

    `total_pairs`: the denominator. The reference reads it precomputed from
    nodepairs.csv (Application.scala:26-32); when absent we use the spec's
    own definition — connected pairs at d=20 (docs/PA1.pdf p.3) — by
    running the BFS to convergence first.

    `strict_stop=True` reproduces the reference's emission rule
    (Analytics.scala:176-214): d=1 and d=2 always recorded; d>=3 recorded
    only while the previous row's percent <= 0.90, new pairs keep
    appearing, and d <= 20.
    """
    counts = connected_pairs_by_distance(edges, max_d=max_d)
    if not counts:
        return []
    if total_pairs is None:
        total_pairs = counts[-1][1]

    rows = [HopPlotRow(d, g, g * 1.0 / total_pairs) for d, g in counts]
    return _apply_strict_stop(rows) if strict_stop else rows


def _apply_strict_stop(rows: list[HopPlotRow]) -> list[HopPlotRow]:
    """The reference's emission rule (Analytics.scala:176-214): d=1,2
    always; d>=3 only while the previous row's percent <= 0.90."""
    out: list[HopPlotRow] = []
    for row in rows:
        if row.d <= 2:
            out.append(row)
        elif out and out[-1].percent <= 0.90:
            out.append(row)
        else:
            break
        if row.d >= 2 and row.percent > 0.90:
            break
    return out


def effective_diameter(rows: list[HopPlotRow]) -> float | None:
    """G10: d* = d + (0.9 - g(d))/(g(d+1) - g(d)) at the 0.9 crossing
    (docs/PA1.pdf p.3 §3; the reference leaves this to post-processing)."""
    for lo, hi in zip(rows, rows[1:]):
        if lo.percent <= 0.9 < hi.percent:
            return lo.d + (0.9 - lo.percent) / (hi.percent - lo.percent)
    if rows and rows[0].percent > 0.9:
        return float(rows[0].d)
    return None


def hop_plot_df(
    spark,
    edges: DataFrame,
    total_pairs: int | None = None,
    max_d: int = 20,
    strict_stop: bool = True,
) -> DataFrame:
    """Hop-plot as a DataFrame with the reference's output schema
    (d, `g(d)`, percent_of_total) — S7 local-collection source."""
    from .. import schemas

    rows = hop_plot(edges, total_pairs=total_pairs, max_d=max_d, strict_stop=strict_stop)
    data = [(r.d, r.pairs, r.percent) for r in rows]
    return spark.createDataFrame(data, schema=schemas.HOP_PLOT)


def approx_hop_plot_df(
    spark,
    edges: DataFrame,
    total_pairs: int | None = None,
    max_d: int = 20,
    p: int = 6,
    strict_stop: bool = True,
) -> DataFrame:
    """Hop-plot in the reference's output schema, estimated by HyperBall
    (functions/sketches.py) instead of the exact pair BFS — O(|V|·2^p)
    state instead of O(connected pairs), the path that still runs when
    the pair set no longer fits anywhere (100 TB graphs). Estimates carry
    ~1 % relative error at p=6 on sf0.1 (asserted in tests)."""
    from .. import schemas
    from ..functions.sketches import hyperball_hopplot

    counts = hyperball_hopplot(edges, p=p, max_d=max_d)
    if not counts:
        return spark.createDataFrame([], schema=schemas.HOP_PLOT)
    total = float(total_pairs) if total_pairs is not None else counts[-1][1]
    rows = [
        HopPlotRow(d, int(round(g)), g / total if total else 0.0)
        for d, g in counts
    ]
    if strict_stop:
        rows = _apply_strict_stop(rows)
    return spark.createDataFrame(
        [(r.d, r.pairs, r.percent) for r in rows], schema=schemas.HOP_PLOT
    )


def connected_components(
    edges: DataFrame,
    max_iter: int = 25,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Connected components by hash-min label propagation: every node
    starts labeled with its own id; each round a node takes the min of
    its label and its neighbors' labels; converged when no label changes.
    Output: (node, component) where component = min node id reachable.

    Rounds needed ~ component diameter — for high-diameter graphs use
    connected_components_star (large/small-star, O(log) rounds) below;
    per round: one equi join
    (messages) + one min-aggregate with map-side combine, lineage
    truncated via localCheckpoint. All DataFrame ops — no RDDs.
    """
    n_shuffle = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    fwd = edges.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
    rev = edges.select(F.col("dst").alias("node"), F.col("src").alias("nbr"))
    # static adjacency partitioned once by the per-round join key and
    # cached (persist keeps the hashpartitioning visible — see
    # pagerank); labels hash-build into it so rounds move only the
    # O(nodes) label table + the combined min-aggregate, never the
    # O(edges) adjacency
    adj = (
        fwd.unionByName(rev)
        .distinct()
        .repartition(n_shuffle, "nbr")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    adj.count()  # materialize once

    labels = (
        adj.select("node").distinct().select("node", F.col("node").alias("component"))
    ).persist(StorageLevel.MEMORY_AND_DISK)

    for it in range(1, max_iter + 1):
        msgs = (
            adj.alias("a")
            .join(
                labels.hint("shuffle_hash").alias("l"),
                F.col("a.nbr") == F.col("l.node"),
                "inner",
            )
            .select(F.col("a.node").alias("node"), F.col("l.component").alias("component"))
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        if it % checkpoint_every == 0:
            new_labels = new_labels.transform(cut_lineage)
        else:
            new_labels = new_labels.persist(StorageLevel.MEMORY_AND_DISK)
        n_changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if n_changed == 0:
            break

    adj.unpersist()
    return labels


# --------------------------------------------- centrality / structure ops


def degree_distribution(edges: DataFrame) -> DataFrame:
    """Degree histogram of an undirected graph: (degree, n_nodes).

    `edges` must carry both orientations (`bidirectional`), deduped, so
    `groupBy(src).count()` is the undirected degree. Two hash aggregates,
    both with map-side partial combine; the second operates on |V| rows.
    """
    deg = edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("degree"))
    return (
        deg.groupBy("degree").agg(F.count("*").alias("n_nodes")).orderBy("degree")
    )


def co_citation(edges: DataFrame, src: str = "from", dst: str = "to") -> DataFrame:
    """Co-citation projection: canonical pairs (a < b) of targets cited by
    a common source (Small 1973, "Co-citation in the scientific
    literature" — public bibliometrics construct). One self-equi-join on
    the citing key + distinct.

    Scale: the join fans out quadratically in per-source out-degree, so
    skewed sources dominate; out-degree here is bounded (TPC-H: <= 7
    items/order). For power-law sources, cap or sample per-source
    out-neighbors before the join.
    """
    left = edges.select(F.col(src).alias("s"), F.col(dst).alias("a"))
    right = edges.select(F.col(src).alias("s"), F.col(dst).alias("b"))
    return (
        left.join(right, "s")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def triangle_stats(und_edges: DataFrame) -> DataFrame:
    """Global triangle census of an undirected graph: one row
    (n_edges, n_wedges, n_triangles, clustering_coeff).

    `und_edges`: canonical edges (a < b), distinct.

    Triangles are counted with DEGREE-ORDERED ORIENTATION (each edge
    directed from its lower-(degree, id) endpoint): every triangle then
    has exactly one node with two out-edges, so counting (u->v, u->w,
    v->w) paths counts each triangle once, and per-node out-degree is
    bounded by O(sqrt(|E|)) — the wedge-enumeration join survives
    power-law degree skew that would explode a naive a<b ordering.
    Wedges n_wedges = sum_v C(deg_v, 2); clustering coefficient =
    3 * triangles / wedges.
    """
    deg = (
        und_edges.select(F.col("a").alias("node"))
        .unionByName(und_edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # orient each edge from lower (deg, id) to higher
    e = (
        und_edges.join(deg.alias("da"), F.col("a") == F.col("da.node"))
        .join(deg.alias("db"), F.col("b") == F.col("db.node"))
        .select(
            F.when(
                (F.col("da.deg") < F.col("db.deg"))
                | ((F.col("da.deg") == F.col("db.deg")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
    )
    e = e.transform(cut_lineage)
    wedges = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.u") == F.col("e2.u"))
        .filter(F.col("e1.v") < F.col("e2.v"))
        .select(F.col("e1.v").alias("x"), F.col("e2.v").alias("y"))
    )
    # wedge endpoints are x < y by id and und_edges is canonical (a < b),
    # so closing-edge existence is one equi semi join (an OR over the
    # two orientations would force a nested-loop join)
    tri = wedges.join(
        und_edges,
        (F.col("x") == F.col("a")) & (F.col("y") == F.col("b")),
        "left_semi",
    )
    n_edges = und_edges.count()
    n_tri = tri.count()
    n_wedges = (
        deg.agg(F.sum(F.expr("deg * (deg - 1) / 2")).alias("w")).first()["w"] or 0
    )
    spark = und_edges.sparkSession
    coeff = round(3.0 * n_tri / n_wedges, 6) if n_wedges else 0.0
    return spark.createDataFrame(
        [(int(n_edges), int(n_wedges), int(n_tri), coeff)],
        schema="n_edges bigint, n_wedges bigint, n_triangles bigint, clustering_coeff double",
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 3,
    broadcast_budget_bytes: int = 256 << 20,
    seeds: list[int] | None = None,
) -> DataFrame:
    """PageRank on a DIRECTED edge list (src, dst), fixed iteration count:
    r_{k+1}(v) = (1-d)/N + d * sum_{u->v} r_k(u)/outdeg(u).

    Variant note: dangling-node mass is NOT redistributed (it decays),
    so ranks sum to < 1; the recurrence is otherwise the classic one and
    is exactly expressible in SQL (the DuckDB oracle mirrors it with a
    recursive CTE). Output: (node, rank).

    `seeds`: PERSONALIZED PageRank — the teleport term restricts to the
    seed set ((1-d)/|seeds| at seed nodes, 0 elsewhere) and the initial
    mass is uniform over seeds, so ranks measure proximity to the seeds
    (random walk with restart). Identical round shape and cost; only the
    teleport expression changes.

    Same mechanics as the HyperBall loop (functions/sketches.py),
    mirrored for the src->dst message direction: the edge table is
    augmented once with ZERO-WEIGHT self-loops so every node receives at
    least one message per round (a round is then a pure join +
    groupBy-sum, no left join against the previous ranks), and it is
    pre-partitioned ONCE for whichever join strategy the node count
    selects:

    - rank table under `broadcast_budget_bytes`: partition e_aug by DST
      — with the (16-byte-per-node) rank table BROADCAST into the join,
      the join output already carries the group-by key's partitioning,
      so a whole round runs with ZERO shuffle.
    - past the budget (1e9-node graphs), the join must shuffle — so
      partition e_aug by SRC instead: the per-round rank table comes
      out of its groupBy hash-partitioned on node with the same
      partition count, both join sides already satisfy the join's
      distribution, and the only per-round exchange left is the
      map-side-combined message aggregate (O(distinct dst) per
      partition, not O(edges)). Without this the static 100TB edge
      table would re-shuffle on src EVERY iteration — the round-7 100x
      rehearsal measured that as the dominant cost of the fallback
      (15.6 GB/10 rounds); src-partitioning cut the forced-fallback
      A/B's per-round shuffle by ~2.9x and wall by ~1.5x at 6M edges.

    Round state is localCheckpoint-ed (lineage truncation) with prompt
    Py4J release.
    """
    import gc

    spark = edges.sparkSession
    edges = edges.transform(cut_lineage)
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .transform(cut_lineage)
    )
    n = nodes.count()
    use_broadcast = n * 48 <= broadcast_budget_bytes
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    e_aug = (
        edges.join(outdeg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w"))
        .unionByName(
            nodes.select(
                F.col("node").alias("src"),
                F.col("node").alias("dst"),
                F.lit(0.0).alias("w"),
            )
        )
        .repartition(n_shuffle, "dst" if use_broadcast else "src")
        # persist, NOT localCheckpoint: a PySpark localCheckpoint scans
        # back as ExistingRDD with UnknownPartitioning, so every round
        # would silently re-shuffle the static O(edges) table — the
        # cached InMemoryTableScan keeps hashpartitioning(key, n) visible
        # to EnsureRequirements and the per-round plan starts from the
        # already-partitioned cache (verified in .explain: no Exchange
        # above the InMemoryTableScan in either join mode)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e_aug.count()  # materialize once

    if seeds is None:
        init_rank = F.lit(1.0 / n)
        teleport = F.lit((1.0 - damping) / n)
    else:
        is_seed = F.col("node").isin(*[int(x) for x in seeds])
        init_rank = F.when(is_seed, F.lit(1.0 / len(seeds))).otherwise(F.lit(0.0))
        teleport = F.when(is_seed, F.lit((1.0 - damping) / len(seeds))).otherwise(
            F.lit(0.0)
        )
    ranks = nodes.select("node", init_rank.alias("rank")).transform(cut_lineage)
    with _aqe_off_for_rounds(spark, use_broadcast):
        for it in range(1, iterations + 1):
            # fallback build side: SHUFFLE_HASH, not sort-merge — the rank
            # table is the per-round hash build (its shuffle is O(nodes)),
            # while the src-partitioned edge table streams with neither a
            # re-shuffle nor the per-round SORT a merge join would force on
            # the O(edges) side
            build = (
                F.broadcast(ranks) if use_broadcast else ranks.hint("shuffle_hash")
            )
            nxt = (
                e_aug.join(build, e_aug["src"] == build["node"], "inner")
                .select(
                    e_aug["dst"].alias("node"),
                    (F.col("rank") * F.col("w")).alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("_s"))
                .select(
                    "node", (teleport + F.lit(damping) * F.col("_s")).alias("rank")
                )
            )
            if it % checkpoint_every == 0 or it == iterations:
                nxt = nxt.transform(cut_lineage)
                # release superseded checkpoint blocks promptly — but only
                # at checkpoint rounds: a Python full GC costs ~50 ms, and
                # the intermediate rounds hold no materialized state to
                # release (r13, guide §1.2 — fixed per-round driver costs)
                gc.collect()
            ranks = nxt
    # the final ranks are checkpointed (it == iterations), so they no
    # longer depend on the cached edge table — release it eagerly
    e_aug.unpersist()
    return ranks


def k_core(und_edges: DataFrame, k: int, max_rounds: int = 50) -> DataFrame:
    """k-core of an undirected graph (Seidman 1983, "Network structure and
    minimum degree"): the maximal subgraph where every node has degree
    >= k, found by iterative peeling. Returns (node, core_deg) — each
    surviving node with its degree INSIDE the core.

    `und_edges`: canonical pairs (a < b), distinct.

    Each round is one degree aggregate + two semi joins; the edge set
    only shrinks, so rounds get cheaper. Convergence is detected by a
    stable edge COUNT (the edge set is monotonically decreasing, so
    equal counts imply equal sets). Round state is localCheckpoint-ed:
    without lineage truncation the plan doubles per round and the
    optimizer re-derives every prior peel. Real-world graphs converge in
    a handful of rounds (peel depth, not diameter); a path graph is the
    k=2 worst case, hence the max_rounds backstop.
    """
    edges = und_edges.transform(cut_lineage)
    n_edges = edges.count()
    converged = False
    for _ in range(max_rounds):
        if n_edges == 0:
            converged = True
            break
        deg = (
            edges.select(F.col("a").alias("node"))
            .unionByName(edges.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node")
        nxt = (
            edges.join(
                keep.withColumnRenamed("node", "ka"),
                F.col("a") == F.col("ka"),
                "left_semi",
            )
            .join(
                keep.withColumnRenamed("node", "kb"),
                F.col("b") == F.col("kb"),
                "left_semi",
            )
            .transform(cut_lineage)
        )
        m = nxt.count()
        if m == n_edges:
            converged = True
            break
        edges, n_edges = nxt, m
    if not converged:
        # an unfinished peel still contains sub-k-degree nodes and would
        # read as a valid (larger) core downstream — fail loudly
        # (ADVICE r3 silent-partial-result pattern).
        from ..errors import ConvergenceError

        raise ConvergenceError("k_core", max_rounds)
    return (
        edges.select(F.col("a").alias("node"))
        .unionByName(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("core_deg"))
    )


def label_propagation(
    edges: DataFrame,
    max_iter: int = 5,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation: every node
    starts in its own community; each round a node adopts the most
    frequent label among its neighbors and itself (self-vote damps the
    oscillation synchronous LPA exhibits on bipartite structure), ties
    broken toward the smallest label — fully deterministic. Output:
    (node, community).

    Per round: one equi join (neighbor labels) + one (node, label) count
    aggregate + one argmax-by-struct aggregate. The argmax is
    `max(struct(cnt, -label))` — a regular aggregate with map-side
    combine on the same `node` key as the count's first grouping column,
    NOT a row_number window (a window would force a second full sort
    exchange per round). Lineage is truncated with localCheckpoint.
    Fixed small `max_iter`: LPA quality saturates in a few rounds and
    each extra round is a full join over the edge set.
    """
    n_shuffle = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    fwd = edges.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
    rev = edges.select(F.col("dst").alias("node"), F.col("src").alias("nbr"))
    adj = fwd.unionByName(rev).filter(F.col("node") != F.col("nbr")).distinct()
    # partition the static adjacency by the per-round JOIN key and cache
    # it: with the hashpartitioning visible (persist, not checkpoint —
    # see pagerank) and the label table as a SHUFFLE_HASH build side,
    # each round moves only the O(nodes) labels and the map-side-
    # combined vote aggregate — never the O(edges) adjacency, and never
    # the per-round sort a merge join would force on it
    adj = adj.repartition(n_shuffle, "nbr").persist(StorageLevel.MEMORY_AND_DISK)
    adj.count()  # materialize once

    labels = (
        adj.select("node").distinct().select("node", F.col("node").alias("community"))
    ).persist(StorageLevel.MEMORY_AND_DISK)

    for it in range(1, max_iter + 1):
        msgs = (
            adj.alias("a")
            .join(
                labels.hint("shuffle_hash").alias("l"),
                F.col("a.nbr") == F.col("l.node"),
                "inner",
            )
            .select(F.col("a.node").alias("node"), F.col("l.community").alias("community"))
        )
        votes = msgs.unionByName(labels)
        new_labels = (
            votes.groupBy("node", "community")
            .agg(F.count("*").alias("cnt"))
            .groupBy("node")
            .agg(
                F.max(F.struct(F.col("cnt"), (-F.col("community")).alias("neg"))).alias("top")
            )
            .select("node", (-F.col("top.neg")).alias("community"))
        )
        if it % checkpoint_every == 0:
            new_labels = new_labels.transform(cut_lineage)
        else:
            new_labels = new_labels.persist(StorageLevel.MEMORY_AND_DISK)
        n_changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.community") != F.col("o.community"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if n_changed == 0:
            break

    adj.unpersist()
    return labels


def _tarjan_scc(pairs: list[tuple[int, int]]) -> list[frozenset]:
    """Exact SCC partition of a driver-local directed edge list —
    ITERATIVE Tarjan (explicit stack, no recursion limit). Shared by
    the small-residue fast path of strongly_connected_components and
    by scc_partition_gate's independent reference replay (the gate runs
    the operator with local_threshold=0, so the two sides never share
    an execution path)."""
    from collections import defaultdict

    adj = defaultdict(list)
    nodes: set = set()
    for a, b in pairs:
        adj[a].append(b)
        nodes.update((a, b))
    index: dict = {}
    low: dict = {}
    on: set = set()
    st: list = []
    out: list[frozenset] = []
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
            if low[v] == index[v]:
                comp = []
                while True:
                    w = st.pop()
                    on.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                out.append(frozenset(comp))
            work.pop()
            if work:
                p = work[-1][0]
                low[p] = min(low[p], low[v])
    return out


def strongly_connected_components(
    edges: DataFrame,
    max_rounds: int = 50,
    local_threshold: int = 500_000,
) -> DataFrame:
    """SCC of a DIRECTED graph: TRIM + coloring (parallel FW-BW, Orzan).

    Phase 1 — trim: a node with zero in-degree or zero out-degree cannot
    be on a cycle, so it is a singleton SCC; peel such nodes iteratively
    (each peel: two distincts + two semi joins — a DAG trims to empty in
    topological-depth rounds, so the common near-acyclic citation graph
    never reaches the expensive phase). Peels are NOT lazily batched
    between materializations: each peel references its input 4× (srcs,
    dsts, and the semi-join left side), so a k-deep lazy chain grows the
    logical plan ~4^k and Catalyst planning dominates (measured: an
    8-deep chain never finished planning at sf0.01). One materialized
    peel per round is the stable shape. Phase 2 — coloring on the cyclic
    residue:
    propagate the max node id FORWARD to a fixpoint (color classes),
    then from each root (color(r)=r) propagate a confirmation flag
    BACKWARD restricted to the root's color class; confirmed nodes are
    exactly root's SCC (root→v forward ∧ v→root backward), emitted and
    peeled — every color class peels one SCC per outer round. All nodes
    never emitted by phase 2 (trimmed or edge-orphaned) are singleton
    SCCs, emitted in one final anti-join. Output: (node, scc), scc = the
    component's max node id.

    Once the live residue fits `local_threshold` edges (checked at the
    free count points), it is collected and solved EXACTLY by iterative
    Tarjan on the driver — the standard shrinking-residue endgame: on a
    1000-executor cluster, distributed rounds that peel a handful of
    edges each are pure scheduling overhead, while the residue of a
    trimmed 100 TB citation graph is a few MB. The 500k default matches
    scc_partition_gate's driver-size budget (≈8 MB of edge pairs; Tarjan
    is linear and sub-second there). `local_threshold=0` disables the
    fast path (scc_partition_gate uses that to keep its
    distributed-vs-Tarjan comparison honest). Labels are identical
    either way — the partition is unique and both paths emit max-id.

    Round shape matches connected_components: equi join + max-aggregate,
    localCheckpoint lineage truncation, no RDDs/UDFs. Worst case (one
    long cycle) pays O(cycle length) rounds — the bound any
    label-propagation SCC pays.
    """
    spark = edges.sparkSession
    live = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .transform(cut_lineage)
    )
    all_nodes = (
        edges.select(F.col("src").cast("long").alias("node"))
        .unionByName(edges.select(F.col("dst").cast("long").alias("node")))
        .distinct()
        .transform(cut_lineage)
    )

    def _local_residue(residue: DataFrame) -> DataFrame:
        import pandas as pd

        pairs = [(r["src"], r["dst"]) for r in residue.collect()]
        rows = [
            (int(n), int(max(comp)))
            for comp in _tarjan_scc(pairs)
            for n in comp
        ]
        # Arrow path: createDataFrame on a plain tuple list falls back to
        # row-at-a-time pickling (measured 8.9 s for 19k rows); the same
        # rows through a pandas frame upload as one Arrow batch (<0.5 s).
        pdf = pd.DataFrame(rows, columns=["node", "scc"], dtype="int64")
        return spark.createDataFrame(pdf, "node long, scc long")

    # ---- phase 1: trim acyclic fringe (cannot be on any cycle)
    n_edges = live.count()
    went_local = False
    for _ in range(max_rounds):
        if n_edges == 0:
            break
        if local_threshold and n_edges <= local_threshold:
            went_local = True
            break
        srcs = live.select(F.col("src").alias("node")).distinct()
        dsts = live.select(F.col("dst").alias("node")).distinct()
        core = srcs.intersect(dsts)  # >=1 out-edge AND >=1 in-edge
        nxt = (
            live.join(core.withColumnRenamed("node", "_s"), live["src"] == F.col("_s"), "left_semi")
            .join(core.withColumnRenamed("node", "_d"), live["dst"] == F.col("_d"), "left_semi")
            .transform(cut_lineage)
        )
        n_next = nxt.count()
        live = nxt
        if n_next == n_edges:
            break
        n_edges = n_next

    if went_local:
        labeled = _local_residue(live)
        singletons = all_nodes.join(
            labeled.select("node"), "node", "left_anti"
        ).select("node", F.col("node").alias("scc"))
        return labeled.unionByName(singletons)

    # ---- phase 2: coloring on the cyclic residue
    out_parts: list[DataFrame] = []
    for _ in range(max_rounds):
        nodes = (
            live.select(F.col("src").alias("node"))
            .unionByName(live.select(F.col("dst").alias("node")))
            .distinct()
            .transform(cut_lineage)
        )
        if nodes.isEmpty():
            break
        color = nodes.select("node", F.col("node").alias("color"))
        colored = False
        for _i in range(max_rounds):
            msgs = (
                live.join(color, live["src"] == color["node"], "inner")
                .select(F.col("dst").alias("node"), "color")
            )
            new_color = (
                color.unionByName(msgs)
                .groupBy("node")
                .agg(F.max("color").alias("color"))
                .transform(cut_lineage)
            )
            n_changed = (
                new_color.alias("n")
                .join(color.alias("o"), "node")
                .filter(F.col("n.color") != F.col("o.color"))
                .count()
            )
            color = new_color
            if n_changed == 0:
                colored = True
                break
        if not colored:
            # forward color propagation stopped before its fixpoint:
            # color classes are wrong and every SCC derived from them
            # would be silently wrong (ADVICE r3 pattern).
            from ..errors import ConvergenceError

            raise ConvergenceError(
                "strongly_connected_components (forward coloring)", max_rounds
            )
        confirmed = color.filter(F.col("node") == F.col("color")).select(
            "node", "color"
        )
        backward_done = False
        for _i in range(max_rounds):
            msgs = (
                live.join(confirmed, live["dst"] == confirmed["node"], "inner")
                .select(F.col("src").alias("node"), "color")
            )
            cand = (
                msgs.join(color.withColumnRenamed("color", "_c"), "node")
                .filter(F.col("color") == F.col("_c"))
                .select("node", "color")
            )
            new_confirmed = (
                confirmed.unionByName(cand)
                .groupBy("node")
                .agg(F.max("color").alias("color"))
                .transform(cut_lineage)
            )
            if new_confirmed.count() == confirmed.count():
                confirmed = new_confirmed
                backward_done = True
                break
            confirmed = new_confirmed
        if not backward_done:
            # backward confirmation stopped while still growing: the
            # root's SCC would be under-counted and its stragglers
            # emitted as bogus singletons later.
            from ..errors import ConvergenceError

            raise ConvergenceError(
                "strongly_connected_components (backward confirm)", max_rounds
            )
        out_parts.append(confirmed.select("node", F.col("color").alias("scc")))
        done = confirmed.select("node")
        live = (
            live.join(done.withColumnRenamed("node", "_s"), live["src"] == F.col("_s"), "left_anti")
            .join(done.withColumnRenamed("node", "_d"), live["dst"] == F.col("_d"), "left_anti")
            .transform(cut_lineage)
        )

    # outer peel exhausted with live edges remaining: those nodes would
    # fall through to the singleton emission below and be silently
    # mislabeled — refuse instead.
    if live.limit(1).count() != 0:
        from ..errors import ConvergenceError

        raise ConvergenceError(
            "strongly_connected_components (outer peel)", max_rounds
        )

    # ---- nodes never emitted (trimmed / orphaned) are singleton SCCs
    cyclic = out_parts[0] if out_parts else None
    for p in out_parts[1:]:
        cyclic = cyclic.unionByName(p)
    if cyclic is None:
        return all_nodes.select("node", F.col("node").alias("scc"))
    singletons = all_nodes.join(cyclic.select("node"), "node", "left_anti").select(
        "node", F.col("node").alias("scc")
    )
    return cyclic.unionByName(singletons)


def hits(
    edges: DataFrame,
    iterations: int = 10,
    checkpoint_every: int = 3,
    broadcast_budget_bytes: int = 256 << 20,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999, "Authoritative sources in
    a hyperlinked environment") on a DIRECTED edge list (src, dst) —
    the citation-network centrality pair: a good authority is cited by
    good hubs; a good hub cites good authorities.

    Simultaneous (Jacobi) update, `iterations` fixed rounds:
        a_{k+1}(v) = sum_{u->v} h_k(u)
        h_{k+1}(u) = sum_{u->v} a_k(v)
    This variant updates both vectors from the PREVIOUS round (the
    classic Gauss-Seidel order computes h from the new a; Jacobi
    converges to the same principal vectors at half the rate) because it
    makes every round ONE message join instead of two: each directed
    edge u->v is pre-expanded into a forward message (to=v carries h(u))
    and a reverse message (to=u carries a(v)), unioned with zero-weight
    self-messages so every node survives the groupBy. The message table
    is built once, partitioned for the selected join mode, and CACHED
    (persist — see `pagerank` for why a checkpoint would lose the
    partitioning); with the per-node state broadcast (24 bytes/node
    within `broadcast_budget_bytes`), a round is join + groupBy-sum with
    ZERO shuffle, and past the budget the shuffled-hash fallback moves
    only the state + the combined aggregate, never the messages — the
    same mechanics as `pagerank` above. Scores are left UN-normalized (normalization is a
    scalar that cancels in ranking); callers who need comparable
    magnitudes divide by the max, which keeps the recurrence exactly
    expressible in SQL (the DuckDB oracle replays it with a recursive
    CTE — per-round normalization would need an aggregate over the
    working table, which recursive SQL cannot express).

    Growth bound: 10 unnormalized rounds reach ~(2|E|/|V|)^10-scale
    values — far inside double range for any graph that fits a cluster.
    Output: (node, hub, auth).
    """
    import gc

    spark = edges.sparkSession
    edges = edges.transform(cut_lineage)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .transform(cut_lineage)
    )
    n = nodes.count()
    use_broadcast = n * 24 <= broadcast_budget_bytes
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    # kind 1: forward (h -> authority of dst); kind 2: reverse (a -> hub
    # of src); kind 0: zero self-message (keeps isolated-direction nodes)
    msgs = (
        edges.select(F.col("src").alias("frm"), F.col("dst").alias("to"), F.lit(1).alias("kind"))
        .unionByName(
            edges.select(F.col("dst").alias("frm"), F.col("src").alias("to"), F.lit(2).alias("kind"))
        )
        .unionByName(
            nodes.select(F.col("node").alias("frm"), F.col("node").alias("to"), F.lit(0).alias("kind"))
        )
        # partition for the selected join mode and PERSIST (a PySpark
        # localCheckpoint would scan back with UnknownPartitioning and
        # silently re-shuffle the static message table every round —
        # see pagerank above): broadcast mode partitions by the agg key
        # `to` (zero-shuffle rounds), fallback by the join key `frm`
        # (the O(edges) side streams into a shuffled-hash join without
        # re-shuffle or sort; only the per-round state + the map-side-
        # combined aggregate move)
        .repartition(n_shuffle, "to" if use_broadcast else "frm")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    msgs.count()  # materialize once

    state = nodes.select("node", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth"))
    with _aqe_off_for_rounds(spark, use_broadcast):
        for it in range(1, iterations + 1):
            build = (
                F.broadcast(state) if use_broadcast else state.hint("shuffle_hash")
            )
            nxt = (
                msgs.join(build, msgs["frm"] == build["node"], "inner")
                .select(
                    F.col("to").alias("node"),
                    F.when(F.col("kind") == 2, F.col("auth"))
                    .otherwise(0.0)
                    .alias("h_c"),
                    F.when(F.col("kind") == 1, F.col("hub"))
                    .otherwise(0.0)
                    .alias("a_c"),
                )
                .groupBy("node")
                .agg(F.sum("h_c").alias("hub"), F.sum("a_c").alias("auth"))
            )
            if it % checkpoint_every == 0 or it == iterations:
                nxt = nxt.transform(cut_lineage)
                # GC only at checkpoint rounds (see pagerank)
                gc.collect()
            state = nxt
    # final state is checkpointed — the cached message table can go
    msgs.unpersist()
    return state


def link_prediction(
    und_edges: DataFrame,
    top_k: int = 100,
    max_degree: int = 10_000,
) -> DataFrame:
    """Link prediction over an UNDIRECTED graph (canonical pairs a < b):
    for every non-adjacent node pair with at least one common neighbor,
    the common-neighbor count and the Adamic-Adar score
    sum_z 1/ln(deg(z)) (Adamic & Adar 2003, "Friends and neighbors on
    the web") — the citation-recommendation primitive. Returns the
    global top_k by (adamic_adar, cn, pair) — deterministic total order.

    Plan: degree aggregate → wedge self-join THROUGH the middle node z
    (each unordered neighbor pair of z is a candidate) → canonicalize →
    anti-join existing edges → one (a,b) aggregate → TakeOrdered top-k
    (heap, no global sort). The wedge join is quadratic in the middle
    node's degree, so hubs above `max_degree` are excluded from the
    MIDDLE role (documented sampling cap — at power-law scale a
    1e6-degree hub alone yields 1e12 wedges; dropping hub middles is the
    standard LSH-free mitigation and biases scores only for pairs whose
    sole witnesses are hubs, which Adamic-Adar already down-weights by
    1/ln(deg)).
    """
    # und_edges may hang off an arbitrary (dedup/join) lineage and is
    # scanned 3 more times below (both wedge sides via mid, the anti
    # build) — materialize it once instead of recomputing its exchanges
    # per consumer
    und_edges = und_edges.transform(cut_lineage)
    nbrs = (
        und_edges.select(F.col("a").alias("z"), F.col("b").alias("x"))
        .unionByName(und_edges.select(F.col("b").alias("z"), F.col("a").alias("x")))
    )
    deg = nbrs.groupBy("z").agg(F.count("*").alias("deg"))
    # deg >= 2: a degree-1 middle forms no wedge, and excluding it keeps
    # 1/ln(deg) finite everywhere the expression is evaluated
    n_shuffle = int(
        und_edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    mid = (
        nbrs.join(
            F.broadcast(
                deg.filter((F.col("deg") <= max_degree) & (F.col("deg") >= 2))
            ),
            "z",
        )
        .select("z", "x", "deg")
        # both sides of the wedge self-join read this: compute the
        # degree-join once, not twice. Round-robin repartition first
        # (r13, guide §2.6/§1.2): the checkpointed table otherwise
        # inherits the SCAN's partition count, and the quadratic wedge
        # stage below — the query's dominant stage — ran on 10 tasks on
        # a 32-core session (measured 3.6 s of an 11 s query).
        # Round-robin (not hash-on-z) keeps the stage skew-proof: the
        # self-join broadcasts one side, so each task's wedge work is
        # sum(deg(z)) over ITS rows — spread evenly even for hot
        # middles.
        .repartition(n_shuffle)
        .transform(cut_lineage)
    )
    left = mid.select("z", F.col("x").alias("u"), "deg")
    right = mid.select(F.col("z").alias("z2"), F.col("x").alias("v"))
    wedges = (
        left.join(right, (left["z"] == right["z2"]) & (left["u"] < right["v"]))
        .select(
            F.col("u").alias("a"),
            F.col("v").alias("b"),
            (F.lit(1.0) / F.log(F.col("deg").cast("double"))).alias("aa_w"),
        )
    )
    scores = (
        wedges.join(und_edges, ["a", "b"], "left_anti")
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("cn"),
            F.round(F.sum("aa_w"), 6).alias("adamic_adar"),
        )
    )
    return scores.orderBy(
        F.col("adamic_adar").desc(), F.col("cn").desc(), "a", "b"
    ).limit(top_k)


def sssp_bounded(
    edges_w: DataFrame,
    source: int,
    rounds: int = 15,
    checkpoint_every: int = 3,
    broadcast_budget_bytes: int = 256 << 20,
) -> DataFrame:
    """Weighted single-source shortest distances within `rounds` hops
    (bounded Bellman-Ford): d_{k+1}(v) = min(d_k(v), min_{u->v} d_k(u) +
    w(u,v)), run for a FIXED round count so the result ("shortest
    distance using <= k edges") is exactly replayable in recursive SQL.

    `edges_w`: (src, dst, w), non-negative weights. Same zero-shuffle
    round mechanics as `pagerank`/`hits`: the edge table is augmented
    once with zero-weight self-loops (carrying each node's own distance
    forward, so a round is ONE join + min-aggregate with no union
    against the previous state), partitioned once for the selected join
    mode and cached (see `pagerank`), and the
    distance table — which only ever holds REACHED nodes, a frontier
    that grows like the ball around the source — is broadcast while it
    fits `broadcast_budget_bytes`. Distances are sums of the input
    weights selected by min: no divisions, so integer-valued weights
    stay exact in double and the DuckDB oracle matches bit-for-bit.

    Output: (node, dist) for nodes within `rounds` hops of `source`.
    """
    import gc

    spark = edges_w.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    nodes = (
        edges_w.select(F.col("src").alias("node"))
        .unionByName(edges_w.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    use_broadcast = n * 16 <= broadcast_budget_bytes
    e_aug = (
        edges_w.select("src", "dst", F.col("w").cast("double").alias("w"))
        .unionByName(
            nodes.select(
                F.col("node").alias("src"),
                F.col("node").alias("dst"),
                F.lit(0.0).alias("w"),
            )
        )
        # same persist-not-checkpoint / mode-keyed partitioning as
        # pagerank: agg key (dst) for zero-shuffle broadcast rounds,
        # join key (src) + shuffled-hash build for the fallback
        .repartition(n_shuffle, "dst" if use_broadcast else "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e_aug.count()  # materialize once

    dist = e_aug.sparkSession.createDataFrame(
        [(int(source), 0.0)], "node long, dist double"
    )
    with _aqe_off_for_rounds(spark, use_broadcast):
        for it in range(1, rounds + 1):
            build = (
                F.broadcast(dist) if use_broadcast else dist.hint("shuffle_hash")
            )
            nxt = (
                e_aug.join(build, e_aug["src"] == build["node"], "inner")
                .select(
                    e_aug["dst"].alias("node"),
                    (F.col("dist") + F.col("w")).alias("d"),
                )
                .groupBy("node")
                .agg(F.min("d").alias("dist"))
            )
            if it % checkpoint_every == 0 or it == rounds:
                nxt = nxt.transform(cut_lineage)
                # GC only at checkpoint rounds (see pagerank)
                gc.collect()
            dist = nxt
    e_aug.unpersist()
    return dist


def prepare_bfs_edges(und_edges: DataFrame) -> DataFrame:
    """Build, partition and persist the self-loop-augmented edge table
    `multi_source_bfs` relaxes against (r13: factored out so callers
    that sweep the SAME graph repeatedly — graph_diameter_double_sweep's
    two sweeps — pay the distinct + repartition + materialize cost
    once). Caller owns the returned persist (unpersist when done)."""
    spark = und_edges.sparkSession
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    nodes = (
        und_edges.select(F.col("src").alias("node"))
        .unionByName(und_edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    e_aug = (
        und_edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
            F.lit(1).alias("w"),
        )
        .unionByName(
            nodes.select(
                F.col("node").cast("long").alias("src"),
                F.col("node").cast("long").alias("dst"),
                F.lit(0).alias("w"),
            )
        )
        # persist, not localCheckpoint (UnknownPartitioning — see
        # pagerank): with the dst partitioning visible, the broadcast
        # join preserves it and the (src_id, node=dst) aggregate needs
        # no exchange — rounds are zero-shuffle
        .repartition(n_shuffle, "dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e_aug.count()  # materialize once
    return e_aug


def multi_source_bfs(
    und_edges: DataFrame,
    sources: list[int],
    rounds: int = 6,
    checkpoint_every: int = 3,
    prepared: DataFrame | None = None,
) -> DataFrame:
    """Exact shortest hop-distances from a small set of landmark sources
    within `rounds` hops — the building block for sampled (landmark)
    closeness/eccentricity centrality at scale, where all-pairs BFS is
    infeasible (reference computes pair counts only, Analytics.scala:
    152-229; per-landmark distances are the natural extension).

    `und_edges`: (src, dst) ALREADY undirected (both orientations
    present). State is (src_id, node, dist) — |sources| x reached-ball
    rows, a small multiple of the node count for small landmark sets, so
    the distance table is broadcast into each relaxation round: a round
    is ONE broadcast-hash join + min-aggregate, zero shuffle on the edge
    side. Self-loops carry settled distances forward (same mechanics as
    `sssp_bounded` with w=1 on real edges, w=0 on loops); lineage is cut
    with localCheckpoint. Output: (src_id, node, dist INT).

    `prepared`: a prepare_bfs_edges() result for the same graph — the
    augmented table is then reused as-is (and NOT unpersisted here).
    """
    import gc

    spark = und_edges.sparkSession
    e_aug = prepared if prepared is not None else prepare_bfs_edges(und_edges)

    dist = spark.createDataFrame(
        [(int(s), int(s), 0) for s in sources], "src_id long, node long, dist int"
    )
    with _aqe_off_for_rounds(spark, True):
        for it in range(1, rounds + 1):
            nxt = (
                e_aug.join(F.broadcast(dist), e_aug["src"] == dist["node"], "inner")
                .select(
                    "src_id",
                    e_aug["dst"].alias("node"),
                    (F.col("dist") + F.col("w")).cast("int").alias("d"),
                )
                .groupBy("src_id", "node")
                .agg(F.min("d").alias("dist"))
            )
            if it % checkpoint_every == 0 or it == rounds:
                nxt = nxt.transform(cut_lineage)
                # GC only at checkpoint rounds (see pagerank)
                gc.collect()
            dist = nxt
    if prepared is None:
        e_aug.unpersist()
    return dist


def closeness_from_landmarks(bfs_dist: DataFrame) -> DataFrame:
    """Per-landmark closeness + eccentricity over the reached ball:
    (src_id, reached, total_dist, closeness = reached / total_dist,
    eccentricity = max dist). One tiny aggregate over the
    multi_source_bfs output; harmonic or normalized variants are one
    expression away."""
    return (
        bfs_dist.filter(F.col("dist") > 0)
        .groupBy("src_id")
        .agg(
            F.count("*").alias("reached"),
            F.sum("dist").cast("bigint").alias("total_dist"),
            F.max("dist").cast("int").alias("eccentricity"),
        )
        .select(
            "src_id",
            "reached",
            "total_dist",
            F.round(F.col("reached") / F.col("total_dist"), 6).alias("closeness"),
            "eccentricity",
        )
    )


def local_clustering(und_edges: DataFrame, top_k: int = 100) -> DataFrame:
    """Per-node local clustering coefficient of an undirected graph:
    cc(v) = 2·T(v) / (deg(v)·(deg(v)−1)) for deg(v) >= 2, top_k rows by
    (cc desc, node asc).

    Triangles are enumerated ONCE with the same degree-ordered
    orientation as `triangle_stats` (each triangle appears as exactly
    one (u→v, u→w, v→w) path and oriented out-degree is O(sqrt |E|), so
    the wedge join survives power-law skew); each enumerated triangle
    then credits all three corners via a 3-way explode — one extra
    narrow pass, no second join.

    `und_edges` and `deg` are each referenced from several branches of
    the plan (deg build, orientation join, closing-edge join; deg again
    in the final cc join), so both are lineage-cut ONCE up front —
    otherwise Spark re-executes the caller's projection subtree (for
    graph_clustering_coefficient, a 600k×600k self-join + distinct) at
    every reference, the plan-side analog of DuckDB re-inlining a CTE
    (round-10 profile: 10.2 s → ~5 s at sf0.1)."""
    und_edges = und_edges.transform(cut_lineage)
    deg = (
        und_edges.select(F.col("a").alias("node"))
        .unionByName(und_edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
        .transform(cut_lineage)
    )
    e = (
        und_edges.join(deg.alias("da"), F.col("a") == F.col("da.node"))
        .join(deg.alias("db"), F.col("b") == F.col("db.node"))
        .select(
            F.when(
                (F.col("da.deg") < F.col("db.deg"))
                | ((F.col("da.deg") == F.col("db.deg")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
        .transform(cut_lineage)
    )
    paths = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.u") == F.col("e2.u"))
        .filter(F.col("e1.v") < F.col("e2.v"))
        .select(
            F.col("e1.u").alias("x"),
            F.col("e1.v").alias("y"),
            F.col("e2.v").alias("z"),
        )
    )
    closing = und_edges.select(F.col("a").alias("y"), F.col("b").alias("z"))
    tri = paths.join(closing, ["y", "z"])
    t_per = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("t"))
    )
    return (
        deg.filter(F.col("deg") >= 2)
        .join(t_per, "node", "left")
        .select(
            "node",
            F.col("deg").cast("long").alias("degree"),
            F.round(
                2.0 * F.coalesce(F.col("t"), F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1)),
                6,
            ).alias("cc"),
        )
        .orderBy(F.desc("cc"), "node")
        .limit(top_k)
    )


def harmonic_centrality(
    bidir: DataFrame,
    max_d: int = 20,
    local_threshold: int = 2000,
) -> DataFrame:
    """Exact harmonic centrality sum_{v != u} 1/d(u, v) over an
    undirected edge list given with BOTH orientations (columns s, d).

    Same two-tier shape as `connected_pairs_by_distance`: at or below
    `local_threshold` directed edges the whole graph is BFS'd
    driver-local (the distributed loop's ~6 jobs/round are pure overhead
    on a fixture-sized graph); above it, a simultaneous multi-source BFS
    runs distributed — the frontier carries (src, node) pairs, each
    round is one join + one fused dedup/anti shuffle, with frontier
    partitioning pinned to the cluster's parallelism so round-over-round
    unions don't inflate the task count.

    Exact all-pairs state is O(n^2); that is inherent to EXACT harmonic
    centrality. The 100 TB answer is the HyperBall harmonic estimator
    (Boldi-Vigna 2013) over the same register state as
    `functions/sketches.py` — this operator is the exact small-scale oracle
    for it, like exact hop-plot vs graph_hyperball.
    """
    spark = bidir.sparkSession
    n_edges = bidir.limit(local_threshold + 1).count()
    if n_edges <= local_threshold:
        from collections import defaultdict, deque

        adj: dict = defaultdict(set)
        for r in bidir.collect():
            if r[0] != r[1]:
                adj[r[0]].add(r[1])
        rows = []
        for s in adj:
            dist = {s: 0}
            dq = deque([s])
            h = 0.0
            while dq:
                u = dq.popleft()
                if dist[u] >= max_d:
                    continue
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        dq.append(v)
                        h += 1.0 / dist[v]
            rows.append((s, round(h, 6)))
        return spark.createDataFrame(
            sorted(rows), "id int, harmonic double"
        ).orderBy("id")

    par = spark.sparkContext.defaultParallelism
    edges = bidir.repartition(par, "s").persist(StorageLevel.MEMORY_AND_DISK)
    nodes = edges.select(F.col("s").alias("id")).distinct()
    seen = (
        nodes.select(
            F.col("id").alias("src"), F.col("id").alias("node"),
            F.lit(0).alias("dist"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    frontier = seen
    for d in range(1, max_d + 1):
        cand = (
            frontier.join(edges, frontier.node == edges.s)
            .select("src", F.col("d").alias("node"), F.lit(d).alias("dist"))
        )
        # dedup + seen-subtraction fused into one shuffle (tag-and-group,
        # same trick as connected_pairs_by_distance)
        nxt = (
            cand.select("src", "node", F.lit(0).alias("_seen"))
            .unionByName(seen.select("src", "node", F.lit(1).alias("_seen")))
            .groupBy("src", "node")
            .agg(F.max("_seen").alias("_seen"))
            .filter(F.col("_seen") == 0)
            .select("src", "node", F.lit(d).alias("dist"))
            .transform(cut_lineage)
        )
        if nxt.isEmpty():
            break
        seen = seen.unionByName(nxt).transform(cut_lineage)
        frontier = nxt
    edges.unpersist()
    return (
        seen.filter(F.col("dist") > 0)
        .groupBy(F.col("src").alias("id"))
        .agg(F.round(F.sum(1.0 / F.col("dist")), 6).alias("harmonic"))
        .orderBy("id")
    )


def betweenness_sampled(
    bidir: DataFrame,
    source_mod: int | None = None,
    max_d: int = 20,
    local_threshold: int = 2000,
) -> DataFrame:
    """Betweenness centrality by Brandes' algorithm (Brandes 2001) over
    an undirected edge list given with BOTH orientations (columns s, d),
    restricted to source nodes with `id % source_mod == 0` (None = all
    sources = exact betweenness) and shortest paths of length <= max_d
    (k-bounded betweenness). Scores sum the pair-dependency
    sigma_st(v)/sigma_st over ORDERED (s, t) pairs — no /2 halving — so
    sampled and exact runs share one definition.

    Two-tier like `connected_pairs_by_distance`: driver-local Brandes
    below `local_threshold` edges; above it, the standard distributed
    formulation — a forward multi-source BFS accumulating per-(src,node)
    shortest-path counts sigma (one join + one sum-aggregate per level),
    then a backward sweep over levels accumulating dependencies delta
    (one join per level, walking depth max..1). Per-source state is one
    row per reached (src, node): with S sampled sources the working set
    is O(S * n) — the reason sampling exists (Brandes-Pich 2007); exact
    all-sources runs are a fixture/subgraph tool.
    """
    spark = bidir.sparkSession
    n_edges = bidir.limit(local_threshold + 1).count()
    if n_edges <= local_threshold:
        from collections import defaultdict, deque

        adj: dict = defaultdict(set)
        for r in bidir.collect():
            if r[0] != r[1]:
                adj[r[0]].add(r[1])
        bc: dict = defaultdict(float)
        sources = [
            s for s in adj if source_mod is None or s % source_mod == 0
        ]
        for s in sources:
            dist = {s: 0}
            sigma = {s: 1.0}
            order = []
            preds = defaultdict(list)
            dq = deque([s])
            while dq:
                u = dq.popleft()
                order.append(u)
                if dist[u] >= max_d:
                    continue
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        dq.append(v)
                    if dist[v] == dist[u] + 1:
                        sigma[v] = sigma.get(v, 0.0) + sigma[u]
                        preds[v].append(u)
            delta = defaultdict(float)
            for w in reversed(order):
                for v in preds[w]:
                    delta[v] += (sigma[v] / sigma[w]) * (1.0 + delta[w])
            for v, val in delta.items():
                if v != s:
                    bc[v] += val
        rows = sorted((int(v), round(val, 6)) for v, val in bc.items() if val > 0)
        return spark.createDataFrame(rows, "node int, bc double").orderBy("node")

    par = spark.sparkContext.defaultParallelism
    edges = bidir.filter(F.col("s") != F.col("d")).repartition(
        par, "s"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    srcs = edges.select(F.col("s").alias("id")).distinct()
    if source_mod is not None:
        srcs = srcs.filter(F.col("id") % source_mod == 0)

    # forward: levels[d] = (src, node, sigma) at shortest distance d
    levels: list[DataFrame] = [
        srcs.select(
            F.col("id").alias("src"), F.col("id").alias("node"),
            F.lit(1.0).alias("sigma"),
        ).transform(cut_lineage)
    ]
    seen = levels[0].select("src", "node")
    for _d in range(1, max_d + 1):
        cand = (
            levels[-1].join(edges, levels[-1].node == edges.s)
            .select("src", F.col("d").alias("node"), "sigma")
        )
        # sigma sums over all predecessors; fuse dedup-vs-seen into the
        # same aggregate with a tag column (visited rows poison the group)
        nxt = (
            cand.select("src", "node", "sigma", F.lit(0).alias("_seen"))
            .unionByName(
                seen.select(
                    "src", "node", F.lit(0.0).alias("sigma"),
                    F.lit(1).alias("_seen"),
                )
            )
            .groupBy("src", "node")
            .agg(F.sum("sigma").alias("sigma"), F.max("_seen").alias("_seen"))
            .filter(F.col("_seen") == 0)
            .select("src", "node", "sigma")
            .transform(cut_lineage)
        )
        if nxt.isEmpty():
            break
        levels.append(nxt)
        seen = seen.unionByName(nxt.select("src", "node")).transform(cut_lineage)

    # backward: delta over levels deep -> shallow; contribution of w to
    # predecessor v is (sigma_v / sigma_w) * (1 + delta_w)
    bc_parts: list[DataFrame] = []
    delta = None  # (src, node, delta) for the level below the current one
    for d in range(len(levels) - 2, -1, -1):
        below = levels[d + 1]
        if delta is not None:
            below = below.join(delta, ["src", "node"], "left").select(
                "src", "node", "sigma",
                F.coalesce("delta", F.lit(0.0)).alias("delta"),
            )
        else:
            below = below.select("src", "node", "sigma", F.lit(0.0).alias("delta"))
        w_side = below.select(
            "src", F.col("node").alias("w"),
            ((1.0 + F.col("delta")) / F.col("sigma")).alias("w_term"),
        )
        v_side = levels[d].select("src", F.col("node").alias("v"), "sigma")
        contrib = (
            v_side.join(edges, v_side.v == edges.s)
            .select("src", "v", "sigma", F.col("d").alias("w"))
            .join(w_side, ["src", "w"])
            .groupBy("src", F.col("v").alias("node"))
            .agg(F.sum(F.col("sigma") * F.col("w_term")).alias("delta"))
            .transform(cut_lineage)
        )
        delta = contrib
        bc_parts.append(contrib.filter(F.col("node") != F.col("src")))

    edges.unpersist()
    if not bc_parts:
        return spark.createDataFrame([], "node int, bc double")
    allc = bc_parts[0]
    for p in bc_parts[1:]:
        allc = allc.unionByName(p)
    return (
        allc.groupBy(F.col("node").cast("int").alias("node"))
        .agg(F.round(F.sum("delta"), 6).alias("bc"))
        .filter(F.col("bc") > 0)
        .orderBy("node")
    )


def maximal_independent_set(
    edges: DataFrame, max_rounds: int = 40, local_threshold: int = 50_000
) -> DataFrame:
    """Luby's maximal-independent-set algorithm (Luby 1986) as pure
    DataFrame rounds: each round every still-active node draws a
    deterministic priority md5(node|round); a node enters the MIS iff
    its priority is strictly below every active neighbor's (md5 on
    distinct node ids cannot tie, so two adjacent nodes never both
    enter), then winners and their neighbors deactivate. Expected
    O(log n) rounds; per round one join + one map-side-combinable min
    aggregate over the SURVIVING edge set, which shrinks geometrically
    — never a re-scan of the original graph.

    Determinism is the point of the md5 priorities: the exact same MIS
    falls out of a driver-side replay, which is what graph_mis_gate
    certifies. edges: (src, dst), treated undirected, self-loops
    dropped. Returns (node,) — the MIS members among edge endpoints
    (callers with isolated vertices add them directly: they are always
    in the MIS).

    Tail cutover (r13 optimization, guide §1.2): the surviving edge set
    shrinks geometrically, so after the first couple of rounds the loop
    degenerates into dozens of 1-3-task rounds whose cost is pure
    per-round fixed overhead (4 jobs + driver planning each — measured
    ~4 s of an 8.5 s gate). Once the surviving directed edge set fits
    `local_threshold` rows, the REMAINING rounds run driver-side over
    the collected tail — the identical md5-priority recurrence
    (deterministic by construction, so the result is bit-equal; the
    gate's independent replay and the oracle certify it), with the same
    round indices and the same max_rounds bound. The collect is bounded
    by `local_threshold` rows — driver-sized at any data scale, the
    same argument as connected_pairs_by_distance's local BFS cutover.
    Per-round counts ride the round's own checkpoint materialization as
    observed metrics instead of separate count jobs."""
    import hashlib
    from collections import defaultdict

    from pyspark.sql import Observation

    from ..errors import ConvergenceError

    base = edges.filter(F.col("src") != F.col("dst"))
    adj = (
        base.select("src", "dst")
        .unionByName(
            base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_edges = adj.count()  # materializes the persist
    obs0 = Observation("mis_active_0")
    active = (
        adj.select(F.col("src").alias("node"))
        .distinct()
        .observe(obs0, F.count(F.lit(1)).alias("n"))
        .transform(cut_lineage)
    )
    n_active = obs0.get["n"]
    cur = adj
    mis: DataFrame | None = None
    node_schema = active.schema

    r = 0
    while r < max_rounds:
        if n_active == 0:
            break
        if n_edges <= local_threshold:
            # driver-local finish of the tail rounds (exact same
            # recurrence, continuing round index)
            amap: defaultdict[object, set] = defaultdict(set)
            for row in cur.select("src", "dst").collect():
                amap[row[0]].add(row[1])
            act = {row[0] for row in active.collect()}
            out: set = set()
            while act and r < max_rounds:
                p = {
                    v: hashlib.md5(f"{v}|{r}".encode()).hexdigest()
                    for v in act
                }
                sel_l = {
                    v
                    for v in act
                    if all(p[v] < p[u] for u in amap[v] if u in act)
                }
                out |= sel_l
                rem = set(sel_l)
                for v in sel_l:
                    rem |= amap[v] & act
                act -= rem
                r += 1
            if act:
                adj.unpersist()
                raise ConvergenceError("maximal_independent_set", max_rounds)
            n_active = 0
            if out:
                tail_df = edges.sparkSession.createDataFrame(
                    [(v,) for v in sorted(out)], node_schema
                )
                mis = tail_df if mis is None else mis.unionByName(tail_df)
            break
        pri = active.withColumn(
            "p", F.md5(F.concat_ws("|", F.col("node").cast("string"), F.lit(str(r))))
        )
        nbr_min = (
            cur.join(
                pri.select(F.col("node").alias("dst"), F.col("p").alias("pd")),
                "dst",
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("pd").alias("np"))
        )
        sel = (
            pri.join(nbr_min, "node", "left")
            .filter(F.col("np").isNull() | (F.col("p") < F.col("np")))
            .select("node")
            .transform(cut_lineage)
        )
        mis = sel if mis is None else mis.unionByName(sel)
        removed = (
            sel.unionByName(
                cur.join(sel.withColumnRenamed("node", "src"), "src").select(
                    F.col("dst").alias("node")
                )
            )
            .distinct()
        )
        obs_a = Observation(f"mis_active_{r + 1}")
        active = (
            active.join(removed, "node", "left_anti")
            .observe(obs_a, F.count(F.lit(1)).alias("n"))
            .transform(cut_lineage)
        )
        n_active = obs_a.get["n"]
        obs_e = Observation(f"mis_edges_{r + 1}")
        cur = (
            cur.join(active.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(active.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .observe(obs_e, F.count(F.lit(1)).alias("n"))
            .transform(cut_lineage)
        )
        n_edges = obs_e.get["n"]
        r += 1

    adj.unpersist()
    if n_active != 0:
        # active nodes remain: the set is independent but NOT maximal,
        # which downstream consumers cannot distinguish — fail loudly.
        raise ConvergenceError("maximal_independent_set", max_rounds)
    if mis is None:
        return edges.sparkSession.createDataFrame([], "node long")
    return mis


def maximal_matching(
    edges: DataFrame, max_rounds: int = 40, local_threshold: int = 50_000
) -> DataFrame:
    """Deterministic maximal matching in parallel rounds (the
    Israeli-Itai shape with md5 edge priorities): each round every
    surviving edge draws priority md5(a|b|round); an edge is matched
    iff its priority is the strict minimum among all surviving edges
    at BOTH its endpoints (md5 on distinct canonical pairs cannot tie,
    so matched edges never share a vertex), then all edges touching a
    newly matched vertex drop out. The globally minimum surviving edge
    always matches, so the loop terminates; in expectation a constant
    fraction of vertices leaves per round. A maximal matching is also
    the classic 2-approximation to minimum vertex cover (take both
    endpoints).

    Per round: one vertex-keyed min aggregate (map-side combinable,
    built from the edge list's two orientations) + two broadcast-free
    semi/anti joins; the surviving edge set shrinks geometrically and
    the original input is never re-scanned. edges: (src, dst),
    undirected, self-loops dropped. Returns (a, b) canonical matched
    pairs.

    Tail cutover (r13 optimization, guide §1.2 — same shape and
    rationale as maximal_independent_set): once the surviving canonical
    edge set fits `local_threshold` rows, the remaining rounds run the
    identical md5-priority recurrence driver-side over the collected
    tail (continuing round indices, same max_rounds bound; the result
    is bit-equal by determinism and the gate's independent replay
    certifies it). The per-round emptiness/size check rides the round's
    checkpoint as an observed metric instead of a separate count job."""
    import hashlib

    from pyspark.sql import Observation

    from ..errors import ConvergenceError

    obs0 = Observation("mm_edges_0")
    cur = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .observe(obs0, F.count(F.lit(1)).alias("n"))
        .transform(cut_lineage)
    )
    n_edges = obs0.get["n"]
    matched: DataFrame | None = None
    pair_schema = cur.schema

    r = 0
    while r < max_rounds:
        if n_edges == 0:
            break
        if n_edges <= local_threshold:
            # driver-local finish of the tail rounds (exact same
            # recurrence, continuing round index)
            cur_e = {(row[0], row[1]) for row in cur.collect()}
            out: set = set()
            while cur_e and r < max_rounds:
                p = {
                    e: hashlib.md5(f"{e[0]}|{e[1]}|{r}".encode()).hexdigest()
                    for e in cur_e
                }
                vmin: dict = {}
                for (a, b), pe_h in p.items():
                    if a not in vmin or pe_h < vmin[a]:
                        vmin[a] = pe_h
                    if b not in vmin or pe_h < vmin[b]:
                        vmin[b] = pe_h
                sel_l = {
                    e
                    for e in cur_e
                    if p[e] == vmin[e[0]] and p[e] == vmin[e[1]]
                }
                out |= sel_l
                mv = {v for e in sel_l for v in e}
                cur_e = {
                    e for e in cur_e if e[0] not in mv and e[1] not in mv
                }
                r += 1
            if cur_e:
                raise ConvergenceError("maximal_matching", max_rounds)
            n_edges = 0
            if out:
                tail_df = edges.sparkSession.createDataFrame(
                    sorted(out), pair_schema
                )
                matched = (
                    tail_df if matched is None else matched.unionByName(tail_df)
                )
            break
        pe = cur.withColumn(
            "p",
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("a").cast("string"),
                    F.col("b").cast("string"),
                    F.lit(str(r)),
                )
            ),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        incid = pe.select(F.col("a").alias("v"), "p").unionByName(
            pe.select(F.col("b").alias("v"), "p")
        )
        vmin = incid.groupBy("v").agg(F.min("p").alias("mp"))
        sel = (
            pe.join(
                vmin.select(F.col("v").alias("a"), F.col("mp").alias("ma")),
                "a",
            )
            .join(
                vmin.select(F.col("v").alias("b"), F.col("mp").alias("mb")),
                "b",
            )
            .filter((F.col("p") == F.col("ma")) & (F.col("p") == F.col("mb")))
            .select("a", "b")
            .transform(cut_lineage)
        )
        matched = sel if matched is None else matched.unionByName(sel)
        mv = (
            sel.select(F.col("a").alias("v"))
            .unionByName(sel.select(F.col("b").alias("v")))
            .distinct()
        )
        obs_e = Observation(f"mm_edges_{r + 1}")
        cur = (
            pe.join(mv.withColumnRenamed("v", "a"), "a", "left_anti")
            .join(mv.withColumnRenamed("v", "b"), "b", "left_anti")
            .select("a", "b")
            .observe(obs_e, F.count(F.lit(1)).alias("n"))
            .transform(cut_lineage)
        )
        n_edges = obs_e.get["n"]
        pe.unpersist()
        r += 1

    if n_edges != 0:
        # surviving edges remain: the matching is valid but NOT maximal
        # — indistinguishable from a complete result downstream, so
        # refuse rather than return it.
        raise ConvergenceError("maximal_matching", max_rounds)
    if matched is None:
        return edges.sparkSession.createDataFrame([], "a long, b long")
    return matched


def connected_components_star(
    edges: DataFrame, max_rounds: int = 50, local_threshold: int = 50_000
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — the scale-proof alternative to hash-min label
    propagation: hash-min needs O(diameter) rounds (a chain of length L
    takes L rounds), while star rounds contract every component to a
    star centered at its minimum node in O(log^2 n) worst case and a
    handful of rounds in practice, because each round rewires whole
    neighborhoods rather than advancing labels one hop.

    large-star(u): every neighbor v > u reconnects to m(u), the minimum
    of u's closed neighborhood. small-star(u): every neighbor v <= u,
    and u itself, reconnects to m(u). Both are one min-aggregate plus
    one join per round over the CURRENT edge set, which only shrinks
    (toward |V| star edges); convergence is detected by multiset
    equality (count match + empty except).

    Output: (node, component) with component = min node id, matching
    connected_components exactly — but in logarithmically many rounds
    on the chain-shaped graphs where hash-min stalls."""
    cur = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .transform(cut_lineage)
    )

    def _adj(e: DataFrame) -> DataFrame:
        return e.select(F.col("a").alias("u"), F.col("b").alias("n")).unionByName(
            e.select(F.col("b").alias("u"), F.col("a").alias("n"))
        )

    def _minmap(adj: DataFrame) -> DataFrame:
        return adj.groupBy("u").agg(
            F.least(F.min("n"), F.first("u")).alias("m")
        )

    # NOTE (round-8 audit, measured negative result — do not "fix"
    # this again): each star phase references its min-map TWICE (join
    # side + self-attachment union branch) and Catalyst plans the
    # aggregate subtree twice (no ReusedExchange, verified on the
    # executed plan). Materializing it once via persist was tried and
    # LOSES at every tested scale (same-box A/B: sf0.1 21.6 s unpinned
    # vs 25.2 s pinned; same-session 30x/18M-edge runs: 88.0 s
    # unpinned, 98.4 s pinned, 55.1 s unpinned again) — the round's
    # cost is dominated by the distinct + join shuffles, and the
    # persist barrier serializes work AQE otherwise pipelines. The
    # duplicate aggregate is the cheaper evil; leave it.
    converged = False
    n_cur = cur.count()
    for _ in range(max_rounds):
        if 0 <= local_threshold and n_cur <= local_threshold:
            # Tail cutover (r13 optimization, guide §1.2 — same shape as
            # the MIS/matching/MST local finishes): star rounds preserve
            # each component's node set, so the components of the
            # CURRENT edge set equal the original components and the
            # final (node, min-id) labelling can be computed directly by
            # a driver union-find over the collected tail — skipping the
            # remaining near-empty rounds' fixed costs. Bounded by
            # local_threshold rows; the gate's driver replay and the
            # oracle certify equality.
            rows = cur.collect()
            uf: dict = {}

            def _find(x):
                root = x
                while uf.setdefault(root, root) != root:
                    root = uf[root]
                while uf[x] != root:
                    uf[x], x = root, uf[x]
                return root

            for a, b in rows:
                ra, rb = _find(a), _find(b)
                if ra != rb:
                    uf[ra] = rb
            groups: dict = {}
            for v in uf:
                groups.setdefault(_find(v), []).append(v)
            out_rows = []
            for members in groups.values():
                lbl = min(members)
                out_rows.extend((v, lbl) for v in members)
            from pyspark.sql import types as T

            id_t = cur.schema["a"].dataType
            sch = T.StructType(
                [
                    T.StructField("node", id_t),
                    T.StructField("component", id_t),
                ]
            )
            return edges.sparkSession.createDataFrame(sorted(out_rows), sch)
        # large-star
        adj = _adj(cur)
        m = _minmap(adj)
        ls = (
            adj.join(m, "u")
            .filter(F.col("n") > F.col("u"))
            .select(
                F.least("n", "m").alias("a"), F.greatest("n", "m").alias("b")
            )
            .filter(F.col("a") != F.col("b"))
            .unionByName(
                # keep u's own attachment so components never split
                m.filter(F.col("u") != F.col("m")).select(
                    F.col("m").alias("a"), F.col("u").alias("b")
                )
            )
            .distinct()
            .transform(cut_lineage)
        )
        # small-star
        adj2 = _adj(ls)
        m2 = _minmap(adj2)
        ss = (
            adj2.join(m2, "u")
            .filter(F.col("n") < F.col("u"))
            .select(
                F.least("n", "m").alias("a"), F.greatest("n", "m").alias("b")
            )
            .unionByName(
                m2.select(F.least("u", "m").alias("a"),
                          F.greatest("u", "m").alias("b"))
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .transform(cut_lineage)
        )
        # carried counts: ss/cur are both checkpointed, so the equality
        # check needs only ONE new count job per round (the previous
        # round's n_cur is reused)
        n_ss = ss.count()
        same = (
            n_ss == n_cur
            and ss.exceptAll(cur).limit(1).count() == 0
        )
        cur, n_cur = ss, n_ss
        if same:
            converged = True
            break
    if not converged:
        # the final extraction below assumes a converged star forest
        # (one-hop min of incident smaller endpoints); on a partial
        # contraction it returns silently wrong labels, so refuse.
        from ..errors import ConvergenceError

        raise ConvergenceError("connected_components_star", max_rounds)

    # converged star set: every edge is (component-min, member)
    centers = cur.select(F.col("a").alias("node"), F.col("a").alias("component"))
    members = cur.select(F.col("b").alias("node"), F.col("a").alias("component"))
    return (
        members.unionByName(centers)
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )


def edge_support(
    und_edges: DataFrame, _pins: list[DataFrame] | None = None
) -> DataFrame:
    """Triangles-per-edge (edge 'support') of an undirected graph given
    as canonical (a<b) pairs — the building block of truss
    decomposition. Same degree-ordered orientation as triangle_stats /
    local_clustering (each triangle enumerated exactly once, oriented
    out-degree O(sqrt |E|) under skew); each triangle then credits its
    THREE edges via one narrow explode. Returns (a, b, support) for
    edges with support >= 1; zero-support edges have no row.

    `_pins` selects the materialization mode for the oriented table.
    With a list supplied (k_truss above its pin threshold), it is
    persisted hash-partitioned on `u` (NOT localCheckpoint-ed, which
    scans back as UnknownPartitioning — the round-7 lesson), so the
    wedge-enumerating self-join on `u` needs NO Exchange on either
    side: both aliases read the same cached layout and satisfy the
    join's distribution directly, removing the 2x O(E') shuffle + sort
    a merge self-join pays once the table is past broadcast size; the
    persisted handle lands in the list for the caller to unpersist
    after the round materializes. With _pins=None (one-shot callers,
    small graphs) the table is localCheckpoint-ed as before — at
    broadcastable sizes AQE turns the self-join into a
    BroadcastHashJoin anyway, and the extra repartition pass would be
    pure overhead."""
    deg = (
        und_edges.select(F.col("a").alias("node"))
        .unionByName(und_edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    e = (
        und_edges.join(deg.alias("da"), F.col("a") == F.col("da.node"))
        .join(deg.alias("db"), F.col("b") == F.col("db.node"))
        .select(
            F.when(
                (F.col("da.deg") < F.col("db.deg"))
                | (
                    (F.col("da.deg") == F.col("db.deg"))
                    & (F.col("a") < F.col("b"))
                ),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
    )
    if _pins is not None:
        # pinned mode: materialize hash-partitioned on `u` so the
        # wedge self-join below runs with NO Exchange on either side
        e = e.repartition(
            int(
                und_edges.sparkSession.conf.get(
                    "spark.sql.shuffle.partitions", "200"
                )
            ),
            "u",
        ).persist(StorageLevel.MEMORY_AND_DISK)
        _pins.append(e)
        e.count()  # materialize the pinned layout before the self-join
    else:
        e = e.transform(cut_lineage)
    paths = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.u") == F.col("e2.u"))
        .filter(F.col("e1.v") < F.col("e2.v"))
        .select(
            F.col("e1.u").alias("x"),
            F.col("e1.v").alias("y"),
            F.col("e2.v").alias("z"),
        )
    )
    closing = und_edges.select(F.col("a").alias("y"), F.col("b").alias("z"))
    tri = paths.join(closing, ["y", "z"])
    tri_edges = tri.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
                ),
                F.struct(
                    F.least("x", "z").alias("a"), F.greatest("x", "z").alias("b")
                ),
                F.struct(F.col("y").alias("a"), F.col("z").alias("b")),
            )
        ).alias("t")
    ).select("t.a", "t.b")
    return tri_edges.groupBy("a", "b").agg(F.count("*").alias("support"))


def k_truss(
    edges: DataFrame,
    k: int,
    max_rounds: int = 30,
    local_threshold: int = 50_000,
) -> DataFrame:
    """k-truss decomposition by iterative support peeling (Cohen 2008):
    repeatedly delete every edge lying in fewer than k-2 triangles of
    the CURRENT subgraph until none remains — the standard cohesive-
    subgraph notion one step stronger than k-core (it requires tied-
    together neighborhoods, not just degree). Each round is one
    triangle enumeration over the surviving edges (which only shrink)
    plus a semi join; rounds are bounded by the peeling depth, and the
    certificate that the FINAL edge set is truly a k-truss (min support
    >= k-2) is itself one distributed edge_support pass — checkable at
    any scale without the driver replay the gate adds at test sizes.

    edges: (src, dst) undirected; returns canonical (a, b) pairs of the
    k-truss subgraph (empty when no edge survives). For k <= 2 the
    support requirement is vacuous and the whole simple graph is
    returned — including support-0 edges, which edge_support emits no
    row for."""
    cur = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .transform(cut_lineage)
    )
    need = k - 2
    if need <= 0:
        # the (k<=2)-truss is the whole simple graph: every edge needs
        # >= 0 supporting triangles, including support-0 edges, which
        # edge_support emits NO row for — a semi join against it would
        # silently drop them, so short-circuit before the peel loop.
        return cur
    converged = False
    for _ in range(max_rounds):
        n_before = cur.count()
        if n_before == 0:
            converged = True
            break
        if 0 <= local_threshold and n_before <= local_threshold:
            # Tail cutover (r13 optimization, guide §1.2 — same shape as
            # the MIS/matching/MST local finishes): the k-truss is the
            # unique maximal subgraph with every edge in >= k-2
            # triangles, and simultaneous peeling converges to it from
            # any intermediate state, so finishing the peel driver-side
            # over the collected tail emits the identical edge set
            # without the remaining rounds' fixed costs (a full
            # distributed peel round is a triangle enumeration + semi
            # join + checkpoint even when it deletes nothing). Bounded
            # by local_threshold rows; the gate's driver replay and the
            # oracle certify equality.
            from collections import defaultdict

            es = {(row[0], row[1]) for row in cur.collect()}
            while True:
                nbrs: defaultdict = defaultdict(set)
                for a, b in es:
                    nbrs[a].add(b)
                    nbrs[b].add(a)
                drop = {
                    e for e in es if len(nbrs[e[0]] & nbrs[e[1]]) < need
                }
                if not drop:
                    break
                es -= drop
            converged = True
            return edges.sparkSession.createDataFrame(
                sorted(es), cur.schema
            )
        # pin the oriented table's partitioning only once the surviving
        # edge set is past plausible broadcast size (same idea as
        # pagerank's broadcast budget): below it, AQE broadcasts the
        # wedge self-join and the repartition pass would be overhead;
        # above it, the pin removes the per-round 2x O(E') exchange.
        pins: list[DataFrame] = []
        if n_before * 48 > 10 << 20:
            sup = edge_support(cur, _pins=pins)
        else:
            sup = edge_support(cur)
        keep = sup.filter(F.col("support") >= need).select("a", "b")
        nxt = cur.join(keep, ["a", "b"], "left_semi").transform(cut_lineage)
        # the eager checkpoint materialized the whole round; release
        # the round's pinned oriented-edge cache before the next peel
        for p in pins:
            p.unpersist()
        n_after = nxt.count()
        cur = nxt
        if n_after == n_before:
            converged = True
            break
    if not converged:
        from ..errors import ConvergenceError

        raise ConvergenceError("k_truss", max_rounds)
    return cur
