"""HyperBall: approximate neighborhood function / hop-plot via per-node
HyperLogLog counters (Boldi & Vigna, "In-Core Computation of Geometric
Centralities with HyperBall", 2013; HyperANF, WWW'11 — public papers).

Why it exists: the exact hop-plot (operators/graph.py) materializes the
set of connected pairs — O(pairs) state, ~77 M rows for the reference's
1997 snapshot and quadratic-ish in node count at 100 TB graph scale.
HyperBall replaces the pair set with one HLL counter per node
(m = 2^p registers): per round, each node's counter absorbs its
neighbors' counters (register-wise max), and sum-of-estimates gives
N(d) = #(u,v) pairs with dist(u,v) <= d. State is O(|V| * m), messages
are O(|E| * m) per round — linear in the graph, independent of pair
count.

Spark-first design — NO Python UDFs, no RDDs:

- Counters are DENSE: one row per node with m tinyint register columns
  (`init_counters_dense`). A message is ONE ~m-byte row per edge
  instead of one row per (edge × nonzero register), and the
  register-wise max-union is an m-column `groupBy(node).max` — a hash
  aggregate that stays in whole-stage codegen.
- The edge table is augmented ONCE with self-loops (v, v), so a round
  is join + aggregate with NO union against the previous counters (the
  self-loop message carries each node's own ball forward). Duplicate
  edges are harmless (max is idempotent), so the edge feed skips its
  dedup shuffle.
- The one-hop absorb joins the self-loop-augmented edge list with the
  counters. When the counter table fits a broadcast budget (|V| *
  (m + overhead) bytes), the counters are BROADCAST and the edges are
  pre-partitioned by `src`: the join is map-side and the group-by key
  (src, aliased `node`) already matches the edges' partitioning, so a
  whole round runs with ZERO shuffle — only the ~|V|*m-byte broadcast
  republish per round. Past the budget (1e9-node graphs at 100 TB
  scale), the same plan degrades gracefully to a shuffled hash join +
  exchange, still linear in |E|*m per round.
- Round state is materialized with `cut_lineage` (localCheckpoint by
  default, reliable checkpoint behind the session knob; row-level block
  store, also truncates lineage) rather than `persist` — the columnar
  cache encode of 65 columns costs ~10x the checkpoint. Whole-stage
  codegen is disabled around the loop: Janino recompiles the huge
  64-column generated class for every round's distinct plan, and at
  O(|V|*m) volumes the compile dwarfs the interpreted eval it saves.
- The HLL estimate (alpha_m * m^2 / sum(2^-M_j), with the small-range
  linear-counting correction) is a pure column expression over
  (non-zero registers, implicit-zero count).
- Hashing is `xxhash64` (JVM built-in); rho (leading-zero rank) is
  computed exactly with integer ops via base-2 string length —
  no floating-point log2 edge cases.
"""

from __future__ import annotations

import contextlib
import gc
import math

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..lineage import cut_lineage


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def init_counters(nodes: DataFrame, p: int = 6, node_col: str = "node") -> DataFrame:
    """Singleton HLL counter per node: one sparse register from
    xxhash64(node). Output: (node, reg_idx, reg_val)."""
    m = 1 << p
    h = F.xxhash64(F.col(node_col))
    idx = h.bitwiseAND(F.lit(m - 1)).cast("int")
    w = F.shiftrightunsigned(h, p)
    # rho = leading zeros of w within 64-p bits, + 1.
    # bit_length(w) for w>0 == length of its base-2 string (exact integer
    # path, unlike log2 which mis-rounds near powers of two).
    bitlen = F.length(F.conv(w.cast("string"), 10, 2))
    rho = F.when(w == 0, F.lit(64 - p + 1)).otherwise(F.lit(64 - p) - bitlen + 1)
    return nodes.select(
        F.col(node_col).alias("node"),
        idx.alias("reg_idx"),
        rho.cast("int").alias("reg_val"),
    )


def init_counters_dense(nodes: DataFrame, p: int = 6, node_col: str = "node") -> DataFrame:
    """Singleton HLL counter per DISTINCT node, directly in the dense
    (node, r0..r{m-1}) layout: r_i = rho if i == idx else 0.

    Cheaper than init_counters + densify when `nodes` has duplicates
    (e.g. the src column of an edge list): the m-way `when` projection
    runs once per distinct node, not once per input row, and the only
    shuffle is the distinct itself (8-byte rows).

    The m register projections are built as ONE selectExpr (r13
    optimization, guide §4 — the Python boundary): constructing them
    with per-column pyspark.sql.functions calls cost ~1 s of driver
    Py4J round-trips per invocation at m=64; the SQL strings parse
    JVM-side into the identical Catalyst expressions in one call."""
    m = 1 << p
    h = F.xxhash64("node")
    w = F.shiftrightunsigned(h, p)
    bitlen = F.length(F.conv(w.cast("string"), 10, 2))
    rho = F.when(w == 0, F.lit(64 - p + 1)).otherwise(F.lit(64 - p) - bitlen + 1)
    base = (
        nodes.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("_idx", h.bitwiseAND(F.lit(m - 1)).cast("int"))
        .withColumn("_rho", rho.cast("int"))
    )
    regs = [
        f"cast(CASE WHEN _idx = {i} THEN _rho ELSE 0 END AS tinyint) AS r{i}"
        for i in range(m)
    ]
    return base.selectExpr("node", *regs)


def _estimate_sql(p: int) -> str:
    """Per-row HLL estimate over dense register columns r0..r{m-1} as a
    single SQL string — rides a `DataFrame.observe` on the absorb job
    (hyperball_hopplot) and the standalone estimate_total_dense pass.

    r13 optimization (guide §§1.2, 4): 2^-r is computed as
    1.0 / shiftleft(1L, r) — exact for every register value (r <=
    64-p+1 < 63, and both pow(2.0,-r) and the shifted divide return the
    identical IEEE double), but an integer shift instead of a
    transcendental pow call per (row x register).

    r13 optimization round 2 (guide §1/§7 — JIT-profiled): the previous
    2m-term UNROLLED tree (64 divides + 63 adds for the denominator plus
    64 CASEs + 63 adds for the zero count) Janino-compiles into ~130
    tiny generated methods (SpecificMutableProjection::Add_N$/Divide_N$)
    per fresh plan; in a one-shot-per-query JVM (the bench, any batch
    job) those methods flood the C2 compile queue — measured 40-140 s
    of HotSpot compiler CPU per hyperball invocation with every task
    meanwhile executing at the 10x-slower profiling tier. The same math
    as ONE array fold (`aggregate` HOF over array(r0..r{m-1})) generates
    a constant-size expression tree instead. Bit-identical by
    construction: the fold's running double sum evaluates
    ((0.0+t0)+t1)+...+t{m-1} and 0.0+t0 == t0 exactly for t0 > 0, so
    the summation order matches the old left-associated `t0 + t1 + ...`
    term for term; the zero count is integer arithmetic."""
    m = 1 << p
    alpha = _alpha(m)
    arr = "array(" + ",".join(f"r{i}" for i in range(m)) + ")"
    # denominator: primitive-double left fold (no per-element struct —
    # the named_struct accumulator variant A/B'd ~1.5x slower from
    # InternalRow/boxing churn in the interpreted HOF eval); zero count:
    # array_remove is a single builtin scan, no lambda at all. Both
    # sub-expressions are duplicated across the CASE branches exactly as
    # the unrolled original duplicated its `raw`/`zeros` terms.
    denom = f"aggregate({arr}, 0.0D, (acc, x) -> acc + (1.0D / cast(shiftleft(1L, x) as double)))"
    zeros = f"({m} - size(array_remove({arr}, 0Y)))"
    raw = f"({alpha * m * m!r}D / ({denom}))"
    return (
        f"CASE WHEN {raw} <= {2.5 * m!r}D AND ({zeros}) > 0 "
        f"THEN {float(m)!r}D * ln({float(m)!r}D / ({zeros})) "
        f"ELSE {raw} END"
    )


def densify(counters: DataFrame, p: int = 6) -> DataFrame:
    """Sparse (node, reg_idx, reg_val) → dense (node, r0..r{m-1}).

    The dense layout is what the iteration runs on: a message is then ONE
    row per edge (m tinyint-sized columns) instead of one row per
    (edge × nonzero register) — ~nnz× less shuffle volume per round, and
    every max-aggregate stays in whole-stage codegen. Register values are
    <= 64-p+1, so the row is ~m bytes + overhead.
    """
    m = 1 << p
    # tinyint registers: reg_val <= 64-p+1 < 128, and the narrow type
    # quarters the shuffled bytes of every subsequent absorb round
    aggs = [
        F.max(F.when(F.col("reg_idx") == i, F.col("reg_val")).otherwise(0))
        .cast("tinyint")
        .alias(f"r{i}")
        for i in range(m)
    ]
    return counters.groupBy("node").agg(*aggs)


def absorb_neighbors_dense(counters: DataFrame, edges: DataFrame, p: int = 6) -> DataFrame:
    """One HyperBall round on the dense layout: counter'(v) =
    register-wise max of counter(v) and counters of v's out-neighbors.
    One equi join + one m-column max-aggregate (map-side combine)."""
    m = 1 << p
    cols = [f"r{i}" for i in range(m)]
    msgs = edges.join(counters, edges["dst"] == counters["node"], "inner").select(
        edges["src"].alias("node"), *cols
    )
    return (
        counters.unionByName(msgs)
        .groupBy("node")
        .agg(*[F.max(c).alias(c) for c in cols])
    )


def estimate_total_dense(counters: DataFrame, p: int = 6) -> float:
    """Sum over nodes of HLL estimates on the dense layout — identical
    math to `estimate_total` (a zero register contributes 2^0 = 1 to the
    denominator, exactly the `zeros` term of the sparse path)."""
    row = counters.agg(F.expr(f"sum({_estimate_sql(p)}) AS total")).first()
    return float(row["total"] or 0.0)


def absorb_neighbors(counters: DataFrame, edges: DataFrame) -> DataFrame:
    """One HyperBall round: counter'(v) = counter(v) union-max the
    counters of v's out-neighbors. `edges` must be (src, dst) with both
    orientations present for undirected semantics."""
    msgs = (
        edges.join(counters, edges["dst"] == counters["node"], "inner")
        .select(edges["src"].alias("node"), "reg_idx", "reg_val")
    )
    return (
        counters.unionByName(msgs)
        .groupBy("node", "reg_idx")
        .agg(F.max("reg_val").alias("reg_val"))
    )


def estimate_total(counters: DataFrame, p: int = 6) -> float:
    """Sum over nodes of the HLL estimates of |ball(v)| — the neighborhood
    function N(d). One aggregation pass, all column expressions."""
    m = 1 << p
    alpha = _alpha(m)
    per_node = counters.groupBy("node").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("reg_val"))).alias("sum_nz"),
        F.count("*").alias("n_nz"),
    )
    zeros = F.lit(m) - F.col("n_nz")
    raw = F.lit(alpha * m * m) / (F.col("sum_nz") + zeros)
    # small-range (linear counting) correction: E <= 2.5m and zero
    # registers present
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    row = per_node.agg(F.sum(est).alias("total")).first()
    return float(row["total"] or 0.0)


def hyperball_hopplot(
    edges: DataFrame,
    p: int = 6,
    max_d: int = 20,
    rel_tol: float = 1e-3,
    broadcast_budget_bytes: int = 256 << 20,
) -> list[tuple[int, float]]:
    """Approximate hop-plot: [(d, estimated #unordered connected pairs at
    dist <= d)] until the neighborhood function stabilizes (relative
    change < rel_tol) or max_d.

    `edges`: (src, dst), both orientations. Standard error of each HLL
    estimate is ~1.04/sqrt(2^p) (p=6 -> ~13 %); sums over nodes
    concentrate tighter, and for balls far smaller than m the
    linear-counting regime is near-exact.

    Counters fitting `broadcast_budget_bytes` (|V| * (m + row overhead))
    are broadcast each round — with the self-loop-augmented edge table
    pre-partitioned by src, a round is then a single zero-shuffle job.
    Larger vertex sets fall back to a shuffled join transparently.
    """
    spark = edges.sparkSession
    m = 1 << p
    cols = [f"r{i}" for i in range(m)]
    # materialize the raw edge lineage ONCE, with codegen still on (it
    # may hang off arbitrary upstream joins); everything below reads
    # this row-level checkpoint
    edges = edges.transform(cut_lineage)
    # codegen off: Janino would recompile the huge 64-column class for
    # every round's distinct plan. AQE coalescing off: the per-round
    # state is small enough that AQE would squash it to ONE partition,
    # serializing the (interpreted) loop stages.
    codegen_before = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    coalesce_before = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        counters = init_counters_dense(
            edges.select(F.col("src").alias("node")), p=p
        ).transform(cut_lineage)
        n = counters.count()
        use_broadcast = n * (m + 32) <= broadcast_budget_bytes
        # self-loops make absorb a pure join+agg (each node's own ball
        # rides the (v, v) message) — no union with the previous
        # counters, so the broadcast path needs no exchange at all.
        # Loops come from the checkpointed counters (already distinct),
        # so the upstream edge lineage is scanned once here, not twice.
        edges_aug = (
            edges.unionByName(
                counters.select(F.col("node").alias("src"), F.col("node").alias("dst"))
            )
            # persist, NOT localCheckpoint (a PySpark checkpoint scans
            # back with UnknownPartitioning and every round re-shuffles
            # this O(edges) table — see operators/graph.py pagerank).
            # Broadcast mode partitions by the AGG key `src` so a round
            # is join + agg with zero exchange; the fallback partitions
            # by the JOIN key `dst` and hash-builds on the counter side,
            # so the only per-round exchanges are the counter table and
            # the map-side-combined aggregate — never the edges.
            .repartition(n_shuffle, "src" if use_broadcast else "dst")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        edges_aug.count()  # materialize once

        out: list[tuple[int, float]] = []
        prev_total = float(n)  # N(0): every node reaches itself
        max_aggs = [F.expr(f"max({c}) AS {c}") for c in cols]
        est_sum = F.expr(f"sum({_estimate_sql(p)})").alias("total")
        for d in range(1, max_d + 1):
            build = (
                F.broadcast(counters)
                if use_broadcast
                else counters.hint("shuffle_hash")
            )
            # the round estimate rides the checkpoint materialization as
            # an `observe` metric (r13 optimization, guide §1.2): the
            # estimate previously ran as a separate per-round job over
            # the checkpointed counters — same sum, one job instead of
            # two per round, and the observed aggregate is computed on
            # the absorb output rows as they materialize
            obs = Observation(f"hyperball_d{d}")
            nxt = (
                edges_aug.join(build, edges_aug["dst"] == build["node"], "inner")
                .select(edges_aug["src"].alias("node"), *cols)
                .groupBy("node")
                .agg(*max_aggs)
                .observe(obs, est_sum)
            ).transform(cut_lineage)
            total = float(obs.get["total"] or 0.0)
            counters = nxt
            # release superseded round state promptly: Python's lazy
            # collection of Py4J refs otherwise pins old checkpoint
            # blocks/broadcasts JVM-side and rounds degrade sharply
            gc.collect()
            pairs = max(0.0, (total - n) / 2.0)
            out.append((d, pairs))
            if prev_total > 0 and abs(total - prev_total) / prev_total < rel_tol:
                break
            prev_total = total
    finally:
        with contextlib.suppress(Exception):
            edges_aug.unpersist()
        spark.conf.set("spark.sql.codegen.wholeStage", codegen_before)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", coalesce_before)

    return out
