"""Composable relational operators (SURVEY.md §2.2-2.7 inventory).

Each is a thin, documented wrapper over DataFrame primitives — the point
is a named, testable surface matching the reference's operator inventory,
plus the common OLAP shapes (top-k per group, sessionization) the
reference lacks. All JVM-side; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..lineage import cut_lineage


def group_count(df: DataFrame, key: str, alias: str = "count") -> DataFrame:
    """A1/A2: hash aggregate count per key (partial agg map-side, free)."""
    return df.groupBy(key).agg(F.count("*").alias(alias))


def group_sum(df: DataFrame, key: str, value: str, alias: str) -> DataFrame:
    """A3: hash aggregate sum per key."""
    return df.groupBy(key).agg(F.sum(value).alias(alias))


def running_total(
    df: DataFrame, order_col: str, value_col: str, alias: str,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """W1: cumulative sum ordered by `order_col`.

    The reference's window has no partitionBy (Analytics.scala:22-25) —
    fine for <=#years rows, a serialization hazard otherwise. Callers with
    large frames must pass `partition_by` (scale note in SURVEY.md §4.3).
    """
    w = Window.orderBy(order_col)
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(order_col)
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(alias, F.sum(value_col).over(w))


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order_col, k: int, rank_alias: str = "rn"
) -> DataFrame:
    """Top-k per group via row_number — the distributed top-k idiom: each
    partition pre-ranks map-side, only k rows per group survive.

    `order_col` must be a total order within each group (add a unique
    tiebreak column otherwise): row_number over a tied order returns an
    arbitrary k-subset of the tied rows."""
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    return df.withColumn(rank_alias, F.row_number().over(w)).filter(
        F.col(rank_alias) <= k
    )


def anti_join_new(new: DataFrame, seen: DataFrame, keys: list[str]) -> DataFrame:
    """J4/U2: keep rows of `new` whose key is absent from `seen`
    (the reference's subtractByKey, Analytics.scala:287)."""
    return new.join(seen, keys, "left_anti")


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Sessionization: a new session starts when the gap since the user's
    previous event exceeds `gap_minutes`. Pure window functions — one
    shuffle on user, then per-user sorted scan; scales with user
    cardinality, not total rows per partition."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # TIMESTAMP_NTZ (Spark 4's read of tz-less parquet timestamps) has no
    # direct BIGINT cast; route via TIMESTAMP (session TZ pinned to UTC).
    ts_long = F.col(ts_col).cast("timestamp").cast("long")
    gap = ts_long - F.lag(ts_long).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return df.withColumn("_new_session", is_new).withColumn(
        "session_id",
        F.sum("_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).drop("_new_session")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_key: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, attach the columns of the LATEST
    right row with the same key and right_ts <= left_ts.

    Spark has no native as-of join; the scalable expression is the
    union-and-carry idiom: tag both inputs, union them, and carry the most
    recent right-side values forward with a last-non-null window. ONE
    shuffle on (key), no range-candidate explosion — cost is a sort within
    key partitions, independent of how many left rows match each right
    row. (The per-key sort is what an interval/BNL join can't give you at
    100 TB.) Ties on equal timestamps resolve to the right row (sorted
    first), matching ASOF JOIN semantics in DuckDB/QuestDB/kdb.
    """
    right_key = right_key or key
    carried = [f"_asof_{c}" for c in right_cols]
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        "*",
        *[F.lit(None).cast(right.schema[c].dataType).alias(a)
          for c, a in zip(right_cols, carried)],
    )
    r_tagged = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left.schema.fields],
        *[F.col(c).alias(a) for c, a in zip(right_cols, carried)],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l_tagged.unionByName(r_tagged)
    filled = unioned.select(
        "*",
        *[
            F.last(a, ignorenulls=True).over(w).alias(f"{a}_f")
            for a in carried
        ],
    )
    return filled.filter(F.col("_side") == 1).select(
        *[f.name for f in left.schema.fields],
        *[F.col(f"{a}_f").alias(c) for c, a in zip(right_cols, carried)],
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    key: str | None,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bin_width: int,
) -> DataFrame:
    """Interval/range join: left rows whose `left_point` falls inside the
    right row's [right_lo, right_hi], optionally also matching `key`.

    Catalyst plans a bare inequality join as broadcast-nested-loop —
    O(|L|·|R|) and a non-starter at scale. Binning makes it an EQUI join:
    each right interval is exploded to the bins it overlaps, each left
    point maps to exactly one bin, and the join key becomes (key, bin)
    with the exact range predicate re-applied as a filter. Cost scales
    with genuine overlap density (interval_span/bin_width duplicates per
    right row), and every join strategy (broadcast/SMJ/AQE skew split)
    applies. Pick bin_width ~ typical interval span.
    """
    def as_long(df: DataFrame, name: str):
        # TIMESTAMP_NTZ has no direct numeric cast; route via TIMESTAMP
        # (session TZ is pinned to UTC in session.py, so this is stable;
        # the cast exists ONLY on this bin path — the exact re-filter
        # below compares native column values and never leaves the NTZ
        # domain, so re-filter correctness does not depend on the TZ pin)
        c = F.col(name)
        if dict(df.dtypes)[name].startswith("timestamp"):
            c = c.cast("timestamp")
        return c.cast("long")

    # Bin assignment may truncate to whole seconds (monotonic, so a point
    # inside [lo, hi] always lands in a bin in [floor(lo), floor(hi)]),
    # but the exact re-filter must NOT: timestamp→long drops fractional
    # seconds, and a purchase 60 ms BEFORE a click would pass a
    # second-granular `pt >= lo` (found by the sf0.1 cross-SF oracle
    # sweep — one such sub-second-inverted pair exists there and in none
    # of the smaller corpora). The re-filter therefore compares the
    # NATIVE values (microsecond-exact for timestamps, width-exact for
    # integers). The filter operands are materialized as internal
    # _pt/_lo/_hi columns on their OWN frame before the join, so name
    # resolution cannot bind the wrong side when left and right happen
    # to share a column named like the point/bound columns.
    lo_s, hi_s = as_long(right, right_lo), as_long(right, right_hi)
    r_binned = right.withColumn("_lo", F.col(right_lo)).withColumn(
        "_hi", F.col(right_hi)
    ).withColumn(
        "_bin",
        F.explode(F.sequence(F.floor(lo_s / bin_width), F.floor(hi_s / bin_width))),
    )
    l_binned = left.withColumn("_pt", F.col(left_point)).withColumn(
        "_bin", F.floor(as_long(left, left_point) / bin_width)
    )
    on = ["_bin", key] if key else ["_bin"]
    return (
        l_binned.join(r_binned, on=on, how="inner")
        .filter((F.col("_pt") >= F.col("_lo")) & (F.col("_pt") <= F.col("_hi")))
        .drop("_bin", "_pt", "_lo", "_hi")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi join: the left (large, skewed) side gets a
    random salt in [0, n_salts); the right side is replicated n_salts
    times with every salt value; the join key becomes (key, salt). A hot
    key's rows now spread over n_salts reducer partitions instead of one.

    This is the manual fallback for engines/paths where AQE's runtime
    skew-join split (enabled in session.py) can't act — e.g. when the
    skewed side feeds a window, or on static plans. Replication cost:
    |right| * n_salts rows, so use it when right is the smaller side but
    too big to broadcast.
    """
    salt = (F.rand(seed=42) * n_salts).cast("int")
    l_salted = left.withColumn("_salt", salt)
    r_salted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l_salted.join(r_salted, on=[key, "_salt"], how=how).drop("_salt")


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rnk",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed exact global rank (dense row numbering by `order_cols`)
    WITHOUT a single-partition sort.

    `Window.orderBy` with no partition key pulls every row into ONE
    partition — the classic scale cliff. This instead mirrors how Spark's
    own sort executes: range-repartition on the keys (disjoint, ordered
    key ranges per partition), count rows per partition (a tiny
    P-row aggregate collected to the driver, like the range sampler
    itself), then global rank = cumulative offset of earlier partitions +
    intra-partition row_number. The per-partition window still exchanges
    on the synthetic partition id, but each hash bucket holds one
    already-range-bounded partition — nothing ever concentrates on a
    single machine.

    Ties broken by the full `order_cols` list — pass enough columns to
    make the order total, or equal rows get an arbitrary (but stable
    within a run) relative order.
    """
    spark = df.sparkSession
    n_parts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    ranged = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        .transform(cut_lineage)  # pin pids: range sampling must not re-run per job
    )
    sizes = sorted(
        (r["_pid"], r["cnt"])
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid, cnt in sizes:
        offsets[pid] = acc
        acc += cnt
    offset_map = F.create_map(
        *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return ranged.withColumn(
        rank_col, (F.row_number().over(w) + offset_map[F.col("_pid")]).cast("long")
    ).drop("_pid")


def global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    alias: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed exact global running sum of `value_col` ordered by
    `order_cols`, WITHOUT a single-partition sort — same machinery as
    `global_rank`: range-repartition on the order keys, collect the tiny
    per-partition value sums, add each partition's predecessor offset to
    an intra-partition running sum. The cumulative value is INCLUSIVE of
    the current row; subtract `value_col` for the exclusive prefix."""
    spark = df.sparkSession
    n_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    ranged = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        .transform(cut_lineage)  # pin pids: range sampling must not re-run
    )
    sizes = sorted(
        (r["_pid"], r["s"])
        for r in ranged.groupBy("_pid").agg(F.sum(value_col).alias("s")).collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid, s in sizes:
        offsets[pid] = acc
        acc += s or 0
    offset_map = F.create_map(
        *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ranged.withColumn(
        alias,
        (F.sum(value_col).over(w) + offset_map[F.col("_pid")]).cast("long"),
    ).drop("_pid")


def grouped_exact_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[float],
    names: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact interpolated percentiles per group with BOUNDED memory.

    `F.percentile` (and every exact rank aggregate) buffers the whole
    group's values in the aggregation state — at 6M rows/group under a
    starved executor that is an OOM, not a spill (the r12 spill board's
    one ERROR, approx_percentile_prices' certificate columns). This
    operator computes the identical interpolated percentile
    (index = q*(n-1), linear between floor/ceil neighbors — the same
    definition as Spark `percentile` and DuckDB `quantile_cont`) from
    machinery where every step is external-sort/shuffle spillable and
    no task ever holds a group in memory:

    1. `global_rank` over (group, value): range-repartition spreads even
       a single huge group across partitions (no per-group
       concentration), external sort ranks it.
    2. per-group (min rank, count) — a group-cardinality-sized aggregate,
       broadcast back (groups are small-cardinality by contract: flags,
       statuses, segments).
    3. one hash aggregate with rank-targeted conditional max's picks the
       floor/ceil neighbor values for every q — constant state per
       group, never the values themselves.

    Ties: equal (group, value) rows get arbitrary relative rank, which
    is immaterial for percentiles (the neighbors are equal values).
    """
    ranked = global_rank(
        df.select(group_col, value_col),
        [group_col, value_col],
        rank_col="_grnk",
        num_partitions=num_partitions,
    )
    bounds = ranked.groupBy(group_col).agg(
        F.min("_grnk").alias("_lo"), F.count("*").alias("_n")
    )
    j = ranked.join(F.broadcast(bounds), group_col)
    rn = F.col("_grnk") - F.col("_lo")  # 0-based rank within the group
    aggs = []
    for q, name in zip(qs, names):
        pos = (F.col("_n") - 1) * F.lit(float(q))
        v_lo = F.max(F.when(rn == F.floor(pos), F.col(value_col)))
        v_hi = F.max(F.when(rn == F.ceil(pos), F.col(value_col)))
        frac = F.max(pos - F.floor(pos))
        aggs.append((v_lo + frac * (v_hi - v_lo)).alias(name))
    return j.groupBy(group_col).agg(*aggs)


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str,
    n_buckets: int = 8,
) -> DataFrame:
    """Exact equi-depth histogram: rank every row with `global_rank`,
    assign bucket = (rank-1)*n_buckets div N (integer math — no float
    boundary ambiguity), aggregate count/min/max/sum per bucket."""
    total = df.count()
    ranked = global_rank(df, [value_col, tiebreak_col])
    bucket = ((F.col("rnk") - 1) * n_buckets / F.lit(total)).cast("int")
    return (
        ranked.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.min(value_col), 2).alias("lo"),
            F.round(F.max(value_col), 2).alias("hi"),
            F.round(F.sum(value_col), 2).alias("value_sum"),
        )
        .orderBy("bucket")
    )


def edit_distance_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 20,
) -> DataFrame:
    """Near-duplicate pairs by Levenshtein distance <= max_dist, without
    the O(n²) cross join, via a lossless three-stage filter cascade:

    1. **Length blocking** (candidate generation): levenshtein(a,b) >=
       |len(a)-len(b)|, so candidates only need docs whose lengths fall
       in the same or adjacent length bucket of width max_dist (a 3-way
       bucket explode on one side of an equi join).
    2. **1-gram count filter** (per-candidate O(alphabet) reject): each
       edit changes at most one character count on each side, so
       levenshtein(a,b) >= L1(hist(a), hist(b)) / 2 — the q-gram count
       filter with q=1 (Gravano et al., VLDB'01). Histograms over a
       fixed [a-z + space] alphabet are built once per doc with
       `length - length(replace(...))` (pure codegen, no UDF) and
       compared with `zip_with`+`aggregate` — ~30 integer ops per pair
       vs ~k·len DP cells, rejecting the bulk of same-length-but-
       different-content candidates before any DP runs.
    3. **Banded levenshtein verify**: `levenshtein(a, b, threshold)`
       (Spark >= 3.5) runs Ukkonen's O(k·len) band instead of the full
       O(len²) matrix and early-outs to -1 above the threshold.

    At 100 TB the cascade bounds per-candidate cost at O(alphabet) for
    the overwhelming reject path; candidate *generation* remains length-
    blocked (dense length bands stay the scale risk — the full fix is
    PassJoin-style positional segment indexing, which this module trades
    off against zero-explosion candidate volume at current shapes).

    Output: (a, b, dist) with a < b, dist <= max_dist.
    """
    alphabet = [chr(c) for c in range(ord("a"), ord("z") + 1)] + [" "]
    hist = F.array(
        *[
            (F.length("txt") - F.length(F.replace(F.col("txt"), F.lit(ch))))
            for ch in alphabet
        ]
    )
    d = docs.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("txt"),
        F.length(text_col).alias("l"),
    ).withColumn("h", hist)
    b0 = F.floor(F.col("l") / max_dist).cast("int")
    left = d.select(F.col("id").alias("ida"), F.col("txt").alias("ta"),
                    F.col("l").alias("la"), F.col("h").alias("ha"),
                    b0.alias("bucket"))
    right = d.select(
        F.col("id").alias("idb"), F.col("txt").alias("tb"), F.col("l").alias("lb"),
        F.col("h").alias("hb"),
        F.explode(F.array(b0 - 1, b0, b0 + 1)).alias("bucket"),
    )
    l1 = F.aggregate(
        F.zip_with("ha", "hb", lambda x, y: F.abs(x - y)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        left.join(right, "bucket")
        .filter(
            (F.col("ida") < F.col("idb"))
            & (F.abs(F.col("la") - F.col("lb")) <= max_dist)
        )
        .filter(l1 <= 2 * max_dist)
        .select(
            F.col("ida").alias("a"),
            F.col("idb").alias("b"),
            F.levenshtein("ta", "tb", max_dist).alias("dist"),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .orderBy("a", "b")
    )


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Skyline (Pareto frontier) for two minimize-dimensions: rows not
    dominated by any other row (other.x <= x AND other.y <= y with at
    least one strict). Borzsony/Kossmann/Stocker (ICDE 2001) semantics;
    duplicate (x, y) points are mutually non-dominating and all kept.

    2-D skylines reduce to a sort + running-min: a point survives iff
    its y is strictly below the minimum y of every strictly-smaller x.
    Done distributed with the `global_cumsum` machinery — ONE
    aggregation to a per-distinct-x table (min y per x), a
    range-repartition of that table on x, an intra-partition running
    min, and a collected per-partition prefix (tiny: one value per
    partition) for the cross-partition offsets — no single-partition
    global sort anywhere; the fact table is touched by exactly one
    aggregate and one semi-join back."""
    spark = df.sparkSession
    n_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    g = df.groupBy(F.col(x_col).alias("_x")).agg(F.min(y_col).alias("_my"))
    ranged = (
        g.repartitionByRange(n_parts, F.col("_x"))
        .withColumn("_pid", F.spark_partition_id())
        .transform(cut_lineage)  # pin pids: range sampling must not re-run
    )
    mins = sorted(
        (r["_pid"], r["m"])
        for r in ranged.groupBy("_pid").agg(F.min("_my").alias("m")).collect()
    )
    offsets: dict[int, float] = {}
    acc = None
    for pid, m in mins:
        offsets[pid] = acc  # min over all PRECEDING partitions (exclusive)
        if m is not None:
            acc = m if acc is None else min(acc, m)
    present = [kv for kv in offsets.items() if kv[1] is not None]
    if present:
        offset_map = F.create_map(
            *[F.lit(x) for pid_off in present for x in pid_off]
        )
        cross_prev = offset_map[F.col("_pid")]
    else:
        cross_prev = F.lit(None).cast("double")
    w = (
        Window.partitionBy("_pid")
        .orderBy("_x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_min = F.least(F.min("_my").over(w), cross_prev)
    sky_keys = (
        ranged.withColumn("_prev", prev_min)
        .filter(F.col("_prev").isNull() | (F.col("_my") < F.col("_prev")))
        .select("_x", "_my")
    )
    return df.join(
        sky_keys,
        (F.col(x_col) == F.col("_x")) & (F.col(y_col) == F.col("_my")),
        "left_semi",
    )
