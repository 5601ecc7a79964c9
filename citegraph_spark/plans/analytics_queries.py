"""Advanced-analytics query registrations (round 3).

Surface gaps this module closes, each DuckDB-oracle-checked:

- time-RANGE window frames (trailing-interval moving average) — the
  frame type the reference never uses (its one window is rows-framed,
  Analytics.scala:22-25);
- robust/statistical aggregates: exact median, deterministic mode,
  population skewness, correlation — one pass per group;
- winsorization (percentile clipping), the standard outlier treatment
  before training-data averaging;
- higher-order array functions (transform/filter/aggregate/zip_with)
  executed JVM-side over embedding vectors — no Python boundary;
- JSON -> MAP parsing + map explode aggregation (events.props);
- a Python UDTF (Spark 4 user-defined *table* function) exploding
  documents into fixed-size token chunks — the one place a row-to-rows
  generator genuinely needs Python, batched per-row but Arrow-free;
- null-safe equi join (`<=>` / IS NOT DISTINCT FROM);
- landmark (sampled) closeness centrality via multi-source bounded BFS
  (operators/graph.py multi_source_bfs) — the scalable stand-in for
  all-pairs closeness, oracle-replayed as a recursive CTE.

Scale notes: every query here is a single scan + at most one shuffle,
except the BFS (k broadcast-join rounds, zero edge-side shuffle) and
the UDTF (per-row Python generator — documents only, and the chunker is
O(len(text)); at 100 TB this shape runs as mapInArrow/mapInPandas over
pre-repartitioned text, which `functions/multimodal.py` already does
for binary payloads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .entry_queries import register

# --------------------------------------------------------------------------
# Time-range window frame
# --------------------------------------------------------------------------


@register(
    "events_moving_avg_time",
    """
SELECT event_id,
       round(avg(value) OVER (
           PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 4) AS mav_1h
FROM events
ORDER BY event_id
""",
)
def events_moving_avg_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing one-hour moving average per user: a RANGE (time-interval)
    window frame, not a ROWS frame — frame membership is decided by
    timestamp distance, so irregular event spacing is handled exactly.
    One shuffle on user_id; the frame scan is a single ordered pass per
    partition (Spark keeps a sliding aggregate, not O(n^2) re-sums).
    Rows with equal timestamps share a frame in both engines (RANGE
    frame peers), so the oracle matches row-for-row. The frame orders by
    unix_micros — whole-second granularity would make distinct-but-same-
    second events frame peers and over-include gaps in (3600s, 3601s),
    diverging from the oracle's microsecond INTERVAL."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        ev.select("event_id", "user_id", "ts", "value")
        .withColumn("mav_1h", F.round(F.avg("value").over(w), 4))
        .select("event_id", "mav_1h")
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Statistical aggregates: median / mode / skewness / correlation
# --------------------------------------------------------------------------


@register(
    "stats_moments",
    """
WITH mu AS (
  SELECT l_returnflag, avg(l_extendedprice) AS m FROM lineitem GROUP BY 1
),
modes AS (
  SELECT l_returnflag, min(l_linestatus) FILTER (rk = 1) AS mode_status
  FROM (
    SELECT l_returnflag, l_linestatus,
           rank() OVER (PARTITION BY l_returnflag ORDER BY count(*) DESC) AS rk
    FROM lineitem GROUP BY 1, 2
  ) GROUP BY 1
)
SELECT l.l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS med_price,
       round(stddev_samp(l_extendedprice), 4) AS sd_price,
       round(avg((l_extendedprice-m)*(l_extendedprice-m)*(l_extendedprice-m))
             / pow(avg((l_extendedprice-m)*(l_extendedprice-m)), 1.5), 4) AS skew_price,
       round(corr(l_extendedprice, l_quantity), 4) AS corr_price_qty,
       any_value(mode_status) AS mode_status
FROM lineitem l
JOIN mu USING (l_returnflag)
JOIN modes USING (l_returnflag)
GROUP BY l.l_returnflag, m
ORDER BY l.l_returnflag
""",
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust/statistical aggregate surface in one grouped pass: exact
    interpolated median, deterministic mode (ties -> smallest value,
    `mode(col, true)`), population skewness, Pearson correlation. All
    JVM-side built-ins with map-side partial aggregation. The oracle
    replays Spark's population-moment skewness (m3/m2^1.5) from centered
    moments — DuckDB's own `skewness` is the bias-corrected sample
    statistic, a different estimator."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.median("l_extendedprice"), 4).alias("med_price"),
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
            F.round(F.skewness("l_extendedprice"), 4).alias("skew_price"),
            F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("corr_price_qty"),
            F.mode("l_linestatus", True).alias("mode_status"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Winsorized aggregation (percentile clipping)
# --------------------------------------------------------------------------


@register(
    "winsorized_prices",
    """
WITH q AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.01) AS p01,
         quantile_cont(l_extendedprice, 0.99) AS p99
  FROM lineitem GROUP BY 1
)
SELECT l.l_returnflag,
       round(avg(least(greatest(l_extendedprice, p01), p99)), 4) AS avg_winsorized,
       CAST(count(*) FILTER (l_extendedprice < p01) AS BIGINT) AS n_clipped_low,
       CAST(count(*) FILTER (l_extendedprice > p99) AS BIGINT) AS n_clipped_high
FROM lineitem l JOIN q USING (l_returnflag)
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
""",
)
def winsorized_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per group: exact p01/p99 via one grouped
    percentile pass, broadcast the (3-row) bounds table back onto the
    fact scan, clip with least/greatest, aggregate. Two scans of the
    fact (percentiles are not streamable exactly), one broadcast join,
    no extra shuffle — at 100 TB swap the exact percentile for
    `approx_percentile` and the plan shape is unchanged."""
    li = load_table(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.01)").alias("p01"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
    )
    clipped = li.join(F.broadcast(q), "l_returnflag").withColumn(
        "clip", F.least(F.greatest(F.col("l_extendedprice"), F.col("p01")), F.col("p99"))
    )
    return (
        clipped.groupBy("l_returnflag")
        .agg(
            F.round(F.avg("clip"), 4).alias("avg_winsorized"),
            F.count(F.when(F.col("l_extendedprice") < F.col("p01"), 1))
            .cast("bigint")
            .alias("n_clipped_low"),
            F.count(F.when(F.col("l_extendedprice") > F.col("p99"), 1))
            .cast("bigint")
            .alias("n_clipped_high"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Higher-order array functions over embeddings
# --------------------------------------------------------------------------


@register(
    "hof_array_stats",
    """
SELECT vec_id,
       round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))), 4) AS l2_norm,
       CAST(len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS INT) AS n_positive,
       round(list_dot_product(embedding::DOUBLE[], list_reverse(embedding::DOUBLE[])), 4) AS dot_reversed
FROM embeddings
ORDER BY vec_id
""",
)
def hof_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions executed entirely JVM-side — the
    fast path for per-vector math without any Python/Arrow boundary:
    `transform` (square), `aggregate` (fold-sum -> L2 norm), `filter` +
    `size` (positive-component count), `zip_with` (elementwise product
    against the reversed vector -> a dot product). Same accumulation
    order as DuckDB's list_* lambdas, so doubles match bitwise before
    rounding. Narrow plan: zero shuffles, pure projection."""
    em = load_table(spark, sf_dir, "embeddings")
    vec = F.transform("embedding", lambda x: x.cast("double"))
    dbl = F.lit(0.0)
    return em.select(
        "vec_id",
        F.round(F.sqrt(F.aggregate(vec, dbl, lambda a, x: a + x * x)), 4).alias("l2_norm"),
        F.size(F.filter(vec, lambda x: x > 0)).alias("n_positive"),
        F.round(
            F.aggregate(
                F.zip_with(vec, F.reverse(vec), lambda a, b: a * b),
                dbl,
                lambda a, x: a + x,
            ),
            4,
        ).alias("dot_reversed"),
    ).orderBy("vec_id")


# --------------------------------------------------------------------------
# JSON -> MAP parsing + map explode
# --------------------------------------------------------------------------


@register(
    "events_json_map_agg",
    """
WITH kv AS (SELECT unnest(json_keys(props)) AS key, props FROM events)
SELECT key,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract(props, '$.' || key) AS INT)) AS BIGINT) AS total
FROM kv GROUP BY key ORDER BY key
""",
)
def events_json_map_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured path: parse the JSON props column into a typed
    MAP<STRING,INT> (`from_json` — schema declared, not inferred), then
    `explode` the map to (key, value) rows and aggregate per key. All
    JVM-side (Jackson parse inside codegen); the explode is narrow, the
    only shuffle is the final tiny per-key aggregate."""
    ev = load_table(spark, sf_dir, "events")
    kv = ev.select(
        F.explode(F.from_json("props", "map<string,int>")).alias("key", "value")
    )
    return (
        kv.groupBy("key")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").cast("bigint").alias("total"),
        )
        .orderBy("key")
    )


# --------------------------------------------------------------------------
# Python UDTF: document -> fixed-size token chunks
# --------------------------------------------------------------------------


@register(
    "udtf_chunk_split",
    """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words,
         len(string_split(text, ' ')) AS n
  FROM documents WHERE doc_id < 500
),
ex AS (
  SELECT doc_id, words, n,
         unnest(range(0, CAST(ceil(n/10.0) AS BIGINT))) AS chunk_idx
  FROM w
)
SELECT doc_id,
       CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(least(10, n - chunk_idx*10) AS INT) AS chunk_len,
       words[chunk_idx*10 + 1] AS first_word
FROM ex ORDER BY doc_id, chunk_idx
""",
)
def udtf_chunk_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined TABLE function (Spark 4 Python UDTF): one document
    row in, one row per 10-token chunk out — the tokenize-and-chunk
    primitive of LLM pretraining pipelines, expressed as a lateral
    generator. The reference's closest analog is its row-expanding RDD
    flatMap (Analytics.scala:362-364); here it is a first-class SQL
    citizen usable as `LATERAL chunker(text)`. `useArrow=True` makes it
    an arrow-optimized UDTF (plans as ArrowEvalPythonUDTF — batched
    Arrow transfer, not row-at-a-time pickling; the repo's plan linter
    treats BatchEvalPython as a 100 TB-killer and this entry used to be
    its one genuine hit). Bounded to the first 500 docs as an API demo;
    bulk chunking at scale belongs to mapInPandas
    (functions/multimodal.py)."""
    from pyspark.sql.functions import lit, udtf

    @udtf(
        returnType="chunk_idx int, chunk_len int, first_word string",
        useArrow=True,
    )
    class Chunker:
        def eval(self, text: str, size: int):
            if text is None:  # NULL doc → no chunks (matches the oracle)
                return
            words = text.split(" ")
            for i in range(0, len(words), size):
                chunk = words[i : i + size]
                yield i // size, len(chunk), chunk[0]

    spark.udtf.register("chunker", Chunker)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    docs.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_len, c.first_word
        FROM udtf_docs d, LATERAL chunker(d.text, 10) c
        ORDER BY d.doc_id, c.chunk_idx
        """
    )


# --------------------------------------------------------------------------
# Null-safe equi join
# --------------------------------------------------------------------------


@register(
    "null_safe_join_status",
    """
WITH o AS (
  SELECT nullif(o_orderstatus, 'O') AS k, CAST(count(*) AS BIGINT) AS o_cnt
  FROM orders GROUP BY 1
),
l AS (
  SELECT nullif(l_linestatus, 'O') AS k, CAST(count(*) AS BIGINT) AS l_cnt
  FROM lineitem GROUP BY 1
)
SELECT o.k AS status_key, o_cnt, l_cnt
FROM o JOIN l ON o.k IS NOT DISTINCT FROM l.k
ORDER BY status_key NULLS FIRST
""",
)
def null_safe_join_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (`<=>`): NULL keys match each other instead
    of vanishing — the semantics gap between `=` and IS NOT DISTINCT
    FROM. Both sides are aggregated to a handful of rows first (the
    NULL bucket would be a guaranteed skew key on a raw join — at scale,
    null-safe joins want the aggregate-then-join shape used here), then
    joined with eqNullSafe."""
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("k"))
        .agg(F.count("*").alias("o_cnt"))
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.nullif(F.col("l_linestatus"), F.lit("O")).alias("k"))
        .agg(F.count("*").alias("l_cnt"))
    )
    return (
        o.join(li, o["k"].eqNullSafe(li["k"]))
        .select(o["k"].alias("status_key"), "o_cnt", "l_cnt")
        .orderBy(F.col("status_key").asc_nulls_first())
    )


# --------------------------------------------------------------------------
# Landmark closeness centrality (multi-source bounded BFS)
# --------------------------------------------------------------------------


@register(
    "graph_closeness_sampled",
    """
WITH RECURSIVE cit AS (
  SELECT CAST(l_orderkey AS INT) AS f, CAST(l_partkey AS INT) AS t FROM lineitem
),
und AS (SELECT f AS s, t AS d FROM cit UNION SELECT t, f FROM cit),
srcs AS (SELECT DISTINCT s FROM und ORDER BY s LIMIT 4),
bfs AS (
  SELECT 0 AS iter, s AS src_id, s AS node, 0 AS dist FROM srcs
  UNION ALL
  SELECT bfs.iter + 1, bfs.src_id, und.d, MIN(bfs.dist + 1)
  FROM bfs JOIN und ON bfs.node = und.s
  WHERE bfs.iter < 4
  GROUP BY 1, 2, 3
),
best AS (SELECT src_id, node, MIN(dist) AS dist FROM bfs GROUP BY 1, 2)
SELECT src_id,
       CAST(count(*) AS BIGINT) AS reached,
       CAST(sum(dist) AS BIGINT) AS total_dist,
       round(count(*) * 1.0 / sum(dist), 6) AS closeness,
       CAST(max(dist) AS INT) AS eccentricity
FROM best WHERE dist > 0
GROUP BY src_id ORDER BY src_id
""",
)
def graph_closeness_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark closeness centrality: exact hop distances from 4
    deterministic landmark nodes (smallest ids) within 4 hops via
    multi-source BFS (operators/graph.py multi_source_bfs — broadcast
    relaxation rounds, zero edge-side shuffle per round), then
    closeness = reached/total_dist per landmark. The scalable form of
    closeness at 100 TB is exactly this: k landmarks, not all-pairs.
    Oracle replays the bounded BFS as a recursive CTE with per-iteration
    min-grouping."""
    from ..operators.graph import multi_source_bfs

    cit = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("int").alias("from"),
        F.col("l_partkey").cast("int").alias("to"),
    )
    und = (
        cit.select(F.col("from").alias("src"), F.col("to").alias("dst"))
        .unionByName(cit.select(F.col("to").alias("src"), F.col("from").alias("dst")))
        .distinct()
    )
    sources = [r[0] for r in und.select("src").distinct().orderBy("src").limit(4).collect()]
    dist = multi_source_bfs(und, sources, rounds=4)
    from ..operators.graph import closeness_from_landmarks

    return (
        closeness_from_landmarks(dist)
        .select(
            F.col("src_id").cast("int").alias("src_id"),
            F.col("reached").cast("bigint").alias("reached"),
            "total_dist",
            "closeness",
            "eccentricity",
        )
        .orderBy("src_id")
    )


# --------------------------------------------------------------------------
# Iterative BPE training (driver loop, weighted vocabulary)
# --------------------------------------------------------------------------


from .bpe_oracle_sql import bpe_oracle_sql  # noqa: E402 — used below


@register("bpe_train_merges", bpe_oracle_sql(n_merges=8))
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE training loop, 8 merges (functions/text.py bpe_train):
    corpus -> weighted vocab (one aggregate), then 8 rounds of
    pair-count + argmax + JVM-side fold merge over the tiny vocab
    table. Fully hash-oracled: the loop is deterministic (integer
    counts, lexicographic tie-break, greedy fold), so the DuckDB oracle
    unrolls all 8 rounds in one statement (plans/bpe_oracle_sql.py) —
    the fold re-expressed as gaps-and-islands over candidate positions —
    and must learn the IDENTICAL merge table. The equivalence test vs a
    pure-Python BPE reference lives in tests/test_analytics_queries.py.
    Output: (step, left, right, cnt), the learned merge table."""
    from ..functions import text
    from ..functions.text import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(text.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    merges = bpe_train(vocab, n_merges=8)
    return spark.createDataFrame(
        merges, "step int, left string, right string, cnt bigint"
    )


# --------------------------------------------------------------------------
# End-to-end pretraining pipeline composite
# --------------------------------------------------------------------------


@register(
    "pipeline_end_to_end",
    """
WITH toks AS (
  SELECT doc_id, lang, text, n_chars,
         len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '')) AS n_tokens
  FROM documents
),
filtered AS (
  SELECT * FROM toks
  WHERE n_tokens BETWEEN 5 AND 100000 AND n_chars >= 20
),
dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM filtered
  ) WHERE rn = 1
),
split AS (
  SELECT lang,
         CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8))::BIGINT % 100 < 90 THEN 'train'
              WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 8))::BIGINT % 100 < 95 THEN 'val'
              ELSE 'test' END AS split
  FROM dedup
)
SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs
FROM split GROUP BY lang, split ORDER BY lang, split
""",
)
def pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pretraining pipeline in one plan: token-count
    quality gate -> exact near-dup removal (first doc per md5(text)
    wins) -> deterministic md5 train/val/test split -> per-(lang,split)
    counts. Every stage is a pure function of the row (the only
    shuffles: one for the dedup window, one for the final tiny
    aggregate), so the whole pipeline is reproducible across engines,
    partitionings, and retries — the property that matters when a 100 TB
    corpus is re-sharded between runs."""
    docs = load_table(spark, sf_dir, "documents")
    from ..functions import text

    toks = docs.withColumn("n_tokens", F.size(text.tokens(F.col("text"))))
    filtered = toks.filter(
        (F.col("n_tokens").between(5, 100000)) & (F.col("n_chars") >= 20)
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    dedup = (
        filtered.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    )
    bucket = (
        F.conv(F.substring(F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit("split"))), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    split = dedup.withColumn(
        "split",
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test"),
    )
    return (
        split.groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "split")
    )


# --------------------------------------------------------------------------
# File lineage via metadata columns
# --------------------------------------------------------------------------


@register(
    "file_lineage_counts",
    """
SELECT 'lineitem.parquet' AS file_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
FROM lineitem
GROUP BY 1 ORDER BY 1
""",
)
def file_lineage_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level lineage via the hidden `_metadata` column: rows per
    source file (+ per-file distinct order count). At 100 TB this is the
    debugging query — which input file produced these rows — and it
    costs nothing extra: `_metadata.file_name` is populated by the scan
    itself, no join against a listing. (The oracle can't see filenames
    through its pre-registered views, so it pins the testdata invariant —
    one file per table, named `lineitem.parquet` at every SF — instead of
    hardcoding one SF's absolute path, which broke gate runs at any other
    sf_dir.)"""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.select(F.col("_metadata.file_name").alias("file_name"), "l_orderkey")
        .groupBy("file_name")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
        .orderBy("file_name")
    )


@register(
    "events_anomaly_iqr",
    """
WITH q AS (
  SELECT event_type,
         quantile_cont("value", 0.25) AS q1,
         quantile_cont("value", 0.75) AS q3
  FROM events GROUP BY 1
)
SELECT e.event_id, e.event_type, round(e."value", 4) AS value,
       CASE WHEN e."value" < q1 - 1.5 * (q3 - q1) THEN 'low' ELSE 'high' END
         AS side
FROM events e JOIN q USING (event_type)
WHERE e."value" < q1 - 1.5 * (q3 - q1) OR e."value" > q3 + 1.5 * (q3 - q1)
ORDER BY e.event_id
""",
)
def events_anomaly_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group IQR (Tukey-fence) outlier detection: exact quartiles in
    one grouped percentile pass, the tiny per-type bounds table broadcast
    back onto the fact scan, outliers filtered with pure comparisons —
    same two-scan + broadcast shape as winsorized_prices; at 100 TB swap
    `percentile` for `approx_percentile` without changing the plan."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    lo, hi = F.col("q1") - 1.5 * iqr, F.col("q3") + 1.5 * iqr
    return (
        ev.join(F.broadcast(q), "event_type")
        .filter((F.col("value") < lo) | (F.col("value") > hi))
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.when(F.col("value") < lo, "low").otherwise("high").alias("side"),
        )
        .orderBy("event_id")
    )


@register(
    "dq_benford_first_digit",
    """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT)
           AS digit
  FROM orders WHERE o_totalprice >= 1
)
SELECT digit,
       CAST(count(*) AS BIGINT) AS n,
       round(count(*) * 1.0 / (SELECT count(*) FROM d), 6) AS observed,
       round(log10(1.0 + 1.0 / digit), 6) AS benford
FROM d GROUP BY digit ORDER BY digit
""",
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the classic
    fraud/synthetic-data screen: observed leading-digit frequencies next
    to the log10(1 + 1/d) expectation. One aggregation over an
    integer-truncated leading digit plus a broadcast scalar total; the
    comparison column is a constant expression. (The synthetic TPC-H
    uniform prices deliberately FAIL Benford — the point of the check is
    the comparison, not conformance.)"""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        # floor() explicitly: DuckDB CAST(DOUBLE AS BIGINT) rounds,
        # Spark truncates — floor makes both engines agree
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        ).cast("int").alias("digit")
    )
    total = d.count()
    return (
        d.groupBy("digit")
        .agg(F.count("*").alias("n"))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.lit(float(total)), 6).alias("observed"),
            F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias("benford"),
        )
        .orderBy("digit")
    )
