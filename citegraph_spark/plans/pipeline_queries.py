"""Training-data-pipeline query registrations.

Operators a large-scale pretraining pipeline needs beyond the reference's
surface (mandated by SURVEY.md §7.5 "beyond-reference" scope): dataset
splitting, stratified sampling, corpus n-gram statistics, TF-IDF, and
composite quality filtering (Gopher-style rules, Rae et al. 2021 —
public paper). Plus two SQL-surface gaps: GROUPING SETS and correlated
scalar-subquery semantics.

Determinism rules (everything here must hash-match a DuckDB oracle):
- sampling/splitting uses md5-derived buckets, NOT rand() — the split is
  a pure function of the key, reproducible across engines and runs, and
  at 100 TB it is also the only splitter that stays stable under
  re-partitioning and retries.
- md5 is the one hash both engines share; `conv(substring(md5(x),1,8),
  16,10)` == DuckDB `('0x' || substring(md5(x),1,8))::BIGINT`.

Scale notes: split/sample/filter are narrow (pipeline into the scan,
zero shuffle before the final tiny aggregate). N-gram/TF-IDF explode to
one row per token — the heavy-but-unavoidable shape — then aggregate
with map-side partial combine; top-k is a single reduce of per-partition
heaps (TakeOrderedAndProject), never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import clustering, text
from ..sources.tables import load_table
from .entry_queries import register
from .money import disc_price, money, money_sum_pair

_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"
_STOPWORDS = "('the','a','of','and','to','in','is','it')"


def _bucket(col) -> F.Column:
    """Deterministic 0-99 bucket from md5 of the key (engine-portable)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )


_BUCKET_SQL = "(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100)"


@register(
    "split_train_test",
    f"""
WITH b AS (SELECT doc_id, n_chars, {_BUCKET_SQL} AS bucket FROM documents)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'validation'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM b GROUP BY split ORDER BY split
""",
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/validation/test split of `documents`
    keyed on md5(doc_id) buckets. A pure function of the key: stable
    under retries, re-partitioning, and incremental appends — the only
    splitter that works at 100 TB (rand()-based splits are none of
    those). Narrow until the 3-row aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    b = docs.select("doc_id", "n_chars", _bucket(F.col("doc_id")).alias("bucket"))
    split = (
        F.when(F.col("bucket") < 80, "train")
        .when(F.col("bucket") < 90, "validation")
        .otherwise("test")
    )
    return (
        b.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split")
    )


@register(
    "sample_stratified",
    f"""
WITH b AS (SELECT doc_id, lang, n_chars, {_BUCKET_SQL} AS bucket FROM documents),
     kept AS (
       SELECT * FROM b
       WHERE bucket < CASE WHEN lang = 'en' THEN 100 ELSE 25 END
     )
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(n_chars) AS BIGINT) AS kept_chars
FROM kept GROUP BY lang ORDER BY lang
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling by language: keep all English, a
    deterministic 25 % hash-sample of everything else (the standard
    data-mixing move when rebalancing a pretraining corpus). Same
    md5-bucket mechanism as split_train_test, so the sample is
    reproducible and append-stable; fully narrow before the per-lang
    aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    b = docs.select(
        "doc_id", "lang", "n_chars", _bucket(F.col("doc_id")).alias("bucket")
    )
    rate = F.when(F.col("lang") == "en", 100).otherwise(25)
    return (
        b.filter(F.col("bucket") < rate)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
        )
        .orderBy("lang")
    )


@register(
    "grouping_sets_revenue",
    """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(16,4))), 2) AS DOUBLE) AS revenue,
       CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(16,4))), 2) * 100 AS BIGINT) AS revenue_cents
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY gid, returnflag, linestatus
""",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((flag,status),(flag),()) with grouping_id — the
    general form behind rollup/cube (§2.4 A1-A3 generalized). One
    shuffle; Spark expands the sets map-side (Expand operator) so the
    aggregate still gets partial combine."""
    li = load_table(spark, sf_dir, "lineitem")
    gid = (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).cast("int")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            gid.alias("gid"),
            F.count("*").alias("n_items"),
            *money_sum_pair(disc_price(), "revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "n_items",
            "revenue",
            "revenue_cents",
        )
        .orderBy("gid", "returnflag", "linestatus")
    )


@register(
    "orders_above_customer_avg",
    """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_above,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_above,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) * 100 AS BIGINT) AS sum_above_cents
FROM orders o
WHERE o_totalprice > (SELECT avg(i.o_totalprice)
                      FROM orders i WHERE i.o_custkey = o.o_custkey)
GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-scalar-subquery semantics ("rows above their group's
    average"), decorrelated the way Catalyst itself would: a window
    average over the correlation key instead of a per-row subquery —
    one shuffle on o_custkey, no self-join. The oracle states it as the
    correlated subquery, so the two formulations check each other."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        orders.withColumn("cust_avg", F.avg("o_totalprice").over(w))
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_above"),
            *money_sum_pair(money("o_totalprice"), "sum_above"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "ngram_top_bigrams",
    f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
     bi AS (
       SELECT doc_id,
              unnest(CASE WHEN len(toks) >= 2 THEN
                       list_transform(range(1, len(toks)),
                                      i -> toks[i] || ' ' || toks[i + 1])
                     ELSE []::VARCHAR[] END) AS bigram
       FROM t
     )
SELECT bigram,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM bi GROUP BY bigram
ORDER BY n_occurrences DESC, bigram LIMIT 20
""",
)
def ngram_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-20 bigrams with document frequency — the n-gram
    statistics pass of a corpus-analysis pipeline. Explode to one row
    per bigram (unavoidable), hash-aggregate with map-side combine,
    then TakeOrderedAndProject for the top-k (per-partition heaps, no
    global sort). Ties broken on the bigram for determinism."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", text.tokens(F.col("text")).alias("toks"))
    # bigrams in their own projection: HOF lambdas skip codegen/CSE
    bi = t.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("toks", i),
                        F.element_at("toks", i + 1),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram"),
    )
    return (
        bi.groupBy("bigram")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), "bigram")
        .limit(20)
    )


@register(
    "tfidf_top_terms",
    f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
     n AS (SELECT count(*) AS n_total FROM t),
     tf AS (SELECT doc_id, unnest(toks) AS term FROM t),
     stats AS (
       SELECT term,
              CAST(count(*) AS BIGINT) AS tf_total,
              CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       FROM tf GROUP BY term
     )
SELECT term, tf_total, df,
       round(tf_total * ln(n_total * 1.0 / df), 6) AS tfidf
FROM stats CROSS JOIN n
WHERE df < n_total
ORDER BY tfidf DESC, term LIMIT 25
""",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus TF-IDF: term frequency × ln(N/df), top 25 discriminative
    terms (stop-everywhere terms with df = N excluded). The corpus size
    N is a 1-row cross join — broadcast for free. One explode + one
    hash aggregate + top-k heap; no full sort, no second pass over the
    corpus."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", text.tokens(F.col("text")).alias("toks"))
    n_total = t.select(F.count("*").alias("n_total"))
    tf = t.select("doc_id", F.explode("toks").alias("term"))
    stats = tf.groupBy("term").agg(
        F.count("*").alias("tf_total"),
        F.countDistinct("doc_id").alias("df"),
    )
    return (
        stats.crossJoin(F.broadcast(n_total))
        .filter(F.col("df") < F.col("n_total"))
        .select(
            "term",
            "tf_total",
            "df",
            F.round(
                F.col("tf_total") * F.log(F.col("n_total") / F.col("df")), 6
            ).alias("tfidf"),
        )
        .orderBy(F.desc("tfidf"), "term")
        .limit(25)
    )


@register(
    "gopher_quality_filter",
    f"""
WITH t AS (SELECT doc_id, source, text, {_TOKS} AS toks FROM documents),
     m AS (
       SELECT doc_id, source,
              len(toks) AS n_tokens,
              CASE WHEN len(toks) = 0 THEN 0.0
                   ELSE list_sum(list_transform(toks, x -> length(x))) * 1.0
                        / len(toks) END AS mean_word_len,
              CASE WHEN length(text) = 0 THEN 0.0
                   ELSE length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0
                        / length(text) END AS punct_ratio,
              len(list_filter(toks, x -> x IN {_STOPWORDS})) AS n_stop
       FROM t
     ),
     flagged AS (
       SELECT source,
              (n_tokens BETWEEN 5 AND 1000
               AND mean_word_len BETWEEN 2.0 AND 12.0
               AND punct_ratio < 0.2
               AND n_stop >= 1) AS keep
       FROM m
     )
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(avg(CASE WHEN keep THEN 1.0 ELSE 0.0 END), 6) AS keep_rate
FROM flagged GROUP BY source ORDER BY source
""",
)
def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite pretraining quality filter in the style of Gopher's
    rules (Rae et al. 2021, §A1.1 — public paper): token-count bounds,
    mean-word-length bounds, punctuation-ratio cap, >=1 stopword.
    Reports per-source keep rates. All rules are narrow column
    expressions fused into the scan; only the per-source rollup
    shuffles (a handful of groups)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "source", "text", text.tokens(F.col("text")).alias("toks")
    )
    m = t.select(
        "source",
        F.size("toks").alias("n_tokens"),
        F.when(F.size("toks") == 0, F.lit(0.0))
        .otherwise(
            F.aggregate(
                F.transform(F.col("toks"), lambda x: F.length(x)),
                F.lit(0),
                lambda acc, x: acc + x,
            )
            / F.size("toks")
        )
        .alias("mean_word_len"),
        F.when(F.length("text") == 0, F.lit(0.0))
        .otherwise(text.punct_count(F.col("text")) / F.length("text"))
        .alias("punct_ratio"),
        text.stopword_count(F.col("toks")).alias("n_stop"),
    )
    keep = (
        F.col("n_tokens").between(5, 1000)
        & F.col("mean_word_len").between(2.0, 12.0)
        & (F.col("punct_ratio") < 0.2)
        & (F.col("n_stop") >= 1)
    )
    return (
        m.select("source", keep.alias("keep"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
            F.round(F.avg(F.when(F.col("keep"), 1.0).otherwise(0.0)), 6).alias(
                "keep_rate"
            ),
        )
        .orderBy("source")
    )


@register(
    "kmeans_embeddings",
    """
SELECT CAST(count(*) AS BIGINT) AS n_points,
       TRUE AS sizes_conserved, TRUE AS cells_within_k,
       TRUE AS inertia_below_total_ss
FROM embeddings
""",
)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means (Lloyd's via mapInPandas partial sums) over
    the embeddings table, scalarized to a driver-hashable certificate
    (was rows-only through r6: raw cluster sizes/inertia depend on
    float-summation order, which no SQL replay reproduces): every point
    lands in exactly one of <= k clusters (sizes sum back to the table
    count), and the fitted within-cluster SSE is strictly below the
    total SSE around the global mean — the k=1 solution every correct
    k>=2 fit must beat (W = T - B with B > 0; measured ratio 0.916 at
    sweep scale). Complements kmeans_quality_gate, which pins inertia
    DESCENT across iterations; this entry pins the variance
    decomposition of the final fit. Raw per-cluster summaries remain
    available via `functions.clustering.kmeans_summary`."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    summary = clustering.kmeans_summary(emb, k=10, max_iter=8)
    s = summary.agg(
        F.count("*").alias("n_cells"),
        F.sum("n_vecs").alias("n_assigned"),
        F.sum("inertia").alias("inertia"),
    ).first()
    # total SSE around the global mean, from per-dimension moments:
    # sum((x - mean)^2) = sum(x^2) - (sum x)^2 / n per dimension
    mom = (
        emb.select(F.posexplode("embedding").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("s"), F.sum(F.col("v") * F.col("v")).alias("ss"))
        .agg(F.sum(F.col("ss") - F.col("s") * F.col("s") / n).alias("total_ss"))
        .first()
    )
    return spark.createDataFrame(
        [
            (
                n,
                s["n_assigned"] == n,
                1 <= s["n_cells"] <= 10,
                float(s["inertia"]) < float(mom["total_ss"]),
            )
        ],
        "n_points bigint, sizes_conserved boolean, cells_within_k boolean, "
        "inertia_below_total_ss boolean",
    )


@register(
    "similarity_ivf_trained",
    """
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       TRUE AS k_rows_each, TRUE AS no_self_neighbor,
       TRUE AS cosine_bounded, TRUE AS recall_ok
FROM embeddings
""",
)
def similarity_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k with a k-means-trained coarse quantizer (the scale path
    similarity.py's docstring promises), scalarized to the same
    driver-hashable certificate shape as similarity_pq (was rows-only
    through r6: trained-centroid cell contents are not SQL-replayable):
    exactly k neighbors per query, never itself, cosines bounded, and
    exact top-1 recall@3 >= 0.3 over _ann_certificate's deterministic
    128-query sample (the unit-test floor on this isotropic corpus,
    where full-corpus recall measures 0.44-0.45 at sweep scale). Raw
    neighbor lists remain available via `functions.similarity.ivf_topk`."""
    from ..functions import similarity
    from .text_queries import _ann_certificate

    emb = load_table(spark, sf_dir, "embeddings")
    cents, _ = clustering.kmeans_fit(emb, k=16, max_iter=4)
    ann = similarity.ivf_topk(emb, k=3, n_cells=16, n_probe=2, centroids=cents)
    return _ann_certificate(spark, emb, ann, k=3, recall_floor=0.3)


@register(
    "dq_orders_checks",
    """
SELECT 'orderdate_not_null' AS rule,
       CAST(count(*) FILTER (WHERE o_orderdate IS NULL) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'totalprice_positive',
       CAST(count(*) FILTER (WHERE o_totalprice IS NULL OR o_totalprice <= 0) AS BIGINT)
FROM orders
UNION ALL
SELECT 'priority_in_domain',
       CAST(count(*) FILTER (WHERE o_orderpriority IS NULL OR o_orderpriority NOT IN
         ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')) AS BIGINT)
FROM orders
UNION ALL
SELECT 'custkey_references_customer',
       CAST(count(*) AS BIGINT)
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_custkey IS NULL
ORDER BY rule
""",
)
def dq_orders_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate over orders: three row-predicate rules evaluated
    in ONE aggregate pass (functions/dataquality.py) plus a referential
    orphan check against customer via broadcast LEFT ANTI join. Output
    (rule, n_violations) — all zeros on the clean test corpus; the
    operator is the point, the driver hash pins the contract."""
    from ..functions.dataquality import dq_referential_violations, dq_row_violations

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rows = dq_row_violations(
        o,
        {
            "orderdate_not_null": F.col("o_orderdate").isNotNull(),
            "totalprice_positive": F.col("o_totalprice") > 0,
            "priority_in_domain": F.col("o_orderpriority").isin(
                "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
            ),
        },
    )
    ref = dq_referential_violations(
        o, "o_custkey", c, "c_custkey", "custkey_references_customer"
    )
    return rows.unionByName(ref).orderBy("rule")


_BIGRAMS = (
    "CASE WHEN len(toks) >= 2 THEN "
    "list_transform(range(1, len(toks)), "
    "i -> array_to_string(list_slice(toks, i, i + 1), ' ')) "
    "ELSE []::VARCHAR[] END"
)

_SHINGLES8 = (
    "list_distinct(CASE WHEN len(toks) >= 8 THEN "
    "list_transform(range(1, len(toks) - 6), "
    "i -> array_to_string(list_slice(toks, i, i + 7), ' ')) "
    "ELSE []::VARCHAR[] END)"
)


@register(
    "doc_repetition_signals",
    f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
sig AS (
  SELECT doc_id,
         len(toks) AS n_toks,
         len(list_distinct(toks)) AS n_types,
         list_max(list_transform(list_distinct(toks),
                  w -> len(list_filter(toks, t -> t = w)))) AS top_word,
         {_BIGRAMS} AS bg
  FROM t WHERE len(toks) > 0
),
sig2 AS (
  SELECT doc_id, n_toks, n_types, top_word,
         len(bg) AS n_bg,
         CASE WHEN len(bg) > 0 THEN
           list_max(list_transform(list_distinct(bg),
                    w -> len(list_filter(bg, t -> t = w))))
         ELSE 0 END AS top_bigram
  FROM sig
)
SELECT doc_id,
       CAST(n_toks AS INT) AS n_toks,
       round(n_types * 1.0 / n_toks, 6) AS type_token_ratio,
       round(top_word * 1.0 / n_toks, 6) AS top_word_frac,
       round(CASE WHEN n_bg > 0 THEN top_bigram * 1.0 / n_bg ELSE 0.0 END, 6)
         AS top_bigram_frac,
       (top_word * 1.0 / n_toks > 0.1
        OR (n_bg > 0 AND top_bigram * 1.0 / n_bg > 0.18)) AS is_repetitive
FROM sig2 ORDER BY doc_id
""",
)
def doc_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition quality signals (Gopher §A1.1-style
    repetition rules, Rae et al. 2021): type-token ratio, most-frequent-
    word fraction, most-frequent-bigram fraction, and a composite
    repetitive flag. Computed entirely with ARRAY expressions (distinct×n
    compares per row, JVM-side) — a narrow map with NO shuffle and no
    explode, unlike the groupBy-per-word formulation whose shuffle volume
    is the token count of the corpus; at 100 TB that difference is the
    whole job."""
    docs = load_table(spark, sf_dir, "documents")
    toks = text.tokens(F.col("text"))
    # persist = materialization barrier: the signal expressions reference
    # the token array ~6x (incl. inside nested transform/filter lambdas);
    # collapsed back into the split expression that is O(|toks|) regex
    # runs per reference and per lambda element
    t = (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") > 0)
        .persist()
    )
    # most-frequent-element count in O(n log n): sort, then one aggregate
    # pass tracking the current and best run length — vs the naive
    # distinct×n compare matrix (O(n²) per doc; measured 100x more JVM
    # compares at 300-token docs)
    top_of = lambda arr: F.aggregate(
        F.array_sort(arr),
        F.struct(
            F.lit("\u0000").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(1).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(1),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    bigrams = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sig = t.select(
        "doc_id",
        F.size("toks").alias("n_toks"),
        F.size(F.array_distinct("toks")).alias("n_types"),
        top_of(F.col("toks")).alias("top_word"),
        bigrams.alias("bg"),
    ).select(
        "doc_id",
        "n_toks",
        "n_types",
        "top_word",
        F.size("bg").alias("n_bg"),
        F.when(F.size("bg") > 0, top_of(F.col("bg"))).otherwise(0).alias("top_bigram"),
    )
    twf = F.col("top_word") / F.col("n_toks")
    tbf = F.when(F.col("n_bg") > 0, F.col("top_bigram") / F.col("n_bg")).otherwise(0.0)
    return sig.select(
        "doc_id",
        F.col("n_toks").cast("int").alias("n_toks"),
        F.round(F.col("n_types") / F.col("n_toks"), 6).alias("type_token_ratio"),
        F.round(twf, 6).alias("top_word_frac"),
        F.round(tbf, 6).alias("top_bigram_frac"),
        ((twf > 0.1) | ((F.col("n_bg") > 0) & (tbf > 0.18))).alias("is_repetitive"),
    ).orderBy("doc_id")


@register(
    "sample_domain_mix",
    f"""
WITH chars AS (SELECT source, CAST(sum(n_chars) AS DOUBLE) AS cs
               FROM documents GROUP BY source),
mn AS (SELECT min(cs) AS m FROM chars),
rates AS (SELECT source, CAST(floor(100.0 * mn.m / cs) AS INT) AS rate_pct
          FROM chars, mn),
b AS (SELECT doc_id, source, n_chars, {_BUCKET_SQL} AS bucket FROM documents),
kept AS (
  SELECT b.source, r.rate_pct, b.n_chars
  FROM b JOIN rates r ON b.source = r.source
  WHERE b.bucket < r.rate_pct
)
SELECT source, rate_pct,
       CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(n_chars) AS BIGINT) AS kept_chars
FROM kept GROUP BY source, rate_pct ORDER BY source
""",
)
def sample_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mix rebalancing: compute per-source keep-rates FROM the
    data (equalize char mass to the smallest source — the generic form
    of 'resample sources to target weights'), then hash-sample each
    source at its computed rate. Two tiny aggregates produce the rate
    table (broadcast back); the corpus pass stays narrow — md5-bucket
    sampling is a pure key function, so the kept set is deterministic,
    append-stable, and identical under repartitioning. Unlike
    sample_stratified (fixed rates), the rates here are data-derived —
    the two-pass compute-then-apply pipeline every mixing job needs."""
    docs = load_table(spark, sf_dir, "documents")
    chars = docs.groupBy("source").agg(
        F.sum("n_chars").cast("double").alias("cs")
    )
    mn = chars.agg(F.min("cs").alias("m"))
    rates = chars.join(F.broadcast(mn)).select(
        "source",
        F.floor(F.lit(100.0) * F.col("m") / F.col("cs")).cast("int").alias("rate_pct"),
    )
    b = docs.select(
        "doc_id", "source", "n_chars", _bucket(F.col("doc_id")).alias("bucket")
    )
    return (
        b.join(F.broadcast(rates), "source")
        .filter(F.col("bucket") < F.col("rate_pct"))
        .groupBy("source", "rate_pct")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
        )
        .orderBy("source")
    )


@register(
    "contamination_check",
    f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
sh AS (SELECT doc_id, {_SHINGLES8} AS sh FROM t),
bench AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id < 10),
corpus AS (SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id >= 10),
hits AS (
  SELECT c.doc_id, count(*) AS n_hits
  FROM corpus c JOIN bench b ON c.s = b.s
  GROUP BY c.doc_id
),
sizes AS (SELECT doc_id, len(sh) AS n_shingles FROM sh WHERE doc_id >= 10)
SELECT h.doc_id, CAST(h.n_hits AS BIGINT) AS n_hits,
       CAST(s.n_shingles AS INT) AS n_shingles,
       round(h.n_hits * 1.0 / s.n_shingles, 6) AS hit_frac
FROM hits h JOIN sizes s ON h.doc_id = s.doc_id
WHERE h.n_hits >= 5
ORDER BY h.doc_id
""",
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan (the n-gram-overlap decontamination
    step of every pretraining pipeline, e.g. GPT-3 appendix C / PaLM §6):
    docs sharing >= 5 distinct 8-gram shingles with a benchmark set
    (stand-in: doc_id < 10) are flagged with their hit count and hit
    fraction. The benchmark's shingle set is small by construction, so
    the probe is a BROADCAST semi-structured join against the corpus
    posting list — the corpus is scanned once, never shuffled on the
    shingle key (at 100 TB the posting-list self-join this replaces
    would dwarf the job)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = text.tokens(F.col("text"))
    sh8 = F.when(
        F.size("toks") >= 8,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 7),
                lambda i: F.concat_ws(" ", F.slice(F.col("toks"), i, 8)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    # persist = materialization barrier: CollapseProject would re-inline
    # the token split into the 8-gram transform (per-element re-split),
    # and `sh` feeds BOTH the bench-set and the corpus branch
    sh = (
        docs.select("doc_id", toks.alias("toks"))
        .select("doc_id", sh8.alias("sh"))
        .persist()
    )
    bench = (
        sh.filter(F.col("doc_id") < 10)
        .select(F.explode("sh").alias("s"))
        .distinct()
    )
    corpus = sh.filter(F.col("doc_id") >= 10)
    # n_shingles rides the posting rows (one int per row) so the corpus
    # shingling runs ONCE — no second evaluation + join-back for sizes
    posting = corpus.select(
        "doc_id", F.size("sh").alias("n_shingles"), F.explode("sh").alias("s")
    )
    hits_df = (
        posting.join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"), F.first("n_shingles").alias("n_shingles"))
    )
    return (
        hits_df.filter(F.col("n_hits") >= 5)
        .select(
            "doc_id",
            F.col("n_hits").cast("bigint").alias("n_hits"),
            F.col("n_shingles").cast("int").alias("n_shingles"),
            F.round(F.col("n_hits") / F.col("n_shingles"), 6).alias("hit_frac"),
        )
        .orderBy("doc_id")
    )


@register(
    "sample_weighted",
    """
WITH u AS (SELECT o_orderkey, o_totalprice,
                  ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                    / 4294967296.0 AS unif
           FROM orders),
     k AS (SELECT o_orderkey, o_totalprice,
                  -ln(unif) / o_totalprice AS key
           FROM u WHERE unif > 0)
SELECT o_orderkey, o_totalprice, round(key * 1e6, 6) AS priority_ppm
FROM k ORDER BY key, o_orderkey LIMIT 50
""",
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, Efraimidis-Spirakis A-ES
    form: priority = -ln(u)/w with u a DETERMINISTIC md5-derived uniform
    per key — the 50 smallest priorities are a weight-proportional sample
    that is reproducible, append-stable, and needs only a top-k
    (TakeOrderedAndProject), never a global sort. rand()-based weighted
    sampling has none of those properties at 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    unif = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
        / F.lit(4294967296.0)
    )
    k = (
        orders.select("o_orderkey", "o_totalprice", unif.alias("unif"))
        .filter(F.col("unif") > 0)
        .select(
            "o_orderkey",
            "o_totalprice",
            (-F.log("unif") / F.col("o_totalprice")).alias("key"),
        )
    )
    return (
        k.select(
            "o_orderkey", "o_totalprice", F.round(F.col("key") * 1e6, 6).alias("priority_ppm"), "key"
        )
        .orderBy("key", "o_orderkey")
        .limit(50)
        .drop("key")
    )


# --------------------------------------------------------------------------
# Sequence packing (concat-and-chop training batches)
# --------------------------------------------------------------------------

_TOKCNT_SQL = f"len({_TOKS})"


@register(
    "pack_sequences",
    f"""
WITH t AS (SELECT doc_id, CAST({_TOKCNT_SQL} AS BIGINT) AS nt FROM documents),
c AS (
  SELECT doc_id, nt,
         COALESCE(sum(nt) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
  FROM t
)
SELECT CAST(bef // 2048 AS INT) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS n_tokens
FROM c GROUP BY 1 ORDER BY 1
""",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training batches, concat-and-chop form: docs
    in deterministic (doc_id) order are laid head-to-tail on a token
    tape; a doc belongs to the 2048-token bin where it STARTS
    (bin = exclusive-prefix-token-count // 2048). Output: per-bin doc
    and token counts.

    The prefix sum is `global_cumsum` (operators/relational.py) — range
    repartition + per-partition offsets, NOT a Window.orderBy with no
    partition key, which would drag the whole corpus through one
    partition; packing is the canonical "needs a global running sum at
    100 TB" operator."""
    from ..operators.relational import global_cumsum

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.size(text.tokens(F.col("text"))).cast("long").alias("nt")
    )
    c = global_cumsum(t, ["doc_id"], "nt", alias="incl")
    return (
        c.withColumn("bef", F.col("incl") - F.col("nt"))
        .groupBy(F.floor(F.col("bef") / 2048).cast("int").alias("bin"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
        )
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# Deterministic training-order shuffle shards
# --------------------------------------------------------------------------


@register(
    "shuffle_shard_stats",
    f"""
WITH k AS (
  SELECT doc_id, CAST({_TOKCNT_SQL} AS BIGINT) AS nt,
         md5('shuf42:' || CAST(doc_id AS VARCHAR)) AS okey
  FROM documents
)
SELECT CAST(('0x' || substring(okey, 1, 8))::BIGINT % 8 AS INT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS n_tokens,
       arg_min(doc_id, okey) AS first_doc_id
FROM k GROUP BY 1 ORDER BY 1
""",
)
def shuffle_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into training shards: order key =
    md5(seed || doc_id) (a keyed uniform — reproducible across engines,
    runs, and repartitioning, unlike rand()), shard = top 8 hex digits
    mod 8. Per shard: doc/token counts and the first doc in shard order
    (min_by on the order key). At 100 TB this is exactly how a corpus is
    shuffled for training: one hash pass, one shuffle on shard, no
    global sort."""
    docs = load_table(spark, sf_dir, "documents")
    okey = F.md5(F.concat(F.lit("shuf42:"), F.col("doc_id").cast("string")))
    k = docs.select(
        "doc_id",
        F.size(text.tokens(F.col("text"))).cast("long").alias("nt"),
        okey.alias("okey"),
    )
    shard = (
        F.conv(F.substring("okey", 1, 8), 16, 10).cast("bigint") % 8
    ).cast("int")
    return (
        k.groupBy(shard.alias("shard"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
            F.min_by("doc_id", "okey").alias("first_doc_id"),
        )
        .orderBy("shard")
    )


# --------------------------------------------------------------------------
# Incremental cross-corpus dedup (new crawl vs existing corpus)
# --------------------------------------------------------------------------

_SHINGLES_SQL = (
    f"list_distinct(list_transform(range(1, len({_TOKS}) - 1), "
    f"i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1] || ' ' || {_TOKS}[i+2]))"
)


@register(
    "dedup_incremental",
    # round 9: the near-dup arm previously evaluated list_intersect
    # twice inside the new x existing join condition (4.1M pairs, 208 s
    # at sf0.1). Candidates now come from a PPJoin prefix-postings join
    # (J >= 0.8 forces the lexicographic (n - ceil(0.8n) + 1)-prefixes
    # to share a shingle) with the exact Jaccard verified once per
    # candidate; `d` is MATERIALIZED so the shingle build runs once.
    f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, text, list_sort({_SHINGLES_SQL}) AS sh, {_BUCKET_SQL} AS b
  FROM documents
),
new AS (SELECT * FROM d WHERE b >= 80),
ex  AS (SELECT * FROM d WHERE b < 80),
exact AS (
  SELECT DISTINCT n.doc_id FROM new n JOIN ex e ON md5(n.text) = md5(e.text)
),
prefn AS (SELECT doc_id, unnest(
            sh[1:(len(sh) - CAST(ceil(0.8 * len(sh)) AS INT) + 1)]) AS s
          FROM new WHERE len(sh) > 0),
prefe AS (SELECT doc_id, unnest(
            sh[1:(len(sh) - CAST(ceil(0.8 * len(sh)) AS INT) + 1)]) AS s
          FROM ex WHERE len(sh) > 0),
cand AS MATERIALIZED (
  SELECT DISTINCT pn.doc_id AS dn, pe.doc_id AS de
  FROM prefn pn JOIN prefe pe ON pn.s = pe.s
),
near AS (
  SELECT DISTINCT c.dn AS doc_id
  FROM cand c JOIN new n ON c.dn = n.doc_id
              JOIN ex e ON c.de = e.doc_id
  WHERE least(len(n.sh), len(e.sh)) >= 0.8 * greatest(len(n.sh), len(e.sh))
    AND len(list_intersect(n.sh, e.sh)) * 1.0
        / (len(n.sh) + len(e.sh) - len(list_intersect(n.sh, e.sh))) >= 0.8
)
SELECT n.doc_id,
       CASE WHEN exact.doc_id IS NOT NULL THEN 'exact_dup'
            WHEN near.doc_id IS NOT NULL THEN 'near_dup'
            ELSE 'kept' END AS status
FROM new n
LEFT JOIN exact ON n.doc_id = exact.doc_id
LEFT JOIN near ON n.doc_id = near.doc_id
ORDER BY n.doc_id
""",
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a NEW batch against the EXISTING corpus —
    the shape every continuously-fed training pipeline runs: never
    all-pairs over the full corpus, only new×existing.

    New docs (deterministic md5 bucket >= 80, standing in for the fresh
    crawl) are checked two ways: exact (md5-of-text equi join) and near
    (3-token shingles; candidates from an inverted-index posting join on
    shared shingles — cost scales with posting-list overlap, not
    |new|×|existing| — verified with exact Jaccard >= 0.8). Output: each
    new doc_id with status kept / exact_dup / near_dup. The DuckDB
    oracle recomputes near-dups with an independent brute-force
    list_intersect cross join."""
    docs = load_table(spark, sf_dir, "documents")
    # persist() is the materialization barrier here, same as the MinHash
    # path (functions/dedup.py): HOF lambdas skip codegen CSE and
    # CollapseProject re-inlines single-referenced projections, so
    # without the barrier every downstream branch (postings, ordering,
    # verify arrays) re-runs the O(|toks|²) shingle construction per
    # reference. The persisted frame is one row per doc — tiny relative
    # to the corpus at every scale.
    d = (
        docs.select("doc_id", "text", text.tokens(F.col("text")).alias("_toks"))
        .select(
            "doc_id",
            "text",
            F.array_distinct(text.shingles(F.col("_toks"))).alias("sh"),
            _bucket(F.col("doc_id")).alias("b"),
        )
        .persist()
    )
    new = d.filter(F.col("b") >= 80).drop("b")
    ex = d.filter(F.col("b") < 80).drop("b")

    exact = (
        new.select("doc_id", F.md5("text").alias("h"))
        .join(ex.select(F.md5("text").alias("h")).distinct(), "h")
        .select("doc_id")
        .distinct()
        .withColumn("is_exact", F.lit(1))
    )

    # PPJoin-style prefix-filtered candidates (lossless; see
    # functions/dedup.py prefix_filter_jaccard_pairs for the lemma): under
    # ONE global rare-first shingle order — document frequency over the
    # COMBINED corpus, so both sides sort identically — any pair with
    # J >= t must share a shingle inside both docs' (n - ceil(t*n) + 1)-
    # element prefixes. Posting only prefixes cuts candidate volume ~25x
    # at t=0.8 vs full inverted-index posting (measured 372k -> 15k
    # pairs at sf0.1), and candidates stop growing with every shared
    # COMMON shingle — the term that scales quadratically on boilerplate.
    t = 0.8
    posting_all = d.select("doc_id", "b", F.explode("sh").alias("s"))
    dfreq = posting_all.groupBy("s").agg(F.count("*").alias("df"))
    ordered = (
        posting_all.join(dfreq, "s")
        .groupBy("doc_id", "b")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "s"))), lambda e: e["s"]
            ).alias("os")
        )
    )
    n = F.size("os")
    plen = (n - F.ceil(F.lit(t) * n) + 1).cast("int")
    pre = ordered.select(
        "doc_id", "b", n.alias("n"), F.slice("os", F.lit(1), plen).alias("prefix")
    )
    np_ = pre.filter(F.col("b") >= 80).select(
        F.col("doc_id").alias("n_id"), F.col("n").alias("nn"),
        F.explode("prefix").alias("s"),
    )
    ep = pre.filter(F.col("b") < 80).select(
        F.col("doc_id").alias("e_id"), F.col("n").alias("ne"),
        F.explode("prefix").alias("s"),
    )
    cand = (
        np_.join(ep, "s")
        .filter(F.greatest("nn", "ne") * F.lit(t) <= F.least("nn", "ne"))
        .select("n_id", "e_id")
        .distinct()
    )
    n_sh = new.select(F.col("doc_id").alias("n_id"), F.col("sh").alias("n_sh"))
    e_sh = ex.select(F.col("doc_id").alias("e_id"), F.col("sh").alias("e_sh"))
    inter = F.size(F.array_intersect("n_sh", "e_sh"))
    union = F.size("n_sh") + F.size("e_sh") - inter
    near = (
        cand.join(n_sh, "n_id")
        .join(e_sh, "e_id")
        .filter(inter / union.cast("double") >= 0.8)
        .select(F.col("n_id").alias("doc_id"))
        .distinct()
        .withColumn("is_near", F.lit(1))
    )

    return (
        new.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("is_exact").isNotNull(), "exact_dup")
            .when(F.col("is_near").isNotNull(), "near_dup")
            .otherwise("kept")
            .alias("status"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Per-document n-gram novelty (memorization-risk signal)
# --------------------------------------------------------------------------


@register(
    "doc_novelty_trigrams",
    f"""
WITH g AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_transform(range(1, len({_TOKS}) - 1),
                i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1] || ' ' || {_TOKS}[i+2])) AS ng
  FROM documents
),
cnt AS MATERIALIZED (SELECT ng, count(*) AS c FROM g GROUP BY 1),
per_doc AS (
  SELECT g.doc_id,
         CAST(count(*) AS BIGINT) AS total,
         CAST(sum(CASE WHEN cnt.c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS uniq
  FROM g JOIN cnt USING (ng) GROUP BY 1
)
SELECT CAST(least(9, (10 * uniq) // total) AS INT) AS novelty_decile,
       CAST(count(*) AS BIGINT) AS n_docs
FROM per_doc GROUP BY 1 ORDER BY 1
""",
)
def doc_novelty_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document trigram novelty: the fraction of a doc's trigram
    instances that occur exactly once in the whole corpus, bucketed into
    deciles (integer math — (10*uniq)//total — so the bucket edge is
    exact cross-engine). Low-novelty docs are near-boilerplate /
    memorization risks; this is the corpus-level signal behind dedup
    thresholds. Shape: explode → corpus counts (map-side combine) →
    count-join back → per-doc aggregate; two shuffles, both on trigram /
    doc keys."""
    docs = load_table(spark, sf_dir, "documents")
    # persist() as materialization barrier (see dedup_incremental /
    # functions/dedup.py): without it CollapseProject re-inlines the
    # token projection into the shingle transform (per-element regex
    # re-split) and BOTH consumers of g — the corpus count and the
    # count-join — pay the explode again.
    g = (
        docs.select("doc_id", text.tokens(F.col("text")).alias("_toks"))
        .select(
            "doc_id",
            F.explode(text.shingles(F.col("_toks"), distinct=False)).alias("ng"),
        )
        .persist()
    )
    cnt = g.groupBy("ng").agg(F.count("*").alias("c"))
    per_doc = (
        g.join(cnt, "ng")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("total"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("uniq"),
        )
    )
    decile = F.least(
        F.lit(9), F.floor((10 * F.col("uniq")) / F.col("total"))
    ).cast("int")
    return (
        per_doc.groupBy(decile.alias("novelty_decile"))
        .agg(F.count("*").alias("n_docs"))
        .orderBy("novelty_decile")
    )


# --------------------------------------------------------------------------
# Unigram-LM surprisal (perplexity-proxy quality signal)
# --------------------------------------------------------------------------


@register(
    "doc_lm_surprisal",
    f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS t FROM documents
),
lm AS (
  SELECT t, count(*) AS c FROM tok GROUP BY 1
),
tot AS (SELECT sum(c) AS n FROM lm)
SELECT tok.doc_id,
       CAST(count(*) AS BIGINT) AS n_toks,
       round(avg(-ln(lm.c * 1.0 / tot.n)), 4) AS avg_surprisal
FROM tok JOIN lm USING (t) CROSS JOIN tot
GROUP BY 1 ORDER BY 1
""",
)
def doc_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score from a corpus-trained unigram LM:
    per-doc average token surprisal -ln p(token), p from corpus counts.
    High-surprisal docs are rare-token-heavy (noise / non-language);
    low-surprisal docs are boilerplate — the classic cheap LM filter
    before a real model scores anything.

    Shape: one explode over tokens, corpus counts with map-side combine,
    count-join back (token table broadcast — vocab ≪ corpus at any
    scale), per-doc aggregate. The corpus total rides along as a
    1-row broadcast cross join, same pattern as winsorized_prices."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(text.tokens(F.col("text"))).alias("t"))
    lm = tok.groupBy("t").agg(F.count("*").alias("c"))
    tot = lm.agg(F.sum("c").alias("n"))
    return (
        tok.join(F.broadcast(lm), "t")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_toks"),
            F.round(F.avg(-F.log(F.col("c") / F.col("n"))), 4).alias(
                "avg_surprisal"
            ),
        )
        .orderBy("doc_id")
    )


_KMV_K = 64
_KMV_U = "(('0x' || substring(md5(key), 1, 8))::BIGINT / 4294967296.0)"


@register(
    "kmv_set_ops",
    f"""
WITH keys AS (
  SELECT DISTINCT event_type,
         CAST(user_id AS VARCHAR) || ':' || strftime(CAST(ts AS DATE), '%Y-%m-%d')
           AS key
  FROM events WHERE event_type IN ('click', 'view')
),
u AS (SELECT DISTINCT event_type, {_KMV_U} AS u FROM keys),
ranked AS (
  SELECT event_type, u,
         row_number() OVER (PARTITION BY event_type ORDER BY u) AS rn
  FROM u
),
sk AS (
  SELECT event_type, list(u ORDER BY u) AS sk
  FROM ranked WHERE rn <= {_KMV_K} GROUP BY event_type
),
ab AS (
  SELECT a.sk AS sk_a, b.sk AS sk_b
  FROM (SELECT sk FROM sk WHERE event_type = 'click') a,
       (SELECT sk FROM sk WHERE event_type = 'view') b
),
m AS (
  SELECT sk_a, sk_b,
         list_slice(list_sort(list_distinct(list_concat(sk_a, sk_b))), 1, {_KMV_K})
           AS sk_u
  FROM ab
),
est AS (
  SELECT CAST({_KMV_K} AS INT) AS k,
         round(({_KMV_K} - 1) / sk_a[{_KMV_K}], 6) AS est_a,
         round(({_KMV_K} - 1) / sk_b[{_KMV_K}], 6) AS est_b,
         round(({_KMV_K} - 1) / sk_u[{_KMV_K}], 6) AS est_union,
         round(
           len(list_filter(sk_u, x -> list_contains(sk_a, x) AND list_contains(sk_b, x)))
           * 1.0 / {_KMV_K} * (({_KMV_K} - 1) / sk_u[{_KMV_K}]), 6)
           AS est_intersect
  FROM m
),
exact AS (
  SELECT
    CAST(count(DISTINCT CASE WHEN event_type = 'click' THEN key END) AS BIGINT)
      AS exact_a,
    CAST(count(DISTINCT CASE WHEN event_type = 'view' THEN key END) AS BIGINT)
      AS exact_b,
    CAST(count(DISTINCT key) AS BIGINT) AS exact_union
  FROM keys
)
SELECT k, est_a, est_b, est_union, est_intersect, exact_a, exact_b, exact_union
FROM est, exact
""",
)
def kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct sketch with SET OPERATIONS — the
    capability HLL lacks: besides cardinality, KMV sketches support
    union (merge the minima, keep k smallest) and INTERSECTION
    estimation (Beyer et al., SIGMOD'07: rho = |K ∩ A ∩ B| / k over the
    union sketch K, est = rho * est_union). Elements are 'active
    user-days' per event type; the hash is the engine-portable
    md5-uniform (exactly conv(md5)/2^32 in both engines), so estimates
    are bit-deterministic and the oracle replays them to 6 dp alongside
    the exact counts.

    Scale shape: one DISTINCT on (type, key), one per-type top-k (in
    production a mergeable per-partition k-smallest aggregate; here a
    window rank over the already-distinct values), then all set math on
    <= 2k-element ARRAYS with higher-order functions — the sketches are
    O(k) forever, so union/intersect over any number of 100 TB
    partitions costs array ops on broadcast-size state."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    keys = ev.select(
        "event_type",
        F.concat_ws(
            ":", F.col("user_id").cast("string"),
            F.date_format("ts", "yyyy-MM-dd"),
        ).alias("key"),
    ).distinct()
    u = keys.select(
        "event_type",
        (
            F.conv(F.substring(F.md5("key"), 1, 8), 16, 10).cast("double")
            / F.lit(4294967296.0)
        ).alias("u"),
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("u")
    sk = (
        u.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_K)
        .groupBy("event_type")
        .agg(F.sort_array(F.collect_list("u")).alias("sk"))
    )
    a = sk.filter(F.col("event_type") == "click").select(F.col("sk").alias("sk_a"))
    b = sk.filter(F.col("event_type") == "view").select(F.col("sk").alias("sk_b"))
    m = a.crossJoin(b).withColumn(  # 1x1 — broadcast-of-one-row pattern
        "sk_u",
        F.slice(
            F.array_sort(F.array_distinct(F.concat("sk_a", "sk_b"))), 1, _KMV_K
        ),
    )
    kth = lambda c: F.element_at(c, _KMV_K)  # noqa: E731
    est_u = (_KMV_K - 1) / kth(F.col("sk_u"))
    inter = F.size(
        F.filter(
            "sk_u",
            lambda x: F.array_contains("sk_a", x) & F.array_contains("sk_b", x),
        )
    )
    est = m.select(
        F.lit(_KMV_K).cast("int").alias("k"),
        F.round((_KMV_K - 1) / kth(F.col("sk_a")), 6).alias("est_a"),
        F.round((_KMV_K - 1) / kth(F.col("sk_b")), 6).alias("est_b"),
        F.round(est_u, 6).alias("est_union"),
        F.round(inter / F.lit(float(_KMV_K)) * est_u, 6).alias("est_intersect"),
    )
    exact = keys.agg(
        F.countDistinct(
            F.when(F.col("event_type") == "click", F.col("key"))
        ).alias("exact_a"),
        F.countDistinct(
            F.when(F.col("event_type") == "view", F.col("key"))
        ).alias("exact_b"),
        F.countDistinct("key").alias("exact_union"),
    )
    return est.crossJoin(exact)


@register(
    "label_knn_agreement",
    """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
     n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nm FROM e),
     pairs AS (
       SELECT a.vec_id, a.label AS label, b.label AS nb_label,
              round(list_dot_product(a.v, b.v) / (a.nm * b.nm), 6) AS cosine,
              b.vec_id AS neighbor_id
       FROM n a JOIN n b ON a.vec_id <> b.vec_id
     ),
     ranked AS (
       SELECT *, row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cosine DESC, neighbor_id) AS rank
       FROM pairs
     )
SELECT vec_id, CAST(label AS INT) AS label,
       CAST(count(*) FILTER (WHERE nb_label = label) AS INT) AS n_same,
       round(count(*) FILTER (WHERE nb_label = label) / 5.0, 2) AS agreement
FROM ranked WHERE rank <= 5
GROUP BY vec_id, label ORDER BY vec_id
""",
)
def label_knn_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label-agreement scoring (the Confident-Learning-style label
    NOISE screen for training data): for each embedding, the fraction of
    its 5 nearest cosine neighbors sharing its label — low agreement
    flags probable mislabels for review before training. Reuses the
    hash-verified brute-force top-k (broadcast-corpus matmul); the
    label joins are broadcasts of the (vec_id, label) projection. At
    corpus scale the top-k swaps for the IVF/LSH path; the scoring join
    is unchanged."""
    from ..functions import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    nn = similarity.cosine_topk_bruteforce(emb, k=5)
    lab = emb.select("vec_id", F.col("label").cast("int").alias("label"))
    nb_lab = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").cast("int").alias("nb_label"),
    )
    joined = nn.join(F.broadcast(lab), "vec_id").join(
        F.broadcast(nb_lab), "neighbor_id"
    )
    return (
        joined.groupBy("vec_id", "label")
        .agg(
            F.sum((F.col("nb_label") == F.col("label")).cast("int"))
            .cast("int")
            .alias("n_same")
        )
        .select(
            "vec_id", "label", "n_same",
            F.round(F.col("n_same") / 5.0, 2).alias("agreement"),
        )
        .orderBy("vec_id")
    )


_PSI_BUCKETS = 10
_PSI_LO, _PSI_HI = 0.0, 400000.0


@register(
    "dq_psi_drift",
    f"""
WITH b AS (
  SELECT CASE WHEN year(o_orderdate) = 1994 THEN 'ref' ELSE 'cur' END AS side,
         least({_PSI_BUCKETS} - 1,
               greatest(0, CAST(floor((o_totalprice - {_PSI_LO})
                 / (({_PSI_HI} - {_PSI_LO}) / {_PSI_BUCKETS})) AS INT)))
           AS bucket
  FROM orders WHERE year(o_orderdate) IN (1994, 1995)
),
g AS (SELECT side, bucket, count(*) AS n FROM b GROUP BY 1, 2),
t AS (SELECT side, sum(n) AS total FROM g GROUP BY 1),
p AS (
  SELECT bucket,
         greatest(coalesce(max(CASE WHEN side = 'ref' THEN n * 1.0 / total END), 0), 0.0005) AS p_ref,
         greatest(coalesce(max(CASE WHEN side = 'cur' THEN n * 1.0 / total END), 0), 0.0005) AS p_cur
  FROM g JOIN t USING (side) GROUP BY bucket
)
SELECT CAST(bucket AS INT) AS bucket,
       round(p_ref, 6) AS p_ref, round(p_cur, 6) AS p_cur,
       round((p_cur - p_ref) * ln(p_cur / p_ref), 6) AS psi_term
FROM p ORDER BY bucket
""",
)
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between a reference and current
    window (1994 vs 1995 orders over fixed price buckets) — the
    standard distribution-drift monitor for ML feature pipelines:
    psi = sum((p_cur - p_ref) * ln(p_cur / p_ref)), with the usual
    0.0005 floor so empty buckets don't produce infinities. FIXED bucket
    edges (not data-dependent quantiles) keep the check one aggregation
    with no extra pass; per-bucket terms are emitted so a drifted bucket
    is attributable."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1994, 1995)
    )
    width = (_PSI_HI - _PSI_LO) / _PSI_BUCKETS
    bucket = F.least(
        F.lit(_PSI_BUCKETS - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col("o_totalprice") - _PSI_LO) / width).cast("int"),
        ),
    )
    side = F.when(F.year("o_orderdate") == 1994, "ref").otherwise("cur")
    g = o.select(side.alias("side"), bucket.alias("bucket")).groupBy(
        "side", "bucket"
    ).agg(F.count("*").alias("n"))
    t = g.groupBy("side").agg(F.sum("n").alias("total"))
    p = (
        g.join(t, "side")
        .groupBy("bucket")
        .agg(
            F.greatest(
                F.coalesce(
                    F.max(F.when(F.col("side") == "ref", F.col("n") / F.col("total"))),
                    F.lit(0.0),
                ),
                F.lit(0.0005),
            ).alias("p_ref"),
            F.greatest(
                F.coalesce(
                    F.max(F.when(F.col("side") == "cur", F.col("n") / F.col("total"))),
                    F.lit(0.0),
                ),
                F.lit(0.0005),
            ).alias("p_cur"),
        )
    )
    return p.select(
        F.col("bucket").cast("int").alias("bucket"),
        F.round("p_ref", 6).alias("p_ref"),
        F.round("p_cur", 6).alias("p_cur"),
        F.round(
            (F.col("p_cur") - F.col("p_ref")) * F.log(F.col("p_cur") / F.col("p_ref")),
            6,
        ).alias("psi_term"),
    ).orderBy("bucket")


_FH_DIM = 32


@register(
    "feature_hashing",
    f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
h AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(tok), 1, 8))::BIGINT % {_FH_DIM} AS INT)
           AS slot
  FROM tok
),
c AS (SELECT doc_id, slot, CAST(count(*) AS INT) AS n FROM h GROUP BY 1, 2)
SELECT doc_id, slot, n FROM c ORDER BY doc_id, slot
""",
)
def feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the 'hashing trick', Weinberger et al. ICML'09):
    tokens map to a FIXED {_FH_DIM}-slot space via the engine-portable
    md5 hash — no vocabulary pass, no vocabulary broadcast, memory O(dim)
    regardless of corpus size, which is why hashed features are the
    default for 100 TB text. Output is the sparse (doc, slot, count)
    representation; collisions are part of the contract (and exactly
    reproduced by the oracle, since both engines hash identically)."""
    from ..functions import text

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(text.tokens(F.col("text"))).alias("tok")
    )
    slot = (
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long") % _FH_DIM
    ).cast("int")
    return (
        tok.select("doc_id", slot.alias("slot"))
        .groupBy("doc_id", "slot")
        .agg(F.count("*").cast("int").alias("n"))
        .orderBy("doc_id", "slot")
    )


@register(
    "kmeans_quality_gate",
    """
SELECT CAST(count(*) AS BIGINT) AS n_points,
       TRUE AS all_assigned, TRUE AS cells_within_k,
       TRUE AS inertia_decreased
FROM embeddings
""",
)
def kmeans_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-hashable convergence certificate for the Lloyd's k-means
    implementation (whose per-cluster summary stays rows-only by
    design): every point assigned exactly once, no more than k cells
    used, and 8 iterations strictly reduce total inertia vs the seeded
    1-iteration fit. All three properties are deterministic (the
    assignment argmin is a pure function of the data); a broken partial
    -sum merge, lost point, or diverging update flips a boolean and
    hash-mismatches."""
    from ..functions import clustering

    emb = load_table(spark, sf_dir, "embeddings")
    n_points = emb.count()

    def inertia(max_iter: int) -> tuple[float, int, int]:
        _, assign = clustering.kmeans_fit(emb, k=10, max_iter=max_iter)
        row = assign.agg(
            F.sum("sq_dist").alias("i"),
            F.count("*").alias("n"),
            F.countDistinct("cell").alias("c"),
        ).first()
        return float(row["i"]), int(row["n"]), int(row["c"])

    i1, n1, _ = inertia(1)
    i8, n8, c8 = inertia(8)
    return spark.createDataFrame(
        [(n_points, n1 == n_points and n8 == n_points, c8 <= 10, i8 < i1)],
        "n_points bigint, all_assigned boolean, cells_within_k boolean, "
        "inertia_decreased boolean",
    )
