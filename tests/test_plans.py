"""Physical-plan assertions: the plans the engine promises at scale —
pushdown reaches the scan, dims broadcast, no nested-loop range joins.
"""

from __future__ import annotations

import contextlib
import io
import re

from citegraph_spark.plans.entry_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_filter_and_pruning_reach_scan(spark):
    p = plan_text(QUERIES["q1_pricing_summary"](spark, SF_DIR))
    assert "LessThan(l_shipdate" in p, "shipdate filter not pushed"
    # 7-column projection: comment/receipt columns must not be read
    scan = p[p.index("Scan parquet") :]
    read_schema = scan[scan.index("ReadSchema") : scan.index("\n", scan.index("ReadSchema"))]
    assert "l_comment" not in read_schema and "l_receiptdate" not in read_schema


def test_filter_project_pushdown_scan(spark):
    p = plan_text(QUERIES["filter_project_pushdown"](spark, SF_DIR))
    assert "EqualTo(l_returnflag,R)" in p
    assert "GreaterThan(l_quantity" in p


def test_star_join_broadcasts_dims(spark):
    p = plan_text(QUERIES["multi_join_region_revenue"](spark, SF_DIR))
    assert p.count("BroadcastHashJoin") >= 3, "dimension joins not broadcast"
    assert "CartesianProduct" not in p


def test_range_join_is_not_nested_loop(spark):
    p = plan_text(QUERIES["range_join_events_orders"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in p, "range join fell back to BNL"
    assert "CartesianProduct" not in p


def test_asof_join_single_key_shuffle(spark):
    p = plan_text(QUERIES["asof_join_events_orders"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    # union-and-carry: the window runs over the union, partitioned by key
    assert "Window" in p


def test_split_is_narrow_until_aggregate(spark):
    # split/sample are pure key functions: the only Exchange allowed is the
    # final tiny group-by; the bucket math must fuse into the scan stage.
    import re

    p = plan_text(QUERIES["split_train_test"](spark, SF_DIR))
    # agg shuffle + order-by range exchange only ("(N) Exchange" headers
    # count each operator once; bare substring counting double-counts)
    assert len(re.findall(r"\(\d+\) Exchange", p)) <= 2, p
    assert "CartesianProduct" not in p


def test_ngram_topk_uses_heap_not_global_sort(spark):
    p = plan_text(QUERIES["ngram_top_bigrams"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in p, "top-k fell back to a global sort"


def test_grouping_sets_single_shuffle(spark):
    p = plan_text(QUERIES["grouping_sets_revenue"](spark, SF_DIR))
    assert "Expand" in p, "grouping sets not expanded map-side"


def test_split_deterministic_under_repartition(spark):
    # The md5-bucket split must be a pure function of doc_id: identical
    # results regardless of partitioning (rand()-based splits fail this).
    a = {tuple(r) for r in QUERIES["split_train_test"](spark, SF_DIR).collect()}
    from citegraph_spark.sources.tables import load_table
    import pyspark.sql.functions as F
    from citegraph_spark.plans.pipeline_queries import _bucket

    docs = load_table(spark, SF_DIR, "documents").repartition(13, "lang")
    b = docs.select("doc_id", "n_chars", _bucket(F.col("doc_id")).alias("bucket"))
    split = (
        F.when(F.col("bucket") < 80, "train")
        .when(F.col("bucket") < 90, "validation")
        .otherwise("test")
    )
    bb = (
        b.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )
    assert {tuple(r) for r in bb.collect()} == a


def test_q4_exists_semi_join_is_hash_join(spark):
    p = plan_text(QUERIES["q4_order_priority"](spark, SF_DIR))
    assert "LeftSemi" in p, "EXISTS did not plan as a semi join"
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    # the date range must reach the orders scan
    assert "GreaterThanOrEqual(o_orderdate" in p, "order-date filter not pushed"


def test_q19_disjunction_pushes_part_filters(spark):
    p = plan_text(QUERIES["q19_disjunctive_filter"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    # Catalyst splits the disjunction per side and pushes each half into
    # its scan: brand/size branches to part, quantity ranges to lineitem
    assert "EqualTo(p_brand,Brand#1)" in p, "brand filter not pushed to part scan"
    assert "GreaterThanOrEqual(l_quantity,1.0)" in p, "quantity ranges not pushed to lineitem scan"


def test_click_attribution_is_binned_hash_join(spark):
    p = plan_text(QUERIES["events_click_attribution"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


def test_pack_sequences_no_single_partition_sort(spark):
    """Packing's prefix sum must come from the range-repartitioned
    cumsum, never a partition-less global Window (which would plan a
    single-partition Exchange of the whole corpus)."""
    p = plan_text(QUERIES["pack_sequences"](spark, SF_DIR))
    assert "Exchange SinglePartition" not in p, "global window leaked in"


def test_dedup_incremental_no_cartesian(spark):
    """new×existing candidates must come from the posting join (equi on
    shingle) — never a cross/nested-loop product of the two corpora."""
    p = plan_text(QUERIES["dedup_incremental"](spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_bloom_filter_prunes_without_false_negatives(spark):
    from pyspark.sql import functions as F

    from citegraph_spark.plans.relational_queries import (
        bloom_might_contain,
        build_bloom_words,
    )

    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf}/lineitem.parquet")
    build = orders.filter(F.col("o_totalprice") > 250000).select(
        F.col("o_orderkey").alias("key")
    )
    true_keys = {r["key"] for r in build.collect()}
    words = build_bloom_words(build)

    total = lineitem.count()
    cand = lineitem.filter(bloom_might_contain(words, "l_orderkey"))
    n_cand = cand.count()
    # prunes: the bitmap must reject the bulk of non-matching rows
    assert n_cand < total * 0.5
    # no false negatives: every truly-matching row survives the filter
    true_rows = lineitem.filter(F.col("l_orderkey").isin(true_keys)).count()
    survivors = cand.filter(F.col("l_orderkey").isin(true_keys)).count()
    assert survivors == true_rows


def test_regression_single_shuffle(spark):
    """Per-group OLS must be one scan + one group shuffle (two-phase
    agg), with only the output sort above it."""
    p = plan_text(QUERIES["regression_price_on_qty"](spark, SF_DIR))
    import re

    # exactly two Exchange nodes: the groupBy hash partitioning and the
    # output ORDER BY range partitioning — nothing else may shuffle
    n_exchange = len(re.findall(r"Exchange \(\d+\)", p))
    assert n_exchange == 2, p
    assert "hashpartitioning" in p and "rangepartitioning" in p


def test_key_skew_uses_heap_topk(spark):
    p = plan_text(QUERIES["dq_key_skew"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in p, "top-10 share must be a heap top-k"
    assert "GlobalSort" not in p


def test_mann_whitney_windows_over_histogram_only(spark):
    """The rank window must consume the aggregated value histogram, not
    raw rows: a HashAggregate must sit below the Window."""
    p = plan_text(QUERIES["ab_mann_whitney"](spark, SF_DIR))
    assert "Window" in p and "HashAggregate" in p
    # formatted plans print the tree top-down: the Window's line must
    # come before (above) a HashAggregate line which itself sits above
    # the parquet scan — i.e. the window consumes aggregated rows
    win_at = p.index("Window")
    scan_at = p.index("Scan parquet")
    assert win_at < scan_at, p
    assert any(
        win_at < m.start() < scan_at for m in re.finditer(r"HashAggregate", p)
    ), p
