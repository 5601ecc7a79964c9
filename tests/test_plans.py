"""Physical-plan assertions: the plans the engine promises at scale —
pushdown reaches the scan, dims broadcast, no nested-loop range joins.
"""

from __future__ import annotations

import contextlib
import io

from citegraph_spark.plans.entry_queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_filter_and_pruning_reach_scan(spark):
    p = plan_text(QUERIES["q1_pricing_summary"](spark, SF_DIR))
    assert "LessThanOrEqual(l_shipdate" in p, "shipdate filter not pushed"
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
