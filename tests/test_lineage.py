"""cut_lineage: default path is exactly localCheckpoint; the reliable
knob reroutes every iterative operator's round state through DFS-backed
checkpoint with identical results. This is the one-knob cluster
fault-tolerance story (lineage.py) — local[*] cannot rehearse an
executor loss, so the pin is: same results, real checkpoint files."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from citegraph_spark.lineage import RELIABLE_FLAG, cut_lineage


@pytest.fixture
def edges(spark):
    rows = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (6, 7)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_default_path_is_localcheckpoint(spark, edges):
    out = edges.transform(cut_lineage)
    # localCheckpoint truncates the plan to a scan of materialized blocks
    assert "Scan ExistingRDD" in out._jdf.queryExecution().toString()
    assert out.count() == 6


def test_reliable_mode_matches_default_and_writes_files(spark, edges, tmp_path):
    from citegraph_spark.operators.graph import connected_components, pagerank

    base_pr = {
        (r["node"], round(r["rank"], 9))
        for r in pagerank(edges, iterations=5).collect()
    }
    base_cc = {
        tuple(r) for r in connected_components(edges.select("src", "dst")).collect()
    }

    ckpt = str(tmp_path / "ckpt")
    spark.sparkContext.setCheckpointDir(ckpt)
    spark.conf.set(RELIABLE_FLAG, "true")
    try:
        got_pr = {
            (r["node"], round(r["rank"], 9))
            for r in pagerank(edges, iterations=5).collect()
        }
        got_cc = {
            tuple(r)
            for r in connected_components(edges.select("src", "dst")).collect()
        }
    finally:
        spark.conf.unset(RELIABLE_FLAG)

    assert got_pr == base_pr
    assert got_cc == base_cc
    # the round state really went through the DFS-backed path
    written = [
        os.path.join(dp, f) for dp, _, fs in os.walk(ckpt) for f in fs
    ]
    assert written, "reliable mode produced no checkpoint files"
