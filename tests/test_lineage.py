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


def test_checkpoint_dir_conf_is_honored_at_startup(tmp_path):
    """deploy/spark-cluster.conf enables reliable mode with TWO conf
    keys and no driver code — that only works if Spark honors
    spark.checkpoint.dir as a SUBMIT-TIME conf (it is static: read at
    SparkContext startup, CANNOT_MODIFY_CONFIG on a live session, which
    is exactly the properties-file deployment path). Pin it in a fresh
    JVM the way spark-submit would supply it."""
    import subprocess
    import sys as _sys

    d = str(tmp_path / "conf_ckpt")
    probe = (
        "from pyspark.sql import SparkSession\n"
        "import os, sys\n"
        f"d = {d!r}\n"
        "spark = (SparkSession.builder.master('local[2]')\n"
        "         .config('spark.checkpoint.dir', d)\n"
        "         .config('spark.ui.enabled', 'false')\n"
        "         .appName('ckpt_conf_probe').getOrCreate())\n"
        "out = spark.range(100).checkpoint(eager=True)\n"
        "n = out.count()\n"
        "files = [f for _, _, fs in os.walk(d) for f in fs]\n"
        "spark.stop()\n"
        "sys.exit(0 if (n == 100 and files) else 1)\n"
    )
    res = subprocess.run(
        [_sys.executable, "-c", probe], capture_output=True, timeout=300
    )
    assert res.returncode == 0, res.stderr.decode()[-2000:]


def test_deploy_recipe_two_keys_end_to_end(tmp_path):
    """The exact deploy/spark-cluster.conf recipe — BOTH keys supplied
    at session build, zero driver code — must route a real iterative
    operator's round state through reliable checkpoints: pagerank on a
    fresh session with spark.citegraph.reliableCheckpoint=true +
    spark.checkpoint.dir writes checkpoint files and returns the same
    ranks as the in-suite default session."""
    import subprocess
    import sys as _sys

    d = str(tmp_path / "deploy_ckpt")
    probe = (
        "import sys, os\n"
        "sys.path.insert(0, '/root/repo')\n"
        "from pyspark.sql import SparkSession\n"
        "from citegraph_spark.operators.graph import pagerank\n"
        f"d = {d!r}\n"
        "spark = (SparkSession.builder.master('local[2]')\n"
        "         .config('spark.citegraph.reliableCheckpoint', 'true')\n"
        "         .config('spark.checkpoint.dir', d)\n"
        "         .config('spark.sql.shuffle.partitions', '4')\n"
        "         .config('spark.ui.enabled', 'false')\n"
        "         .appName('deploy_recipe_probe').getOrCreate())\n"
        "edges = spark.createDataFrame(\n"
        "    [(1, 2), (2, 3), (3, 1), (3, 4)], 'src long, dst long')\n"
        "rows = sorted((r['node'], round(r['rank'], 9))\n"
        "              for r in pagerank(edges, iterations=3).collect())\n"
        "files = [f for _, _, fs in os.walk(d) for f in fs]\n"
        "spark.stop()\n"
        "print(repr(rows))\n"
        "sys.exit(0 if files else 1)\n"
    )
    res = subprocess.run(
        [_sys.executable, "-c", probe], capture_output=True, timeout=300
    )
    assert res.returncode == 0, res.stderr.decode()[-2000:]
    # cross-process determinism: same ranks as an in-process default run
    from citegraph_spark.operators.graph import pagerank
    from citegraph_spark.session import get_spark

    spark = get_spark(app_name="deploy_recipe_ref", shuffle_partitions=4)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    )
    expected = sorted(
        (r["node"], round(r["rank"], 9))
        for r in pagerank(edges, iterations=3).collect()
    )
    got = eval(res.stdout.decode().strip().splitlines()[-1])
    assert got == expected
