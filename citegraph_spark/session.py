"""SparkSession factory with scale-aware defaults.

Local testing runs on local[N]; the same config keys are the ones that
matter on a 1000-executor cluster (AQE, adaptive skew join, broadcast
threshold). Shuffle partition count is sized from parallelism rather than
Spark's legacy default of 200.
"""

from __future__ import annotations

import atexit
import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "citegraph_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for analytic workloads.

    AQE is on: at cluster scale it coalesces small post-shuffle partitions,
    converts sort-merge joins to broadcast when runtime stats allow, and
    splits skewed partitions — all decisions we want made per-query from
    real statistics, not hardcoded like the reference's `numPartitions=16`
    (reference Analytics.scala:376,400).
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
        # the events table stores TIMESTAMP(NANOS) which the vectorized
        # parquet reader rejects; read as long and convert (sources/tables.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if not spark.sparkContext.master.startswith("local["):
        _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make `citegraph_spark` importable on executor Python workers.

    In pure local[N] mode, Python workers fork from the driver and
    inherit its sys.path — imports just work, which silently HIDES a
    real deployment requirement: on any multi-JVM master
    (local-cluster, standalone, YARN, k8s) executor Python workers
    start in the worker's scratch dir, and every mapInPandas /
    applyInPandas(WithState) stage whose function is pickled BY
    REFERENCE to this module dies with ModuleNotFoundError (found by
    the round-11 full-registry local-cluster parity board: 7 entries —
    the sketch, multimodal, and stateful-streaming families). The
    spark-submit path ships the package with --py-files
    (deploy/submit.sh); this is the same fix for programmatically
    built sessions: zip the package once per APPLICATION and addPyFile
    it, which distributes the zip and prepends it to every worker's
    sys.path.

    Shipped once per applicationId (r12 ADVICE): get_spark() is called
    per-entry in sweeps, and getOrCreate() returns the same live
    session, so an unguarded addPyFile would leak one temp zip and one
    duplicate worker sys.path entry per call. The zip must OUTLIVE the
    app — executors fetch it lazily from the driver's file server, and
    replacement executors re-fetch it after a failure (the
    tests/test_pyworker_kill.py scenario) — so cleanup happens at
    interpreter exit, not after addPyFile returns.
    """
    import tempfile
    import zipfile

    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED_APP_IDS:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    fd, zpath = tempfile.mkstemp(suffix=".zip", prefix="citegraph_spark_py_")
    os.close(fd)
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED_APP_IDS.add(app_id)
    _SHIPPED_ZIPS.append(zpath)


_SHIPPED_APP_IDS: set[str] = set()
_SHIPPED_ZIPS: list[str] = []


@atexit.register
def _cleanup_shipped_zips() -> None:
    for p in _SHIPPED_ZIPS:
        try:
            os.unlink(p)
        except OSError:
            pass
