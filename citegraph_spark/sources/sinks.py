"""Sinks (SURVEY.md §2.1 S8-S9).

Single-file CSV mirrors the reference's user-facing output contract
(reference DataFrameSaver.scala:8-25). The reference sorts AFTER
coalesce(1) — a one-task sort; we sort first (a distributed range-sort)
and then coalesce, which preserves the sort order into the single output
partition. Single-file output is inherently output-size-bound; for large
results use `save_parquet` (partitioned, the scale path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def save_csv_single(df: DataFrame, path: str) -> None:
    (
        df.coalesce(1)
        .write.option("header", "true")
        .option("sep", ",")
        .mode("overwrite")
        .csv(path)
    )


def save_sorted_csv_single(df: DataFrame, path: str, sort_col: str) -> None:
    save_csv_single(df.sort(sort_col), path)


def save_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def save_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    target_partitions: int | None = None,
) -> None:
    """Data-skipping layout: range-repartition by `sort_cols`, then sort
    WITHIN each partition before writing. Every output file then covers a
    disjoint key range and every parquet row group carries tight min/max
    stats on the sort key, so a later point/range filter on that key
    prunes whole files (partition-level min/max) and row groups
    (footer stats) instead of scanning 100 TB. This is the cheap 80% of
    Z-ordering for single-key access patterns; the write costs one
    range-exchange (sampled bounds) — no global sort barrier."""
    parts = df
    if target_partitions:
        parts = parts.repartitionByRange(target_partitions, *sort_cols)
    else:
        parts = parts.repartitionByRange(*sort_cols)
    parts.sortWithinPartitions(*sort_cols).write.mode("overwrite").parquet(path)


def compact_small_files(
    spark,
    path: str,
    target_file_bytes: int = 128 << 20,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(bytes / target_file_bytes) files. Streaming sinks, per-partition
    writers, and incremental loads all accrete kilobyte-scale files; at
    100 TB the resulting footer/open overhead dominates scan time and
    floods the driver with file metadata. One distributed read →
    coalesce(n) → atomic swap (write to .tmp, then move) keeps the data
    live at all times. Returns the output file count."""
    import math
    import shutil
    import uuid

    df = spark.read.parquet(path)
    total_bytes = sum(
        int(f.stat().st_size)
        for f in __import__("pathlib").Path(path).rglob("*.parquet")
    )
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    tmp = f"{path}.compact-{uuid.uuid4().hex[:8]}.tmp"
    # coalesce (not repartition): merging narrow files needs no shuffle
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    shutil.move(tmp, path)
    return n_files


def upsert_parquet(
    spark,
    updates: DataFrame,
    path: str,
    key_cols: list[str],
    version_col: str,
) -> None:
    """Keyed MERGE/upsert into a parquet directory without a table
    format: read current ∪ updates, keep the highest-`version_col` row
    per key (ties favor the update), rewrite atomically (tmp dir + swap,
    as in `compact_small_files`). This is copy-on-write MERGE semantics;
    the rewrite cost is the whole target, so at 100 TB the target should
    be partitioned (e.g. by date) and this applied per affected
    partition — or swapped for a transactional format (Delta/Iceberg,
    not available in this environment) where row-level merge is native.
    The dedup is one shuffle on the key; no window sort is needed
    (max_by-struct aggregate keeps it map-side combinable)."""
    import os
    import shutil
    import uuid

    from pyspark.sql import functions as F

    if os.path.exists(path):
        current = spark.read.parquet(path).withColumn("_pri", F.lit(0))
        merged_src = current.unionByName(updates.withColumn("_pri", F.lit(1)))
    else:
        merged_src = updates.withColumn("_pri", F.lit(1))

    value_cols = [c for c in merged_src.columns if c not in key_cols]
    merged = (
        merged_src.groupBy(*key_cols)
        .agg(
            F.max(F.struct(version_col, "_pri", *[c for c in value_cols if c not in (version_col, "_pri")])).alias("_top")
        )
        .select(*key_cols, *[F.col(f"_top.{c}").alias(c) for c in value_cols if c != "_pri"])
    )
    tmp = f"{path}.upsert-{uuid.uuid4().hex[:8]}.tmp"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    shutil.move(tmp, path)


def zorder_key(col_a, col_b, bits: int = 16):
    """Z-order (Morton) key: interleave the low `bits` bits of two
    non-negative int columns — pure JVM column expressions (shifts,
    masks, bitwise or), no UDF. Sorting by this key gives BOTH columns
    locality, so range filters on either column prune files/row groups
    after a `save_sorted_parquet(..., [zkey])` write — the multi-column
    generalization of single-key clustering. 16 bits per dimension keeps
    the key in a BIGINT; values are clamped into range first (clamping
    only weakens locality for outliers, never correctness — the key is
    layout, not data)."""
    from pyspark.sql import functions as F

    max_v = (1 << bits) - 1
    a = F.least(F.greatest(col_a.cast("long"), F.lit(0)), F.lit(max_v))
    b = F.least(F.greatest(col_b.cast("long"), F.lit(0)), F.lit(max_v))
    key = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b, i).bitwiseAND(F.lit(1))
        key = key.bitwiseOR(F.shiftleft(bit_a, 2 * i)).bitwiseOR(
            F.shiftleft(bit_b, 2 * i + 1)
        )
    return key


def overwrite_partitions_dynamic(df: DataFrame, path: str, partition_by: list[str]) -> None:
    """Dynamic partition overwrite: replace ONLY the partitions present
    in `df`, leaving every other partition of the target untouched.

    This is the scale-correct incremental refresh for a partitioned
    100 TB table: a daily job writes the day's partition(s) without
    rewriting — or even listing — the rest of the table, and without the
    read-modify-write cycle `upsert_parquet` needs for keyed merges.
    Spark's STATIC overwrite mode (the default) would first DELETE the
    whole root path; the partitionOverwriteMode=dynamic session/ write
    option scopes the delete to partitions the incoming frame actually
    contains (Spark SQL docs, `spark.sql.sources.partitionOverwriteMode`).
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def daily_event_rollup(events: DataFrame) -> DataFrame:
    """Per-(day, event_type) count and value sum — the canonical
    incrementally-maintainable aggregate (count and sum are
    self-mergeable, so a day can be recomputed in isolation)."""
    return (
        events.groupBy(
            F.to_date("ts").cast("string").alias("day"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("value_sum"))
    )


def refresh_rollup_days(events: DataFrame, path: str, days: list[str]) -> None:
    """Incremental maintenance of the daily rollup: recompute ONLY the
    given days from the (date-filtered, partition-prunable) event scan
    and dynamic-overwrite exactly those partitions.

    At 100 TB this is the difference between a daily job that reads one
    day's partition and rewrites one partition, and a full-table rebuild:
    cost is O(|changed days|), independent of table history size.
    """
    day = F.to_date("ts").cast("string")
    delta = daily_event_rollup(events.filter(day.isin(days)))
    overwrite_partitions_dynamic(delta, path, ["day"])
