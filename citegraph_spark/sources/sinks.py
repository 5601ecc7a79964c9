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
