"""Parquet test-table loaders (TESTDATA.md).

`spark.read.parquet` gives a real FileSourceScanExec, so Catalyst's
predicate pushdown and column pruning reach the scan — unlike the
reference's `createDataFrame(rdd, schema)` LogicalRDD sources, which block
pushdown (SURVEY.md §4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import schemas


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in schemas.TESTDATA_TABLES}
