"""Parquet test-table loaders (TESTDATA.md).

`spark.read.parquet` gives a real FileSourceScanExec, so Catalyst's
predicate pushdown and column pruning reach the scan — unlike the
reference's `createDataFrame(rdd, schema)` LogicalRDD sources, which block
pushdown (SURVEY.md §4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as long via nanosAsLong; truncate to micros
        # with integer DIV (ns values exceed 2^53 — float division would
        # lose precision)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in schemas.TESTDATA_TABLES}
