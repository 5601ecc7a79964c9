"""ORC source/sink — the second columnar format Spark ships natively.

Same contract as the parquet path (sources/tables.py): explicit schema
on read when known (no inference pass), predicate pushdown and column
pruning reach the ORC reader (verified in tests/test_sources.py), and
writes support directory partitioning. Useful when interoperating with
Hive-era warehouses where ORC is the table format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_orc(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def write_orc(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
