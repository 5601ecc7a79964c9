"""JSONL (newline-delimited JSON) source/sink.

Beyond the reference's text/CSV surface: the interchange format
training-data pipelines actually move documents in. Reads REQUIRE an
explicit schema — schema inference scans the whole input (a full extra
pass at 100 TB) and silently widens types; writes are plain
`df.write.json`, one file per partition, optionally partitioned by
columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_jsonl(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)
