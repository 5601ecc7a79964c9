"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) for
the reference's citation-graph text formats — the same semantics as
`sources/citations.py` (reference DataFrameLoader.scala:28-74), exposed
as first-class formats:

    spark.dataSource.register(CitationsDataSource)
    spark.read.format("citations").load(path)          # (from, to)
    spark.read.format("citations").option("kind", "published")
         .load(path)                                   # (id, year)

Parallelism: one `InputPartition` per file for multi-file directories
(the production layout: one shard per HDFS block / upload chunk), so a
1000-file directory fans out across the cluster. Parsing happens
per-partition in the Python worker (Arrow-batched back to the JVM);
comment/blank filtering, whitespace tokenization, int casts, and the
9-digit `11`-prefix id normalization match the column-expression loader
exactly — equality is asserted in tests.

This is the escape hatch for formats Spark has no reader for; for
formats Spark DOES read (CSV/JSON/parquet/ORC), the built-in JVM readers
keep pushdown + codegen and are preferred (sources/citations.py stays
the default loader — it is pure column expressions over spark.read.text,
fully visible to Catalyst)."""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import IntegerType, StructField, StructType


def _normalize_id(tok: str) -> int:
    if len(tok) == 9 and tok.startswith("11"):
        return int(tok[2:])
    return int(tok)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class CitationsDataSource(DataSource):
    """format("citations"): option `kind` = 'citations' (default) or
    'published'."""

    @classmethod
    def name(cls) -> str:
        return "citations"

    def schema(self) -> StructType:
        if self.options.get("kind", "citations") == "published":
            return StructType(
                [
                    StructField("id", IntegerType(), False),
                    StructField("year", IntegerType(), False),
                ]
            )
        return StructType(
            [
                StructField("from", IntegerType(), False),
                StructField("to", IntegerType(), False),
            ]
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return _CitationsReader(
            self.options["path"], self.options.get("kind", "citations")
        )


class _CitationsReader(DataSourceReader):
    def __init__(self, path: str, kind: str):
        self.path = path
        self.kind = kind

    def partitions(self) -> Sequence[InputPartition]:
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if not f.startswith((".", "_"))
            )
        else:
            files = [self.path]
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                if "#" in line or not line.strip():
                    continue
                toks = line.split()
                if len(toks) < 2:
                    continue
                try:
                    if self.kind == "published":
                        # id \t yyyy-mm-dd → (normalized id, year)
                        yield _normalize_id(toks[0].strip()), int(toks[1][:4])
                    else:
                        yield int(toks[0]), int(toks[1])
                except ValueError:
                    continue  # na.drop() equivalent for malformed rows
