"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship query (citation-graph density pipeline, G1 in
SURVEY.md §2.9, mapped onto the TPC-H-ish tables) at sf0.001.

`queries()` / `oracle_sql()` — one entry per implemented operator from
SURVEY.md §2; DuckDB-verified at sf0.01. Column names and dtypes are
aligned between both sides (aggregates cast to BIGINT, years to INT) so
the driver's order-insensitive value hash matches.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from citegraph_spark.plans import entry_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: density pipeline (G1) on the sf0.001 tables."""
    return entry_queries.QUERIES["graph_density"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(entry_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(entry_queries.ORACLES)
