"""Tiny fixture citation graph (FIXTURES.md §3).

17 directed edges over 11 nodes, publication years 1992-1998. Used by
tests and by the fixture-graph `queries()` entries, where the DuckDB
oracle embeds the same values as a VALUES list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import schemas

FIXTURE_EDGES: list[tuple[int, int]] = [
    (2, 1), (3, 1), (4, 1), (9, 3), (5, 3), (7, 3), (4, 2), (9, 2),
    (5, 4), (7, 4), (10, 5), (6, 5), (10, 6), (8, 6), (8, 7), (9, 8),
    (11, 8),
]

FIXTURE_YEARS: dict[int, int] = {
    1: 1992, 2: 1993, 3: 1993, 4: 1994, 5: 1995, 6: 1996,
    7: 1996, 8: 1997, 9: 1997, 10: 1997, 11: 1998,
}


def fixture_citations(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(FIXTURE_EDGES, schema=schemas.CITATIONS)


def fixture_published(spark: SparkSession) -> DataFrame:
    rows = sorted(FIXTURE_YEARS.items())
    return spark.createDataFrame(rows, schema=schemas.PUBLISHED_DATES)


def edges_values_sql() -> str:
    """The fixture edge list as a SQL VALUES body (for DuckDB oracles)."""
    return ", ".join(f"({a}, {b})" for a, b in FIXTURE_EDGES)


def years_values_sql() -> str:
    return ", ".join(f"({i}, {y})" for i, y in sorted(FIXTURE_YEARS.items()))
