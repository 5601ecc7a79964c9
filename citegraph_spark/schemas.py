"""Declared schemas for the citation-graph tables and outputs.

Mirrors the reference's fixed StructTypes (reference
src/main/scala/org/citegraph/schemas/package.scala:7-18): no inference,
`nullable=False` on key columns. Output column names keep the reference's
parenthesized headers (`n(t)`, `e(t)`, `g(d)`) — backtick-quoted in SQL.
"""

from __future__ import annotations

from pyspark.sql import types as T

CITATIONS = T.StructType(
    [
        T.StructField("from", T.IntegerType(), False),
        T.StructField("to", T.IntegerType(), False),
    ]
)

PUBLISHED_DATES = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("year", T.IntegerType(), False),
    ]
)

NODEPAIRS = T.StructType(
    [
        T.StructField("year", T.IntegerType(), False),
        T.StructField("total_pairs", T.LongType(), False),
    ]
)

DENSITIES = T.StructType(
    [
        T.StructField("year", T.IntegerType(), False),
        T.StructField("n(t)", T.LongType(), False),
        T.StructField("e(t)", T.LongType(), False),
    ]
)

HOP_PLOT = T.StructType(
    [
        T.StructField("d", T.IntegerType(), False),
        T.StructField("g(d)", T.LongType(), False),
        T.StructField("percent_of_total", T.DoubleType(), False),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
