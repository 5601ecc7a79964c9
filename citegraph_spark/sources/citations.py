"""Citation-graph text loaders (SURVEY.md §2.1 S1-S6).

The reference parses whitespace-delimited text with RDD lambdas
(reference DataFrameLoader.scala:28-74). We express the same semantics as
DataFrame column expressions over `spark.read.text`, so the whole load is
JVM-side, codegen'd, and visible to Catalyst:

- `#` comment lines and blank lines dropped        (S4)
- tokens split on whitespace, trimmed, cast to int (S5, F1/F2/F5)
- rows with nulls dropped                          (P5)
- published dates: year = first 4 chars of yyyy-mm-dd (F3)
- cross-listed id normalization: 9-digit ids starting `11` lose the
  prefix (`11<id>` → `<id>`)                       (F4; DataFrameLoader.scala:64-68)
- dedupe on id, deterministically keeping the MIN year (the reference's
  `dropDuplicates("id")` keeps an arbitrary row — DataFrameLoader.scala:73;
  we make it deterministic, divergence documented in SURVEY.md §7.5)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas


def _non_comment_lines(spark: SparkSession, path: str) -> DataFrame:
    lines = spark.read.text(path)
    return lines.filter(
        (~F.col("value").contains("#")) & (F.trim(F.col("value")) != "")
    )


def load_citations(spark: SparkSession, path: str) -> DataFrame:
    """`(from INT, to INT)` directed edge list from whitespace text."""
    lines = _non_comment_lines(spark, path)
    toks = lines.select(F.split(F.trim(F.col("value")), r"\s+").alias("t"))
    # try_cast: ANSI mode (Spark 4 default) makes plain cast THROW on a
    # malformed token; try_cast -> null -> na.drop reproduces the
    # reference's drop-bad-rows behavior (DataFrameLoader.scala:37)
    df = toks.select(
        F.element_at("t", 1).try_cast("int").alias("from"),
        F.element_at("t", 2).try_cast("int").alias("to"),
    )
    return df.na.drop()


def normalize_paper_id(col):
    """Cross-listed-paper id fix: 9-digit ids with a `11` prefix are
    duplicates of the un-prefixed id (reference DataFrameLoader.scala:64-68)."""
    s = col.cast("string")
    return (
        F.when(
            (F.length(s) == 9) & s.startswith("11"), F.substring(s, 3, 7)
        )
        .otherwise(s)
        .try_cast("int")
    )


def published_dates_from_lines(lines: DataFrame) -> DataFrame:
    """Shared core of `load_published_dates` over an already-loaded
    `(value STRING)` lines DataFrame: comment/blank filter, whitespace
    tokenize, 11-prefix normalization, year slice, deterministic
    min-year dedupe. Factored out (round-12 mutation audit, mutants
    M02/M03) so the `loader_normalize_ids` oracle exercises THIS code
    instead of an inline copy — loader mutations are now gate-visible."""
    keep = lines.filter(
        (~F.col("value").contains("#")) & (F.trim(F.col("value")) != "")
    )
    toks = keep.select(F.split(F.trim(F.col("value")), r"\s+").alias("t"))
    df = toks.select(
        normalize_paper_id(F.trim(F.element_at("t", 1))).alias("id"),
        F.substring(F.trim(F.element_at("t", 2)), 1, 4).try_cast("int").alias("year"),
    ).na.drop()
    return df.groupBy("id").agg(F.min("year").alias("year"))


def load_published_dates(spark: SparkSession, path: str) -> DataFrame:
    """`(id INT, year INT)` from `id<TAB>yyyy-mm-dd` text, normalized and
    deduped (deterministic min-year per id)."""
    return published_dates_from_lines(spark.read.text(path))


def load_nodepairs(spark: SparkSession, path: str) -> DataFrame:
    """Precomputed `(year, total_pairs)` totals (reference
    Application.scala:26-32 collects these to the driver; we keep a
    DataFrame and collect only the tiny per-year dict at the call site)."""
    return spark.read.csv(path, schema=schemas.NODEPAIRS, comment="#")
