"""Composable relational operators (SURVEY.md §2.2-2.7 inventory).

Each is a thin, documented wrapper over DataFrame primitives — the point
is a named, testable surface matching the reference's operator inventory,
plus the common OLAP shapes (top-k per group, sessionization) the
reference lacks. All JVM-side; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_count(df: DataFrame, key: str, alias: str = "count") -> DataFrame:
    """A1/A2: hash aggregate count per key (partial agg map-side, free)."""
    return df.groupBy(key).agg(F.count("*").alias(alias))


def group_sum(df: DataFrame, key: str, value: str, alias: str) -> DataFrame:
    """A3: hash aggregate sum per key."""
    return df.groupBy(key).agg(F.sum(value).alias(alias))


def running_total(
    df: DataFrame, order_col: str, value_col: str, alias: str,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """W1: cumulative sum ordered by `order_col`.

    The reference's window has no partitionBy (Analytics.scala:22-25) —
    fine for <=#years rows, a serialization hazard otherwise. Callers with
    large frames must pass `partition_by` (scale note in SURVEY.md §4.3).
    """
    w = Window.orderBy(order_col)
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(order_col)
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(alias, F.sum(value_col).over(w))


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order_col, k: int, rank_alias: str = "rn"
) -> DataFrame:
    """Top-k per group via row_number — the distributed top-k idiom: each
    partition pre-ranks map-side, only k rows per group survive."""
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    return df.withColumn(rank_alias, F.row_number().over(w)).filter(
        F.col(rank_alias) <= k
    )


def anti_join_new(new: DataFrame, seen: DataFrame, keys: list[str]) -> DataFrame:
    """J4/U2: keep rows of `new` whose key is absent from `seen`
    (the reference's subtractByKey, Analytics.scala:287)."""
    return new.join(seen, keys, "left_anti")


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Sessionization: a new session starts when the gap since the user's
    previous event exceeds `gap_minutes`. Pure window functions — one
    shuffle on user, then per-user sorted scan; scales with user
    cardinality, not total rows per partition."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return df.withColumn("_new_session", is_new).withColumn(
        "session_id",
        F.sum("_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).drop("_new_session")
