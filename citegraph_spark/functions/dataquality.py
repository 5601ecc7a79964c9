"""Data-quality gates — the validation pass a production ingest runs
before promoting a batch (beyond-reference surface; the reference's only
validation is loader-side na.drop/dedupe, DataFrameLoader.scala:37,73).

Two rule shapes, each chosen for its scale behavior:

- Row-predicate rules: ALL rules evaluate in ONE aggregate pass over the
  table (sum-of-violations per rule inside a single agg → map-side
  combine, no per-rule rescan of 100 TB).
- Referential rules: orphan counts via LEFT ANTI join against the parent
  key set — at scale the parent side is the smaller (dimension) table
  and broadcasts; the child table is scanned once per referential rule
  (these can't fold into the row pass: they need the other table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dq_row_violations(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """rules: {rule_name: predicate that must HOLD}. Returns one row per
    rule: (rule, n_violations) — counts of rows where the predicate is
    false or null, computed in a single aggregate pass."""
    aggs = [
        F.sum(
            F.when(F.coalesce(pred.cast("boolean"), F.lit(False)), 0).otherwise(1)
        )
        .cast("bigint")
        .alias(name)
        for name, pred in rules.items()
    ]
    wide = df.agg(*aggs)
    return wide.unpivot([], list(rules), "rule", "n_violations")


def dq_referential_violations(
    child: DataFrame,
    fk: str,
    parent: DataFrame,
    pk: str,
    rule_name: str,
) -> DataFrame:
    """Orphan check: child rows whose `fk` has no match in parent `pk`
    (null fks count as orphans — an FK that must be nullable should be
    pre-filtered by the caller). Returns (rule, n_violations)."""
    orphans = child.select(F.col(fk).alias("_fk")).join(
        F.broadcast(parent.select(F.col(pk).alias("_fk")).distinct()),
        "_fk",
        "left_anti",
    )
    return orphans.agg(
        F.lit(rule_name).alias("rule"),
        F.count("*").cast("bigint").alias("n_violations"),
    )


def write_with_metrics(
    df: DataFrame,
    rules: dict[str, Column],
    path: str | None = None,
) -> dict[str, int]:
    """Validate WHILE writing: attach the single-pass violation counters
    as a `DataFrame.observe` observation on the write job itself, so the
    quality metrics come out of the same scan that produced the output —
    no second pass over 100 TB. Writes parquet to `path` (or a noop sink
    when None — metrics-only), returns {rule: n_violations}."""
    from pyspark.sql import Observation

    obs = Observation("dq")
    aggs = [
        F.sum(
            F.when(F.coalesce(pred.cast("boolean"), F.lit(False)), 0).otherwise(1)
        )
        .cast("bigint")
        .alias(name)
        for name, pred in rules.items()
    ]
    observed = df.observe(obs, *aggs)
    writer = observed.write.mode("overwrite")
    if path is None:
        writer.format("noop").save()
    else:
        writer.parquet(path)
    return {k: int(v) for k, v in obs.get.items()}
