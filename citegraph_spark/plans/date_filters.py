"""TZ-proof date-window predicates for parquet TIMESTAMP columns.

Shared by the TPC-H-shaped plans (plans/tpch_rest.py,
plans/relational_queries.py). Exists because the r3/r5 driver sweeps
hash-failed q12_ship_priority_class while local checks passed: the
query compared the parquet TIMESTAMP column against a
``.cast("timestamp")`` string literal, and on an engine build that
reads the column as TIMESTAMP_LTZ under a non-UTC session the window
shifts by the session-TZ offset, moving boundary-midnight rows
(present at every sf) across the filter. Date-only comparisons on both
engines (``F.to_date`` vs DATE literals here; ``CAST(... AS DATE)`` vs
``DATE '...'`` in the DuckDB oracles) are insensitive to the SYMMETRIC
skew model: both the parquet read and the to_date round-trip applying
the same session-TZ conversion, which cancels. They are NOT a blanket
TZ guarantee — under an asymmetric model (raw micros read as UTC
instants but ``to_date`` converting via a non-UTC session TZ),
boundary-midnight rows still shift across the precise bound. The real
build is NTZ (membership tests in tests/test_date_filters.py pass),
and q12's ``boundary_day_count`` edge-day canary localizes the
residual model in the driver row if an engine ever exhibits it; the
actual r3/r5 q12 hash fail was the HUGEINT oracle dtype, not TZ
(see plans/tpch_rest.py q12 docstring).
"""

from __future__ import annotations

from datetime import date, timedelta

from pyspark.sql import Column
from pyspark.sql import functions as F


def date_window(
    col_name: str, lo: date | None, hi: date | None = None
) -> Column:
    """Half-open date-window predicate [lo, hi) — one-sided when either
    bound is None — for a TIMESTAMP column.

    Two conjoined predicates: the PRECISE one compares
    ``F.to_date(col)`` against DATE literals (engine-build / session-TZ
    insensitive, see module docstring). The COARSE one keeps the BARE
    column compared against DATE literals widened by one day per side:
    Catalyst pushes it into the parquet scan (row-group pruning
    survives), which the ``to_date()`` wrapper alone would forfeit; any
    engine TZ skew is strictly < 24 h, so the slack never changes the
    result set — membership is always decided by the precise predicate.
    """
    if lo is None and hi is None:
        raise ValueError("date_window needs at least one bound")
    c = F.col(col_name)
    parts = []
    if lo is not None:
        parts.append(F.to_date(c) >= F.lit(lo))
        parts.append(c >= F.lit(lo - timedelta(days=1)))
    if hi is not None:
        parts.append(F.to_date(c) < F.lit(hi))
        parts.append(c < F.lit(hi + timedelta(days=1)))
    pred = parts[0]
    for p in parts[1:]:
        pred = pred & p
    return pred
