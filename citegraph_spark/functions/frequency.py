"""Frequency sketches: Misra-Gries heavy hitters (mergeable summaries).

Misra & Gries 1982; mergeability per Agarwal, Cormode, Huang, Phillips,
Wei, Yi, "Mergeable Summaries" (PODS'12): two k-counter MG summaries
merge by (1) summing counts per key, (2) if more than k keys survive,
subtracting the (k+1)-th largest count from every key and dropping the
non-positive. The merged summary's undercount stays <= N/(k+1) for N
total stream items — so any item with true frequency > N/(k+1) is
GUARANTEED present, and for every reported item
    est <= true <= est + N/(k+1).

Spark shape (two-level, the same pattern as the HLL rollup in
plans/relational_queries.py):

  stage 1  mapInPandas over the token stream: one MG summary per
           PARTITION (Arrow-batched; per batch an exact value_counts,
           merged into the running summary with the rule above — a batch
           is itself a trivially-exact MG summary). Output: <= k rows
           per partition.
  stage 2  the <= k*P summary rows (a few KB) hash-shuffle to one
           reducer; applyInPandas runs the same merge once more.

At 100 TB the Arrow transfer of stage 1 IS the token stream — that is
the unavoidable cost of a Python-side sketch; everything after stage 1
is O(k * partitions). The exact JVM alternative (explode + groupBy +
top-k) is registered alongside as `heavy_hitters_exact` — the sketch
exists for the single-pass bounded-memory regime where the full
(token, count) map no longer fits a shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_merge(counters: dict[str, int], batch: dict[str, int], k: int) -> dict[str, int]:
    """Merge an exact (or MG) summary `batch` into `counters`, keeping
    <= k keys via the Agarwal et al. decrement rule."""
    for key, cnt in batch.items():
        counters[key] = counters.get(key, 0) + int(cnt)
    if len(counters) > k:
        # (k+1)-th largest count is the decrement
        dec = sorted(counters.values(), reverse=True)[k]
        counters = {key: c - dec for key, c in counters.items() if c - dec > 0}
    return counters


def misra_gries_topn(
    tokens_df: DataFrame, col: str = "tok", k: int = 64, topn: int = 20
) -> DataFrame:
    """Approximate top-`topn` heavy hitters of the token stream with a
    k-counter Misra-Gries summary per partition, merged once.

    Output: (tok, est_cnt) sorted by est_cnt desc, tok asc — est_cnt is
    a LOWER bound on the true count, short by at most N/(k+1).
    """
    summary_schema = "tok string, cnt long"

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            vc = pdf[col].value_counts()
            counters = _mg_merge(counters, vc.to_dict(), k)
        yield pd.DataFrame(
            {"tok": list(counters.keys()), "cnt": list(counters.values())}
        )

    def mg_final(pdf: pd.DataFrame) -> pd.DataFrame:
        counters: dict[str, int] = {}
        for tok, cnt in zip(pdf["tok"], pdf["cnt"]):
            counters = _mg_merge(counters, {tok: int(cnt)}, k)
        out = pd.DataFrame({"tok": list(counters.keys()), "est_cnt": list(counters.values())})
        return out.sort_values(["est_cnt", "tok"], ascending=[False, True]).head(topn)

    partials = tokens_df.select(F.col(col).alias(col)).mapInPandas(
        mg_partition, summary_schema
    )
    merged = partials.groupBy().applyInPandas(mg_final, "tok string, est_cnt long")
    return merged.orderBy(F.desc("est_cnt"), "tok")
