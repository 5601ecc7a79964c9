"""citegraph_spark — a PySpark-native analytics engine.

A from-scratch, DataFrame-first re-expression of the query surface of the
reference citation-graph analytics application (inf0rmatiker/citegraph,
see SURVEY.md), extended with large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing, event-time
streaming).

Design principles (SURVEY.md §7):
- DataFrame / Spark SQL only; no RDD API, no row-at-a-time Python UDFs in
  hot paths. Catalyst + Tungsten pick physical strategies.
- Every operator is a small composable function `f(df, ...) -> DataFrame`
  that builds a lazy logical plan; actions happen only at the edges
  (driver loops, sinks, tests).
- Designed for 1000-executor / 100 TB scale: broadcast small dims, frontier
  BFS with lineage truncation, LSH instead of quadratic candidate
  generation, partition-count awareness.
"""

__version__ = "0.1.0"
