"""Graph sampling / centrality extensions beyond the reference's two
analytics tasks: deterministic random walks (node2vec-style positive
sampling) and exact harmonic centrality on the fixture graph.

Both stay oracle-able by construction: the walk's "randomness" is an
md5-ranked neighbor choice (same hex in Spark and DuckDB), and harmonic
centrality runs on the embedded 17-edge fixture so the oracle can do
all-pairs BFS with a recursive CTE."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import edges_values_sql, fixture_citations
from .entry_queries import _CIT_SQL, _citations, register

_WALK_STEPS = 3
_START_MOD = 97


def _walk_step(frontier: DataFrame, edges: DataFrame, step: int) -> DataFrame:
    """One deterministic walk step: from each walker's current node,
    choose the out-neighbor with the smallest md5(cur|nbr|step) digest.
    min_by is a hash aggregate (map-side combinable) — per step the cost
    is one shuffle on the walker id, never a window sort. Dead ends
    (no out-edges) keep a NULL via the left join and stay NULL after."""
    cur = frontier.columns[-1]
    step_col = f"n{step}"
    cand = frontier.join(
        edges.withColumnRenamed("from", "_f").withColumnRenamed("to", "_t"),
        F.col(cur) == F.col("_f"),
        "left",
    ).withColumn(
        "_h",
        F.md5(
            F.concat_ws(
                "|",
                F.col(cur).cast("string"),
                F.col("_t").cast("string"),
                F.lit(str(step)),
            )
        ),
    )
    return cand.groupBy(*frontier.columns).agg(
        F.min_by("_t", "_h").alias(step_col)
    )


def _walk_step_sql(prev: str, step: int) -> str:
    cols = ", ".join(f"n{j}" for j in range(1, step))
    keep = f"start, {cols}, " if cols else "start, "
    return f"""
s{step} AS (
  SELECT {keep}
         arg_min(cit."to", md5(CAST(s.n{step - 1} AS VARCHAR) || '|' ||
                               CAST(cit."to" AS VARCHAR) || '|' || '{step}'))
           AS n{step}
  FROM {prev} s LEFT JOIN cit ON s.n{step - 1} = cit."from"
  GROUP BY ALL
)"""


@register(
    "graph_random_walks",
    f"""
WITH cit AS ({_CIT_SQL}),
starts AS (
  SELECT DISTINCT "from" AS start, "from" AS n0 FROM cit
  WHERE "from" % {_START_MOD} = 0
),
{",".join(_walk_step_sql("starts" if k == 1 else f"s{k - 1}", k) for k in range(1, _WALK_STEPS + 1))}
SELECT start, n1, n2, n3 FROM s{_WALK_STEPS} ORDER BY start
""",
)
def graph_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic {_WALK_STEPS}-step out-edge walks from a hashed
    start sample — the positive-pair sampler for DeepWalk/node2vec-style
    embedding training (Perozzi et al., KDD'14), made reproducible by
    ranking neighbors with md5(cur|nbr|step) instead of an RNG (the
    standard seeded-walk trick: any uniform hash is a valid sampler and
    re-runs identically across engines and retries — at 100 TB a
    task-retry MUST NOT change the walk).

    Scale shape: each step is one equi-join current-node -> edge-list
    plus a map-side-combinable min_by aggregate; walker state is one row
    per walk, so W walks x S steps costs S joins on a frame of W rows —
    never materializing neighborhoods. Dead ends propagate NULL."""
    edges = _citations(spark, sf_dir)
    walks = (
        edges.select(F.col("from").alias("start"))
        .filter(F.col("start") % _START_MOD == 0)
        .distinct()
        .withColumn("n0", F.col("start"))
    )
    for k in range(1, _WALK_STEPS + 1):
        walks = _walk_step(walks, edges, k)
    return walks.select("start", "n1", "n2", "n3").orderBy("start")


@register(
    "fixture_harmonic_centrality",
    f"""
WITH RECURSIVE ed AS (SELECT * FROM (VALUES {edges_values_sql()}) e("from", "to")),
bidir AS (
  SELECT "from" AS s, "to" AS d FROM ed WHERE "from" <> "to"
  UNION SELECT "to", "from" FROM ed WHERE "from" <> "to"
),
nodes AS (SELECT DISTINCT s AS id FROM bidir),
r AS (
  SELECT id AS src, id AS node, 0 AS dist FROM nodes
  UNION
  SELECT r.src, b.d, r.dist + 1 FROM r JOIN bidir b ON r.node = b.s
  WHERE r.dist < 20
),
sp AS (SELECT src, node, min(dist) AS dist FROM r GROUP BY 1, 2)
SELECT src AS id,
       round(sum(CASE WHEN dist > 0 THEN 1.0 / dist ELSE 0 END), 6) AS harmonic
FROM sp GROUP BY 1 ORDER BY id
""",
)
def fixture_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact harmonic centrality sum(1/d(u,v)) on the undirected fixture
    graph via simultaneous multi-source BFS: the frontier carries
    (src, node) pairs, each round is ONE join + ONE anti-join against
    the seen set — the same fused-shuffle cadence as the hop-plot BFS
    (operators/graph.py:244-255), generalized to per-source distances.

    Exact all-pairs state is O(n^2) and is the point of this operator
    only at fixture/subgraph scale; the 100 TB path is the HyperBall
    harmonic estimator (Boldi-Vigna 2013) whose register state already
    exists in functions/sketches.py — same contract as exact-hop-plot
    vs graph_hyperball. The operator takes the driver-local fast path
    below 2000 edges (operators/graph.py harmonic_centrality), exactly
    like the hop-plot BFS does."""
    from ..operators.graph import harmonic_centrality

    edges = fixture_citations(spark).filter(F.col("from") != F.col("to"))
    bidir = (
        edges.select(F.col("from").alias("s"), F.col("to").alias("d"))
        .union(edges.select(F.col("to").alias("s"), F.col("from").alias("d")))
        .distinct()
    )
    return harmonic_centrality(bidir)
