"""Motif finding: compile a GraphFrames-style pattern string into a
DataFrame join plan over an edge list.

    find_motifs(edges, "(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)")

returns one row per binding of the named vertex variables (columns in
first-appearance order). Semantics match GraphFrames' `find`
(graphframes.github.io motif docs, public API): a repeated variable
means the SAME vertex (expressed as an equi-join key, never a post-hoc
filter); DIFFERENT variables may still bind the same vertex (no implicit
distinctness — callers add inequality filters); each pattern TERM must
match a distinct edge only if the caller says so. Edges DataFrame has
columns (src, dst).

Execution shape: the pattern compiles left-to-right into equi-joins of
the edge table against the accumulated binding frame — each term is ONE
shuffle (or broadcast, Catalyst/AQE's choice) keyed on the shared
variables, which is exactly how GraphFrames plans motifs on Spark. Cost
scales with intermediate binding cardinality, so put the most selective
terms first; for wedge/triangle workloads prefer the degree-ordered
specializations in operators/graph.py (co_citation, triangle_stats)
which cap hub blowup explicitly.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TERM = re.compile(r"^\((\w+)\)-\[\]->\((\w+)\)$")


def parse_pattern(pattern: str) -> list[tuple[str, str]]:
    """'(a)-[]->(b); (b)-[]->(c)' -> [('a','b'), ('b','c')]."""
    terms = []
    for raw in pattern.split(";"):
        raw = raw.strip()
        if not raw:
            continue
        m = _TERM.match(raw)
        if not m:
            raise ValueError(f"unsupported motif term: {raw!r}")
        terms.append((m.group(1), m.group(2)))
    if not terms:
        raise ValueError("empty motif pattern")
    return terms


def find_motifs(edges: DataFrame, pattern: str) -> DataFrame:
    """Compile `pattern` to joins over `edges` (columns src, dst) and
    return the bound vertex variables in first-appearance order."""
    terms = parse_pattern(pattern)
    order: list[str] = []
    for i, (a, b) in enumerate(terms):
        if i > 0 and a not in order and b not in order:
            raise ValueError(
                f"term ({a})-[]->({b}) shares no variable with earlier "
                "terms — disconnected patterns would be a cross join"
            )
        for v in (a, b):
            if v not in order:
                order.append(v)

    result: DataFrame | None = None
    bound: set[str] = set()
    for i, (a, b) in enumerate(terms):
        e = edges.select(
            F.col("src").alias(f"_s{i}"), F.col("dst").alias(f"_d{i}")
        )
        if result is None:
            if a == b:  # self-loop term: one variable, equal endpoints
                result = e.filter(F.col(f"_s{i}") == F.col(f"_d{i}")).select(
                    F.col(f"_s{i}").alias(a)
                )
            else:
                result = e.select(
                    F.col(f"_s{i}").alias(a), F.col(f"_d{i}").alias(b)
                )
            bound = {a, b}
            continue
        on = []
        if a in bound:
            on.append(F.col(a) == F.col(f"_s{i}"))
        if b in bound:
            on.append(F.col(b) == F.col(f"_d{i}"))
        cond = on[0]
        for c in on[1:]:
            cond = cond & c
        result = result.join(e, cond)
        sel = [F.col(v) for v in order if v in bound]
        if a not in bound:
            sel.append(F.col(f"_s{i}").alias(a))
            bound.add(a)
        if b not in bound:
            sel.append(F.col(f"_d{i}").alias(b))
            bound.add(b)
        result = result.select(*sel)
    return result.select(*order)
