"""Motif compiler: parse errors, repeated-variable semantics, and
brute-force binding equality on a hand graph."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from citegraph_spark.operators.motif import find_motifs, parse_pattern

EDGES = [(1, 2), (2, 3), (3, 1), (2, 4), (4, 2), (4, 5)]


def _edges_df(spark):
    return spark.createDataFrame(EDGES, "src int, dst int")


def test_parse_pattern():
    assert parse_pattern("(a)-[]->(b); (b)-[]->(c)") == [("a", "b"), ("b", "c")]
    with pytest.raises(ValueError):
        parse_pattern("(a)-[e]->(b)")
    with pytest.raises(ValueError):
        parse_pattern("")
    with pytest.raises(ValueError):
        find_motifs(None, "(a)-[]->(b); (c)-[]->(d)")  # disconnected


def _brute(pattern_terms, variables):
    es = set(EDGES)
    nodes = {n for e in EDGES for n in e}
    out = set()
    for combo in itertools.product(nodes, repeat=len(variables)):
        binding = dict(zip(variables, combo))
        if all((binding[a], binding[b]) in es for a, b in pattern_terms):
            out.add(tuple(binding[v] for v in variables))
    return out


def test_chain_and_cycle_bindings_match_bruteforce(spark):
    e = _edges_df(spark)
    for pat, vs in [
        ("(a)-[]->(b); (b)-[]->(c)", ["a", "b", "c"]),
        ("(a)-[]->(b); (b)-[]->(a)", ["a", "b"]),  # reciprocal pairs
        ("(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)", ["a", "b", "c"]),
        ("(a)-[]->(a)", ["a"]),  # self-loop: repeated var = same vertex
    ]:
        got = {tuple(r) for r in find_motifs(e, pat).collect()}
        assert got == _brute(parse_pattern(pat), vs), pat


def test_motif_column_order_is_first_appearance(spark):
    e = _edges_df(spark)
    df = find_motifs(e, "(x)-[]->(y); (y)-[]->(z)")
    assert df.columns == ["x", "y", "z"]
