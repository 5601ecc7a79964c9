"""Pins for oracle clauses the testdata cannot constrain (round-13
oracle-mutation-audit finds OM20/OM23, same class as OM04/OM14).

Verified by direct count at ALL THREE SFs:
- no 'click' event shares an exact timestamp with any user's first
  'view' — so events_funnel's strict step-advance (`e.ts > v.t1` vs
  `>=`) is data-unconstrained everywhere;
- no document text contains '_' — so text_token_count's underscore
  word-class (`[a-z0-9_]+` vs `[a-z0-9]+`) is data-unconstrained
  everywhere.

Each test plants the missing boundary case and runs the REAL
registered query, so the semantics are pinned at test time regardless
of SF.
"""

from __future__ import annotations

import datetime as dt


def test_funnel_click_at_exact_first_view_ts_does_not_advance(tmp_path, spark):
    from citegraph_spark.plans.entry_queries import QUERIES

    base = dt.datetime(2025, 1, 1, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = [
        # user 1: click at EXACTLY the first-view timestamp — strictly-
        # after semantics must NOT advance them to step 2
        (1, "view", base), (1, "click", base),
        # user 2: click strictly after the first view — advances; a
        # purchase at EXACTLY the click min must NOT reach step 3
        (2, "view", base), (2, "click", base + s),
        (2, "purchase", base + s),
        # user 3: full strict chain — reaches step 3
        (3, "view", base), (3, "click", base + s), (3, "purchase", base + 2 * s),
    ]
    ev = spark.createDataFrame(
        [(u, t, ts, 1.0) for u, t, ts in rows],
        "user_id int, event_type string, ts timestamp, value double",
    )
    ev.write.parquet(str(tmp_path / "events.parquet"))

    out = {r["step"]: r["users"]
           for r in QUERIES["events_funnel"](spark, str(tmp_path)).collect()}
    # the >= mutant reads {1: 3, 2: 3, 3: 2}
    assert out == {1: 3, 2: 2, 3: 1}, out


def test_token_count_treats_underscore_as_word_char(tmp_path, spark):
    from citegraph_spark.plans.entry_queries import QUERIES

    docs = spark.createDataFrame(
        [
            # one word-run token (underscore is a word char) + one word
            (1, "foo_bar baz"),
            # leading/trailing underscores still glue into one run
            (2, "_x_ y"),
            # control without underscores: 2 words + 1 punctuation
            (3, "plain text!"),
        ],
        "doc_id int, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))

    out = {r["doc_id"]: r["n_tokens"]
           for r in QUERIES["text_token_count"](spark, str(tmp_path)).collect()}
    # the declassed-underscore mutant reads {1: 4, 2: 5, 3: 3}
    assert out == {1: 2, 2: 2, 3: 3}, out
