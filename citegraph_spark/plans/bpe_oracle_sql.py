"""DuckDB replay oracle for the BPE training loop.

bpe_train (functions/text.py) is deterministic — per round: weighted
bigram counts over the vocab symbol table, argmax with (count desc,
left, right) tie-break, then a greedy left-to-right merge fold. Nothing
in it is float- or engine-order-sensitive, so the whole loop unrolls
into one SQL statement and `bpe_train_merges` upgrades from rows-only
to a full value-hash oracle:

- the symbol table is relational: (tok, cnt, pos, sym), one row per
  symbol position of each distinct corpus token;
- a round's top pair is a 1-row MATERIALIZED CTE (the driver argmax,
  re-expressed); MATERIALIZED is load-bearing — DuckDB inlines plain
  CTEs per reference, which goes exponential over 8 chained rounds;
- the greedy left-to-right fold becomes gaps-and-islands: candidate
  positions (sym=a, next=b) form consecutive runs only when a = b
  (if a <> b, a candidate's successor position starts with b, never a),
  and the fold keeps exactly the even offsets within each run —
  `pos - min(pos) OVER (island)` even. Merged rows take sym || b,
  successor rows drop, positions renumber.

Verified row-identical to the Spark loop at sf0.001/sf0.01
(tests/test_analytics_queries.py + the oracle gate).
"""

from __future__ import annotations


def bpe_oracle_sql(n_merges: int = 8) -> str:
    parts = [
        """
WITH
vocab AS MATERIALIZED (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
  FROM (
    SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok
    FROM documents
  ) WHERE tok <> '' GROUP BY tok
),
s0 AS MATERIALIZED (
  SELECT tok, cnt, i.i AS pos, substr(tok, i.i, 1) AS sym
  FROM vocab, LATERAL (SELECT unnest(range(1, length(tok) + 1)) AS i) i
)"""
    ]
    for r in range(1, n_merges + 1):
        p = r - 1
        parts.append(
            f""",
pair{r} AS MATERIALIZED (
  SELECT x.sym AS a, y.sym AS b, CAST(sum(x.cnt) AS BIGINT) AS c
  FROM s{p} x JOIN s{p} y ON x.tok = y.tok AND y.pos = x.pos + 1
  GROUP BY x.sym, y.sym
),
top{r} AS MATERIALIZED (SELECT a, b, c FROM pair{r} ORDER BY c DESC, a, b LIMIT 1),
cand{r} AS MATERIALIZED (
  SELECT x.tok, x.pos
  FROM s{p} x JOIN s{p} y ON x.tok = y.tok AND y.pos = x.pos + 1, top{r} t
  WHERE x.sym = t.a AND y.sym = t.b
),
keep{r} AS MATERIALIZED (
  SELECT tok, pos FROM (
    SELECT tok, pos, pos - min(pos) OVER (PARTITION BY tok, grp) AS off
    FROM (SELECT tok, pos,
                 pos - row_number() OVER (PARTITION BY tok ORDER BY pos) AS grp
          FROM cand{r})
  ) WHERE off % 2 = 0
),
s{r} AS MATERIALIZED (
  SELECT tok, cnt,
         CAST(row_number() OVER (PARTITION BY tok ORDER BY pos) AS BIGINT) AS pos,
         sym
  FROM (
    SELECT x.tok, x.cnt, x.pos,
           CASE WHEN k.pos IS NOT NULL
                THEN x.sym || (SELECT b FROM top{r}) ELSE x.sym END AS sym
    FROM s{p} x
    LEFT JOIN keep{r} k ON x.tok = k.tok AND x.pos = k.pos
    WHERE NOT EXISTS (SELECT 1 FROM keep{r} k2
                      WHERE k2.tok = x.tok AND k2.pos = x.pos - 1)
  )
)"""
        )
    tops = "\nUNION ALL\n".join(
        f"SELECT {r} AS step, a AS left, b AS right, c AS cnt FROM top{r}"
        for r in range(1, n_merges + 1)
    )
    parts.append(
        f'\nSELECT CAST(step AS INT) AS step, "left", "right", cnt'
        f"\nFROM ({tops}) ORDER BY step"
    )
    return "".join(parts)
