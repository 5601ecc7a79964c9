"""Differential plan fuzzer: random relational plans, two engines, one AST.

The 229 registry oracles pin FIXED plans; this tool extends the same
Spark-vs-DuckDB methodology to UNBOUNDED random plans. A seeded generator
builds a small relational AST (scan -> FK joins -> filters -> aggregate/
project -> having/distinct -> sort+limit) over the testdata tables, then
renders the SAME tree twice — once as a PySpark DataFrame chain (through
`sources.tables.load_table`, so the real scan path) and once as DuckDB SQL
— and compares row count, column names, and the driver-format
order-insensitive value hash (tools/oracle_check.table_hash).

Why this catches what the fixed set can't: the fixed oracles cover each
operator's intended use; random composition walks the cross-product of
null propagation, three-valued logic, join-introduced nulls feeding
aggregates, empty groups, duplicate-row DISTINCT/limit ties — the corners
where engine dialects historically diverge (the r8 sf0.1 sweep found two
such boundary classes in FIXED plans; this hunts the same class
systematically).

Grammar v5 (round 11) adds the join/null/type surface v4 didn't reach:
RIGHT/FULL OUTER joins (fact-side null extension), NULL-injected join
keys / group keys / window partitions via nullif(col, v), UNION
(distinct) alongside UNION ALL, exact DECIMAL(18,4) casts + arithmetic
+ aggregation (scale-deterministic in both engines — no round() escape
hatch), date arithmetic derived from int columns (date_add / EXTRACT /
date_diff), and tiny limits (1, 3) for top-k tie stress. Window
functions are suppressed under right/full joins (a null-extended PK
voids the row-unique order contract).

Grammar v6 (round 12) reaches the subquery/HAVING surface:
uncorrelated scalar subqueries in WHERE (col <=> (SELECT agg FROM dim)),
correlated scalar subqueries in SELECT (decorrelated on the Spark side
as groupBy + left join, with the COUNT-over-empty-group coalesce(0)
trap encoded faithfully), IN / NOT IN against NULL-bearing subqueries
(the three-valued-logic trap: the Spark side decomposes NOT IN into
emptiness/null-count flags + anti join instead of pretending it is one),
HAVING on aggregates absent from the SELECT list, and RANGE window
frames (cumulative and N-PRECEDING) ordered by deliberately TIED keys —
tie-safe because RANGE pools peers, with exact-decimal sums so no float
order can hide.

Grammar v7 (round 13) reaches the multiplicity/filtered-aggregate
surface: one-to-many FAN-OUT joins (orders→lineitem etc. — parent rows
duplicate through the child, so aggregates see multiplicities the
unique-dim FK chains never produce; LEFT fan-out null-extends childless
parents so count-over-NULL-children and sum-of-nothing corners fire),
aggregate FILTER clauses (agg(x) FILTER (WHERE p) vs Spark's
agg(CASE WHEN p THEN x END) — the all-rows-filtered-out group must
yield NULL, not 0, and a NULL predicate must act as false),
sum(DISTINCT ...) over exact decimals/ints, and explicit GROUPING SETS
(random subset lattices beside the existing ROLLUP/CUBE, rendered via
DataFrame.groupingSets with GROUPING() disambiguators). Windows are
suppressed under fan-out joins (the duplicated PK voids the row-unique
order contract, same rule as right/full outer).

Determinism policy (mirrors the registry's): aggregation over doubles is
rendered `round(agg(x), 2|6)` on BOTH sides (the repo-wide double-sum
policy); LIMIT is only emitted after an ORDER BY over every output column
with pinned null order, so the kept multiset is engine-independent even
under ties; integer arithmetic is cast to BIGINT on both sides (Spark 4
runs ANSI mode — int32 overflow would error, and DuckDB's promotion rules
differ). Timestamp and nested columns are out of scope (the TZ story is
pinned by the round-6 audit + fixed oracles; lists aren't comparable via
the hash normalizer).

Usage:
  python tools/plan_fuzz.py [--n 200] [--seed0 0] [--sf-dir DIR] [--show N]
                            [--scramble K]

--scramble K additionally round-robin-repartitions every scan into K
partitions before the plan runs, scrambling row order the way a wide
cluster would — the hashes must STILL agree, so any order-dependent
plan construct is caught without needing a DuckDB disagreement.

tests/test_plan_fuzz.py runs a pinned seed block as a standing gate.
"""

from __future__ import annotations

import math
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.oracle_check import table_hash  # noqa: E402

SF_DIR_DEFAULT = "/root/testdata/sf0.001"

# --------------------------------------------------------------------------
# catalog: tables, typed columns, FK edges, literal-sampling rules
# --------------------------------------------------------------------------

# type in {"int", "double", "str"}; timestamp/list columns are excluded.
TABLES: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int", "r_name": "str"},
    "nation": {"n_nationkey": "int", "n_name": "str", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "int", "c_name": "str", "c_nationkey": "int",
        "c_acctbal": "double", "c_mktsegment": "str",
    },
    "supplier": {
        "s_suppkey": "int", "s_name": "str", "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int", "p_name": "str", "p_brand": "str",
        "p_type": "str", "p_size": "int", "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int", "o_custkey": "int", "o_orderstatus": "str",
        "o_totalprice": "double", "o_orderpriority": "str",
    },
    "lineitem": {
        "l_orderkey": "int", "l_partkey": "int", "l_suppkey": "int",
        "l_linenumber": "int", "l_quantity": "double",
        "l_extendedprice": "double", "l_discount": "double",
        "l_tax": "double", "l_returnflag": "str", "l_linestatus": "str",
    },
    "documents": {
        "doc_id": "int", "text": "str", "lang": "str", "source": "str",
        "n_chars": "int",
    },
    "events": {
        "event_id": "int", "user_id": "int", "event_type": "str",
        "value": "double",
    },
}

# row-unique key per table: FK joins to unique-keyed dims never duplicate
# fact rows, so these stay row-unique after any join chain — they pin the
# total order that makes window functions engine-deterministic. NOTE the
# synthetic lineitem does NOT honor TPC-H's (l_orderkey, l_linenumber)
# uniqueness (~23% duplicate pairs — found by this fuzzer's first deep
# sweep: 4 window seeds diverged on tie order), but its full non-timestamp
# column tuple IS unique at every SF, so that is the order key.
# sample_literals() re-verifies uniqueness against the live data so a
# testdata regen can't silently reintroduce tie-dependent windows.
PKS: dict[str, list[str]] = {
    "region": ["r_regionkey"], "nation": ["n_nationkey"],
    "customer": ["c_custkey"], "supplier": ["s_suppkey"],
    "part": ["p_partkey"], "orders": ["o_orderkey"],
    "lineitem": [
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus",
    ],
    "documents": ["doc_id"], "events": ["event_id"],
}

# fact-table FK -> (dim table, dim key); only natural keys so join
# cardinality stays bounded by the fact side.
FKS: dict[str, list[tuple[str, str, str]]] = {
    "lineitem": [
        ("l_orderkey", "orders", "o_orderkey"),
        ("l_partkey", "part", "p_partkey"),
        ("l_suppkey", "supplier", "s_suppkey"),
    ],
    "orders": [("o_custkey", "customer", "c_custkey")],
    "customer": [("c_nationkey", "nation", "n_nationkey")],
    "supplier": [("s_nationkey", "nation", "n_nationkey")],
    "nation": [("n_regionkey", "region", "r_regionkey")],
}

# v7: parent PK -> (pk_col, child table, child FK): one-to-many edges
# where joining DUPLICATES parent rows (the multiplicity corner).
# Child column names never collide with any reachable parent/dim chain
# (TPC-H prefix discipline).
FANOUT: dict[str, list[tuple[str, str, str]]] = {
    "orders": [("o_orderkey", "lineitem", "l_orderkey")],
    "customer": [("c_custkey", "orders", "o_custkey")],
    "part": [("p_partkey", "lineitem", "l_partkey")],
    "supplier": [("s_suppkey", "lineitem", "l_suppkey")],
    "nation": [("n_nationkey", "customer", "c_nationkey"),
               ("n_nationkey", "supplier", "s_nationkey")],
}

# columns eligible as comparison/IN/LIKE literals (bounded, well-behaved
# value domains); long free-text columns only feed length()/IS NULL.
NO_LITERAL_COLS = {"text", "c_name", "s_name", "p_name"}

# low-cardinality columns preferred as GROUP BY keys
GROUPABLE = {
    "r_name", "n_name", "c_mktsegment", "c_nationkey", "s_nationkey",
    "p_brand", "p_type", "p_size", "o_orderstatus", "o_orderpriority",
    "l_returnflag", "l_linestatus", "l_linenumber", "lang", "source",
    "event_type", "n_regionkey", "r_regionkey",
}


def sample_literals(con, sf_dir: str) -> dict[tuple[str, str], list]:
    """Deterministic per-column literal pools from the actual data.

    Numerics: discrete quantiles (hit real values -> filters select rows).
    Strings: most frequent values with a total tie-break order.
    """
    pools: dict[tuple[str, str], list] = {}
    for t, cols in TABLES.items():
        con.execute(
            f"CREATE OR REPLACE VIEW _fz_{t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
        for c, ty in cols.items():
            if c in NO_LITERAL_COLS:
                continue
            if ty in ("int", "double"):
                row = con.execute(
                    f"SELECT quantile_disc({c}, "
                    f"[0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]) FROM _fz_{t} "
                    f"WHERE {c} IS NOT NULL"
                ).fetchone()
                vals = list(dict.fromkeys(row[0] or []))
                # NaN/±inf would render as bare 'nan'/'inf' identifiers in
                # SQL and diverge on comparison semantics; keep pools finite.
                vals = [
                    v for v in vals
                    if not isinstance(v, float) or math.isfinite(v)
                ]
            else:
                vals = [
                    r[0]
                    for r in con.execute(
                        f"SELECT {c} FROM _fz_{t} WHERE {c} IS NOT NULL "
                        f"GROUP BY 1 ORDER BY count(*) DESC, 1 LIMIT 10"
                    ).fetchall()
                ]
            if vals:
                pools[(t, c)] = vals
    for t, key in PKS.items():
        tup = ", ".join(key)
        n, d = con.execute(
            f"SELECT count(*), count(DISTINCT ({tup})) FROM _fz_{t}"
        ).fetchone()
        if n != d:
            raise AssertionError(
                f"PKS[{t!r}] = {key} is not row-unique in {sf_dir} "
                f"({n} rows, {d} distinct) — window determinism contract broken"
            )
    return pools


# --------------------------------------------------------------------------
# expression AST — every node renders to both dialects
# --------------------------------------------------------------------------


def _cmp_col(op: str, a, b):
    """Comparison Column from an op token (shared by scalar-subquery and
    HAVING renders)."""
    return {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b}[op]


def sql_lit(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, float):
        # repr() on non-finite floats yields 'nan'/'inf' — bare identifiers
        # DuckDB rejects; render them as casts so both dialects parse.
        if v != v:
            return "CAST('NaN' AS DOUBLE)"
        if v in (float("inf"), float("-inf")):
            sign = "-" if v < 0 else ""
            return f"CAST('{sign}Infinity' AS DOUBLE)"
        return repr(v)  # full precision round-trip
    return str(v)


class Expr:
    ty: str

    def sql(self) -> str:
        raise NotImplementedError

    def spark(self, F):
        raise NotImplementedError


class Col(Expr):
    def __init__(self, name: str, ty: str):
        self.name, self.ty = name, ty

    def sql(self):
        return self.name

    def spark(self, F):
        return F.col(self.name)


class Lit(Expr):
    def __init__(self, v, ty: str):
        self.v, self.ty = v, ty

    def sql(self):
        return sql_lit(self.v)

    def spark(self, F):
        return F.lit(self.v)


class Cmp(Expr):
    ty = "bool"
    OPS = {"<": "<", "<=": "<=", ">": ">", ">=": ">=", "=": "=", "!=": "<>"}

    def __init__(self, op: str, a: Expr, b: Expr):
        self.op, self.a, self.b = op, a, b

    def sql(self):
        return f"({self.a.sql()} {self.OPS[self.op]} {self.b.sql()})"

    def spark(self, F):
        a, b = self.a.spark(F), self.b.spark(F)
        return {
            "<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b,
            "=": a == b, "!=": a != b,
        }[self.op]


class IsNull(Expr):
    ty = "bool"

    def __init__(self, a: Expr, negate: bool):
        self.a, self.negate = a, negate

    def sql(self):
        return f"({self.a.sql()} IS {'NOT ' if self.negate else ''}NULL)"

    def spark(self, F):
        c = self.a.spark(F)
        return c.isNotNull() if self.negate else c.isNull()


class InList(Expr):
    ty = "bool"

    def __init__(self, a: Expr, vals: list):
        self.a, self.vals = a, vals

    def sql(self):
        return f"({self.a.sql()} IN ({', '.join(sql_lit(v) for v in self.vals)}))"

    def spark(self, F):
        return self.a.spark(F).isin(self.vals)


class Between(Expr):
    ty = "bool"

    def __init__(self, a: Expr, lo, hi):
        self.a, self.lo, self.hi = a, lo, hi

    def sql(self):
        return f"({self.a.sql()} BETWEEN {sql_lit(self.lo)} AND {sql_lit(self.hi)})"

    def spark(self, F):
        return self.a.spark(F).between(self.lo, self.hi)


class Like(Expr):
    ty = "bool"

    def __init__(self, a: Expr, prefix: str):
        self.a, self.prefix = a, prefix

    def sql(self):
        return f"({self.a.sql()} LIKE {sql_lit(self.prefix + '%')})"

    def spark(self, F):
        # prefix is stripped of %_\ at generation (DuckDB LIKE has no
        # default escape char), so no escaping is needed on either side
        return self.a.spark(F).like(self.prefix + "%")


class BoolOp(Expr):
    ty = "bool"

    def __init__(self, op: str, a: Expr, b: Expr):
        self.op, self.a, self.b = op, a, b

    def sql(self):
        return f"({self.a.sql()} {self.op} {self.b.sql()})"

    def spark(self, F):
        a, b = self.a.spark(F), self.b.spark(F)
        return (a & b) if self.op == "AND" else (a | b)


class Arith(Expr):
    """Numeric arithmetic; int operands widened to BIGINT on both sides
    (Spark 4 ANSI overflow vs DuckDB promotion would otherwise diverge)."""

    def __init__(self, op: str, a: Expr, b: Expr):
        self.op, self.a, self.b = op, a, b
        self.ty = ("dec" if "dec" in (a.ty, b.ty)
                   else "double" if "double" in (a.ty, b.ty) else "int")

    def _wrap_sql(self, e: Expr) -> str:
        return f"CAST({e.sql()} AS BIGINT)" if e.ty == "int" else e.sql()

    def _wrap_spark(self, e: Expr, F):
        c = e.spark(F)
        return c.cast("long") if e.ty == "int" else c

    def sql(self):
        return f"({self._wrap_sql(self.a)} {self.op} {self._wrap_sql(self.b)})"

    def spark(self, F):
        a, b = self._wrap_spark(self.a, F), self._wrap_spark(self.b, F)
        return {"+": a + b, "-": a - b, "*": a * b}[self.op]


class CaseWhen(Expr):
    def __init__(self, pred: Expr, a: Expr, b: Expr):
        self.pred, self.a, self.b = pred, a, b
        self.ty = "double" if "double" in (a.ty, b.ty) else a.ty

    def sql(self):
        return (f"(CASE WHEN {self.pred.sql()} THEN {self.a.sql()} "
                f"ELSE {self.b.sql()} END)")

    def spark(self, F):
        return F.when(self.pred.spark(F), self.a.spark(F)).otherwise(
            self.b.spark(F))


class WinFn(Expr):
    """Window expression, engine-deterministic by construction:

    - running sum/avg/count/min/max order by the row-unique PK with an
      explicit ROWS UNBOUNDED PRECEDING..CURRENT ROW frame (sum/avg only
      over INT inputs — engines disagree on the accumulation-tree shape
      for running double sums, so those stay out of scope);
    - rank/dense_rank order by a value column (tie-insensitive outputs);
    - row_number/lag/lead order by the PK (total order).
    NULLS FIRST is pinned explicitly on both sides.
    """

    AGGS = ("sum", "avg", "count", "min", "max")

    def __init__(self, fn: str, col: Expr | None, part: Col | None,
                 order_cols: list[Col], frame: str = "rows",
                 range_off: int | None = None):
        # frame: "rows" (ROWS UNBOUNDED..CURRENT over a row-unique order,
        # the v4 contract) or "range" (v6: RANGE frame over a single int
        # order key that MAY have ties — tie-safe because RANGE pools
        # peers; with range_off set, RANGE range_off PRECEDING..CURRENT).
        # Range aggregates stick to exact inputs (decimal sum / min /
        # max / count) so no float accumulation order can differ.
        self.fn, self.col, self.part, self.order_cols = fn, col, part, order_cols
        self.frame, self.range_off = frame, range_off
        self.ty = ("double" if fn == "avg"
                   else "int" if fn in ("count", "rank", "dense_rank",
                                        "row_number", "sum")
                   else col.ty)

    def sql(self):
        arg = self.col.sql() if self.col is not None else ""
        if self.fn in ("lag", "lead"):
            head = f"{self.fn}({arg}, 1)"
        elif self.fn in ("rank", "dense_rank", "row_number"):
            head = f"{self.fn}()"
        else:
            head = f"{self.fn}({arg})"
        parts = []
        if self.part is not None:
            parts.append(f"PARTITION BY {self.part.sql()}")
        parts.append("ORDER BY " + ", ".join(
            f"{c.sql()} ASC NULLS FIRST" for c in self.order_cols))
        if self.fn in self.AGGS:
            if self.frame == "range":
                lo = ("UNBOUNDED" if self.range_off is None
                      else str(self.range_off))
                parts.append(
                    f"RANGE BETWEEN {lo} PRECEDING AND CURRENT ROW")
            else:
                parts.append(
                    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW")
        return f"{head} OVER ({' '.join(parts)})"

    def spark(self, F):
        from pyspark.sql import Window

        w = Window.partitionBy(
            *( [self.part.spark(F)] if self.part is not None else [] )
        ).orderBy(*[c.spark(F).asc_nulls_first() for c in self.order_cols])
        if self.fn in self.AGGS:
            if self.frame == "range":
                lo = (Window.unboundedPreceding if self.range_off is None
                      else -self.range_off)
                w = w.rangeBetween(lo, Window.currentRow)
            else:
                w = w.rowsBetween(Window.unboundedPreceding,
                                  Window.currentRow)
            return {"sum": F.sum, "avg": F.avg, "count": F.count,
                    "min": F.min, "max": F.max}[self.fn](
                        self.col.spark(F)).over(w)
        if self.fn in ("rank", "dense_rank", "row_number"):
            return {"rank": F.rank, "dense_rank": F.dense_rank,
                    "row_number": F.row_number}[self.fn]().over(w)
        return {"lag": F.lag, "lead": F.lead}[self.fn](
            self.col.spark(F), 1).over(w)


class NullIf(Expr):
    """NULL injector (grammar v5): nullif(col, v) turns a matching value
    into NULL so join keys, group keys, and window partitions exercise
    null semantics the raw (null-free) testdata columns never produce.
    Both engines agree NULL group/partition keys form ONE group and NULL
    join keys match NOTHING — that agreement is exactly what's under test.
    """

    def __init__(self, a: Expr, v):
        self.a, self.v = a, v
        self.ty = a.ty

    def sql(self):
        return f"nullif({self.a.sql()}, {sql_lit(self.v)})"

    def spark(self, F):
        return F.nullif(self.a.spark(F), F.lit(self.v))


class DecCast(Expr):
    """Exact decimal cast (grammar v5). Decimal arithmetic is the one
    numeric tower where engines CANNOT hide behind float rounding:
    sum/min/max and +,-,* are scale-deterministic in both dialects
    (sum keeps scale 4; s1+s2=8 for products), so the hash compares
    exact strings with no round() escape hatch.

    Width asymmetry (fuzzer-found, seed 2189): DuckDB 1.0 computes
    width<=18 decimal multiplies in INT64 and caps the result width at
    18 — (18,4)x(18,4) products of ~1e5 values overflow with an Out of
    Range error. An operand of width >=19 forces hugeint math and the
    w1+w2 result rule. So the DuckDB side casts to DECIMAL(19,4) and
    Spark to DECIMAL(18,4): products come out DECIMAL(37,8) on BOTH
    engines (Spark: 18+18+1; DuckDB: 19+18), sums/compares keep scale 4,
    and every shared value is exactly representable in both widths."""

    def __init__(self, a: Expr):
        self.a = a
        self.ty = "dec"

    def sql(self):
        return f"CAST({self.a.sql()} AS DECIMAL(19,4))"

    def spark(self, F):
        return self.a.spark(F).cast("decimal(18,4)")


class DateFromInt(Expr):
    """DATE '1992-01-01' + abs(x) % 2557 days (grammar v5) — derives a
    deterministic date from an int column so date arithmetic is testable
    without timestamp columns (excluded from the catalog; TZ story is
    pinned elsewhere). DuckDB date + integer adds days; Spark date_add.
    """

    EPOCH = "1992-01-01"
    MOD = 2557  # ~7 years of distinct days

    def __init__(self, a: Expr):
        self.a = a
        self.ty = "date"

    def sql(self):
        return (f"(DATE '{self.EPOCH}' + "
                f"CAST(abs({self.a.sql()}) % {self.MOD} AS INTEGER))")

    def spark(self, F):
        days = F.abs(self.a.spark(F)) % F.lit(self.MOD)
        return F.date_add(F.lit(self.EPOCH).cast("date"), days.cast("int"))


class DatePart(Expr):
    """EXTRACT(year|month|day FROM d) — int in both dialects."""

    def __init__(self, field: str, a: Expr):
        self.field, self.a = field, a
        self.ty = "int"

    def sql(self):
        return f"EXTRACT({self.field} FROM {self.a.sql()})"

    def spark(self, F):
        return {"year": F.year, "month": F.month,
                "day": F.dayofmonth}[self.field](self.a.spark(F))


class DateDiffDays(Expr):
    """Days between two derived dates: Spark datediff(end, start) ==
    DuckDB date_diff('day', start, end)."""

    def __init__(self, end: Expr, start: Expr):
        self.end, self.start = end, start
        self.ty = "int"

    def sql(self):
        return f"date_diff('day', {self.start.sql()}, {self.end.sql()})"

    def spark(self, F):
        return F.datediff(self.end.spark(F), self.start.spark(F))


class StrFn(Expr):
    def __init__(self, fn: str, a: Expr, args: tuple = ()):
        self.fn, self.a, self.args = fn, a, args
        self.ty = "int" if fn == "length" else "str"

    def sql(self):
        if self.fn == "substr":
            return f"substr({self.a.sql()}, {self.args[0]}, {self.args[1]})"
        return f"{self.fn}({self.a.sql()})"

    def spark(self, F):
        c = self.a.spark(F)
        if self.fn == "substr":
            return F.substring(c, self.args[0], self.args[1])
        return {"upper": F.upper, "lower": F.lower, "length": F.length}[self.fn](c)


# --------------------------------------------------------------------------
# plan AST
# --------------------------------------------------------------------------


class Plan:
    """Linear plan: scan -> joins -> filters -> (agg | project) -> having
    -> distinct -> sort+limit. `schema` tracks visible (name, ty) pairs."""

    def __init__(self, base: str):
        self.base = base
        self.joins: list[tuple[str, str, str, str, Expr | None, object]] = []
        # (fk_col, dim_table, dim_key, how, dim_prefilter, fk_null_lit)
        # how in {inner, left, right, full} (v5 adds the null-extending
        # pair); fk_null_lit, when set, wraps the fact key in
        # nullif(fk, lit) so NULL join keys flow through the join
        self.semijoins: list[tuple[str, str, str, bool, Expr | None]] = []
        # (fk_col, dim_table, dim_key, negate, dim_prefilter) — rendered
        # as [NOT] EXISTS in SQL and left_semi/left_anti in Spark (the
        # null-safe pair, unlike NOT IN); dim columns stay invisible
        self.in_subs: list[tuple[str, str, str, bool, Expr | None, object]] = []
        # v6: (fk_col, dim_table, dim_key, negate, dim_prefilter,
        # null_lit) — fk [NOT] IN (SELECT [nullif(dk, v)] FROM dim
        # [WHERE pre]). Unlike EXISTS, NOT IN is NOT null-safe: one NULL
        # in the list poisons every row (three-valued logic), and a NULL
        # probe never qualifies against a non-empty list. The Spark
        # render decomposes this faithfully (see _core_spark); at most
        # one per plan (flag-column aliases are fixed names).
        self.scalar_where: tuple[Expr, str, str, str, str, Expr | None] | None = None
        # v6: (lhs_expr, op, dim_table, agg_fn, dim_col, dim_prefilter)
        # — lhs op (SELECT agg(dim_col) FROM dim [WHERE pre]); an empty
        # dim makes the scalar NULL and the comparison drops every row,
        # which the Spark cross-join-one-row render reproduces exactly.
        self.corr_subs: list[tuple[str, str, str, str, str, str]] = []
        # v6: (fk, dim_table, dim_key, agg_fn, dim_col, alias) —
        # projection-form only: (SELECT agg(d.col) FROM dim d WHERE
        # d.dk = base.fk) AS alias. Spark side decorrelates as
        # groupBy(dk) + LEFT join; COUNT over a no-match group is 0 in
        # SQL but NULL after the join, so count gets coalesce(,0).
        self.having_agg: tuple[str, "Col", str, object] | None = None
        # v6: (fn, col, op, lit) — HAVING on an aggregate that is NOT in
        # the SELECT list (plain group mode only); Spark computes it as
        # a hidden agg column, filters, drops.
        self.filters: list[Expr] = []
        self.group_keys: list[Col] = []
        self.aggs: list[tuple[str, Col | None, str, int | None]] = []
        # (fn, col, alias, round_digits)
        self.projections: list[tuple[Expr, str]] = []  # (expr, alias)
        self.having: Expr | None = None
        self.group_mode = "plain"  # plain | rollup | cube | sets
        self.gsets: list[list[int]] | None = None
        # v7 (group_mode == "sets"): explicit GROUPING SETS as distinct
        # index-subsets of group_keys (may include the empty set)
        self.fanout_children: set[str] = set()
        # v7: dims in self.joins that are one-to-many CHILDREN of the
        # base (fan-out). Rendered identically in SQL; the Spark side
        # skips the broadcast hint (a real child side is the BIG side)
        self.setop: tuple[str, list[Expr]] | None = None
        # (UNION ALL | INTERSECT | EXCEPT, alternative filter list) —
        # projection-form only; both operands share the projection list
        self.distinct = False
        self.limit: int | None = None

    # ---- rendering: DuckDB SQL -------------------------------------------

    def _core_sql(self, filters: list[Expr]) -> str:
        frm = self.base
        for fk, dim, dk, how, pre, fk_null in self.joins:
            dim_src = dim
            if pre is not None:
                dim_src = f"(SELECT * FROM {dim} WHERE {pre.sql()})"
            kw = {"inner": "JOIN", "left": "LEFT JOIN",
                  "right": "RIGHT JOIN", "full": "FULL JOIN"}[how]
            lhs = f"{self.base}.{fk}"
            if fk_null is not None:
                lhs = f"nullif({lhs}, {sql_lit(fk_null)})"
            frm += f" {kw} {dim_src} AS {dim} ON {lhs} = {dim}.{dk}"
        conds = [f.sql() for f in filters]
        for fk, dim, dk, neg, pre in self.semijoins:
            inner = f"SELECT 1 FROM {dim} WHERE {dim}.{dk} = {self.base}.{fk}"
            if pre is not None:
                inner += f" AND {pre.sql()}"
            conds.append(f"{'NOT ' if neg else ''}EXISTS ({inner})")
        for fk, dim, dk, neg, pre, nl in self.in_subs:
            sel = (f"{dim}.{dk}" if nl is None
                   else f"nullif({dim}.{dk}, {sql_lit(nl)})")
            inner = f"SELECT {sel} FROM {dim}"
            if pre is not None:
                inner += f" WHERE {pre.sql()}"
            conds.append(
                f"{self.base}.{fk} {'NOT ' if neg else ''}IN ({inner})")
        if self.scalar_where is not None:
            lhs, op, dim, fn, dcol, pre = self.scalar_where
            agg = (f"round(avg({dim}.{dcol}), 6)" if fn == "avg"
                   else f"{fn}({dim}.{dcol})")
            inner = f"SELECT {agg} FROM {dim}"
            if pre is not None:
                inner += f" WHERE {pre.sql()}"
            conds.append(f"{lhs.sql()} {op} ({inner})")
        where = ""
        if conds:
            where = " WHERE " + " AND ".join(conds)
        if self.aggs:
            sel = [f"{k.sql()} AS {a}" for k, a in zip(self.group_keys, self._key_aliases())]
            if self.group_mode != "plain":
                sel += [f"GROUPING({k.sql()}) AS g{i}"
                        for i, k in enumerate(self.group_keys)]
            for fn, col, alias, nd, filt in self.aggs:
                sel.append(f"{self._agg_sql(fn, col, nd, filt)} AS {alias}")
            gb = ""
            if self.group_keys:
                keys = ", ".join(k.sql() for k in self.group_keys)
                if self.group_mode == "plain":
                    gb = f" GROUP BY {keys}"
                elif self.group_mode == "sets":
                    sets_sql = ", ".join(
                        "(" + ", ".join(self.group_keys[i].sql()
                                        for i in s) + ")"
                        for s in self.gsets)
                    gb = f" GROUP BY GROUPING SETS ({sets_sql})"
                else:
                    gb = f" GROUP BY {self.group_mode.upper()}({keys})"
            hv = ""
            if self.having_agg is not None:
                hfn, hcol, hop, hlit = self.having_agg
                hv = f" HAVING {hfn}({hcol.sql()}) {hop} {sql_lit(hlit)}"
            q = f"SELECT {', '.join(sel)} FROM {frm}{where}{gb}{hv}"
            if self.group_mode != "plain":
                # ENGINE DIVERGENCE, fuzzer-found (v3 sweep, 16 seeds):
                # over an EMPTY input, DuckDB/PostgreSQL emit the
                # grand-total grouping set as one row (SQL standard);
                # Spark emits nothing — for DataFrame cube/rollup AND
                # SQL GROUP BY CUBE alike. The guard states Spark's
                # semantics declaratively (the only 0-count cell a
                # lattice can produce is the grand total on empty input,
                # so this is exact, not a heuristic).
                q = (f"SELECT * FROM ({q}) WHERE EXISTS "
                     f"(SELECT 1 FROM {frm}{where})")
            return q
        sel = [f"{e.sql()} AS {a}" for e, a in self.projections]
        for fk, dim, dk, fn, dcol, alias in self.corr_subs:
            agg = (f"round(avg(_cs.{dcol}), 6)" if fn == "avg"
                   else f"{fn}(_cs.{dcol})")
            sel.append(
                f"(SELECT {agg} FROM {dim} AS _cs "
                f"WHERE _cs.{dk} = {self.base}.{fk}) AS {alias}")
        return f"SELECT {', '.join(sel)} FROM {frm}{where}"

    def sql(self) -> str:
        q = self._core_sql(self.filters)
        if self.setop is not None:
            op, alt = self.setop
            q = f"SELECT * FROM (({q}) {op} ({self._core_sql(alt)}))"
            # UNION (distinct) vs UNION ALL is a v5 board: the multiset
            # collapse must agree even when the operands share rows
        if self.having is not None:
            q = f"SELECT * FROM ({q}) WHERE {self.having.sql()}"
        if self.distinct:
            q = f"SELECT DISTINCT * FROM ({q})"
        if self.limit is not None:
            cols = self.out_names()
            ob = ", ".join(f"{c} ASC NULLS FIRST" for c in cols)
            q = f"SELECT * FROM ({q}) ORDER BY {ob} LIMIT {self.limit}"
        return q

    @staticmethod
    def _agg_sql(fn: str, col: Col | None, nd: int | None,
                 filt: Expr | None = None) -> str:
        if fn == "count_star":
            e = "count(*)"
        elif fn == "count_distinct":
            e = f"count(DISTINCT {col.sql()})"
        elif fn == "sum_distinct":
            e = f"sum(DISTINCT {col.sql()})"
        else:
            e = f"{fn}({col.sql()})"
        if filt is not None:
            # v7: FILTER attaches to the aggregate (inside any round)
            e = f"{e} FILTER (WHERE {filt.sql()})"
        if nd is not None:
            e = f"round({e}, {nd})"
        return e

    # ---- rendering: PySpark ----------------------------------------------

    def _core_spark(self, spark, sf_dir: str, filters: list[Expr],
                    scramble: int | None = None):
        from pyspark.sql import functions as F

        from citegraph_spark.sources.tables import load_table

        def scan(name):
            df = load_table(spark, sf_dir, name)
            if scramble:
                # round-robin repartition scrambles row order the way a
                # wide cluster would — an order-dependent plan (the scd2
                # defect class) changes its hash here
                df = df.repartition(scramble)
            return df

        df = scan(self.base)
        for fk, dim, dk, how, pre, fk_null in self.joins:
            d = scan(dim)
            if pre is not None:
                d = d.filter(pre.spark(F))
            lhs = df[fk]
            if fk_null is not None:
                lhs = F.nullif(lhs, F.lit(fk_null))
            if how in ("right", "full") or dim in self.fanout_children:
                # BroadcastHashJoin cannot null-extend the build side, so
                # the hint would be ignored (or worse, force a BNLJ plan
                # at scale) — let AQE pick SMJ/SHJ for the outer pair.
                # Fan-out children are the BIG side of a one-to-many
                # join: hinting them broadcast would be the anti-pattern
                # plan lint exists to catch, so AQE decides there too.
                df = df.join(d, on=lhs == d[dk], how=how)
            else:
                df = df.join(F.broadcast(d), on=lhs == d[dk], how=how)
        for fk, dim, dk, neg, pre in self.semijoins:
            d = scan(dim)
            if pre is not None:
                d = d.filter(pre.spark(F))
            df = df.join(F.broadcast(d), on=df[fk] == d[dk],
                         how="left_anti" if neg else "left_semi")
        for fk, dim, dk, neg, pre, nl in self.in_subs:
            d = scan(dim)
            if pre is not None:
                d = d.filter(pre.spark(F))
            key = d[dk] if nl is None else F.nullif(d[dk], F.lit(nl))
            vals = d.select(key.alias("_inv"))
            if not neg:
                # IN ≡ left_semi even with NULL list elements: a NULL
                # element equals nothing, and a no-match probe yields
                # NULL which WHERE drops — same rows either way
                df = df.join(F.broadcast(vals),
                             on=F.col(fk) == F.col("_inv"), how="left_semi")
            else:
                # NOT IN, faithfully: (1) an EMPTY list qualifies every
                # row (even NULL probes); (2) a list containing ANY NULL
                # qualifies none; (3) otherwise a NULL probe never
                # qualifies and non-null probes anti-join
                flags = vals.agg(F.count(F.lit(1)).alias("_in_n"),
                                 F.count("_inv").alias("_in_nn"))
                df = df.crossJoin(F.broadcast(flags))
                df = df.filter(
                    (F.col("_in_n") == 0)
                    | ((F.col("_in_n") == F.col("_in_nn"))
                       & F.col(fk).isNotNull()))
                df = df.join(F.broadcast(vals),
                             on=F.col(fk) == F.col("_inv"), how="left_anti")
                df = df.drop("_in_n", "_in_nn")
        if self.scalar_where is not None:
            lhs, op, dim, fn, dcol, pre = self.scalar_where
            d = scan(dim)
            if pre is not None:
                d = d.filter(pre.spark(F))
            agg = {"min": F.min, "max": F.max, "avg": F.avg}[fn](F.col(dcol))
            if fn == "avg":
                agg = F.round(agg, 6)
            one = d.agg(agg.alias("_ssub"))
            df = df.crossJoin(F.broadcast(one))
            df = df.filter(_cmp_col(op, lhs.spark(F), F.col("_ssub")))
            df = df.drop("_ssub")
        for f in filters:
            df = df.filter(f.spark(F))
        if self.aggs:
            aggs = []
            if self.group_mode != "plain":
                aggs += [F.grouping(k.spark(F)).alias(f"g{i}")
                         for i, k in enumerate(self.group_keys)]
            for fn, col, alias, nd, filt in self.aggs:
                arg = F.lit(1) if fn == "count_star" else col.spark(F)
                if filt is not None:
                    # v7 FILTER clause: agg(CASE WHEN p THEN x END) —
                    # a NULL/false predicate yields NULL, which every
                    # aggregate ignores; an all-filtered group yields
                    # NULL (sum/min/max/avg) or 0 (counts), exactly
                    # SQL's FILTER semantics
                    arg = F.when(filt.spark(F), arg)
                if fn == "count_star":
                    e = F.count(arg)
                elif fn == "count_distinct":
                    e = F.countDistinct(arg)
                elif fn == "sum_distinct":
                    e = F.sum_distinct(arg)
                else:
                    e = {"count": F.count, "sum": F.sum, "min": F.min,
                         "max": F.max, "avg": F.avg}[fn](arg)
                if nd is not None:
                    e = F.round(e, nd)
                aggs.append(e.alias(alias))
            if self.having_agg is not None:
                hfn, hcol, hop, hlit = self.having_agg
                hidden = {"min": F.min, "max": F.max,
                          "count": F.count}[hfn](hcol.spark(F))
                aggs.append(hidden.alias("_hv"))
            if self.group_mode == "plain":
                keys = [k.spark(F).alias(a)
                        for k, a in zip(self.group_keys, self._key_aliases())]
                df = df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)
                if self.having_agg is not None:
                    hfn, hcol, hop, hlit = self.having_agg
                    df = df.filter(
                        _cmp_col(hop, F.col("_hv"), F.lit(hlit))).drop("_hv")
            else:
                if self.group_mode == "sets":
                    grouped = df.groupingSets(
                        [[self.group_keys[i].spark(F) for i in s]
                         for s in self.gsets],
                        *[k.spark(F) for k in self.group_keys])
                else:
                    grouped = (df.rollup if self.group_mode == "rollup"
                               else df.cube)(
                                   *[k.spark(F) for k in self.group_keys])
                df = grouped.agg(*aggs)
                for k, a in zip(self.group_keys, self._key_aliases()):
                    df = df.withColumnRenamed(k.name, a)
        else:
            sel_cols = [e.spark(F).alias(a) for e, a in self.projections]
            for fk, dim, dk, fn, dcol, alias in self.corr_subs:
                d = scan(dim)
                agg = {"min": F.min, "max": F.max, "count": F.count,
                       "avg": F.avg}[fn](F.col(dcol))
                if fn == "avg":
                    agg = F.round(agg, 6)
                g = d.groupBy(F.col(dk).alias("_ck")).agg(agg.alias(alias))
                df = df.join(F.broadcast(g),
                             on=F.col(fk) == F.col("_ck"), how="left")
                df = df.drop("_ck")
                out = F.col(alias)
                if fn == "count":
                    # SQL's correlated (SELECT count(x) ...) is 0 for a
                    # no-match group, never NULL — the classic COUNT
                    # decorrelation trap
                    out = F.coalesce(out, F.lit(0))
                sel_cols.append(out.alias(alias))
            df = df.select(*sel_cols)
        return df

    def spark(self, spark, sf_dir: str, scramble: int | None = None):
        from pyspark.sql import functions as F

        df = self._core_spark(spark, sf_dir, self.filters, scramble)
        if self.setop is not None:
            op, alt = self.setop
            other = self._core_spark(spark, sf_dir, alt, scramble)
            if op == "UNION":
                df = df.union(other).distinct()
            else:
                df = {"UNION ALL": df.union, "INTERSECT": df.intersect,
                      "EXCEPT": df.subtract}[op](other)
        if self.having is not None:
            df = df.filter(self.having.spark(F))
        if self.distinct:
            df = df.distinct()
        if self.limit is not None:
            df = df.orderBy(*[F.col(c).asc_nulls_first() for c in df.columns])
            df = df.limit(self.limit)
        return df

    # ---- helpers -----------------------------------------------------------

    def _key_aliases(self) -> list[str]:
        return [f"k{i}" for i in range(len(self.group_keys))]

    def out_names(self) -> list[str]:
        if self.aggs:
            names = list(self._key_aliases())
            if self.group_mode != "plain":
                names += [f"g{i}" for i in range(len(self.group_keys))]
            return names + [a for _, _, a, _, _ in self.aggs]
        return ([a for _, a in self.projections]
                + [a for *_, a in self.corr_subs])


# --------------------------------------------------------------------------
# generator
# --------------------------------------------------------------------------

BASES = ["lineitem", "orders", "customer", "supplier", "part", "nation",
         "events", "documents"]


def gen_plan(seed: int, pools: dict[tuple[str, str], list]) -> Plan:
    rng = random.Random(seed)
    base = rng.choice(BASES)
    plan = Plan(base)
    avail: list[tuple[str, str, str]] = [
        (c, ty, base) for c, ty in TABLES[base].items()
    ]

    # 0-2 FK joins (chain only off the base table; diamond joins via
    # nation would collide column names)
    for fk, dim, dk in FKS.get(base, []):
        r = rng.random()
        if r < 0.45 and len(plan.joins) < 2:
            hr = rng.random()
            # v5: right/full null-extend the FACT side — the join corner
            # local oracles never hit (base columns become NULL)
            how = ("left" if hr < 0.25 else "right" if hr < 0.37
                   else "full" if hr < 0.47 else "inner")
            pre = None
            if rng.random() < 0.4:
                pre = gen_pred(rng, [(c, t, dim) for c, t in TABLES[dim].items()],
                               pools, allow_bool=False)
            fk_null = None
            if rng.random() < 0.25 and (base, fk) in pools:
                # v5: nullify a real key value so NULL join keys flow —
                # inner/semi must drop them, left/full must null-extend
                fk_null = rng.choice(pools[(base, fk)])
            plan.joins.append((fk, dim, dk, how, pre, fk_null))
            avail += [(c, ty, dim) for c, ty in TABLES[dim].items()]
        elif r < 0.62 and not plan.semijoins:
            # semi/anti instead: dim filters the fact, contributes no cols
            pre = gen_pred(rng, [(c, t, dim) for c, t in TABLES[dim].items()],
                           pools, allow_bool=False)
            plan.semijoins.append((fk, dim, dk, rng.random() < 0.45, pre))
        elif r < 0.74 and not plan.in_subs:
            # v6: [NOT] IN subquery — with p=0.5 the list carries a real
            # NULL via nullif(dk, v), arming the NOT IN 3VL trap
            pre = None
            if rng.random() < 0.5:
                pre = gen_pred(rng, [(c, t, dim) for c, t in TABLES[dim].items()],
                               pools, allow_bool=False)
            nl = None
            if rng.random() < 0.5 and (dim, dk) in pools:
                nl = rng.choice(pools[(dim, dk)])
            plan.in_subs.append((fk, dim, dk, rng.random() < 0.4, pre, nl))

    # v7: one-to-many fan-out join — parent rows DUPLICATE through the
    # child, so downstream aggregates/DISTINCT/set-ops see row
    # multiplicities the unique-keyed FK chains never produce. INNER
    # drops childless parents; LEFT null-extends them (count over a
    # childless group is 0, sum/min/max NULL — both must agree). A
    # child prefilter under LEFT is the classic
    # filter-inside-vs-outside-the-outer-join trap, rendered inside on
    # both sides.
    if base in FANOUT and rng.random() < 0.3:
        pk, child, cfk = rng.choice(FANOUT[base])
        how = "inner" if rng.random() < 0.6 else "left"
        pre = None
        if rng.random() < 0.4:
            pre = gen_pred(rng, [(c, t, child) for c, t in TABLES[child].items()],
                           pools, allow_bool=False)
        plan.joins.append((pk, child, cfk, how, pre, None))
        plan.fanout_children.add(child)
        avail += [(c, ty, child) for c, ty in TABLES[child].items()]

    # 0-2 filters
    for _ in range(rng.randint(0, 2)):
        p = gen_pred(rng, avail, pools, allow_bool=True)
        if p is not None:
            plan.filters.append(p)

    # v6: uncorrelated scalar subquery in WHERE — any table can serve as
    # the scalar's source (it need not be FK-related); an empty source
    # makes the scalar NULL and the comparison drops every row
    if rng.random() < 0.22:
        num = [(c, ty, t) for c, ty, t in avail if ty in ("int", "double")]
        if num:
            c, ty, _t = rng.choice(num)
            dim = rng.choice(sorted(TABLES))
            dcands = [dc for dc, dt in TABLES[dim].items() if dt == ty]
            if dcands:
                dc = rng.choice(dcands)
                fn = rng.choice(["min", "max", "avg"])
                pre = None
                if rng.random() < 0.4:
                    pre = gen_pred(
                        rng, [(c2, t2, dim) for c2, t2 in TABLES[dim].items()],
                        pools, allow_bool=False)
                op = rng.choice(["<", "<=", ">", ">="])
                plan.scalar_where = (Col(c, ty), op, dim, fn, dc, pre)

    # right/full joins can null-extend (and duplicate-NULL) the fact PK,
    # so the window determinism contract (row-unique order key) is void
    has_outer_fact = any(j[3] in ("right", "full") for j in plan.joins)

    numeric = [(c, ty, t) for c, ty, t in avail if ty in ("int", "double")]
    if rng.random() < 0.55:
        # aggregate form
        gkeys = [a for a in avail if a[0] in GROUPABLE]
        rng.shuffle(gkeys)
        picked_keys = gkeys[: rng.randint(0, 2)]
        for c, ty, _t in picked_keys:
            plan.group_keys.append(Col(c, ty))
        n_aggs = rng.randint(1, 3)
        for i in range(n_aggs):
            fn = rng.choice(
                ["count_star", "count", "count_distinct", "sum", "min",
                 "max", "avg", "sum_distinct"]
            )
            alias = f"a{i}"
            # v7: per-aggregate FILTER clause — the all-rows-filtered
            # group (NULL sum vs 0 count) and NULL-predicate-is-false
            # corners fire against real data
            filt = None
            if rng.random() < 0.3:
                filt = gen_pred(rng, avail, pools, allow_bool=False)
            if fn == "count_star":
                plan.aggs.append((fn, None, alias, None, filt))
                continue
            if fn == "sum_distinct":
                # v7: DISTINCT sum — double goes through the exact
                # decimal cast (the distinct SET is engine-identical, so
                # the sum must be too; no round() escape hatch), int
                # stays int (widened by both engines without loss)
                if not numeric:
                    plan.aggs.append(("count_star", None, alias, None, filt))
                    continue
                c, ty, _t = rng.choice(numeric)
                e = DecCast(Col(c, ty)) if ty == "double" else Col(c, ty)
                plan.aggs.append((fn, e, alias, None, filt))
                continue
            if fn in ("count", "count_distinct", "min", "max"):
                c, ty, _t = rng.choice(avail)
            else:
                if not numeric:
                    plan.aggs.append(("count_star", None, alias, None, filt))
                    continue
                c, ty, _t = rng.choice(numeric)
            if (fn in ("sum", "min", "max") and ty == "double"
                    and rng.random() < 0.3):
                # v5: exact DECIMAL(18,4) aggregation — scale-deterministic
                # in both engines, so NO round() escape hatch: the hash
                # compares exact decimal strings (sum keeps scale 4)
                plan.aggs.append((fn, DecCast(Col(c, ty)), alias, None, filt))
                continue
            nd = None
            if fn == "avg":
                # v7 fix (seed 46655, the fuzzer's 3rd boundary catch):
                # an INT avg is an exact ratio, so it can land EXACTLY on
                # a rounding boundary (2659/640 = 4.1546875) where the
                # engines' round() semantics split: Spark rounds the
                # shortest-decimal repr HALF_UP (4.154688), DuckDB
                # rounds the true binary double, which sits just below
                # the boundary (4.154687). The doubles themselves are
                # bit-identical (exact int sum, one division), so int
                # avgs go UNROUNDED and the hash normalizer compares
                # them directly; double avgs keep round6 (accumulation
                # noise is the bigger term there, and a noisy value
                # almost surely misses an exact boundary).
                nd = 6 if ty == "double" else None
            elif fn in ("sum", "min", "max") and ty == "double":
                nd = 2 if fn == "sum" else None
            plan.aggs.append((fn, Col(c, ty), alias, nd, filt))
        if plan.group_keys and rng.random() < 0.3:
            # subtotal lattice: rollup/cube/explicit GROUPING SETS +
            # GROUPING markers (the markers disambiguate subtotal NULLs
            # from real NULL keys)
            plan.group_mode = rng.choice(["rollup", "rollup", "cube",
                                          "sets", "sets"])
            if plan.group_mode == "sets":
                # v7: the full key set (every selected key must appear
                # in >=1 grouping set or the SQL is invalid) plus 1-2
                # random DISTINCT proper subsets — possibly the empty
                # grand-total set, which arms the empty-input guard
                from itertools import combinations

                idx = list(range(len(plan.group_keys)))
                others = [list(s) for r in range(len(idx))
                          for s in combinations(idx, r)]
                rng.shuffle(others)
                plan.gsets = (
                    [idx] + others[: rng.randint(1, min(2, len(others)))])
        elif plan.group_keys:
            # v5: NULL group keys (plain mode only — a NULLIF key under
            # rollup/cube would need GROUPING to disambiguate, and the
            # Spark rollup path renames by bare column name): both
            # engines must pool NULLs into ONE group
            for i, (c, ty, t) in enumerate(picked_keys):
                if rng.random() < 0.25 and (t, c) in pools:
                    plan.group_keys[i] = NullIf(
                        plan.group_keys[i], rng.choice(pools[(t, c)]))
        if rng.random() < 0.35:
            # having on a count-ish output
            counts = [a for fn, _c, a, _nd, _f in plan.aggs
                      if fn in ("count_star", "count", "count_distinct")]
            if counts:
                a = rng.choice(counts)
                plan.having = Cmp(
                    rng.choice([">", ">="]), Col(a, "int"),
                    Lit(rng.randint(1, 5), "int"),
                )
        if plan.group_mode == "plain" and rng.random() < 0.3:
            # v6: HAVING on an aggregate ABSENT from the SELECT list
            # (plain mode only — the rollup/cube rename path would
            # collide with the hidden column); min/max/count stay exact
            # so the comparison is float-free
            hcands = [(c, ty, t) for c, ty, t in avail
                      if (t, c) in pools and ty in ("int", "str")]
            if hcands:
                c, ty, t = rng.choice(hcands)
                hfn = rng.choice(["min", "max", "count"])
                hlit = (rng.randint(1, 5) if hfn == "count"
                        else rng.choice(pools[(t, c)]))
                plan.having_agg = (
                    hfn, Col(c, ty), rng.choice([">", ">=", "<", "<="]),
                    hlit)
    else:
        # projection form
        cols = list(avail)
        rng.shuffle(cols)
        picked = cols[: rng.randint(1, min(4, len(cols)))]
        for i, (c, ty, _t) in enumerate(picked):
            plan.projections.append((Col(c, ty), f"p{i}"))
        # optional computed column
        if rng.random() < 0.6:
            e = gen_scalar(rng, avail, pools)
            if e is not None:
                plan.projections.append((e, f"p{len(plan.projections)}"))
        # optional window column (PKs stay row-unique through FK joins —
        # but NOT through right/full joins, which null-extend the PK,
        # nor through v7 fan-out joins, which duplicate it)
        if (rng.random() < 0.5 and not has_outer_fact
                and not plan.fanout_children):
            e = gen_window(rng, base, avail, pools)
            if e is not None:
                plan.projections.append((e, f"p{len(plan.projections)}"))
        # v6: correlated scalar subqueries over the base's FK dims —
        # safe even under right/full joins: a null-extended fk matches
        # no group on either side (SQL: empty correlated set → NULL/0;
        # Spark: NULL join key matches nothing → NULL, coalesced for
        # count), so no suppression is needed
        if rng.random() < 0.3 and FKS.get(base):
            n_cs = 1 if rng.random() < 0.9 else 2
            for j, (fk, dim, dk) in enumerate(
                    rng.sample(FKS[base], min(n_cs, len(FKS[base])))):
                nums = [c for c, t in TABLES[dim].items()
                        if t in ("int", "double")]
                if nums:
                    plan.corr_subs.append((
                        fk, dim, dk,
                        rng.choice(["min", "max", "count", "avg"]),
                        rng.choice(nums), f"cs{j}"))
        if rng.random() < 0.4:
            plan.distinct = True
        if rng.random() < 0.25:
            # set operation: same projections, independent filter set.
            # UNION ALL keeps multiset semantics; INTERSECT/EXCEPT are
            # DISTINCT semantics in both dialects (Spark .intersect /
            # .subtract), so all three are order-independent.
            alt = []
            for _ in range(rng.randint(0, 2)):
                p = gen_pred(rng, avail, pools, allow_bool=True)
                if p is not None:
                    alt.append(p)
            plan.setop = (
                rng.choice(["UNION ALL", "UNION", "INTERSECT", "EXCEPT"]),
                alt,
            )

    if rng.random() < 0.45 or (not plan.aggs and not plan.distinct):
        # always bound raw projections: deterministic sorted-limit.
        # v5 adds tiny limits (1, 3) — the tie-heaviest top-k shape
        plan.limit = rng.choice([1, 3, 7, 50, 400])
    return plan


def gen_pred(rng, avail, pools, allow_bool: bool) -> Expr | None:
    """One predicate over the available columns (literal pools permitting)."""
    cands = [(c, ty, t) for c, ty, t in avail if (t, c) in pools]
    mk: Expr | None = None
    kind = rng.random()
    if kind < 0.12 and avail:
        c, ty, _t = rng.choice(avail)
        mk = IsNull(Col(c, ty), negate=rng.random() < 0.5)
    elif cands:
        c, ty, t = rng.choice(cands)
        pool = pools[(t, c)]
        r = rng.random()
        if ty == "str" and r < 0.25:
            v = str(rng.choice(pool))
            pref = "".join(ch for ch in v[: rng.randint(1, 4)]
                           if ch not in "%_\\")
            mk = Like(Col(c, ty), pref) if pref else None
        elif r < 0.45:
            k = rng.randint(1, min(4, len(pool)))
            mk = InList(Col(c, ty), rng.sample(pool, k))
        elif ty in ("int", "double") and r < 0.65:
            lo, hi = sorted(rng.sample(pool, 2)) if len(pool) > 1 else (pool[0], pool[0])
            mk = Between(Col(c, ty), lo, hi)
        else:
            op = rng.choice(["<", "<=", ">", ">=", "=", "!="])
            mk = Cmp(op, Col(c, ty), Lit(rng.choice(pool), ty))
    if mk is not None and allow_bool and rng.random() < 0.3:
        other = gen_pred(rng, avail, pools, allow_bool=False)
        if other is not None:
            mk = BoolOp(rng.choice(["AND", "OR"]), mk, other)
    return mk


def gen_scalar(rng, avail, pools) -> Expr | None:
    """One computed scalar column."""
    numeric = [(c, ty) for c, ty, _t in avail if ty in ("int", "double")]
    strings = [(c, ty) for c, ty, _t in avail if ty == "str"]
    ints = [(c, ty) for c, ty, _t in avail if ty == "int"]
    r = rng.random()
    if r < 0.12 and ints:
        # v5: date arithmetic — derive dates from ints, then extract a
        # part or difference (EXTRACT/date_add/date_diff cross-dialect)
        (c1, _), (c2, _) = rng.choice(ints), rng.choice(ints)
        d1, d2 = DateFromInt(Col(c1, "int")), DateFromInt(Col(c2, "int"))
        k = rng.random()
        if k < 0.35:
            return d1
        if k < 0.7:
            return DatePart(rng.choice(["year", "month", "day"]), d1)
        return DateDiffDays(d1, d2)
    if r < 0.24 and len([1 for _, ty in numeric if ty == "double"]) >= 1:
        # v5: exact decimal arithmetic, both operands DECIMAL(18,4)
        dbls = [(c, ty) for c, ty in numeric if ty == "double"]
        (c1, t1), (c2, t2) = rng.choice(dbls), rng.choice(dbls)
        return Arith(rng.choice(["+", "-", "*"]),
                     DecCast(Col(c1, t1)), DecCast(Col(c2, t2)))
    if r < 0.45 and numeric:
        (c1, t1), (c2, t2) = rng.choice(numeric), rng.choice(numeric)
        return Arith(rng.choice(["+", "-", "*"]), Col(c1, t1), Col(c2, t2))
    if r < 0.58 and numeric:
        pred = gen_pred(rng, avail, pools, allow_bool=False)
        if pred is not None:
            (c1, t1), (c2, t2) = rng.choice(numeric), rng.choice(numeric)
            return CaseWhen(pred, Col(c1, t1), Col(c2, t2))
    if strings:
        c, ty = rng.choice(strings)
        fn = rng.choice(["upper", "lower", "length", "substr"])
        if fn == "substr":
            return StrFn(fn, Col(c, ty), (rng.randint(1, 3), rng.randint(1, 8)))
        return StrFn(fn, Col(c, ty))
    return None


def gen_window(rng, base: str, avail, pools) -> Expr | None:
    """One window column; see WinFn for the determinism contract."""
    pks = [Col(c, TABLES[base][c]) for c in PKS[base]]
    part = None
    groupable = [(c, ty, t) for c, ty, t in avail if c in GROUPABLE]
    if groupable and rng.random() < 0.7:
        c, ty, t = rng.choice(groupable)
        part = Col(c, ty)
        if rng.random() < 0.2 and (t, c) in pools:
            # v5: NULL partition keys — both engines put the NULLs in
            # ONE partition; the PK order keys keep rows deterministic
            part = NullIf(part, rng.choice(pools[(t, c)]))
    if rng.random() < 0.35:
        # v6: RANGE frame ordered by a deliberately TIED int key —
        # deterministic because RANGE pools order-key peers into the
        # same frame. Order key restricted to BASE columns (a left join
        # with a v5 nullif'd fk can null-extend dim columns, and the
        # engines' RANGE-offset null-boundary behaviors are not a board
        # we want to conflate here); sums go through the exact decimal
        # cast so no float accumulation order can differ.
        tied = [(c, ty, t) for c, ty, t in avail
                if ty == "int" and c in GROUPABLE and t == base]
        if tied:
            oc, oty, _t = rng.choice(tied)
            rfn = rng.choice(["sum", "min", "max", "count"])
            off = rng.choice([None, None, 2, 10])
            order = [Col(oc, oty)]
            if rfn == "sum":
                dbls = [(c, ty) for c, ty, _t2 in avail if ty == "double"]
                if dbls:
                    c, ty = rng.choice(dbls)
                    return WinFn("sum", DecCast(Col(c, ty)), part, order,
                                 frame="range", range_off=off)
            else:
                c, ty, _t2 = rng.choice(avail)
                return WinFn(rfn, Col(c, ty), part, order,
                             frame="range", range_off=off)
    fn = rng.choice(["sum", "avg", "count", "min", "max", "rank",
                     "dense_rank", "row_number", "lag", "lead"])
    if fn in ("rank", "dense_rank"):
        c, ty, _t = rng.choice(avail)
        return WinFn(fn, None, part, [Col(c, ty)])
    if fn == "row_number":
        return WinFn(fn, None, part, pks)
    if fn in ("lag", "lead"):
        c, ty, _t = rng.choice(avail)
        return WinFn(fn, Col(c, ty), part, pks)
    if fn in ("sum", "avg"):
        ints = [(c, ty) for c, ty, _t in avail if ty == "int"]
        if not ints:
            return None
        c, ty = rng.choice(ints)
    else:
        c, ty, _t = rng.choice(avail)
    return WinFn(fn, Col(c, ty), part, pks)


# --------------------------------------------------------------------------
# runner
# --------------------------------------------------------------------------


def run_seed(spark, con, pools, seed: int, sf_dir: str,
             show: bool = False, scramble: int | None = None) -> tuple[bool, str]:
    plan = gen_plan(seed, pools)
    sql = plan.sql()
    if show:
        print(f"-- seed {seed}\n{sql}")
    try:
        sdf = plan.spark(spark, sf_dir, scramble=scramble)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
    except Exception as ex:  # noqa: BLE001 — report, don't crash the sweep
        return False, f"spark error: {ex}"
    try:
        res = con.execute(sql)
        dcols = [d[0] for d in res.description]
        drows = [tuple(r) for r in res.fetchall()]
    except Exception as ex:  # noqa: BLE001
        return False, f"duckdb error: {ex}"
    if len(srows) != len(drows):
        return False, f"rowcount spark={len(srows)} duckdb={len(drows)}"
    if sorted(scols) != sorted(dcols):
        return False, f"cols spark={sorted(scols)} duckdb={sorted(dcols)}"
    hs, hd = table_hash(scols, srows), table_hash(dcols, drows)
    if hs != hd:
        diff = ""
        for a, b in zip(sorted(map(str, srows)), sorted(map(str, drows))):
            if a != b:
                diff = f"\n  spark : {a}\n  duckdb: {b}"
                break
        return False, f"value-hash {hs} != {hd}{diff}"
    return True, f"{len(srows)} rows"


def make_duckdb(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def main(argv: list[str]) -> int:
    n, seed0, show_n = 200, 0, 0
    scramble: int | None = None
    sf_dir = os.environ.get("FUZZ_SF_DIR", SF_DIR_DEFAULT)
    it = iter(argv)
    for a in it:
        if a == "--n":
            n = int(next(it))
        elif a == "--seed0":
            seed0 = int(next(it))
        elif a == "--sf-dir":
            sf_dir = next(it)
        elif a == "--show":
            show_n = int(next(it))
        elif a == "--scramble":
            scramble = int(next(it))

    from citegraph_spark.session import get_spark

    spark = get_spark(app_name="plan_fuzz")
    con = make_duckdb(sf_dir)
    pools = sample_literals(con, sf_dir)
    t0 = time.time()
    n_fail = 0
    for seed in range(seed0, seed0 + n):
        ok, msg = run_seed(spark, con, pools, seed, sf_dir,
                           show=seed - seed0 < show_n, scramble=scramble)
        if not ok:
            n_fail += 1
            plan = gen_plan(seed, pools)
            print(f"FAIL seed={seed}: {msg}\n  sql: {plan.sql()}")
        elif (seed - seed0) % 25 == 24:
            print(f"  ... {seed - seed0 + 1}/{n} ok ({time.time() - t0:.0f}s)")
    print(
        f"plan_fuzz: {n - n_fail}/{n} seeds agree "
        f"(seeds {seed0}..{seed0 + n - 1}, sf_dir={sf_dir}, "
        f"{time.time() - t0:.0f}s)"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
