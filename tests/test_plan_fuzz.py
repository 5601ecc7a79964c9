"""Standing gate for the differential plan fuzzer (tools/plan_fuzz.py).

A pinned block of seeds runs the same random relational plan through the
Spark engine and DuckDB and requires driver-format hash agreement. Seeds
are PINNED (not drawn fresh per run) so the suite stays deterministic —
deep exploratory sweeps happen via the CLI and get recorded in
BASELINE.md; any divergent seed found there gets added to PINNED_SEEDS
after the fix, hypothesis-style.
"""

from __future__ import annotations

import pytest

from tools.plan_fuzz import (
    SF_DIR_DEFAULT,
    gen_plan,
    make_duckdb,
    run_seed,
    sample_literals,
)

# 259/356/707/903: the first deep sweep's window-function divergences —
# the synthetic lineitem breaks TPC-H (l_orderkey, l_linenumber)
# uniqueness, so tie order leaked into running aggregates / lead until
# the order key became the full unique column tuple.
# 860/880: empty-input ROLLUP/CUBE — Spark emits no grand-total row
# where DuckDB/PostgreSQL emit one (SQL standard); the oracle renderer
# now states Spark's semantics with an EXISTS guard.
# 5634: IEEE negative zero — Spark preserves -0.0 (negative * 0)
# through collect(), DuckDB canonicalizes to +0.0; the shared hash
# normalizer now folds ±0 (they are equal under SQL comparison).
# 2189 (v5 sweep): DuckDB computes width<=18 decimal multiplies in
# int64 and overflows on (18,4)² of ~1e5 values; DecCast now renders
# the DuckDB side at width 19 to force hugeint math (oracle-side
# limitation, not an engine defect — Spark computed the product fine).
# 46655 (v7 sweep): round(avg(INT), 6) landed EXACTLY on a .5 rounding
# boundary (2659/640 = 4.1546875) — Spark rounds the shortest-decimal
# repr HALF_UP, DuckDB rounds the true binary value just below the
# boundary. Int avgs (exact ratios — the only case that can hit a
# boundary exactly) now render unrounded on both sides.
PINNED_SEEDS = list(range(40)) + [259, 356, 707, 903, 860, 880, 5634,
                                  2189, 46655]


@pytest.fixture(scope="module")
def duck():
    con = make_duckdb(SF_DIR_DEFAULT)
    pools = sample_literals(con, SF_DIR_DEFAULT)
    yield con, pools
    con.close()


def test_pinned_seed_block_agrees(spark, duck):
    con, pools = duck
    failures = []
    for seed in PINNED_SEEDS:
        ok, msg = run_seed(spark, con, pools, seed, SF_DIR_DEFAULT)
        if not ok:
            failures.append(f"seed={seed}: {msg}\n  sql: {gen_plan(seed, pools).sql()}")
    assert not failures, "\n".join(failures)


def test_scrambled_partitioning_is_invariant(spark, duck):
    """Partition-scramble leg: every scan round-robin-repartitioned, row
    order destroyed — the hashes must not move (order-dependence net,
    the scd2 defect class). A 12-seed slice keeps the in-suite cost low;
    full blocks run via the CLI --scramble flag."""
    con, pools = duck
    failures = []
    for seed in PINNED_SEEDS[:8] + PINNED_SEEDS[-4:]:
        ok, msg = run_seed(spark, con, pools, seed, SF_DIR_DEFAULT,
                           scramble=7)
        if not ok:
            failures.append(f"seed={seed}: {msg}")
    assert not failures, "\n".join(failures)


def test_generator_is_not_trivial(duck):
    """The fuzzer only has teeth if its plans exercise the grammar: over
    a 120-seed census block, demand joins, filters, aggregates, having,
    distinct and limit all appear, and that most plans return rows (a
    generator whose filters select nothing would vacuously agree).
    The census block is wider than the pinned block: each grammar bump
    re-maps seed->plan (new rng draws), so per-40-seeds feature counts
    wobble; 120 seeds keeps every assertion comfortably above noise."""
    con, pools = duck
    shapes = {"join": 0, "filter": 0, "agg": 0, "having": 0,
              "distinct": 0, "limit": 0, "window": 0, "case": 0,
              "lattice": 0, "setop": 0, "semijoin": 0, "nonempty": 0,
              "outer_fact": 0, "nullif": 0, "decimal": 0, "date": 0,
              "in_sub": 0, "scalar_sub": 0, "corr_sub": 0,
              "having_agg": 0, "range_frame": 0, "fanout": 0,
              "agg_filter": 0, "sum_distinct": 0, "gsets": 0}
    # widened 120 -> 200 at the v7 bump: rarer shapes (range frames,
    # grouping sets) need the bigger block to sit above seed-remap noise
    base_block = list(range(200))
    for seed in base_block:
        p = gen_plan(seed, pools)
        sql = p.sql()
        shapes["join"] += bool(p.joins)
        shapes["filter"] += bool(p.filters)
        shapes["agg"] += bool(p.aggs)
        shapes["having"] += p.having is not None
        shapes["distinct"] += p.distinct
        shapes["limit"] += p.limit is not None
        shapes["window"] += "OVER (" in sql
        shapes["case"] += "CASE WHEN" in sql
        shapes["lattice"] += p.group_mode != "plain"
        shapes["setop"] += p.setop is not None
        shapes["semijoin"] += bool(p.semijoins)
        shapes["outer_fact"] += any(j[3] in ("right", "full") for j in p.joins)
        shapes["nullif"] += "nullif(" in sql
        shapes["decimal"] += "DECIMAL(19,4)" in sql  # DuckDB-side render
        shapes["date"] += "DATE '1992-01-01'" in sql
        shapes["in_sub"] += bool(p.in_subs)
        shapes["scalar_sub"] += p.scalar_where is not None
        shapes["corr_sub"] += bool(p.corr_subs)
        shapes["having_agg"] += p.having_agg is not None
        shapes["range_frame"] += "RANGE BETWEEN" in sql
        shapes["fanout"] += bool(p.fanout_children)
        shapes["agg_filter"] += "FILTER (WHERE" in sql
        shapes["sum_distinct"] += "sum(DISTINCT" in sql
        shapes["gsets"] += p.group_mode == "sets"
        n = con.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0]
        shapes["nonempty"] += n > 0
    assert shapes["join"] >= 45, shapes
    assert shapes["filter"] >= 65, shapes
    assert shapes["agg"] >= 55, shapes
    assert shapes["having"] >= 8, shapes
    assert shapes["distinct"] >= 15, shapes
    assert shapes["limit"] >= 60, shapes
    assert shapes["window"] >= 15, shapes
    assert shapes["case"] >= 3, shapes
    assert shapes["lattice"] >= 12, shapes
    assert shapes["setop"] >= 14, shapes
    assert shapes["semijoin"] >= 15, shapes
    # grammar v5 surfaces
    assert shapes["outer_fact"] >= 9, shapes
    assert shapes["nullif"] >= 20, shapes
    assert shapes["decimal"] >= 10, shapes
    assert shapes["date"] >= 4, shapes
    # grammar v6 surfaces
    assert shapes["in_sub"] >= 8, shapes
    assert shapes["scalar_sub"] >= 20, shapes
    assert shapes["corr_sub"] >= 8, shapes
    assert shapes["having_agg"] >= 9, shapes
    assert shapes["range_frame"] >= 1, shapes
    # grammar v7 surfaces
    assert shapes["fanout"] >= 18, shapes
    assert shapes["agg_filter"] >= 20, shapes
    assert shapes["sum_distinct"] >= 12, shapes
    assert shapes["gsets"] >= 3, shapes
    # over the base block only: divergence-pin seeds are intentionally
    # degenerate (e.g. the empty-input lattice pair). v7 lowered the
    # floor 0.7 -> 0.6: fan-out INNER joins with child prefilters empty
    # more plans, and the empty-through-multiplicity path is coverage,
    # not vacuity (the non-empty majority still anchors the teeth).
    assert shapes["nonempty"] >= len(base_block) * 0.6, shapes
