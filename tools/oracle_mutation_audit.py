"""Oracle-side mutation audit (round-12 verdict item 4).

Round 12 mutated the ENGINE and proved the gates kill single-site
defects. The untested half of the differential net is the ORACLE corpus
itself: a wrong oracle that happens to match wrong code would certify a
defect, and an oracle so loose the data never exercises a predicate
isn't actually constraining its entry. This audit injects single-site
mutations into SCRATCH COPIES of `oracle_sql()` strings (the registry on
disk is never touched) and re-runs the gate: every mutant must FAIL the
comparison (= the oracle constrains that clause), or carry an
adjudication explaining exactly why the data cannot distinguish it and
which OTHER gate pins the semantics.

Usage:
  python tools/oracle_mutation_audit.py            # all mutants
  python tools/oracle_mutation_audit.py OM03 OM05  # subset
  python tools/oracle_mutation_audit.py --json .oracle_mutation_audit_r13.json

Exit 0 iff every mutant is KILLED or matches its recorded adjudication.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")

# Each mutant: one textual edit to one oracle's SQL. `expect` is
# "killed" (the gate must FAIL on the mutated oracle) or "survives",
# in which case `adjudication` records why the data cannot distinguish
# the mutant and what pins the semantics instead.
MUTANTS = [
    dict(
        id="OM01", entry="q1_pricing_summary",
        cls="filter-bound-shift",
        desc="q1 date window tightened by 30 years",
        old="DATE '2025-06-02'", new="DATE '1995-06-02'",
        expect="killed",
    ),
    dict(
        id="OM02", entry="events_sessionize",
        cls="boundary-comparison-flip",
        desc="session gap boundary > becomes >= (exact-gap events split)",
        old="> 30 * 60", new=">= 30 * 60",
        expect="survives",
        adjudication=(
            "No event pair in the testdata sits at EXACTLY the 1800 s "
            "gap (verified by direct count at sf0.01/0.1), so the data "
            "cannot distinguish > from >= — the same reason engine "
            "mutant M06 survived the oracle in r12. The boundary "
            "semantics are pinned by tests/test_sessionize_boundary.py "
            "(synthetic exact-gap events through the REAL operator)."
        ),
    ),
    dict(
        id="OM03", entry="graph_density",
        cls="join-kind-flip",
        desc="pub JOIN outdeg becomes LEFT JOIN (re-admits the 1992-style "
             "zero-outdeg years the reference's strict inner join drops)",
        old="JOIN outdeg ON pub.id = outdeg.f",
        new="LEFT JOIN outdeg ON pub.id = outdeg.f",
        expect="survives",
        adjudication=(
            "First-pass finding of this audit: the TPC-H orders->lineitem "
            "graph mapping has NO zero-outdeg year at ANY SF (every year "
            "has an order with lineitems — verified by direct count at "
            "all three SFs), so this entry's data cannot distinguish the "
            "join kinds. The strict inner-join semantics ARE oracle-"
            "constrained on the 17-edge fixture, whose 1992 has nodes but "
            "no edges: OM03b mutates fixture_density identically and IS "
            "killed; tests/test_fixture_graph.py and the CLI Table-D "
            "replay pin the same behavior."
        ),
    ),
    dict(
        id="OM03b", entry="fixture_density",
        cls="join-kind-flip",
        desc="fixture_density yr JOIN outdeg becomes LEFT JOIN (the "
             "fixture HAS a zero-edge 1992, so this one must die)",
        old="JOIN outdeg ON yr.id = outdeg.f",
        new="LEFT JOIN outdeg ON yr.id = outdeg.f",
        expect="killed",
    ),
    dict(
        id="OM04", entry="dedup_exact",
        cls="keep-rule-flip",
        desc="canonical id becomes MAX instead of MIN (oracle twin of "
             "M09; first-pass SURVIVOR at sf0.01 — no duplicate texts "
             "below sf0.1 — closed by synthesizing a deterministic "
             "duplicated shard into the entry)",
        old="min(doc_id) AS canonical_id", new="max(doc_id) AS canonical_id",
        expect="killed",
    ),
    dict(
        id="OM05", entry="anti_join_idle_customers",
        cls="join-kind-flip",
        desc="ANTI JOIN becomes SEMI JOIN (polarity inversion)",
        old="ANTI JOIN", new="SEMI JOIN",
        expect="killed",
    ),
    dict(
        id="OM06", entry="graph_hopplot_d2",
        cls="dropped-anti-join",
        desc="d2 candidates keep already-seen d1 pairs (oracle twin of "
             "the fused-anti-join class M11)",
        old="d2new AS (SELECT a, b FROM d2cand EXCEPT SELECT a, b FROM d1)",
        new="d2new AS (SELECT a, b FROM d2cand)",
        expect="killed",
    ),
    dict(
        id="OM07", entry="running_total_orders",
        cls="window-frame-flip",
        desc="cumulative price window runs in reverse year order",
        old="CAST(sum(total) OVER (ORDER BY year) AS DOUBLE) AS cum_price",
        new="CAST(sum(total) OVER (ORDER BY year DESC) AS DOUBLE) AS cum_price",
        expect="killed",
    ),
    dict(
        id="OM08", entry="q12_ship_priority_class",
        cls="boundary-comparison-flip",
        desc="SLOW delay boundary > 60 becomes >= 60 (5 exact-60-day "
             "lineitems exist at sf0.01, so the data constrains this one)",
        old="> 60", new=">= 60",
        expect="killed",
    ),
    dict(
        id="OM09", entry="window_rank_lag",
        cls="window-function-swap",
        desc="yoy lag becomes lead (delta direction inverted)",
        old="lag(rev)", new="lead(rev)",
        expect="killed",
    ),
    dict(
        id="OM10", entry="q19_disjunctive_filter",
        cls="range-bound-off-by-one",
        desc="Brand#1 size branch widens BETWEEN 1 AND 15 -> 1 AND 16",
        old="p_size BETWEEN 1 AND 15", new="p_size BETWEEN 1 AND 16",
        expect="killed",
    ),
    # ---- round-13 extension: clause classes the first pass didn't touch
    dict(
        id="OM11", entry="q16_supplier_part_counts",
        cls="dropped-distinct",
        desc="count(DISTINCT suppkey) loses its DISTINCT (multiplicity "
             "inflates supplier_cnt wherever a supplier ships a part "
             "more than once)",
        old="count(DISTINCT l.l_suppkey)", new="count(l.l_suppkey)",
        expect="killed",
    ),
    dict(
        id="OM12", entry="except_all_supplier_flags",
        cls="multiset-flip",
        desc="EXCEPT ALL becomes EXCEPT (bag difference collapses to set "
             "difference; every surplus count degrades to 1)",
        old="EXCEPT ALL", new="EXCEPT",
        expect="killed",
    ),
    dict(
        id="OM13", entry="events_top_users_per_type",
        cls="topk-off-by-one",
        desc="per-type top-5 becomes top-6",
        old="rn <= 5", new="rn <= 6",
        expect="killed",
    ),
    dict(
        id="OM14", entry="q13_customer_distribution",
        cls="outer-join-condition-motion",
        desc="the ON-clause order filter moves to WHERE (the classic "
             "left-join-becomes-inner trap: NULL-extended customers no "
             "longer survive, the c_count=0 bucket vanishes)",
        old="   AND o.o_orderpriority <> '4-NOT SPECIFIED'",
        new="  WHERE o.o_orderpriority <> '4-NOT SPECIFIED'",
        expect="survives",
        adjudication=(
            "Second real coverage hole found by this audit: at "
            "sf0.001/sf0.01 EVERY customer has >=1 qualifying order "
            "(verified by direct count), so the c_count=0 bucket — the "
            "entire point of Q13's LEFT OUTER JOIN — is unconstrained "
            "at the driver's certification SF. The three-SF board's "
            "sf0.1 leg kills this mutant (7 customers without "
            "qualifying orders exist there; judge-reproducible with "
            "ORACLE_SF_DIR=/root/testdata/sf0.1), and "
            "tests/test_q13_zero_bucket.py now pins the zero-bucket "
            "through the REAL registered query on planted childless/"
            "all-excluded customers at every SF."
        ),
    ),
    dict(
        id="OM15", entry="events_windowed_agg",
        cls="window-bucket-resize",
        desc="15-minute tumbling buckets become 30-minute",
        old="INTERVAL '15 minutes'", new="INTERVAL '30 minutes'",
        expect="killed",
    ),
    dict(
        id="OM16", entry="heavy_hitters_exact",
        cls="limit-shift",
        desc="top-20 token list becomes top-19",
        old="LIMIT 20", new="LIMIT 19",
        expect="killed",
    ),
    dict(
        id="OM17", entry="events_top_users_per_type",
        cls="window-partition-drop",
        desc="row_number loses PARTITION BY event_type (per-type top-5 "
             "becomes one global top-5)",
        old="OVER (PARTITION BY event_type\n"
            "                               ORDER BY n DESC, user_id)",
        new="OVER (ORDER BY n DESC, user_id)",
        expect="killed",
    ),
    # ---- round-13 second extension: samplers, iterative graph, funnel
    # boundaries, streaming cutoffs, shingles, tokenizer classes
    dict(
        id="OM18", entry="sample_stratified",
        cls="sampler-fraction-shift",
        desc="non-en keep fraction 25% becomes 24% (one md5 bucket of "
             "non-en docs flips out of the sample)",
        old="ELSE 25 END", new="ELSE 24 END",
        expect="killed",
    ),
    dict(
        id="OM19", entry="graph_kcore",
        cls="core-threshold-shift",
        desc="every peeling iteration's degree threshold k=3 becomes "
             "k=4 (computes the 4-core instead)",
        old="da.dg >= 3 AND db.dg >= 3", new="da.dg >= 4 AND db.dg >= 4",
        expect="killed",
    ),
    dict(
        id="OM20", entry="events_funnel",
        cls="boundary-comparison-flip",
        desc="funnel step-advance strictness: click qualifies at "
             "EXACTLY the first-view timestamp (ts > t1 becomes >=)",
        old="AND e.ts > v.t1", new="AND e.ts >= v.t1",
        expect="survives",
        adjudication=(
            "Fourth coverage hole of this audit (OM04/OM14 class): NO "
            "click event shares an exact timestamp with any user's "
            "first view at ANY of the three SFs (verified by direct "
            "count), so the funnel's strictly-after semantics are "
            "data-unconstrained everywhere. Pinned by "
            "tests/test_oracle_vacuity_pins.py::"
            "test_funnel_click_at_exact_first_view_ts_does_not_advance "
            "— the REAL registered query over planted exact-ts events."
        ),
    ),
    dict(
        id="OM21", entry="streaming_windowed_append",
        cls="watermark-cutoff-shift",
        desc="append-mode finalization cutoff 30min becomes 15min (one "
             "not-yet-final window leaks into the emitted set)",
        old="m - INTERVAL '30 minutes'", new="m - INTERVAL '15 minutes'",
        expect="killed",
    ),
    dict(
        id="OM22", entry="dedup_minhash_lsh",
        cls="shingle-width-shift",
        desc="3-token shingles become 2-token (different Jaccard "
             "universe: candidate pairs and verified similarities move)",
        old="list_slice(toks, i, i + 2)", new="list_slice(toks, i, i + 1)",
        expect="killed",
    ),
    dict(
        id="OM23", entry="text_token_count",
        cls="tokenizer-class-shift",
        desc="underscore declassed from word characters "
             "([a-z0-9_] -> [a-z0-9] in both alternates)",
        old="'[a-z0-9_]+|[^a-z0-9_\\s]'", new="'[a-z0-9]+|[^a-z0-9\\s]'",
        expect="survives",
        adjudication=(
            "Fifth coverage hole of this audit (OM04/OM14/OM20 class): "
            "no document text contains '_' at ANY of the three SFs "
            "(verified by direct count), so the tokenizer's underscore "
            "word-class is data-unconstrained everywhere. Pinned by "
            "tests/test_oracle_vacuity_pins.py::"
            "test_token_count_treats_underscore_as_word_char — the REAL "
            "registered query over planted underscore docs."
        ),
    ),
]


def main(argv: list[str]) -> int:
    ids = [a for a in argv if not a.startswith("--")]
    json_out = None
    if "--json" in argv:
        json_out = argv[argv.index("--json") + 1]
        ids = [a for a in ids if a != json_out]
    selected = [m for m in MUTANTS if not ids or m["id"] in ids]

    from tools.oracle_check import TABLES, check_one

    import __spark_entry__ as e
    from citegraph_spark.session import get_spark

    spark = get_spark(app_name="oracle_mutation_audit")
    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    report, bad = {}, []
    for m in selected:
        name = m["entry"]
        sql = oracles[name]
        assert m["old"] in sql, f"{m['id']}: old text not found in {name} oracle"
        mutated = dict(oracles)
        mutated[name] = sql.replace(m["old"], m["new"])
        assert mutated[name] != sql, f"{m['id']}: mutation is a no-op"
        t0 = time.time()
        rec = check_one(spark, con, qs, mutated, name, SF_DIR)
        outcome = "killed" if rec["status"] == "FAIL" else "survived"
        ok = (
            outcome == "killed"
            if m["expect"] == "killed"
            else outcome == "survived"
        )
        report[m["id"]] = {
            "entry": name, "cls": m["cls"], "desc": m["desc"],
            "outcome": outcome, "expect": m["expect"], "ok": ok,
            "adjudication": m.get("adjudication"),
            "secs": round(time.time() - t0, 1),
        }
        flag = "OK " if ok else "BAD"
        print(f"{m['id']} {flag} {outcome:8s} (expect {m['expect']}) {m['desc']}")
        if not ok:
            bad.append(m["id"])
    n_killed = sum(1 for r in report.values() if r["outcome"] == "killed")
    n_adj = sum(
        1 for r in report.values()
        if r["expect"] == "survives" and r["outcome"] == "survived"
    )
    print(
        f"\noracle mutation audit: {n_killed} killed, {n_adj} adjudicated "
        f"survivors, {len(bad)} UNEXPECTED: {bad or 'none'}"
    )
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
