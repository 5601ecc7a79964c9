"""CLI: `python -m citegraph_spark.cli <task> <input_dir> <output_dir>`.

Tasks: `density`, `diameter`. Fixes the reference's arg-parse defect
(SURVEY.md §3.3: its `--testing` 3-arg path always exits) with one
argparse parser; `--testing` is a flag, and any filesystem URI works
(the reference hard-required hdfs:// prefixes, Application.scala:34-36).

Input dir must contain `citations.txt` and `published-dates.txt`
(reference text formats); `nodepairs.csv` is optional — without it the
diameter denominator is computed from the BFS itself (the spec's d=20
definition, docs/PA1.pdf p.3).
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="citegraph_spark")
    p.add_argument("task", choices=["density", "diameter"])
    p.add_argument("input_dir")
    p.add_argument("output_dir")
    p.add_argument("--testing", action="store_true", help="verbose debug output")
    p.add_argument("--max-d", type=int, default=20)
    p.add_argument(
        "--approx",
        action="store_true",
        help="diameter only: HyperBall sketch hop-plot (O(|V|*2^p) state "
        "instead of O(connected pairs) — the 100 TB path)",
    )
    p.add_argument("--hll-p", type=int, default=6, help="HyperBall precision (2^p registers)")
    args = p.parse_args(argv)

    from .operators.graph import (
        approx_hop_plot_df,
        density,
        hop_plot_df,
        snapshot_edges,
    )
    from .session import get_spark
    from .sources import (
        load_citations,
        load_nodepairs,
        load_published_dates,
        save_sorted_csv_single,
    )

    spark = get_spark(app_name=f"citegraph_{args.task}")
    citations = load_citations(spark, f"{args.input_dir}/citations.txt")
    published = load_published_dates(spark, f"{args.input_dir}/published-dates.txt")

    if args.task == "density":
        result = density(citations, published)
        if args.testing:
            result.show()
        save_sorted_csv_single(result, f"{args.output_dir}/densities", "year")
        print(f"wrote {args.output_dir}/densities")
        return 0

    # diameter: per-year hop plots
    try:
        totals = {
            r["year"]: r["total_pairs"]
            for r in load_nodepairs(spark, f"{args.input_dir}/nodepairs.csv").collect()
        }
    except Exception:
        totals = {}
    years = sorted(
        r["year"] for r in published.select("year").distinct().collect()
    )
    for year in years:
        edges = snapshot_edges(citations, published, year)
        if args.approx:
            df = approx_hop_plot_df(
                spark, edges, total_pairs=totals.get(year), max_d=args.max_d,
                p=args.hll_p,
            )
        else:
            df = hop_plot_df(
                spark, edges, total_pairs=totals.get(year), max_d=args.max_d
            )
        if df.isEmpty():
            if args.testing:
                print(f"{year}: empty graph, skipped")
            continue
        if args.testing:
            df.show()
        save_sorted_csv_single(df, f"{args.output_dir}/diameter_{year}", "d")
        print(f"wrote {args.output_dir}/diameter_{year}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
