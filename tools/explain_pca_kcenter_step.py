"""Dump the physical plan of one pca_power_top1 iteration aggregate and
one kcenter_greedy round update for the plans/r13 evidence files.

The registered gates' own explain is a trivial driver-side
createDataFrame (both return a handful of certificate rows), so the
meaningful plan for optimization evidence is the per-step aggregate the
driver loop executes — this reproduces it exactly as the functions build
it at HEAD (import-time binding, so the same script dumps before/after
around the optimization commit).

Usage: python tools/explain_pca_kcenter_step.py > plans/r13/...txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from citegraph_spark.session import get_spark  # noqa: E402
from citegraph_spark.sources.tables import load_table  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="explain_pca_kcenter_step")
    emb = load_table(spark, sf_dir, "embeddings")

    import citegraph_spark.functions.clustering as cl

    # --- pca: capture the per-iteration aggregate plan by intercepting
    # the loop's first agg via a 1-iteration run ---------------------
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select(v.alias("_v"))
    d = 64
    vec = [0.0] * d
    vec[0] = 1.0

    if hasattr(cl, "_pca_step_plan"):
        step = cl._pca_step_plan(base, vec, d)
    else:
        # pre-optimization shape (Column-API expression trees)
        lit_v = F.array(*[F.lit(x) for x in vec])
        dot = F.aggregate(
            F.zip_with(F.col("_v"), lit_v, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        proj = base.select("_v", dot.alias("_dot"))
        step = proj.agg(
            F.sum("_dot").alias("t"),
            *[
                F.sum(F.col("_dot") * F.col("_v")[j]).alias(f"s{j}")
                for j in range(d)
            ],
        )
    print("== pca_power_top1 per-iteration aggregate ==")
    step.explain("formatted")

    # --- kcenter: one round's min-distance update + max_by pick -----
    center = [0.0] * d
    if hasattr(cl, "_kcenter_dist_expr"):
        dcol = cl._kcenter_dist_expr(center)
    else:
        c = F.array(*[F.lit(float(x)) for x in center])
        dcol = F.sqrt(
            F.aggregate(
                F.zip_with(F.col("_v"), c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    cur = base.select(
        F.monotonically_increasing_id().alias("_id"), "_v"
    ).withColumn("_mind", F.lit(float("inf")))
    cur = cur.withColumn("_mind", F.least(F.col("_mind"), dcol))
    pick = cur.agg(
        F.max_by(
            F.struct("_id", "_v", "_mind"),
            F.struct(F.col("_mind"), -F.col("_id")),
        ).alias("b")
    ).select("b.*")
    print("== kcenter_greedy per-round update + max_by pick ==")
    pick.explain("formatted")
    return 0


if __name__ == "__main__":
    sys.exit(main())
