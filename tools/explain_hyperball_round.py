"""Dump the physical plan of one HyperBall absorb round (+ the round
estimate) for the plans/r13 evidence files.

The registered query's own explain is a trivial driver-side
createDataFrame (hyperball returns a handful of (d, pairs) rows), so the
meaningful plan for optimization evidence is the per-round absorb job the
loop executes — this reproduces it exactly as hyperball_hopplot builds it
(broadcast path, codegen/coalesce knobs, self-loop-augmented edges).

Usage: python tools/explain_hyperball_round.py > plans/r13/...txt
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from citegraph_spark.functions import sketches  # noqa: E402
from citegraph_spark.functions.sketches import init_counters_dense  # noqa: E402
from citegraph_spark.lineage import cut_lineage  # noqa: E402
from citegraph_spark.operators.graph import bidirectional  # noqa: E402
from citegraph_spark.plans.entry_queries import _citations  # noqa: E402
from citegraph_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    p = 6
    m = 1 << p
    cols = [f"r{i}" for i in range(m)]
    spark = get_spark(app_name="explain_hyperball_round")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    edges = bidirectional(_citations(spark, sf_dir), dedup=False).transform(
        cut_lineage
    )
    counters = init_counters_dense(
        edges.select(F.col("src").alias("node")), p=p
    ).transform(cut_lineage)
    edges_aug = edges.unionByName(
        counters.select(F.col("node").alias("src"), F.col("node").alias("dst"))
    ).repartition(n_shuffle, "src")

    absorb = (
        edges_aug.join(
            F.broadcast(counters), edges_aug["dst"] == counters["node"], "inner"
        )
        .select(edges_aug["src"].alias("node"), *cols)
        .groupBy("node")
        .agg(*[F.expr(f"max({c}) AS {c}") for c in cols])
    )
    if hasattr(sketches, "_estimate_sql"):
        # r13 shape: the round estimate rides the absorb job as an
        # observed metric instead of a second job over the checkpoint
        from pyspark.sql import Observation

        absorb = absorb.observe(
            Observation("hyperball_round"),
            F.expr(f"sum({sketches._estimate_sql(p)})").alias("total"),
        )

    if hasattr(sketches, "_estimate_sql"):
        est = F.expr(f"sum({sketches._estimate_sql(p)}) AS total")
    else:  # pre-r13 shape: Column-tree estimate with pow(2, -r) terms
        denom = None
        zeros = None
        for i in range(m):
            term = F.pow(F.lit(2.0), -F.col(f"r{i}"))
            z = F.when(F.col(f"r{i}") == 0, 1).otherwise(0)
            denom = term if denom is None else denom + term
            zeros = z if zeros is None else zeros + z
        alpha = sketches._alpha(m)
        raw = F.lit(alpha * m * m) / denom
        est = F.sum(
            F.when(
                (raw <= 2.5 * m) & (zeros > 0),
                F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
            ).otherwise(raw)
        ).alias("total")

    buf = io.StringIO()
    with redirect_stdout(buf):
        print("== one absorb round (broadcast path) ==")
        absorb.explain("formatted")
        print("== round estimate ==")
        counters.agg(est).explain("formatted")
    text = buf.getvalue()
    # the r0..r63 column lists make the plan unreadable; elide the middles
    for i in range(2, m - 1):
        text = text.replace(f"r{i}#", f"r{i}…#")
    print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
