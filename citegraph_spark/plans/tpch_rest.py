"""The remaining TPC-H query shapes (Q2/Q6/Q8/Q9/Q11/Q12/Q13/Q15/Q16/
Q17/Q20/Q21/Q22), adapted to the driver's columns — completing full
22-query TPC-H shape coverage together with relational_queries.py
(Q1/Q3/Q4/Q5/Q7/Q10/Q14/Q18/Q19).

Adaptations (the test schema has no partsupp table and no
commit/receipt dates, ship modes, phones, or comments):
- "supply offers" are derived from lineitem: the unit price a supplier
  has charged for a part stands in for ps_supplycost;
- "late" means shipped > 60 days after the order date;
- "country code" is the customer's nation key;
- "customer complaints" (Q16) become suppliers with negative balance.

Every query keeps the *plan shape* that makes its TPC-H original
interesting — correlated/scalar subqueries, two-level aggregation,
multi-EXISTS, conditional aggregation — expressed the Catalyst-native
way (window-min or aggregate-then-broadcast-join decorrelation,
semi/anti joins), with the DuckDB oracle written as the literal
subquery form so the decorrelation itself is what gets verified.
"""

from __future__ import annotations

from datetime import date

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .date_filters import date_window as _date_window
from .entry_queries import register


def _offers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partsupp stand-in: per (part, supplier), the minimum unit price
    observed in lineitem. One shuffle on (partkey, suppkey); at 100 TB
    this is a partial-aggregated map-side combine before exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") > 0)
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 6).alias(
                "ps_supplycost"
            )
        )
    )


_OFFERS_SQL = """
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         round(min(l_extendedprice / l_quantity), 6) AS ps_supplycost
  FROM lineitem WHERE l_quantity > 0
  GROUP BY 1, 2
"""


@register(
    "q2_min_cost_supplier",
    f"""
WITH offers AS ({_OFFERS_SQL})
SELECT s.s_acctbal, s.s_name, n.n_name AS nation, p.p_partkey, p.p_type,
       o.ps_supplycost
FROM part p
JOIN offers o ON p.p_partkey = o.ps_partkey
JOIN supplier s ON s.s_suppkey = o.ps_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE p.p_size = 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'
  AND o.ps_supplycost = (
    SELECT min(o2.ps_supplycost)
    FROM offers o2
    JOIN supplier s2 ON s2.s_suppkey = o2.ps_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE o2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
  )
ORDER BY s.s_acctbal DESC, nation, s.s_name, p.p_partkey
LIMIT 100
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: minimum-cost supplier per part within a region.
    The correlated `= (SELECT min(..) WHERE ps_partkey = p_partkey)`
    subquery decorrelates to a window-min over the region-filtered
    offers: one pass, no re-scan per outer row. Region/nation/supplier
    dims broadcast; the only big shuffle is the offers aggregation.
    Cites reference semantics style: Analytics.scala uses no subqueries,
    so this is beyond-reference surface."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    regional_sup = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )
    offers = _offers(spark, sf_dir).join(
        F.broadcast(regional_sup),
        F.col("ps_suppkey") == F.col("s_suppkey"),
    )
    w = Window.partitionBy("ps_partkey")
    best = offers.withColumn("min_cost", F.min("ps_supplycost").over(w)).filter(
        F.col("ps_supplycost") == F.col("min_cost")
    )
    return (
        best.join(F.broadcast(p), F.col("ps_partkey") == p["p_partkey"])
        .select(
            "s_acctbal", "s_name", "nation", "p_partkey", "p_type", "ps_supplycost"
        )
        .orderBy(F.col("s_acctbal").desc(), "nation", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q6_forecast_revenue",
    """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) <  DATE '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate. All three predicates and the
    3-column projection push into the parquet scan; the aggregate is a
    single partial+final hash agg with no join — the plan every
    100 TB scan-heavy query should collapse to. The date window uses
    _date_window: precise TZ-proof to_date comparison plus a coarse
    bare-column predicate that keeps the scan pushdown alive."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        _date_window("l_shipdate", date(1996, 1, 1), date(1997, 1, 1))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.04)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_items"),
    )


@register(
    "q8_market_share",
    """
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share
FROM (
  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
) all_nations
GROUP BY o_year
ORDER BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional revenue for a part
    type, per order year. The share is a conditional-sum / total-sum
    ratio in a single aggregate (no self-join). All dims broadcast;
    lineitem⨝orders is the one big shuffle. Part filter applies before
    the fact join, shrinking the probe side early."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_in_region = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p.select("p_partkey")), li["l_partkey"] == F.col("p_partkey"))
        .join(F.broadcast(sup), li["l_suppkey"] == F.col("s_suppkey"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(cust_in_region), o["o_custkey"] == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    """
SELECT nation, o_year,
       CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         CAST(year(o.o_orderdate) AS INT) AS o_year,
         CAST(l.l_extendedprice * (1 - l.l_discount)
           - 0.1 * p.p_retailprice * l.l_quantity AS DECIMAL(28, 10))
           AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%gear%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (supply cost proxied as 10% of retail price —
    no partsupp table): profit by supplier nation and order year for
    parts matching a name pattern. The LIKE filter broadcast-prunes
    lineitem before the orders shuffle; profit arithmetic stays in
    whole-stage codegen."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    n = load_table(spark, sf_dir, "nation")
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select("n_nationkey", F.col("n_name").alias("nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "nation")
    )
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    # Exact decimal accumulation: the per-row amount stays a
    # deterministic double expression, but it is quantized to
    # DECIMAL(28,10) BEFORE the sum, so the aggregate is
    # order-independent — the round-10 scan-scramble board caught this
    # entry's NATION_17/1998 group sitting exactly on the half-cent
    # boundary (exact sum 2880529.3350000000), where a double sum
    # rounds to .33 or .34 depending on partition order. Both engines
    # quantize identically (the double's decimal expansion is exact),
    # sum exactly, and round half-up. This is the money-sum pattern a
    # 1000-executor job needs anyway: results must not depend on how
    # the scheduler happened to split the scan.
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(28,10)")
    return (
        li.join(
            F.broadcast(p.select("p_partkey", "p_retailprice")),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .join(F.broadcast(s), li["l_suppkey"] == F.col("s_suppkey"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.round(F.sum(amount), 2).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q11_important_stock",
    f"""
WITH offers AS ({_OFFERS_SQL}),
     natsup AS (
       SELECT s_suppkey FROM supplier s JOIN nation n
       ON s.s_nationkey = n.n_nationkey WHERE n.n_name = 'NATION_3'
     ),
     val AS (
       SELECT o.ps_partkey, sum(o.ps_supplycost) AS part_value
       FROM offers o JOIN natsup ns ON o.ps_suppkey = ns.s_suppkey
       GROUP BY 1
     )
SELECT ps_partkey, round(part_value, 2) AS part_value
FROM val
WHERE part_value > (SELECT sum(part_value) * 0.001 FROM val)
ORDER BY part_value DESC, ps_partkey
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose stock value within one nation exceeds
    a fraction of the nation's total. The uncorrelated scalar subquery
    (global sum) becomes an aggregate-then-broadcast-cross-join — the
    per-part values are computed ONCE and reused for both the threshold
    and the output (cached single-shuffle plan, no double scan at
    100 TB)."""
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    val = (
        _offers(spark, sf_dir)
        .join(F.broadcast(s.select("s_suppkey")), F.col("ps_suppkey") == F.col("s_suppkey"))
        .groupBy("ps_partkey")
        .agg(F.sum("ps_supplycost").alias("part_value"))
    )
    threshold = val.agg((F.sum("part_value") * 0.001).alias("threshold"))
    return (
        val.join(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("ps_partkey", F.round("part_value", 2).alias("part_value"))
        .orderBy(F.col("part_value").desc(), "ps_partkey")
    )


@register(
    "q12_ship_priority_class",
    """
SELECT delay_class,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count,
       CAST(sum(CASE WHEN ship_day IN (DATE '1996-01-01', DATE '1996-12-31')
                THEN 1 ELSE 0 END) AS BIGINT) AS boundary_day_count
FROM (
  SELECT o.o_orderpriority,
         CAST(l.l_shipdate AS DATE) AS ship_day,
         CASE WHEN CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE) > 60
              THEN 'SLOW' ELSE 'FAST' END AS delay_class
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l.l_shipdate AS DATE) <  DATE '1997-01-01'
) t
GROUP BY delay_class
ORDER BY delay_class
""",
)
def q12_ship_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (ship mode → ship-delay class; the test schema has
    no l_shipmode): conditional counts of high/low-priority orders per
    delay class. One orderkey shuffle join; both CASE aggregates compute
    in the same hash agg pass.

    Driver-hardening history: r3 and r5 driver sweeps hash-failed this
    entry (rows/schema ok) while local checks pass. The round-4 CAST-to-
    DATE hardening of the day-difference did not fix it; the remaining
    engine-sensitive construct was the FILTER boundary, which compared
    the parquet TIMESTAMP column against a `.cast("timestamp")` string
    literal — on an engine build that reads the column as TIMESTAMP_LTZ
    under a non-UTC session the window shifts by the TZ offset and
    boundary-midnight rows (1996-01-01 / 1997-01-01 00:00, present at
    every sf) migrate between FAST/SLOW. Round 6: date-only semantics on
    BOTH engines — `F.to_date` comparisons against DATE literals here,
    `CAST(... AS DATE)` vs `DATE '...'` in the oracle — plus a
    `boundary_day_count` debug column (rows landing on the first or
    LAST in-window day, 1996-01-01 / 1996-12-31 — the upper bound
    itself is unreachable by construction) so any residual divergence
    self-localizes in the driver row.

    Round-6 root cause (found after the date-only rewrite): this was
    the ONLY oracle in the entire 226-entry registry whose output
    carried DuckDB HUGEINT columns — `sum(CASE..1..0)` of an INTEGER
    is HUGEINT (int128) in DuckDB, while every other entry follows the
    repo convention of CAST(... AS BIGINT) / round()-wrapping. A
    canonicalizer that hashes fetched values typed (int128/Decimal/
    float vs Spark's int64) mismatches on exactly and only this entry —
    which fits the full failure record better than the TZ theory (q20's
    identical timestamp filter passed the same r3 sweep that failed
    q12; the r4 datediff hardening changed nothing). All three sums are
    now CAST AS BIGINT in the oracle; the registry-wide scan asserting
    no oracle emits HUGEINT is tests/test_oracle_dtypes.py."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(_date_window("l_shipdate", date(1996, 1, 1), date(1997, 1, 1)))
        .withColumn("ship_day", F.to_date(F.col("l_shipdate")))
        .select("l_orderkey", "ship_day")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    # edge canaries: the FIRST and LAST in-window days. The upper bound
    # itself (1997-01-01) would be dead by construction — ship_day
    # derives from the very expression the filter half-opens on, so it
    # can never survive the filter even on a TZ-skewed engine; rows
    # migrating across the upper bound show up as a 1996-12-31 delta
    # instead (advisor note, round 6).
    boundary = F.col("ship_day").isin(date(1996, 1, 1), date(1996, 12, 31))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .withColumn(
            "delay_class",
            F.when(
                F.datediff(F.col("ship_day"), F.to_date(F.col("o_orderdate"))) > 60,
                "SLOW",
            ).otherwise("FAST"),
        )
        .groupBy("delay_class")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
            F.sum(F.when(boundary, 1).otherwise(0)).alias("boundary_day_count"),
        )
        .orderBy("delay_class")
    )


@register(
    "q13_customer_distribution",
    """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of per-customer order counts, including
    zero-order customers (LEFT OUTER with the filter INSIDE the join
    condition — filtering before the join would silently drop them from
    the join but they must still appear with count 0). Two-level
    aggregation: the second groupBy keys on an aggregate of the first."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q15_top_supplier",
    """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l_shipdate AS DATE) <  DATE '1996-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue.
    The view + scalar-max subquery becomes aggregate → broadcast of the
    1-row max → filter; the revenue aggregate is computed once (the
    naive plan recomputes the view twice)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        _date_window("l_shipdate", date(1996, 1, 1), date(1996, 4, 1))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_part_counts",
    """
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_type NOT LIKE 'PROMO%'
  AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
""",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per brand/type/size,
    excluding an anti-join set ("complaint" suppliers → negative
    balance; the test schema has no comments). NOT IN over a non-null
    key column is a broadcast LEFT ANTI join; count(DISTINCT) expands
    to a two-phase aggregate."""
    bad_sup = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad_sup), li["l_suppkey"] == bad_sup["s_suppkey"], "left_anti")
        .join(
            F.broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q17_small_quantity_revenue",
    """
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3'
  AND l.l_quantity < (
    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = p.p_partkey
  )
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue of small-quantity orders relative to each
    part's average. The correlated avg decorrelates to a per-part
    aggregate joined back (broadcast — one row per part); the threshold
    uses the UNFILTERED per-part average while the revenue sum is
    brand-filtered, so the avg aggregates before the brand join."""
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_threshold")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    return (
        li.join(F.broadcast(p.select("p_partkey")), li["l_partkey"] == F.col("p_partkey"))
        .join(F.broadcast(part_avg), F.col("l_partkey") == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q20_part_promotion",
    """
SELECT s.s_name, n.n_name AS nation
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_regionkey = 2
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE 'small%'
      AND CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l.l_shipdate AS DATE) <  DATE '1997-01-01'
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING sum(l.l_quantity) > (
      SELECT 0.3 * sum(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey
        AND CAST(l2.l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l2.l_shipdate AS DATE) <  DATE '1997-01-01'
    )
  )
ORDER BY s.s_name
""",
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one region who moved > 30% of a
    promoted part's annual volume. The HAVING-with-correlated-subquery
    becomes: per-(supplier, part) sums joined against per-part totals
    computed from the SAME filtered scan (window-sum over partkey — one
    shuffle, no second scan), then a semi join into supplier."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        _date_window("l_shipdate", date(1996, 1, 1), date(1997, 1, 1))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    sp = (
        li.join(F.broadcast(p.select("p_partkey")), li["l_partkey"] == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("sp_qty"))
    )
    # Per-part total over the same year, unfiltered by part name for the
    # denominator per the adapted oracle: restrict to the same filtered
    # scan keyed by partkey (window over the aggregate avoids a re-scan).
    part_total = li.groupBy(F.col("l_partkey").alias("tot_partkey")).agg(
        (F.sum("l_quantity") * 0.3).alias("qty_bar")
    )
    movers = (
        sp.join(F.broadcast(part_total), F.col("l_partkey") == F.col("tot_partkey"))
        .filter(F.col("sp_qty") > F.col("qty_bar"))
        .select("l_suppkey")
        .distinct()
    )
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(movers, s["s_suppkey"] == movers["l_suppkey"], "left_semi")
        .select("s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )


@register(
    "q21_waiting_suppliers",
    """
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
  AND n.n_name = 'NATION_3'
  AND CAST(l1.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE) > 60
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND CAST(l3.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE) > 60
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape ("late" = shipped > 60 days after order date; the
    test schema has no receipt/commit dates): suppliers who were the
    SOLE late supplier on a finished multi-supplier order. The
    EXISTS/NOT EXISTS pair collapses to one per-order aggregate
    (count distinct suppliers, count distinct late suppliers) joined to
    the late lineitems — one lineitem shuffle on orderkey instead of
    two correlated re-scans; at 100 TB this is the difference between
    one exchange and three."""
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == o["o_orderkey"])
        .withColumn(
            "is_late",
            (
                F.datediff(
                    F.to_date(F.col("l_shipdate")), F.to_date(F.col("o_orderdate"))
                )
                > 60
            ).cast("int"),
        )
    )
    per_order = li.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("n_suppliers"),
        F.count_distinct(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias(
            "n_late_suppliers"
        ),
    )
    late = li.filter(F.col("is_late") == 1)
    return (
        late.join(
            per_order,
            (late["l_orderkey"] == per_order["po_orderkey"])
            & (per_order["n_suppliers"] > 1)
            & (per_order["n_late_suppliers"] == 1),
        )
        .join(
            F.broadcast(s.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@register(
    "q22_global_sales_opportunity",
    """
SELECT c_nationkey AS cntrycode, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
  AND c.c_acctbal > (
    SELECT avg(c2.c_acctbal) FROM customer c2
    WHERE c2.c_acctbal > 0.0
      AND c2.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND CAST(o.o_orderdate AS DATE) >= DATE '1999-01-01'
  )
GROUP BY c_nationkey
ORDER BY cntrycode
""",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (country code → nation key, "never ordered" →
    "no order since 1999" — the synthetic data gives every customer at
    least one order; the test schema has no phone column): wealthy
    customers in target countries gone quiet. Scalar-avg subquery →
    1-row broadcast; NOT EXISTS → LEFT ANTI join on custkey (orders
    pre-filtered by the pushed-down date and projected to the single
    join column, so at 100 TB the anti join ships only keys)."""
    nations = [1, 3, 5, 7, 9, 11, 13]
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(*nations)
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(_date_window("o_orderdate", date(1999, 1, 1)))
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == o["o_custkey"], "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
