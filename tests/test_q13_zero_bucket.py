"""Pin q13_customer_distribution's LEFT-JOIN zero-order bucket.

Round-13 oracle-mutation-audit find (OM14): at sf0.001/sf0.01 EVERY
customer has at least one qualifying (non-'4-NOT SPECIFIED') order, so
the c_count=0 bucket — the whole point of Q13's LEFT OUTER JOIN with
the filter inside the join condition (TPC-H Q13; reference semantics
n/a, this is beyond-reference surface) — is completely unconstrained at
the driver's certification SF: moving the order filter into WHERE (the
classic left-join-becomes-inner trap) survives the sf0.01 oracle gate.
The three-SF board's sf0.1 leg kills it (7 customers without
qualifying orders exist there); this test pins the same semantics
through the REAL registered query on synthetic data where the
zero-bucket customers are planted deliberately, so the boundary is
constrained at test time regardless of SF.
"""

from __future__ import annotations


def test_q13_counts_customers_with_no_qualifying_orders(tmp_path, spark):
    from citegraph_spark.plans.entry_queries import QUERIES

    customers = spark.createDataFrame(
        [(i,) for i in range(1, 6)], "c_custkey int"
    )
    # cust 1: two qualifying; cust 2: one qualifying + one excluded;
    # cust 3: ONLY excluded orders (zero-bucket via the ON-filter);
    # cust 4: no orders at all (zero-bucket via null-extension);
    # cust 5: three qualifying
    orders = spark.createDataFrame(
        [
            (101, 1, "1-URGENT"), (102, 1, "2-HIGH"),
            (201, 2, "3-MEDIUM"), (202, 2, "4-NOT SPECIFIED"),
            (301, 3, "4-NOT SPECIFIED"), (302, 3, "4-NOT SPECIFIED"),
            (501, 5, "1-URGENT"), (502, 5, "5-LOW"), (503, 5, "2-HIGH"),
        ],
        "o_orderkey int, o_custkey int, o_orderpriority string",
    )
    customers.write.parquet(str(tmp_path / "customer.parquet"))
    orders.write.parquet(str(tmp_path / "orders.parquet"))

    out = QUERIES["q13_customer_distribution"](spark, str(tmp_path)).collect()
    got = {r["c_count"]: r["custdist"] for r in out}
    # the inner-join mutant loses the 0 bucket entirely
    assert got == {0: 2, 1: 1, 2: 1, 3: 1}, got
