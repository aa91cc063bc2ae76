"""Relational-division operator semantics (customers_every_priority)."""

from __future__ import annotations

def test_customers_every_priority_is_exact_division(spark):
    """Hand-built corpus: only the customer covering ALL priority levels
    survives; partial coverage (even n-1 of n) is excluded."""
    import tempfile as _tf

    from trafsys_data_transfer_spark.registry import all_queries

    rows = []
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
    # customer 1: all three priorities (plus a repeat); customer 2: two;
    # customer 3: one, repeated
    for i, (cust, prio) in enumerate(
        [(1, prios[0]), (1, prios[1]), (1, prios[2]), (1, prios[0]),
         (2, prios[0]), (2, prios[1]),
         (3, prios[2]), (3, prios[2])]
    ):
        rows.append((i, cust, "O", 10.0, "1995-01-01", prio))
    d = _tf.mkdtemp(prefix="t_div_")
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(o_orderdate AS DATE) AS o_orderdate", "o_orderpriority",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    out = all_queries()["customers_every_priority"].build(spark, d).collect()
    assert [(r.c_custkey, r.n_priorities, r.n_orders) for r in out] == [
        (1, 3, 4)
    ]
