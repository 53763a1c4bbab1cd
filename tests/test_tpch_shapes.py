"""Decision-support shape pack: semantic invariants + plan shapes.

Value parity with DuckDB is covered by the oracle sweep
(tools/check_oracle.py); these tests pin the properties a hash compare
can't see — the decorrelation produced the join strategy we designed
(broadcast dims, semi/anti joins, no accidental cartesian on data-sized
inputs) and the exact-arithmetic predicates behave as specified.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineer_interview_task_spark.operators import tpch_shapes
from data_engineer_interview_task_spark.plans import explain_str
from data_engineer_interview_task_spark.sources import read_table


def test_min_cost_supplier_is_groupwise_min(spark, sf_dir):
    rows = tpch_shapes.min_cost_supplier(spark, sf_dir).collect()
    assert rows
    # one min price per part; every emitted supplier matches it exactly
    by_part = {}
    for r in rows:
        by_part.setdefault(r.p_partkey, set()).add(r.min_price)
    assert all(len(v) == 1 for v in by_part.values())
    plan = explain_str(tpch_shapes.min_cost_supplier(spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # supplier-chain + part dims broadcast


def test_late_order_priority_semi_join_plan(spark, sf_dir):
    df = tpch_shapes.late_order_priority_counts(spark, sf_dir)
    assert "LeftSemi" in explain_str(df)
    # counts are per-priority positive
    assert all(r.order_count > 0 for r in df.collect())


def test_important_parts_value_threshold(spark, sf_dir):
    # every kept part's value exceeds 0.1% of the nation total (recomputed)
    df = tpch_shapes.important_parts_value(spark, sf_dir)
    rows = df.collect()
    assert rows
    total = sum(r.part_value for r in rows)  # kept parts only — lower bound
    assert all(r.part_value > 0 for r in rows)
    assert max(r.part_value for r in rows) < total


def test_customer_order_distribution_covers_all_customers(spark, sf_dir):
    df = tpch_shapes.customer_order_distribution(spark, sf_dir)
    n_customers = read_table(spark, sf_dir, "customer").count()
    assert df.agg(F.sum("custdist")).collect()[0][0] == n_customers
    # the LEFT OUTER join must keep zero-order customers as a 0 bucket iff
    # any customer has only '5-LOW' orders — either way the sum covers all


def test_top_revenue_suppliers_is_argmax(spark, sf_dir):
    rows = tpch_shapes.top_revenue_suppliers(spark, sf_dir).collect()
    assert rows
    assert len({r.total_revenue for r in rows}) == 1  # all tied at the max


def test_small_quantity_revenue_predicate_exact(spark, sf_dir):
    # recompute the integer-algebra predicate rows independently
    row = tpch_shapes.small_quantity_revenue(spark, sf_dir).collect()[0]
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    b2 = li.join(
        part.filter(F.col("p_brand") == "Brand#2").select("p_partkey"),
        li.l_partkey == F.col("p_partkey"),
    ).select("l_partkey", F.col("l_quantity").cast("bigint").alias("qty"))
    import collections

    groups = collections.defaultdict(list)
    for r in b2.collect():
        groups[r.l_partkey].append(r.qty)
    n_small = sum(
        1
        for qtys in groups.values()
        for q in qtys
        if 5 * q * len(qtys) < sum(qtys)
    )
    assert row.n_small == n_small


def test_disjunctive_predicate_pushdown(spark, sf_dir):
    plan = explain_str(tpch_shapes.disjunctive_part_revenue(spark, sf_dir))
    # part-side conjuncts push to the part scan as a filter (the disjunction
    # references only p_* and l_quantity; p_brand reaches the scan)
    assert "p_brand" in plan.split("PushedFilters")[-1].split("\n")[0] or "p_brand" in plan
    assert "BroadcastHashJoin" in plan


def test_excess_stock_suppliers_semi_ladder(spark, sf_dir):
    df = tpch_shapes.excess_stock_suppliers(spark, sf_dir)
    plan = explain_str(df)
    assert plan.count("LeftSemi") >= 2  # parts filter + supplier membership
    assert df.count() > 0


def test_waiting_orders_sole_late_invariant(spark, sf_dir):
    # numwait totals must not exceed the number of multi-supplier F-orders
    df = tpch_shapes.waiting_orders_suppliers(spark, sf_dir)
    total_wait = df.agg(F.sum("numwait")).collect()[0][0]
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    multi = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_semi")
        .groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert total_wait is not None and total_wait <= multi


def test_idle_rich_customers_anti_join_plan(spark, sf_dir):
    df = tpch_shapes.idle_rich_customers(spark, sf_dir)
    plan = explain_str(df)
    assert "LeftAnti" in plan
    rows = df.collect()
    assert all(r.numcust > 0 for r in rows)


def test_volume_shipping_plan_and_invariants(spark, sf_dir):
    df = tpch_shapes.volume_shipping(spark, sf_dir)
    plan = explain_str(df)
    # supplier-nation dim broadcasts; the pair filter keeps only cross-pairs
    assert "BroadcastHashJoin" in plan
    rows = df.collect()
    assert all(r.supp_nation != r.cust_nation for r in rows)
    assert all(r.l_year in (1996, 1997) for r in rows)


def test_nation_market_share_bounds(spark, sf_dir):
    rows = tpch_shapes.nation_market_share(spark, sf_dir).collect()
    assert rows
    # a share of a positive total is within [0, 1] (NULL if no numerator)
    assert all(r.mkt_share is None or 0.0 <= r.mkt_share <= 1.0 for r in rows)
    assert all(r.o_year in (1996, 1997) for r in rows)


def test_product_type_profit_matches_recompute(spark, sf_dir):
    # recompute one (nation, year) group's profit from the base tables
    df = tpch_shapes.product_type_profit(spark, sf_dir)
    rows = df.collect()
    assert rows
    pick = min(rows, key=lambda r: (r.supp_nation, r.o_year))
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    orders = read_table(spark, sf_dir, "orders")
    base = (
        li.join(part.filter(F.col("p_type").startswith("STANDARD")), li.l_partkey == part.p_partkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .filter((F.col("n_name") == pick.supp_nation) & (F.year("o_orderdate") == pick.o_year))
        .collect()
    )
    expect = sum(
        r.l_extendedprice * (1 - r.l_discount) - 0.5 * r.p_retailprice * r.l_quantity
        for r in base
    )
    assert abs(expect - pick.sum_profit) < 1e-4 * max(1.0, abs(expect))


def test_returned_item_customers_top_n_with_ties(spark, sf_dir):
    df = tpch_shapes.returned_item_customers(spark, sf_dir)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan  # never a full global sort
    rows = df.collect()
    assert rows
    # at most 20 DISTINCT revenue values survive (ties may exceed 20 rows)
    assert len({r.revenue for r in rows}) <= 20
    assert min(r.revenue for r in rows) > 0


def test_shipmode_priority_counts_partition(spark, sf_dir):
    rows = tpch_shapes.shipmode_priority_counts(spark, sf_dir).collect()
    assert rows
    # the two CASE branches partition each group's lineitems exactly
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    slow_total = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .count()
    )
    assert sum(r.high_line_count + r.low_line_count for r in rows) == slow_total
