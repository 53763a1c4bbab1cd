"""Decision-support query shapes (TPC-H Q2/Q4/Q7/Q8/Q9/Q10/Q11/Q12/Q13/
Q15/Q16/Q17/Q19/Q20/Q21/Q22 analogs) over the driver's TPC-H-ish tables.

These are the classic *correlated-subquery* and *nested-(anti/semi)-join*
patterns a warehouse engine must decorrelate into joins and aggregations;
none exist in the reference (SURVEY.md §2.7 lists the whole relational
category as absent — its 387-line pandas ETL has no joins at all), but any
user migrating real analytics onto this engine writes them on day one.

Spark-first notes (apply to every function here):
- Correlated scalar subqueries (Q2 min-per-part, Q17 avg-per-part, Q22
  global avg) are expressed as an explicit aggregate + equi-join — exactly
  the decorrelation Catalyst would perform, but written declaratively so
  the plan is visible and the aggregate side can be sized/broadcast.
- EXISTS / NOT EXISTS become ``left_semi`` / ``left_anti`` joins: fully
  distributed, null-safe (unlike SQL ``NOT IN``), and AQE-sizable.
- Every emitted money aggregate accumulates in DECIMAL and casts the final
  value to DOUBLE (decimal->double is correctly rounded in both engines);
  threshold comparisons happen in exact integer/decimal arithmetic so the
  selected row set is bit-identical to the DuckDB oracle.
- SCALE: the only unavoidable shuffles are on the natural keys (partkey /
  orderkey / suppkey); dimension tables (part, supplier, nation, region)
  are broadcast. No query here materializes an intermediate wider than its
  aggregate output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import read_table


def _dec(col: str) -> F.Column:
    """The repo-standard exact money cast (scale 2 matches the data)."""
    return F.col(col).cast("decimal(18,2)")


_REV = "decimal(28,6)"  # accumulator type for extendedprice*(1-discount)


def _revenue() -> F.Column:
    return (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))).cast(
        _REV
    )


def discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape (forecasting revenue change): one-pass filtered aggregate
    over lineitem — revenue that would vanish if discounts in a band were
    eliminated for a year's small-quantity orders.

    The whole query is scan-local: every predicate (ship-year, discount
    band, quantity cap) pushes to the parquet scan (PushedFilters), the
    projection prunes to 4 columns, and the aggregate is a partial+final
    sum with a 1-row exchange — the canonical 'filter pushdown + map-side
    combine' probe. At 100 TB this is bounded by bytes actually read,
    which date-partitioned layout cuts to 1/7th (partition pruning on the
    ship-year predicate). Discount bounds compare the stored doubles
    directly (bit-identical across engines); the product accumulates in
    DECIMAL, emitted once as double."""
    li = read_table(spark, sf_dir, "lineitem")
    amount = (_dec("l_extendedprice") * _dec("l_discount")).cast(_REV)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(amount).cast("double").alias("lost_revenue"),
        )
    )


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each small part, the EUROPE supplier(s) offering the
    minimum price — the correlated-scalar-subquery-in-WHERE pattern,
    decorrelated into a per-part MIN aggregate joined back on
    (partkey, price). The supplier dimension chain (supplier ⋈ nation ⋈
    region) is broadcast; the only shuffle is the per-part aggregate."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")

    eu_supp = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    small_parts = part.filter(F.col("p_size") < 15).select("p_partkey", "p_name")
    offers = (
        li.join(F.broadcast(eu_supp), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(small_parts), li.l_partkey == F.col("p_partkey"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "l_extendedprice")
    )
    min_price = offers.groupBy(F.col("p_partkey").alias("mp_partkey")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        offers.join(
            min_price,
            (offers.p_partkey == F.col("mp_partkey"))
            & (offers.l_extendedprice == F.col("min_price")),
        )
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "min_price")
        .distinct()
    )


def late_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: order-priority checking — orders placed in 1996Q1 that had
    at least one lineitem shipped >30 days after the order date (EXISTS →
    ``left_semi`` join on orderkey), counted per priority bucket."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    q1 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    late = li.select("l_orderkey", "l_shipdate")
    had_late = q1.join(
        late,
        (q1.o_orderkey == late.l_orderkey)
        & (late.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return had_late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


def important_parts_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-part inventory value from NATION_3's suppliers,
    keeping parts worth more than 0.1% of that nation's total — the
    group-level HAVING-vs-scalar-subquery pattern. The global total is a
    one-row aggregate broadcast into the HAVING comparison; both sides stay
    DECIMAL so the selected set is exact."""
    li = read_table(spark, sf_dir, "lineitem")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    n7_supp = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .filter(F.col("n_name") == "NATION_3")
        .select("s_suppkey")
    )
    vals = li.join(F.broadcast(n7_supp), li.l_suppkey == F.col("s_suppkey")).select(
        "l_partkey", _dec("l_extendedprice").alias("price_dec")
    )
    per_part = vals.groupBy("l_partkey").agg(F.sum("price_dec").alias("value_dec"))
    total = vals.agg(
        (F.sum("price_dec") * F.lit("0.001").cast("decimal(4,3)")).alias("threshold_dec")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec") > F.col("threshold_dec"))
        .select("l_partkey", F.col("value_dec").cast("double").alias("part_value"))
    )


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: distribution of customers by order count, where the join
    itself is conditional (non-'5-LOW' orders only) — a LEFT OUTER join
    with an extra ON predicate (NOT the same as a post-filter: customers
    with only low-priority orders must count as 0), then two aggregations."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderpriority") != "5-LOW").select("o_custkey", "o_orderkey")
    per_cust = (
        customer.join(o, customer.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: the supplier(s) with maximum 1996Q1 discounted revenue —
    aggregate, take the MAX of the aggregate (a one-row broadcast), and
    join back on equality. Revenue stays DECIMAL through the MAX and the
    equality so ties are exact; the final value is emitted as DOUBLE."""
    li = read_table(spark, sf_dir, "lineitem")
    supplier = read_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_revenue()).alias("total_rev_dec"))
    )
    best = rev.agg(F.max("total_rev_dec").alias("best_rev_dec"))
    return (
        rev.join(F.broadcast(best), rev.total_rev_dec == F.col("best_rev_dec"))
        .join(F.broadcast(supplier), rev.l_suppkey == supplier.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev_dec").cast("double").alias("total_revenue"),
        )
    )


def supplier_count_by_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: how many distinct suppliers stock each (brand, type, size)
    combination, for parts outside one brand/type family, excluding
    negative-balance suppliers via NOT IN → ``left_anti`` (null-safe).
    The part dimension is broadcast; countDistinct shuffles once on the
    3-column group key."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    supplier = read_table(spark, sf_dir, "supplier")
    wanted_parts = part.filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").startswith("ECONOMY"))
        & (F.col("p_size").isin(1, 2, 3, 4, 5, 6, 7, 8))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = supplier.filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        li.join(F.broadcast(wanted_parts), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(bad_supp), "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: average yearly revenue lost to small orders — lineitems of
    Brand#2 parts with quantity below 20% of that part's average quantity.
    The correlated AVG is decorrelated into a per-part (sum, count)
    aggregate; the threshold test ``qty < 0.2 * sum/n`` is rearranged to
    the integer-exact ``5 * qty * n < sum`` (quantities are integral), so
    the selected rows are bit-identical cross-engine with no float
    division anywhere in the predicate."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    b2 = part.filter(F.col("p_brand") == "Brand#2").select("p_partkey")
    b2_li = li.join(F.broadcast(b2), li.l_partkey == F.col("p_partkey")).select(
        "l_partkey",
        F.col("l_quantity").cast("bigint").alias("qty"),
        _dec("l_extendedprice").alias("price_dec"),
    )
    stats = b2_li.groupBy(F.col("l_partkey").alias("s_partkey")).agg(
        F.sum("qty").alias("sum_qty"), F.count(F.lit(1)).alias("n_li")
    )
    small = b2_li.join(stats, b2_li.l_partkey == F.col("s_partkey")).filter(
        F.lit(5) * F.col("qty") * F.col("n_li") < F.col("sum_qty")
    )
    return small.agg(
        (F.sum("price_dec").cast("double") / F.lit(7.0)).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_small"),
    )


def disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: revenue under an OR-of-ANDs join predicate (three
    brand/size/quantity envelopes). Written as one join with the composite
    condition: Catalyst pushes the per-side conjuncts (brand/size to the
    part scan, quantity to the lineitem scan) below the join and keeps the
    disjunction as the join residual — one broadcast join, no union of
    three scans."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 5)) & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 10)) & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 15)) & qty.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), (li.l_partkey == part.p_partkey) & cond)
        .agg(
            F.sum(_revenue()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: NATION_3 suppliers who shipped more than 30 units of some
    small part during 1996 — nested EXISTS chains become a semi-join
    ladder: parts filter → per-(supplier, part) quantity aggregate →
    HAVING → distinct supplier keys → ``left_semi`` against the nation's
    suppliers. Quantities aggregate as BIGINT (integral data), so the
    HAVING cut is exact."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    small_parts = part.filter(F.col("p_size") < 10).select("p_partkey")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(small_parts), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
        .filter(F.col("qty") > 30)
        .select("l_suppkey")
        .distinct()
    )
    n3 = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .filter(F.col("n_name") == "NATION_3")
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    return n3.join(shipped, n3.s_suppkey == shipped.l_suppkey, "left_semi")


def waiting_orders_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who were the SOLE late shipper on multi-supplier
    finished orders — the EXISTS + NOT-EXISTS-on-the-same-table pattern.
    Instead of two correlated subqueries (two extra joins against
    lineitem), one per-(order, supplier) aggregate computes a late flag,
    and one per-order aggregate over THAT counts suppliers and late
    suppliers; the filter ``late ∧ n_supp > 1 ∧ n_late = 1`` reads both.
    Two shuffles total (orderkey, then suppkey) on aggregate-sized data."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    supplier = read_table(spark, sf_dir, "supplier")
    f_orders = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    per_os = (
        li.join(f_orders, li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).cast(
                    "int"
                )
            ).alias("late")
        )
    )
    per_order = per_os.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("late").alias("n_late")
    )
    sole_late = (
        per_os.join(per_order, per_os.l_orderkey == F.col("po_orderkey"))
        .filter((F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    # emit the KEY alongside the display name: grouping by s_name alone
    # silently merges distinct suppliers if the name↔key functional
    # dependency ever breaks (the sf1 synthetic corpus did exactly that
    # and caught the old name-grouped oracle off by 10x)
    return sole_late.join(
        F.broadcast(supplier), sole_late.l_suppkey == supplier.s_suppkey
    ).select("s_suppkey", "s_name", "numwait")


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bilateral trade volume — discounted revenue shipped between
    two nations (supplier side vs. customer side, both directions), per ship
    year. The five-way join is ordered so the two big facts meet last:
    nation-filtered supplier keys broadcast into lineitem (cuts ~24/25 of
    the fact early), nation-filtered customers shuffle-join orders on
    custkey (orders-sized), and only then does the reduced lineitem join
    the reduced orders on orderkey. Year extraction happens before the
    final aggregate so the shuffle carries 3 small key columns."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")

    pair = ("NATION_1", "NATION_2")
    supp_n = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .filter(F.col("n_name").isin(*pair))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_n = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .filter(F.col("n_name").isin(*pair))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = orders.join(cust_n, orders.o_custkey == cust_n.c_custkey).select(
        "o_orderkey", "cust_nation"
    )
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey)
        .select(
            "l_orderkey",
            "supp_nation",
            F.year("l_shipdate").alias("l_year"),
            _revenue().alias("rev_dec"),
        )
    )
    return (
        shipped.join(o, shipped.l_orderkey == o.o_orderkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("rev_dec").cast("double").alias("revenue"))
    )


def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: NATION_1's market share of PROMO-part revenue sold to
    AMERICA-region customers, per order year — the CASE-inside-aggregate
    ratio pattern. Numerator and denominator are computed in ONE aggregate
    pass (``sum(when(...))`` / ``sum``), both in exact DECIMAL; the single
    IEEE division per output row is cross-engine deterministic. Part and
    supplier-nation dims broadcast; customer⋈orders shuffles on custkey,
    the combined fact joins on orderkey — same two-shuffle skeleton as Q7."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    part = read_table(spark, sf_dir, "part")

    promo = part.filter(F.col("p_type").startswith("PROMO")).select("p_partkey")
    supp_n = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    america_cust = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "AMERICA")
        .select("c_custkey")
    )
    o = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(america_cust, orders.o_custkey == F.col("c_custkey"), "left_semi")
        .select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    )
    fact = (
        li.join(F.broadcast(promo), li.l_partkey == F.col("p_partkey"), "left_semi")
        .join(F.broadcast(supp_n), li.l_suppkey == F.col("s_suppkey"))
        .select("l_orderkey", "supp_nation", _revenue().alias("rev_dec"))
    )
    return (
        fact.join(o, fact.l_orderkey == o.o_orderkey)
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_1", F.col("rev_dec"))).cast(
                    "double"
                )
                / F.sum("rev_dec").cast("double")
            ).alias("mkt_share")
        )
    )


def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit by supplier nation and order year for one part
    family. The dataset has no partsupp table, so supply cost is the
    deterministic analog ``0.5 * p_retailprice * l_quantity`` (documented,
    exact in DECIMAL — quantities and prices are scale≤2, so the scale-4
    product and the 0.5 multiple are exact; both engines compute identical
    decimals). Shape preserved from Q9: fact ⋈ broadcast(part ∩ family)
    ⋈ broadcast(supplier⋈nation), then the orderkey shuffle join against
    orders for the year, then one aggregate."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    part = read_table(spark, sf_dir, "part")

    fam = part.filter(F.col("p_type").startswith("STANDARD")).select(
        "p_partkey", _dec("p_retailprice").alias("retail_dec")
    )
    supp_n = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cost = (
        (_dec("l_quantity") * F.col("retail_dec")).cast(_REV)
        * F.lit("0.5").cast("decimal(2,1)")
    ).cast(_REV)
    fact = (
        li.join(F.broadcast(fam), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp_n), li.l_suppkey == F.col("s_suppkey"))
        .select(
            "l_orderkey",
            "supp_nation",
            (_revenue() - cost).cast(_REV).alias("profit_dec"),
        )
    )
    o = orders.select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    return (
        fact.join(o, fact.l_orderkey == o.o_orderkey)
        .groupBy("supp_nation", "o_year")
        .agg(F.sum("profit_dec").cast("double").alias("sum_profit"))
    )


def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: customers who returned the most revenue in 1996Q4 —
    aggregate-then-top-N. The top-20 cut is made deterministic and
    scale-safe without a single-partition global window: take the DISTINCT
    exact-decimal revenue values (at most one per customer), TakeOrdered
    the top 20 (per-partition top-20 then driver merge — never a full
    sort), broadcast the minimum back as a threshold, and keep customers
    at-or-above it. Ties at the boundary are *included* (rank-with-ties),
    so the result set is bit-stable across engines and partitionings."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")

    q4 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        li.filter(F.col("l_returnflag") == "R")
        .join(q4, li.l_orderkey == q4.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(_revenue()).alias("rev_dec"))
    )
    top_vals = (
        per_cust.select("rev_dec")
        .distinct()
        .orderBy(F.col("rev_dec").desc())
        .limit(20)
        .agg(F.min("rev_dec").alias("cut_dec"))
    )
    return (
        per_cust.crossJoin(F.broadcast(top_vals))
        .filter(F.col("rev_dec") >= F.col("cut_dec"))
        .join(F.broadcast(customer), per_cust.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            "c_acctbal",
            F.col("rev_dec").cast("double").alias("revenue"),
        )
    )


def shipmode_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: for slow shipments (shipped >60 days after the order was
    placed, ship year 1996), count critical- vs. non-critical-priority
    orders per line status (the dataset's stand-in for ship mode). The
    priority CASE collapses inside the aggregate — one orderkey shuffle
    join, one 1-column-key aggregate, everything else codegen."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    o = orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
    slow = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).join(o, (li.l_orderkey == o.o_orderkey)
           & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")))
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("bigint")
    return slow.groupBy("l_linestatus").agg(
        F.sum(crit).alias("high_line_count"),
        F.sum(F.lit(1) - crit).alias("low_line_count"),
    )


def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: per-"country code" (last digit of the customer name —
    the analog of Q22's phone prefix) stats over customers with
    above-average positive balances and no orders since 1999 (idle). The
    scalar AVG
    subquery is a one-row broadcast compared as ``bal > sum_dec/n`` (exact
    decimal sum, one IEEE division — cross-engine deterministic); NOT
    EXISTS is a ``left_anti`` join against order customer keys."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    coded = customer.filter(
        F.substring(F.col("c_name"), -1, 1).isin("1", "3", "5", "7")
    ).select(
        "c_custkey",
        F.substring(F.col("c_name"), -1, 1).alias("code"),
        "c_acctbal",
    )
    avg_row = coded.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(_dec("c_acctbal")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_bal")
    )
    o_keys = orders.filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select(F.col("o_custkey").alias("c_custkey"))
    return (
        coded.crossJoin(F.broadcast(avg_row))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o_keys, "c_custkey", "left_anti")
        .groupBy("code")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )
