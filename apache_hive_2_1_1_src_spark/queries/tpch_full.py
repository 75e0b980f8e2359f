"""Remaining TPC-H query shapes (Q5-Q22) adapted to the driver schema.

Together with queries/relational.py (Q1/Q3), queries/tpch_like.py
(Q4/Q12/Q14/Q18) and q100 (Q2), this completes the 22 canonical TPC-H
shapes — the workload mix Hive's CalcitePlanner was tuned for
(ql/src/java/org/apache/hadoop/hive/ql/parse/CalcitePlanner.java:1) and the
canonical stress set for a 100 TB warehouse.  The driver schema has no
partsupp / commitdate / receiptdate / phone columns, so Q9/Q11/Q20/Q21/Q22
keep the *plan shape* (double-correlated NOT EXISTS, scalar-subquery
thresholds, group-on-substring) over the columns that exist.

Scale notes: every dimension join (region/nation/part/supplier/customer)
is broadcast; fact-fact joins shuffle on the join key and aggregate
partially map-side.  No query materializes an unbounded intermediate —
top-k via ORDER BY ... LIMIT, thresholds via scalar subqueries computed in
one extra reduction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_2_1_1_src_spark.queries._util import t


def _rev():
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def q116_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue by nation where customer and supplier share the
    nation, within one region and one year.  Six-table join: the three
    dims broadcast, the two facts shuffle on orderkey."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def q117_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate — the whole query is one
    parquet scan with every predicate pushed down and a single global agg."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "forecast_revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q118_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: revenue between two trading nations per direction and
    year — join-graph with a symmetric OR predicate on the nation pair."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q119_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of regional revenue for one part type
    per year — conditional-sum ratio over a broadcast-dim join graph."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n_cust = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n_supp = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = _rev()
    target = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(F.sum(target) / F.sum(vol), 6).alias("mkt_share"),
            F.round(F.sum(vol), 2).alias("total_volume"),
        )
        .orderBy("o_year")
    )


def q120_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year.  The driver
    schema has no partsupp.ps_supplycost, so cost is modeled as
    p_retailprice * quantity / 10 — same plan: part-filtered fact join,
    group on (nation, year)."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    supp = t(spark, sf_dir, "supplier")
    part = t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    nation = t(spark, sf_dir, "nation")
    profit = _rev() - F.col("p_retailprice") * F.col("l_quantity") / F.lit(10.0)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q121_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top customers by lost revenue on returned items in a
    quarter — fact-fact shuffle join + broadcast dims + top-k."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q122_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value exceeds a fraction of the
    global total — per-group agg HAVING a scalar-subquery threshold
    (no partsupp, so value = sum of extendedprice per part)."""
    for name in ("lineitem", "part"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"tf_{name}")
    return spark.sql(
        """
        SELECT l_partkey, ROUND(SUM(l_extendedprice), 2) AS part_value
        FROM tf_lineitem
        GROUP BY l_partkey
        HAVING SUM(l_extendedprice) >
               (SELECT SUM(l_extendedprice) * 0.0005 FROM tf_lineitem)
        ORDER BY part_value DESC, l_partkey
        LIMIT 100
        """
    )


def q123_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count, including
    zero-order customers — left outer join then double aggregation."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        ~F.col("o_orderpriority").startswith("5")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q124_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue — the
    revenue "view" is computed once; the max is a scalar subquery over it."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_rev()), 2).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q125_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size) for
    parts outside an excluded brand, skipping suppliers flagged by a
    NOT IN subquery (complaint proxy: negative account balance)."""
    for name in ("lineitem", "part", "supplier"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"tf_{name}")
    return spark.sql(
        """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM tf_lineitem JOIN tf_part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
          AND l_suppkey NOT IN
              (SELECT s_suppkey FROM tf_supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        LIMIT 100
        """
    )


def q126_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from line items below 50% of their part's
    average quantity — correlated scalar average computed as one extra
    aggregation and joined back (no per-row re-scan)."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg_qty")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q127_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive brand/size/quantity predicate bands over a
    part join — the OR-of-ANDs Hive pushed through its join residual
    (CommonJoinOperator residual filters)."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    band1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 10))
        & (F.col("l_quantity").between(1, 15))
    )
    band2 = (
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size").between(1, 20))
        & (F.col("l_quantity").between(10, 25))
    )
    band3 = (
        (F.col("p_brand") == "Brand#3")
        & (F.col("p_size").between(1, 30))
        & (F.col("l_quantity").between(20, 35))
    )
    return j.filter(band1 | band2 | band3).agg(
        F.round(F.sum(_rev()), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q128_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding significant stock of promo-named
    parts — nested IN subqueries (part filter feeding a supplier filter)
    with a correlated half-stock threshold."""
    for name in ("lineitem", "part", "supplier", "nation"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"tf_{name}")
    return spark.sql(
        """
        SELECT s_name, s_suppkey
        FROM tf_supplier JOIN tf_nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
          AND s_suppkey IN (
            SELECT l_suppkey FROM tf_lineitem
            WHERE l_partkey IN
                  (SELECT p_partkey FROM tf_part WHERE p_name LIKE '%bolt%')
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_suppkey
            HAVING SUM(l_quantity) > 30
          )
        ORDER BY s_name, s_suppkey
        """
    )


def q129_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the *only* late shipper on a
    multi-supplier order — EXISTS (another supplier shipped) AND NOT
    EXISTS (another supplier was late).  No receipt/commit dates in the
    driver schema, so "late" = shipped > 90 days after order date."""
    for name in ("lineitem", "orders", "supplier", "nation"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"tf_{name}")
    # Single-pass decorrelation: the EXISTS ("another supplier shipped")
    # and NOT EXISTS ("no other supplier was late") both reduce to
    # per-order supplier counts, computed as WINDOW counts over the
    # (orderkey, suppkey) aggregate — no self-join (the correlated form
    # the oracle runs needs three fact passes).  "No OTHER late
    # supplier" ⇔ the order has exactly one late supplier; numwait counts
    # that supplier's late lines, matching the correlated form's join
    # multiplicity.
    #
    # Round 13 (optimization guide §2.4 "share one exchange"): the fact
    # rows are REPARTITION(l_orderkey)-ed once BELOW the aggregation.
    # hashpartitioning(l_orderkey) satisfies both the GROUP BY
    # (l_orderkey, l_suppkey) clustering (subset rule) and the window's
    # PARTITION BY l_orderkey, so the previous plan's two fact-side
    # exchanges (agg shuffle on (ok, sk) + window re-shuffle on ok)
    # collapse into one.  (ok, sk) is nearly unique per lineitem row —
    # TPC-H orders average ~4 lines with distinct suppliers — so the
    # map-side partial combine the old shape traded on collapsed almost
    # nothing; one raw-row shuffle moves fewer bytes than two collapsed
    # ones.  The hint carries no partition count, so AQE still sizes the
    # shuffle (coalesce/skew-split) at any scale.
    return spark.sql(
        """
        WITH joined AS (
          SELECT /*+ REPARTITION(l_orderkey) */ l_orderkey, l_suppkey,
                 CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                      THEN 1 END AS is_late
          FROM tf_lineitem JOIN tf_orders ON o_orderkey = l_orderkey
          WHERE o_orderstatus = 'F'
        ), per_ls AS (
          SELECT l_orderkey, l_suppkey, COUNT(is_late) AS n_late_lines
          FROM joined
          GROUP BY l_orderkey, l_suppkey
        ), win AS (
          SELECT l_suppkey, n_late_lines,
                 COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
                 COUNT(CASE WHEN n_late_lines > 0 THEN 1 END)
                   OVER (PARTITION BY l_orderkey) AS n_late_supp
          FROM per_ls
        )
        SELECT s_name, CAST(SUM(n_late_lines) AS BIGINT) AS numwait
        FROM win
        JOIN tf_supplier ON l_suppkey = s_suppkey
        JOIN tf_nation ON s_nationkey = n_nationkey
        WHERE n_late_lines > 0 AND n_supp > 1 AND n_late_supp = 1
          AND n_name = 'NATION_3'
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
        """
    )


def q130_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers with no orders, grouped by a
    name-prefix "country code" — NOT EXISTS anti-join plus a scalar
    average-balance subquery (no phone column; substring of c_name)."""
    for name in ("customer", "orders"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"tf_{name}")
    return spark.sql(
        """
        SELECT SUBSTRING(c_name, 16, 2) AS cntrycode,
               COUNT(*) AS numcust,
               ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM tf_customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM tf_customer
                           WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM tf_orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY 1 ORDER BY 1
        """
    )


QUERIES = {
    "q116_local_supplier_volume": q116_local_supplier_volume,
    "q117_forecast_revenue": q117_forecast_revenue,
    "q118_volume_shipping": q118_volume_shipping,
    "q119_market_share": q119_market_share,
    "q120_product_profit": q120_product_profit,
    "q121_returned_items": q121_returned_items,
    "q122_important_parts": q122_important_parts,
    "q123_customer_distribution": q123_customer_distribution,
    "q124_top_supplier": q124_top_supplier,
    "q125_supplier_part_counts": q125_supplier_part_counts,
    "q126_small_quantity_revenue": q126_small_quantity_revenue,
    "q127_discounted_revenue": q127_discounted_revenue,
    "q128_part_promotion": q128_part_promotion,
    "q129_waiting_orders": q129_waiting_orders,
    "q130_global_sales_opportunity": q130_global_sales_opportunity,
}

ORACLES = {
    "q116_local_supplier_volume": """
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
                     AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
    "q117_forecast_revenue": """
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS forecast_revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    "q118_volume_shipping": """
        SELECT supp_nation, cust_nation, l_year,
               ROUND(SUM(volume), 2) AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 EXTRACT(year FROM l_shipdate) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
            AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
              OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        )
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "q119_market_share": """
        SELECT EXTRACT(year FROM o_orderdate) AS o_year,
               ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                              ELSE 0.0 END) / SUM(volume), 6) AS mkt_share,
               ROUND(SUM(volume), 2) AS total_volume
        FROM (
          SELECT o_orderdate, n2.n_name AS supp_nation,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'ASIA' AND p_type = 'PROMO'
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1998-01-01'
        )
        GROUP BY o_year ORDER BY o_year
    """,
    "q120_product_profit": """
        SELECT n_name AS nation,
               EXTRACT(year FROM o_orderdate) AS o_year,
               ROUND(SUM(l_extendedprice * (1 - l_discount)
                         - p_retailprice * l_quantity / 10.0), 2) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2 ORDER BY 1, 2 DESC
    """,
    "q121_returned_items": """
        SELECT c_custkey, c_name, c_acctbal, n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    "q122_important_parts": """
        SELECT l_partkey, ROUND(SUM(l_extendedprice), 2) AS part_value
        FROM lineitem
        GROUP BY l_partkey
        HAVING SUM(l_extendedprice) >
               (SELECT SUM(l_extendedprice) * 0.0005 FROM lineitem)
        ORDER BY part_value DESC, l_partkey
        LIMIT 100
    """,
    "q123_customer_distribution": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '5%'
          GROUP BY c_custkey
        )
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
    "q124_top_supplier": """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                   AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    "q125_supplier_part_counts": """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
          AND l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        LIMIT 100
    """,
    "q126_small_quantity_revenue": """
        SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
               COUNT(*) AS n_lines
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#2'
          AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                            FROM lineitem l2
                            WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    "q127_discounted_revenue": """
        SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 1 AND 15)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
               AND l_quantity BETWEEN 10 AND 25)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
               AND l_quantity BETWEEN 20 AND 35)
    """,
    "q128_part_promotion": """
        SELECT s_name, s_suppkey
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
          AND s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN
                  (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_suppkey
            HAVING SUM(l_quantity) > 30
          )
        ORDER BY s_name, s_suppkey
    """,
    "q129_waiting_orders": """
        SELECT s_name, COUNT(*) AS numwait
        FROM lineitem l1
        JOIN orders ON o_orderkey = l1.l_orderkey
        JOIN supplier ON l1.l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F'
          AND n_name = 'NATION_3'
          AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o3.o_orderdate
                                               + INTERVAL 90 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
    "q130_global_sales_opportunity": """
        SELECT SUBSTRING(c_name, 16, 2) AS cntrycode,
               COUNT(*) AS numcust,
               ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                           WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY 1 ORDER BY 1
    """,
}
