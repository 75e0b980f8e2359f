"""Relational core: scan / filter / project / join / union / limit / sample.

Reference operators re-expressed (SURVEY.md §2.1):
TableScanOperator.java, FilterOperator.java:166, SelectOperator.java:205,
JoinOperator.java + CommonJoinOperator.java (join types
ql/.../plan/JoinDesc.java:42-47), MapJoinOperator.java:769 (broadcast),
UnionOperator.java:193, LimitOperator.java:93, TopNHash.java:452,
ReduceSinkOperator.java:640 (DISTRIBUTE/SORT BY), parse/TableSample.java.

Scale notes (100 TB): all joins against dimension tables broadcast
(`F.broadcast`) — nation/region/supplier must never shuffle a fact table;
fact-fact joins shuffle on their keys with AQE skew splitting enabled.
Filters are plain column predicates so they push into the parquet scan
(PushedFilters), and every query projects only the columns it needs so the
scan's ReadSchema stays narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_2_1_1_src_spark.queries._util import t

# --- q01: flagship scan→filter→agg→sort (TPC-H Q1 shape) --------------------
# Hive chain: TableScan → Filter → GroupBy(HASH,partial) → ReduceSink →
# GroupBy(MERGEPARTIAL) → Select → FileSink (GroupByOperator.java:1159 modes
# at plan/GroupByDesc.java:54-56).  In Spark the partial/final split is
# Catalyst's HashAggregate pair around one Exchange.


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FilterOperator + SelectOperator: pushed-down conjunctive predicate,
    expression projection (revenue)."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("disc_revenue"),
    )


def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + top-N (TopNHash.java pushdown shape →
    TakeOrderedAndProject in Spark)."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def q04_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("c_mktsegment")
    )


def q05_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER: preserve all customers; count only matching big orders
    (CommonJoinOperator null-padding, JoinDesc.java:43)."""
    cust = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000.0)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_big_orders"))
    )


def q06_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000.0)
    cust = t(spark, sf_dir, "customer")
    return (
        big.join(cust, big.o_custkey == cust.c_custkey, "right")
        .groupBy("c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_big_orders"))
        .orderBy("c_mktsegment")
    )


def q07_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER with deliberately non-overlapping key ranges so both
    null-padded sides appear (JoinDesc.java:45 FULLOUTER)."""
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") < 20)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") >= 5)
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.c_nationkey == s.s_nationkey, "full").select(
        F.coalesce(c.c_nationkey, s.s_nationkey).alias("nationkey"),
        F.col("n_cust"),
        F.col("n_supp"),
    )


def q08_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (JoinDesc.java:47 LEFTSEMI; Hive rewrites IN/EXISTS to this
    — parse/QBSubQuery.java:42-57)."""
    cust = t(spark, sf_dir, "customer")
    fo = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        cust.join(fo, cust.c_custkey == fo.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


def q09_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI — Hive's NOT EXISTS rewrite (null-aware variant handled by
    Catalyst's RewritePredicateSubquery)."""
    cust = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_anti")
        .select("c_custkey", "c_acctbal")
    )


def q10_broadcast_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with every dimension broadcast — MapJoinOperator.java:769.
    lineitem (fact) never shuffles for these joins; plan must show
    BroadcastHashJoin all the way down."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region")
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("r_name")
    )


def q11_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL keeps duplicates (UnionOperator.java:193)."""
    orders = t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_orderkey")
    b = orders.filter(F.col("o_totalprice") > 400000.0).select("o_orderkey")
    u = a.union(b)
    return u.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_orderkey").alias("n_keys"),
    )


def q12_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT = union all + dedup (Hive compiles it to
    UNION + GroupBy; grammar HiveParser.g:2294-2298)."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    b = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    return a.union(b).distinct()


def q145_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT [DISTINCT] — set intersection (added to Hive in 2.2 via
    HIVE-12764 as a rewrite to group-by + filter; Spark plans a left-semi
    aggregate natively).  Customers that placed an urgent order AND a
    high-value order."""
    orders = t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    b = orders.filter(F.col("o_totalprice") > 200000.0).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersect(b).orderBy("custkey")


def q146_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT [DISTINCT] / MINUS — set difference (HIVE-12764 family;
    Spark plans a left-anti aggregate).  Customers with orders but none
    urgent."""
    orders = t(spark, sf_dir, "orders")
    a = orders.select(F.col("o_custkey").alias("custkey"))
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.subtract(b).orderBy("custkey")


def q13_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


def q14_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT → TakeOrderedAndProject (the Spark analog of
    Hive's TopNHash pushdown, LimitPushdownOptimizer.java:91)."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


def q15_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    reg = t(spark, sf_dir, "region").select("r_name")
    st = t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return reg.crossJoin(st)


def q16_distribute_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTE BY + SORT BY (ReduceSinkOperator partitioning,
    HiveParser.g:95-100): explicit repartition + per-partition sort.  The
    result *set* equals the plain projection — the oracle checks exactly
    that (order-insensitive)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity")
        .repartition(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey", "l_linenumber")
    )


def q17_tablesample_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE(BUCKET 3 OUT OF 7 ON l_orderkey) (parse/TableSample.java:157)
    → deterministic modulo filter; for integer keys Hive's bucket hash is
    the value itself (ObjectInspectorUtils.hashCode)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.pmod(F.col("l_orderkey"), F.lit(7)) == 2)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


def q18_values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES relation joined to a table (Hive: INSERT ... VALUES /
    virtual table; here a literal DataFrame broadcast-joined)."""
    seg = spark.createDataFrame(
        [("BUILDING", 1), ("MACHINERY", 2), ("AUTOMOBILE", 3)],
        "seg string, seg_rank int",
    )
    cust = t(spark, sf_dir, "customer")
    return (
        cust.join(F.broadcast(seg), cust.c_mktsegment == seg.seg, "inner")
        .groupBy("seg", "seg_rank")
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .orderBy("seg_rank")
    )


def q19_limit_rows_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE(100 ROWS): row-count-bounded sample — rows are
    engine-chosen, so the invariant checked is the count."""
    li = t(spark, sf_dir, "lineitem")
    return li.limit(100).agg(F.count(F.lit(1)).alias("n_rows"))


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_filter_project": q02_filter_project,
    "q03_shipping_priority": q03_shipping_priority,
    "q04_join_inner": q04_join_inner,
    "q05_join_left": q05_join_left,
    "q06_join_right": q06_join_right,
    "q07_join_full": q07_join_full,
    "q08_join_semi": q08_join_semi,
    "q09_join_anti": q09_join_anti,
    "q10_broadcast_region_revenue": q10_broadcast_region_revenue,
    "q11_union_all": q11_union_all,
    "q12_union_distinct": q12_union_distinct,
    "q13_distinct": q13_distinct,
    "q14_order_limit": q14_order_limit,
    "q15_cross_join": q15_cross_join,
    "q16_distribute_sort": q16_distribute_sort,
    "q17_tablesample_bucket": q17_tablesample_bucket,
    "q18_values_inline": q18_values_inline,
    "q19_limit_rows_sample": q19_limit_rows_sample,
    "q145_intersect": q145_intersect,
    "q146_except": q146_except,
}

ORACLES = {
    "q145_intersect": """
        SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000.0
        ORDER BY custkey
    """,
    "q146_except": """
        SELECT o_custkey AS custkey FROM orders
        EXCEPT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        ORDER BY custkey
    """,
    "q01_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_extendedprice), 4) AS avg_price,
               ROUND(AVG(l_discount), 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q02_filter_project": """
        SELECT l_orderkey, l_linenumber,
               ROUND(l_extendedprice * l_discount, 4) AS disc_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "q03_shipping_priority": """
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND l_shipdate > TIMESTAMP '1997-01-01'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    "q04_join_inner": """
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "q05_join_left": """
        SELECT c_custkey, COUNT(o_orderkey) AS n_big_orders
        FROM customer LEFT JOIN
             (SELECT * FROM orders WHERE o_totalprice > 450000) o
             ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
    "q06_join_right": """
        SELECT c_mktsegment, COUNT(o_orderkey) AS n_big_orders
        FROM (SELECT * FROM orders WHERE o_totalprice > 450000) o
             RIGHT JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "q07_join_full": """
        SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey, n_cust, n_supp
        FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer
              WHERE c_nationkey < 20 GROUP BY c_nationkey) c
        FULL OUTER JOIN
             (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier
              WHERE s_nationkey >= 5 GROUP BY s_nationkey) s
        ON c.c_nationkey = s.s_nationkey
    """,
    "q08_join_semi": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
    "q09_join_anti": """
        SELECT c_custkey, c_acctbal FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
    "q10_broadcast_region_revenue": """
        SELECT r_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY r_name ORDER BY r_name
    """,
    "q11_union_all": """
        SELECT COUNT(*) AS n_rows, COUNT(DISTINCT o_orderkey) AS n_keys
        FROM (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'
              UNION ALL
              SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
    """,
    "q12_union_distinct": """
        SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    "q13_distinct": """
        SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    "q14_order_limit": """
        SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    "q15_cross_join": """
        SELECT r_name, o_orderstatus
        FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
    """,
    "q16_distribute_sort": """
        SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-06-01'
          AND l_shipdate < TIMESTAMP '1995-07-01'
    """,
    "q17_tablesample_bucket": """
        SELECT COUNT(*) AS n_rows, ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem WHERE l_orderkey % 7 = 2
    """,
    "q18_values_inline": """
        SELECT seg, seg_rank, COUNT(*) AS n_cust
        FROM customer
        JOIN (VALUES ('BUILDING', 1), ('MACHINERY', 2), ('AUTOMOBILE', 3)) AS v(seg, seg_rank)
          ON c_mktsegment = seg
        GROUP BY seg, seg_rank ORDER BY seg_rank
    """,
    "q19_limit_rows_sample": """
        SELECT LEAST(CAST(100 AS BIGINT), COUNT(*)) AS n_rows FROM lineitem
    """,
}
