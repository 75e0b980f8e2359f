"""Composite TPC-H-shaped queries adapted to the driver's schema.

Single-operator queries prove semantics; these prove the *composition* —
correlated EXISTS under aggregation (Q4), conditional aggregation over a
join (Q12), ratio-of-sums with seasonal filter (Q14), having-filtered
large-volume join (Q18), and a funnel over the events stream.  Each runs
as one Catalyst plan: the shapes Hive's CalcitePlanner had dedicated rule
chains for (SURVEY.md §4.1) and the ones a 100 TB warehouse actually runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_2_1_1_src_spark.queries._util import t


def q110_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: per-priority order counts where a correlated EXISTS
    finds a late line item (shipdate > orderdate + 60 days)."""
    for name in ("orders", "lineitem"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"tq_{name}")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_late_orders
        FROM tq_orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (SELECT 1 FROM tq_lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


def q111_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional aggregation (priority classes) over a
    fact-fact join with a date-range filter."""
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(high).alias("n_high"),
            F.sum(F.lit(1) - high).alias("n_low"),
        )
        .orderBy("l_returnflag")
    )


def q112_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: ratio of conditional revenue to total revenue per
    ship-month (PROMO part share)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            F.round(F.sum(promo_rev) * 100.0 / F.sum(rev), 4).alias("promo_pct"),
            F.round(F.sum(rev), 2).alias("total_rev"),
        )
        .orderBy("ship_month")
    )


def q113_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold
    (HAVING over a fact agg) joined back to customer."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 210.0)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "total_qty")
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(50)
    )


def q114_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event funnel over the stream table: users whose first view precedes
    their first click precedes their first purchase — min-timestamp pivot
    + ordering predicate, all in one hash aggregate."""
    from apache_hive_2_1_1_src_spark.io import load_events

    ev = load_events(spark, sf_dir)
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    funnel = firsts.filter(
        F.col("t_view").isNotNull()
        & F.col("t_click").isNotNull()
        & F.col("t_buy").isNotNull()
        & (F.col("t_view") < F.col("t_click"))
        & (F.col("t_click") < F.col("t_buy"))
    )
    return funnel.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.countDistinct("user_id").alias("n_users"),
    )


QUERIES = {
    "q110_priority_exists": q110_priority_exists,
    "q111_conditional_agg": q111_conditional_agg,
    "q112_promo_share": q112_promo_share,
    "q113_large_volume": q113_large_volume,
    "q114_event_funnel": q114_event_funnel,
}

ORACLES = {
    "q110_priority_exists": """
        SELECT o_orderpriority, COUNT(*) AS n_late_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "q111_conditional_agg": """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS n_low
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q112_promo_share": """
        SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
               ROUND(SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END) * 100.0
                     / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_rev
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-07-01'
        GROUP BY 1 ORDER BY 1
    """,
    "q113_large_volume": """
        SELECT c_custkey, c_name, o_orderkey, total_qty
        FROM (SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
              FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 210) big
        JOIN orders ON big.l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY total_qty DESC, o_orderkey LIMIT 50
    """,
    "q114_event_funnel": """
        SELECT COUNT(*) AS n_converted, COUNT(DISTINCT user_id) AS n_users
        FROM (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                 MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                 MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
          FROM events GROUP BY user_id
        )
        WHERE t_view IS NOT NULL AND t_click IS NOT NULL AND t_buy IS NOT NULL
          AND t_view < t_click AND t_click < t_buy
    """,
}
