"""Window / PTF surface.

Reference (SURVEY.md §2.4): PTFOperator.java:428 +
udf/ptf/WindowingTableFunction.java:1744 buffer each partition and evaluate
ranking/analytic UDAFs (FunctionRegistry.java:459-468: row_number, rank,
dense_rank, percent_rank, cume_dist, ntile, first_value, last_value,
lead, lag).  Frame spec parse/WindowingSpec.java:217-312; the Hive default
frame with ORDER BY is RANGE UNBOUNDED PRECEDING → CURRENT ROW
(WindowingSpec.java:304-312) — identical to Spark's default, which q45
verifies explicitly through tied order keys.

Scale notes: Spark WindowExec shuffles once on partitionBy keys and sorts
within partitions — same cost model as Hive's PTF ReduceSink.  Partition
keys here are low-skew (custkey, returnflag); for skewed keys at 100 TB
the pattern is two-level windowing or AQE skew hints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apache_hive_2_1_1_src_spark.queries._util import t


def q40_row_number_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per status — the canonical PTF + filter-on-rank shape
    (Hive: PTFOperator over rank + outer Filter)."""
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_orderstatus", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 3)
    )


def q41_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank vs dense_rank over tied keys (integer-bucketed quantity forces
    ties so the two diverge)."""
    li = t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("int")
    w = Window.partitionBy("l_returnflag").orderBy(qty)
    return (
        li.select(
            "l_returnflag",
            qty.alias("qty_int"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .distinct()
    )


def q42_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag (FunctionRegistry.java:456-457) with default offset 1 and
    explicit default value."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.lag("o_totalprice", 1).over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice", 1, 0.0).over(w), 2).alias("next_price_or_zero"),
    )


def q43_running_sum_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW running sum
    (WindowingSpec ROWS frame)."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey", "o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("running_total")
    )


def q44_sliding_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding ROWS frame (2 PRECEDING → CURRENT ROW) moving average."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return orders.select(
        "o_custkey", "o_orderkey", F.round(F.avg("o_totalprice").over(w), 4).alias("moving_avg3")
    )


def q45_hive_default_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive's default frame with ORDER BY and *tied* sort keys:
    RANGE UNBOUNDED PRECEDING → CURRENT ROW (WindowingSpec.java:304-312)
    means peers (equal keys) all receive the full peer-group sum — the
    behavioral difference from a ROWS frame.  Ties via p_size."""
    part = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    w = Window.partitionBy("p_brand").orderBy("p_size")  # no explicit frame
    return part.select(
        "p_partkey",
        "p_size",
        F.round(F.sum("p_retailprice").over(w), 2).alias("cum_price_range"),
    )


def q46_range_numeric_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit numeric RANGE frame: sum of retailprice over parts within
    size-5 below (WindowingSpec RANGE BETWEEN n PRECEDING AND CURRENT ROW)."""
    part = t(spark, sf_dir, "part").filter(F.col("p_brand").isin("Brand#11", "Brand#22"))
    w = Window.partitionBy("p_brand").orderBy("p_size").rangeBetween(-5, 0)
    return part.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.round(F.sum("p_retailprice").over(w), 2).alias("sum_nearby_price"),
    )


def q47_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist over a unique ordering."""
    cust = t(spark, sf_dir, "customer")
    w = Window.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return cust.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


def q48_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over the full partition (ROWS UNBOUNDED
    PRECEDING → UNBOUNDED FOLLOWING, the Hive idiom for whole-partition
    analytics)."""
    orders = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        orders.select(
            "o_orderstatus",
            F.first("o_orderkey").over(w).alias("cheapest_order"),
            F.last("o_orderkey").over(w).alias("priciest_order"),
        )
        .distinct()
    )


def q49_window_agg_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Several window aggs sharing one (partition, order) — Hive evaluates
    them in a single PTF pass; Spark plans a single Window operator."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_extendedprice").over(wfull), 2).alias("order_total"),
        F.round(
            F.col("l_extendedprice") / F.sum("l_extendedprice").over(wfull) * 100, 4
        ).alias("pct_of_order"),
        F.count(F.lit(1)).over(wfull).alias("n_lines"),
        F.row_number().over(w).alias("line_seq"),
    )


def q138_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame with a time INTERVAL bound (WindowingSpec.java:217-312
    value-based frames): trailing-30-day spend per customer.  Peer rows
    (equal order dates) enter the frame together, which keeps the result
    deterministic under ties."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("w_orders")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               ROUND(SUM(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW),
                 2) AS trailing_30d
        FROM w_orders WHERE o_custkey <= 200
        ORDER BY o_custkey, o_orderkey
        """
    )


def q156_ignore_nulls_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS analytic variants — Hive's first_value(x, true) /
    last_value(x, true) skip-nulls flag (GenericUDAFFirstValue) and the
    LAG ... IGNORE NULLS gap-fill idiom, over a column with planted
    NULLs every third row."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("w_orders_in")
    return spark.sql(
        """
        WITH src AS (
          SELECT o_orderkey, o_custkey,
                 CASE WHEN o_orderkey % 3 = 0 THEN NULL
                      ELSE ROUND(o_totalprice, 2) END AS v
          FROM w_orders_in WHERE o_orderkey <= 5000
        )
        SELECT o_orderkey, v,
               FIRST_VALUE(v) IGNORE NULLS OVER w AS first_nn,
               LAST_VALUE(v) IGNORE NULLS OVER w AS last_nn,
               NTH_VALUE(v, 2) IGNORE NULLS OVER w AS second_nn,
               LAG(v) IGNORE NULLS OVER
                 (PARTITION BY o_custkey % 8 ORDER BY o_orderkey) AS prev_nn
        FROM src
        WINDOW w AS (PARTITION BY o_custkey % 8 ORDER BY o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY o_orderkey
        """
    )


def q226_windowing_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregates in windows (HIVE-9534;
    ql/src/test/queries/clientpositive/windowing_distinct.q —
    COUNT/SUM/AVG(DISTINCT x) OVER (PARTITION BY ...), whole-partition
    frame only).  Spark rejects distinct window aggregates, so
    HiveEngine rewrites them onto collect_set's window form (the
    per-partition distinct set, sized/folded JVM-side) — one Exchange
    on the partition keys, no Python.  Includes an expression argument
    (concat), the NULL-dropping semantics, and Hive's ORDER BY
    rejection is pinned in tests/test_script_sql.py."""
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables(sf_dir)
    return eng.sql(
        """
        SELECT o_orderkey, o_orderstatus,
               COUNT(DISTINCT o_orderpriority)
                 OVER (PARTITION BY o_orderstatus) AS d_prio,
               COUNT(DISTINCT concat(o_orderpriority, '|', o_orderstatus))
                 OVER (PARTITION BY o_orderstatus) AS d_prio_tag,
               ROUND(CAST(SUM(DISTINCT o_custkey)
                 OVER (PARTITION BY o_orderstatus) AS DOUBLE), 2) AS s_cust,
               ROUND(CAST(AVG(DISTINCT o_custkey)
                 OVER (PARTITION BY o_orderstatus) AS DOUBLE), 6) AS a_cust
        FROM orders WHERE o_orderkey <= 2000
        """
    )


QUERIES = {
    "q226_windowing_distinct": q226_windowing_distinct,
    "q138_range_interval_frame": q138_range_interval_frame,
    "q156_ignore_nulls_windows": q156_ignore_nulls_windows,
    "q40_row_number_topk": q40_row_number_topk,
    "q41_rank_dense": q41_rank_dense,
    "q42_lead_lag": q42_lead_lag,
    "q43_running_sum_rows": q43_running_sum_rows,
    "q44_sliding_rows_frame": q44_sliding_rows_frame,
    "q45_hive_default_frame": q45_hive_default_frame,
    "q46_range_numeric_frame": q46_range_numeric_frame,
    "q47_ntile_percent": q47_ntile_percent,
    "q48_first_last_value": q48_first_last_value,
    "q49_window_agg_mix": q49_window_agg_mix,
}

ORACLES = {
    "q226_windowing_distinct": """
        SELECT o_orderkey, o_orderstatus,
               COUNT(DISTINCT o_orderpriority)
                 OVER (PARTITION BY o_orderstatus) AS d_prio,
               COUNT(DISTINCT concat(o_orderpriority, '|', o_orderstatus))
                 OVER (PARTITION BY o_orderstatus) AS d_prio_tag,
               ROUND(CAST(SUM(DISTINCT o_custkey)
                 OVER (PARTITION BY o_orderstatus) AS DOUBLE), 2) AS s_cust,
               ROUND(CAST(AVG(DISTINCT o_custkey)
                 OVER (PARTITION BY o_orderstatus) AS DOUBLE), 6) AS a_cust
        FROM orders WHERE o_orderkey <= 2000
    """,
    "q156_ignore_nulls_windows": """
        WITH src AS (
          SELECT o_orderkey, o_custkey,
                 CASE WHEN o_orderkey % 3 = 0 THEN NULL
                      ELSE ROUND(o_totalprice, 2) END AS v
          FROM orders WHERE o_orderkey <= 5000
        )
        SELECT o_orderkey, v,
               first_value(v IGNORE NULLS) OVER w AS first_nn,
               last_value(v IGNORE NULLS) OVER w AS last_nn,
               nth_value(v, 2 IGNORE NULLS) OVER w AS second_nn,
               lag(v IGNORE NULLS) OVER
                 (PARTITION BY o_custkey % 8 ORDER BY o_orderkey) AS prev_nn
        FROM src
        WINDOW w AS (PARTITION BY o_custkey % 8 ORDER BY o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY o_orderkey
    """,
    "q138_range_interval_frame": """
        SELECT o_custkey, o_orderkey,
               ROUND(SUM(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW),
                 2) AS trailing_30d
        FROM orders WHERE o_custkey <= 200
        ORDER BY o_custkey, o_orderkey
    """,
    "q40_row_number_topk": """
        SELECT o_orderstatus, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
          SELECT o_orderstatus, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_orderstatus
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) WHERE rn <= 3
    """,
    "q41_rank_dense": """
        SELECT DISTINCT l_returnflag, CAST(l_quantity AS INT) AS qty_int,
               rank() OVER (PARTITION BY l_returnflag ORDER BY CAST(l_quantity AS INT)) AS rnk,
               dense_rank() OVER (PARTITION BY l_returnflag ORDER BY CAST(l_quantity AS INT)) AS drnk
        FROM lineitem
    """,
    "q42_lead_lag": """
        SELECT o_custkey, o_orderkey,
               ROUND(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
               ROUND(lead(o_totalprice, 1, 0.0) OVER w, 2) AS next_price_or_zero
        FROM orders WHERE o_custkey < 100
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "q43_running_sum_rows": """
        SELECT o_custkey, o_orderkey,
               ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        FROM orders WHERE o_custkey < 200
    """,
    "q44_sliding_rows_frame": """
        SELECT o_custkey, o_orderkey,
               ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
        FROM orders WHERE o_custkey < 100
    """,
    "q45_hive_default_frame": """
        SELECT p_partkey, p_size,
               ROUND(SUM(p_retailprice) OVER (PARTITION BY p_brand ORDER BY p_size), 2)
                 AS cum_price_range
        FROM part WHERE p_brand = 'Brand#11'
    """,
    "q46_range_numeric_frame": """
        SELECT p_partkey, p_brand, p_size,
               ROUND(SUM(p_retailprice) OVER (PARTITION BY p_brand ORDER BY p_size
                     RANGE BETWEEN 5 PRECEDING AND CURRENT ROW), 2) AS sum_nearby_price
        FROM part WHERE p_brand IN ('Brand#11', 'Brand#22')
    """,
    "q47_ntile_percent": """
        SELECT c_custkey,
               CAST(ntile(4) OVER w AS INT) AS quartile,
               ROUND(percent_rank() OVER w, 6) AS pct_rank,
               ROUND(cume_dist() OVER w, 6) AS cume
        FROM customer
        WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey)
    """,
    "q48_first_last_value": """
        SELECT DISTINCT o_orderstatus,
               first_value(o_orderkey) OVER w AS cheapest_order,
               last_value(o_orderkey) OVER w AS priciest_order
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    "q49_window_agg_mix": """
        SELECT l_orderkey, l_linenumber,
               ROUND(SUM(l_extendedprice) OVER wf, 2) AS order_total,
               ROUND(l_extendedprice / SUM(l_extendedprice) OVER wf * 100, 4) AS pct_of_order,
               COUNT(*) OVER wf AS n_lines,
               CAST(row_number() OVER wo AS INT) AS line_seq
        FROM lineitem WHERE l_orderkey < 1000
        WINDOW wf AS (PARTITION BY l_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
               wo AS (PARTITION BY l_orderkey ORDER BY l_linenumber)
    """,
}
