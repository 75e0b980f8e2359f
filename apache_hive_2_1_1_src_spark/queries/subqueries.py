"""Subquery predicates, CTEs, multi-insert, UPDATE/DELETE rewrites.

Reference: Hive rewrites IN/NOT IN/EXISTS/NOT EXISTS in WHERE/HAVING to
semi/anti joins (parse/QBSubQuery.java:42-57, SubQueryUtils.java) —
Catalyst's RewritePredicateSubquery performs the identical rewrite,
including the null-aware anti join for NOT IN.  CTEs: HiveParser.g:362.
Multi-insert ``FROM t INSERT ... INSERT ...`` (SemanticAnalyzer multi-dest
genPlan) compiles here to one cached scan fanned out to N aggregates.
ACID UPDATE/DELETE (HiveParser.g:2554,2577; OrcRecordUpdater.java) become
copy-on-write overwrite rewrites — Spark cannot write Hive ACID deltas
(SURVEY.md §1.4), and COW over immutable parquet is the Spark-native
equivalent (same model Delta/Iceberg use).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_2_1_1_src_spark.queries._util import t


def q75_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) → left semi join (QBSubQuery.java:42)."""
    for name in ("orders", "customer"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"sq_{name}")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM sq_orders
        WHERE o_custkey IN (SELECT c_custkey FROM sq_customer WHERE c_acctbal > 9000)
        """
    )


def q76_not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN (subquery) → null-aware anti join."""
    for name in ("orders", "customer"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"sq_{name}")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment FROM sq_customer
        WHERE c_custkey NOT IN
              (SELECT o_custkey FROM sq_orders WHERE o_totalprice > 350000)
        """
    )


def q77_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS in WHERE (SubQueryUtils rewrite)."""
    for name in ("lineitem", "part"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"sq_{name}")
    return spark.sql(
        """
        SELECT p_partkey, p_brand FROM sq_part p
        WHERE EXISTS (SELECT 1 FROM sq_lineitem l
                      WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 49)
        """
    )


def q78_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in WHERE + correlated scalar in SELECT."""
    for name in ("orders", "customer"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"sq_{name}")
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
        FROM sq_orders
        WHERE o_totalprice > 1.8 * (SELECT AVG(o_totalprice) FROM sq_orders)
        """
    )


def q79_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH — two chained CTEs (HiveParser.g:362,2324)."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("sq_lineitem")
    t(spark, sf_dir, "supplier").createOrReplaceTempView("sq_supplier")
    return spark.sql(
        """
        WITH supp_rev AS (
            SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS rev
            FROM sq_lineitem GROUP BY l_suppkey
        ),
        ranked AS (
            SELECT l_suppkey, rev, rank() OVER (ORDER BY rev DESC, l_suppkey) AS rnk
            FROM supp_rev
        )
        SELECT s_suppkey, s_name, ROUND(rev, 2) AS rev, CAST(rnk AS INT) AS rnk
        FROM ranked JOIN sq_supplier ON l_suppkey = s_suppkey
        WHERE rnk <= 10
        """
    )


def q80_multi_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-insert: FROM (one scan) INSERT INTO a ... INSERT INTO b ...
    (SemanticAnalyzer multi-destination plan).  Spark-first: cache the
    shared scan once, fan out N writes; here the two branches are unioned
    with a destination tag so the oracle can check both outputs."""
    orders = t(spark, sf_dir, "orders").cache()
    try:
        by_status = (
            orders.groupBy(F.col("o_orderstatus").alias("key"))
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
            .withColumn("dest", F.lit("by_status"))
        )
        by_prio = (
            orders.groupBy(F.col("o_orderpriority").alias("key"))
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
            .withColumn("dest", F.lit("by_priority"))
        )
        out = by_status.unionByName(by_prio).select("dest", "key", "n", "total")
        # materialize both "inserts" through the shared cached scan, then
        # release it — a leaked cache would silently replace every later
        # orders scan in this session with an InMemoryRelation (no filter
        # pushdown), poisoning unrelated plans
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        orders.unpersist()


def q81_update_cow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE ... SET ... WHERE as copy-on-write rewrite (HiveParser.g:2554;
    ACID OrcRecordUpdater → here: rewrite matching rows, overwrite table
    copy).  Writes a temp copy, applies the rewrite, reads back —
    round-trips the FileSink path; oracle checks final table contents."""
    out = os.path.join(tempfile.gettempdir(), f"hive_spark_cow_update_{os.getpid()}")
    orders = t(spark, sf_dir, "orders")
    # no per-row rounding: round(x*1.1, 2) sits on .005 representation
    # boundaries where engines' float ulps disagree — round only aggregates
    updated = orders.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderstatus") == "O", F.col("o_totalprice") * 1.10
        ).otherwise(F.col("o_totalprice")),
    )
    updated.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total_after_update"),
    ).orderBy("o_orderstatus")


def q82_delete_cow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE ... WHERE as copy-on-write anti-filter rewrite
    (HiveParser.g:2577)."""
    out = os.path.join(tempfile.gettempdir(), f"hive_spark_cow_delete_{os.getpid()}")
    li = t(spark, sf_dir, "lineitem")
    kept = li.filter(~((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 40)))
    kept.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_remaining"),
        F.round(F.sum("l_quantity"), 2).alias("qty_remaining"),
    ).orderBy("l_returnflag")


def q157_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (beyond Hive 2.1 parity; Spark 4 recursive CTE):
    per-order halving amortization schedule until the balance drops
    below 1000_00 cents.  Integer-cents arithmetic keeps every step
    bit-identical across engines (no float rounding in the recursion).
    Iteration depth is data-driven (~log2 of the order total)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("rc_orders")
    return spark.sql(
        """
        WITH RECURSIVE pay AS (
          SELECT o_orderkey, 0 AS step,
                 CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS balance_cents
          FROM rc_orders WHERE o_orderkey <= 200
          UNION ALL
          SELECT o_orderkey, step + 1, balance_cents DIV 2
          FROM pay WHERE balance_cents >= 100000
        )
        SELECT o_orderkey, step, balance_cents
        FROM pay ORDER BY o_orderkey, step
        """
    )


def q160_merge_cow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO as a copy-on-write full-outer-join rewrite (Hive grew
    SQL MERGE in 2.2 / HIVE-10924; this completes the q81/q82 DML trio
    one release beyond parity).  Source = deterministic derived updates
    (keys %37==0, price+1000) and inserts (keys %101==0 shifted past
    MAX(o_orderkey)); WHEN MATCHED AND key%111==0 THEN DELETE, WHEN
    MATCHED THEN UPDATE, WHEN NOT MATCHED THEN INSERT (status 'N').

    Plan: ONE full-outer shuffle join on the merge key + the FileSink
    rewrite — the same single-pass plan an ACID-table MERGE compiles to;
    the max-key scalar is a broadcast one-row cross join, never a
    collect.  Oracle checks the post-merge table digest."""
    out = os.path.join(tempfile.gettempdir(), f"hive_spark_cow_merge_{os.getpid()}")
    orders = t(spark, sf_dir, "orders")
    mk = orders.agg(F.max("o_orderkey").alias("mk"))
    src_upd = orders.filter(F.col("o_orderkey") % 37 == 0).select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_totalprice") + 1000).alias("new_price"),
    )
    src_ins = (
        orders.filter(F.col("o_orderkey") % 101 == 0)
        .crossJoin(F.broadcast(mk))
        .select(
            (F.col("o_orderkey") + F.col("mk") + 1).alias("k"),
            F.lit(100.0).alias("new_price"),
        )
    )
    src = src_upd.union(src_ins)
    m = orders.join(src, orders["o_orderkey"] == src["k"], "full_outer")
    matched = F.col("o_orderkey").isNotNull() & F.col("k").isNotNull()
    merged = m.filter(~(matched & (F.col("o_orderkey") % 111 == 0))).select(
        F.coalesce(F.col("o_orderkey"), F.col("k")).alias("key"),
        F.when(F.col("o_orderkey").isNull(), F.lit("N"))
        .otherwise(F.col("o_orderstatus"))
        .alias("status"),
        F.when(F.col("k").isNotNull(), F.col("new_price"))
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
    )
    merged.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("price"), 2).alias("total_price"),
        )
        .orderBy("status")
    )


def q238_cte_materialization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE materialization (HIVE-11752, cte_mat_1–5.q;
    SemanticAnalyzer.java:1840-1850 marks a CTE for materialization when
    hive.optimize.cte.materialize.threshold >= 0 and its reference count
    reaches the threshold; materializeCTE at SemanticAnalyzer.java:1235
    writes it to a scratch temp table the main query then scans).

    The engine's Spark-first equivalent evaluates the CTE subtree ONCE
    into an eager localCheckpoint and rewrites both references onto it —
    the executed plan contains NO parquet scan (certified in
    tests/test_cte_materialize.py).  The query is cte_mat_1.q's shape —
    a CTE self-join — over orders; the oracle inlines the CTE, proving
    materialization is plan-only, never semantics."""
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables()
    eng.set_var("hive.optimize.cte.materialize.threshold", "2")
    return eng.sql(
        """
        WITH q1 AS (
          SELECT o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
        )
        SELECT a.o_custkey AS cust,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ROUND(SUM(a.o_totalprice + b.o_totalprice), 2) AS pair_total
        FROM q1 a JOIN q1 b
          ON a.o_custkey = b.o_custkey AND a.o_totalprice < b.o_totalprice
        GROUP BY a.o_custkey
        HAVING COUNT(*) >= 3
        ORDER BY cust
        LIMIT 200
        """
    )


QUERIES = {
    "q238_cte_materialization": q238_cte_materialization,
    "q160_merge_cow": q160_merge_cow,
    "q157_recursive_cte": q157_recursive_cte,
    "q75_in_subquery": q75_in_subquery,
    "q76_not_in_subquery": q76_not_in_subquery,
    "q77_exists_correlated": q77_exists_correlated,
    "q78_scalar_subquery": q78_scalar_subquery,
    "q79_cte": q79_cte,
    "q80_multi_insert": q80_multi_insert,
    "q81_update_cow": q81_update_cow,
    "q82_delete_cow": q82_delete_cow,
}

ORACLES = {
    "q238_cte_materialization": """
        WITH q1 AS (
          SELECT o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
        )
        SELECT a.o_custkey AS cust,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ROUND(SUM(a.o_totalprice + b.o_totalprice), 2) AS pair_total
        FROM q1 a JOIN q1 b
          ON a.o_custkey = b.o_custkey AND a.o_totalprice < b.o_totalprice
        GROUP BY a.o_custkey
        HAVING COUNT(*) >= 3
        ORDER BY cust
        LIMIT 200
    """,
    "q160_merge_cow": """
        WITH mk AS (SELECT MAX(o_orderkey) AS mk FROM orders),
        src AS (
          SELECT o_orderkey AS k, o_totalprice + 1000 AS new_price
          FROM orders WHERE o_orderkey % 37 = 0
          UNION ALL
          SELECT o_orderkey + mk.mk + 1, 100.0
          FROM orders, mk WHERE o_orderkey % 101 = 0
        ),
        merged AS (
          SELECT COALESCE(o.o_orderkey, s.k) AS key,
                 CASE WHEN o.o_orderkey IS NULL THEN 'N'
                      ELSE o.o_orderstatus END AS status,
                 CASE WHEN s.k IS NOT NULL THEN s.new_price
                      ELSE o.o_totalprice END AS price,
                 o.o_orderkey AS tk, s.k AS sk
          FROM orders o FULL JOIN src s ON o.o_orderkey = s.k
        )
        SELECT status, COUNT(*) AS n, ROUND(SUM(price), 2) AS total_price
        FROM merged
        WHERE NOT (tk IS NOT NULL AND sk IS NOT NULL AND tk % 111 = 0)
        GROUP BY status ORDER BY status
    """,
    "q157_recursive_cte": """
        WITH RECURSIVE pay AS (
          SELECT o_orderkey, 0 AS step,
                 CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS balance_cents
          FROM orders WHERE o_orderkey <= 200
          UNION ALL
          SELECT o_orderkey, step + 1, balance_cents // 2
          FROM pay WHERE balance_cents >= 100000
        )
        SELECT o_orderkey, step, balance_cents
        FROM pay ORDER BY o_orderkey, step
    """,
    "q75_in_subquery": """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
    """,
    "q76_not_in_subquery": """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders WHERE o_totalprice > 350000)
    """,
    "q77_exists_correlated": """
        SELECT p_partkey, p_brand FROM part p
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 49)
    """,
    "q78_scalar_subquery": """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
        FROM orders
        WHERE o_totalprice > 1.8 * (SELECT AVG(o_totalprice) FROM orders)
    """,
    "q79_cte": """
        WITH supp_rev AS (
            SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS rev
            FROM lineitem GROUP BY l_suppkey
        ),
        ranked AS (
            SELECT l_suppkey, rev, rank() OVER (ORDER BY rev DESC, l_suppkey) AS rnk
            FROM supp_rev
        )
        SELECT s_suppkey, s_name, ROUND(rev, 2) AS rev, CAST(rnk AS INT) AS rnk
        FROM ranked JOIN supplier ON l_suppkey = s_suppkey
        WHERE rnk <= 10
    """,
    "q80_multi_insert": """
        SELECT 'by_status' AS dest, o_orderstatus AS key, COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders GROUP BY o_orderstatus
        UNION ALL
        SELECT 'by_priority' AS dest, o_orderpriority AS key, COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders GROUP BY o_orderpriority
    """,
    "q81_update_cow": """
        SELECT o_orderstatus, COUNT(*) AS n,
               ROUND(SUM(CASE WHEN o_orderstatus = 'O'
                              THEN o_totalprice * 1.10
                              ELSE o_totalprice END), 2) AS total_after_update
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "q82_delete_cow": """
        SELECT l_returnflag, COUNT(*) AS n_remaining,
               ROUND(SUM(l_quantity), 2) AS qty_remaining
        FROM lineitem
        WHERE NOT (l_returnflag = 'R' AND l_quantity > 40)
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
}
