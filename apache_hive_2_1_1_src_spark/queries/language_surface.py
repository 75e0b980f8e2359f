"""Remaining HiveQL language-surface constructs: LATERAL VIEW OUTER,
GROUPING__ID, TABLESAMPLE(n PERCENT), and virtual columns.

Reference surface:
* LATERAL VIEW [OUTER] — grammar HiveParser.g:290-291, executed by
  LateralViewJoinOperator.java:1 (OUTER emits the input row with NULL
  generator output when the UDTF produces nothing).
* GROUPING__ID virtual column — GroupByDesc.java:64-66 grouping-sets
  expansion; Spark's grouping_id() uses the same first-arg-is-MSB bit
  order as Hive.
* TABLESAMPLE(n PERCENT) — parse/SplitSample.java:1 (split-based, so
  row choice is engine-specific; Spark's Bernoulli df.sample is the
  scalable equivalent — seeded, executor-local, no shuffle).
* INPUT__FILE__NAME virtual column — exec/TableScanOperator.java:388
  virtual-column emission → Spark's input_file_name().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_2_1_1_src_spark.queries._util import t


def q131_lateral_view_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW OUTER explode over a sometimes-empty array: rows whose
    array is empty survive with a NULL element (LateralViewJoinOperator's
    OUTER contract), exercised through the actual HiveQL syntax."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("tl_orders")
    return spark.sql(
        """
        SELECT o_orderkey, part
        FROM (
          SELECT o_orderkey,
                 CASE WHEN o_orderstatus = 'P' THEN array()
                      ELSE split(o_orderpriority, '-') END AS parts
          FROM tl_orders WHERE o_orderkey <= 2000
        ) LATERAL VIEW OUTER explode(parts) x AS part
        ORDER BY o_orderkey, part
        """
    )


def q132_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with the GROUPING__ID bitmask (first grouping column in the
    most-significant bit, as Hive's grouping-sets expansion emits it)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


def q133_percent_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE(10 PERCENT): seeded Bernoulli sample — rows are
    engine-chosen (Hive samples by input split), so this is rows-only;
    pytest pins the sampled fraction and determinism."""
    li = t(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=7).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


def q134_input_file_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INPUT__FILE__NAME virtual column: per-file row counts via
    input_file_name() (TableScanOperator's virtual-column surface)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.regexp_extract(F.input_file_name(), r"([^/]+?)(\?.*)?$", 1).alias(
                "file"
            )
        )
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("file")
    )


QUERIES = {
    "q131_lateral_view_outer": q131_lateral_view_outer,
    "q132_grouping_id": q132_grouping_id,
    "q133_percent_sample": q133_percent_sample,
    "q134_input_file_name": q134_input_file_name,
}

ORACLES = {
    "q131_lateral_view_outer": """
        SELECT o_orderkey, u AS part
        FROM (
          SELECT o_orderkey,
                 CASE WHEN o_orderstatus = 'P' THEN []
                      ELSE string_split(o_orderpriority, '-') END AS parts
          FROM orders WHERE o_orderkey <= 2000
        ), LATERAL UNNEST(CASE WHEN len(parts) = 0 THEN [NULL]
                               ELSE parts END) AS x(u)
        ORDER BY o_orderkey, part
    """,
    "q132_grouping_id": """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY gid, l_returnflag, l_linestatus
    """,
    "q134_input_file_name": """
        SELECT 'lineitem.parquet' AS file, COUNT(*) AS n_rows FROM lineitem
    """,
}
