"""TRANSFORM scripts, ANALYZE statistics, and streaming — the remaining
SURVEY.md §2 surfaces (ScriptOperator.java:875, StatsTask.java, §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_2_1_1_src_spark.operators.transform_script import (
    analyze_table_rowcount,
    transform_script,
)
from apache_hive_2_1_1_src_spark.queries._util import t


def q94_transform_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSFORM ... USING 'tr a-z A-Z' (ScriptOperator subprocess piping
    with Hive's tab/newline/\\N framing) over nation."""
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    out = transform_script(
        nation, ["tr", "a-z", "A-Z"], "n_nationkey int, upper_name string"
    )
    return out.orderBy("n_nationkey")


def q95_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE COMPUTE STATISTICS → stats-backed row count must match
    reality (ColumnStatsTask/StatsTask persistence)."""
    from apache_hive_2_1_1_src_spark.queries.storage import drop_table

    drop_table(spark, "stats_customer")
    t(spark, sf_dir, "customer").write.saveAsTable("stats_customer")
    n_stats = analyze_table_rowcount(spark, "stats_customer")
    actual = spark.table("stats_customer").count()
    return spark.createDataFrame(
        [(int(n_stats), int(actual))], "n_rows_stats bigint, n_rows_actual bigint"
    )


def q96_streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming windowed aggregation run to completion
    (availableNow) — must equal the batch/oracle answer over the same data
    (SURVEY.md §2.9: beyond-parity surface)."""
    from apache_hive_2_1_1_src_spark.streaming.jobs import streaming_event_counts

    return streaming_event_counts(spark, sf_dir)


QUERIES = {
    "q94_transform_script": q94_transform_script,
    "q95_analyze_stats": q95_analyze_stats,
    "q96_streaming_window_counts": q96_streaming_window_counts,
}

ORACLES = {
    "q94_transform_script": """
        SELECT n_nationkey, upper(n_name) AS upper_name
        FROM nation ORDER BY n_nationkey
    """,
    "q95_analyze_stats": """
        SELECT COUNT(*) AS n_rows_stats, COUNT(*) AS n_rows_actual FROM customer
    """,
    "q96_streaming_window_counts": """
        SELECT date_trunc('hour', ts) AS win_start, event_type,
               COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
        FROM events GROUP BY 1, 2
    """,
}
