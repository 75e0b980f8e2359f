"""StatsOptimizer pins (operators/stats_optimizer.py — the
hive.compute.query.using.stats behavior of
ql/.../optimizer/StatsOptimizer.java): metadata-only answers fire only
when safe, fall through whenever any needed statistic is missing, and
never change query results."""

from __future__ import annotations

import os

import pytest

from apache_hive_2_1_1_src_spark.operators.stats_optimizer import (
    try_stats_only_answer,
)
from apache_hive_2_1_1_src_spark.session import HiveEngine


@pytest.fixture()
def stats_tbl(spark):
    name = f"statsopt_pins_{os.getpid()}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.createDataFrame(
        [(1, 10.0, "a"), (2, None, "b"), (3, 30.0, None), (4, 40.0, "d")],
        "k bigint, v double, s string",
    ).write.saveAsTable(name)
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_count_star_and_col_from_stats(spark, stats_tbl):
    spark.sql(f"ANALYZE TABLE {stats_tbl} COMPUTE STATISTICS")
    spark.sql(f"ANALYZE TABLE {stats_tbl} COMPUTE STATISTICS FOR COLUMNS v, s")
    df = try_stats_only_answer(
        spark,
        f"SELECT COUNT(*) AS n, COUNT(v) AS nv, COUNT(s) AS ns, "
        f"MIN(v) AS lo, MAX(v) AS hi FROM {stats_tbl}",
    )
    assert df is not None
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "FileScan" not in plan and "Scan parquet" not in plan
    r = df.first()
    assert (r.n, r.nv, r.ns, r.lo, r.hi) == (4, 3, 3, 10.0, 40.0)


def test_falls_through_without_stats(spark, stats_tbl):
    # no ANALYZE at all -> no row-count stat -> must decline
    assert try_stats_only_answer(spark, f"SELECT COUNT(*) FROM {stats_tbl}") is None


def test_falls_through_without_column_stats(spark, stats_tbl):
    spark.sql(f"ANALYZE TABLE {stats_tbl} COMPUTE STATISTICS")
    # basic stats only: count(*) answerable, min(v) is not
    assert try_stats_only_answer(spark, f"SELECT COUNT(*) AS n FROM {stats_tbl}") is not None
    assert try_stats_only_answer(spark, f"SELECT MIN(v) FROM {stats_tbl}") is None


@pytest.mark.parametrize(
    "q",
    [
        "SELECT COUNT(*) FROM {t} WHERE k > 1",
        "SELECT COUNT(*), k FROM {t} GROUP BY k",
        "SELECT COUNT(DISTINCT k) FROM {t}",
        "SELECT SUM(k) FROM {t}",
        "SELECT COUNT(*) FROM {t} JOIN {t} x",
        "SELECT COUNT(*) FROM (SELECT * FROM {t})",
    ],
)
def test_declines_unsupported_shapes(spark, stats_tbl, q):
    spark.sql(f"ANALYZE TABLE {stats_tbl} COMPUTE STATISTICS")
    spark.sql(f"ANALYZE TABLE {stats_tbl} COMPUTE STATISTICS FOR COLUMNS k")
    assert try_stats_only_answer(spark, q.format(t=stats_tbl)) is None


def test_engine_flag_gates_the_rewrite(spark, stats_tbl, sf_dir):
    spark.sql(f"ANALYZE TABLE {stats_tbl} COMPUTE STATISTICS")
    eng = HiveEngine(spark, sf_dir)
    q = f"SELECT COUNT(*) AS n FROM {stats_tbl}"
    # default off (Hive's default): the plan scans
    plan_off = eng.sql(q)._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "Scan" in plan_off
    eng.set_var("hive.compute.query.using.stats", "true")
    fast = eng.sql(q)
    plan_on = fast._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "FileScan" not in plan_on and "Scan parquet" not in plan_on
    assert fast.first().n == 4


@pytest.fixture()
def stats_part_tbl(spark):
    name = f"statsopt_part_pins_{os.getpid()}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (4, None)],
        "k bigint, p string",
    ).write.partitionBy("p").saveAsTable(name)
    spark.sql(f"ANALYZE TABLE {name} PARTITION (p) COMPUTE STATISTICS")
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_partition_filter_count_from_stats(spark, stats_part_tbl):
    """count(*) with a partition-column equality is summed from
    per-partition numRows; no scan relation in the plan."""
    df = try_stats_only_answer(
        spark, f"SELECT COUNT(*) AS n FROM {stats_part_tbl} WHERE p = 'x'"
    )
    assert df is not None and df.first().n == 2
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "FileScan" not in plan and "Scan parquet" not in plan


def test_partition_filter_missing_value_counts_zero(spark, stats_part_tbl):
    df = try_stats_only_answer(
        spark, f"SELECT COUNT(*) AS n FROM {stats_part_tbl} WHERE p = 'zz'"
    )
    assert df is not None and df.first().n == 0


def test_partition_filter_non_partition_column_falls_through(spark, stats_part_tbl):
    assert (
        try_stats_only_answer(
            spark, f"SELECT COUNT(*) AS n FROM {stats_part_tbl} WHERE k = 1"
        )
        is None
    )


def test_partition_filter_or_falls_through(spark, stats_part_tbl):
    assert (
        try_stats_only_answer(
            spark,
            f"SELECT COUNT(*) AS n FROM {stats_part_tbl} "
            "WHERE p = 'x' OR p = 'y'",
        )
        is None
    )


def test_partition_filter_min_max_falls_through(spark, stats_part_tbl):
    """Only the COUNT(*) family is answerable under a partition filter
    (column min/max stats are table-level)."""
    assert (
        try_stats_only_answer(
            spark, f"SELECT MIN(k) AS m FROM {stats_part_tbl} WHERE p = 'x'"
        )
        is None
    )
