"""CTE materialization pins (HIVE-11752, cte_mat_1-5.q):
threshold semantics, computed-once plan certificate, temp-table
shadowing survival, chained-CTE resolution, column-list form."""

from __future__ import annotations

from apache_hive_2_1_1_src_spark.session import HiveEngine

SELF_JOIN = """
WITH q1 AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 200)
SELECT a.o_orderkey AS k, ROUND(a.o_totalprice + b.o_totalprice, 2) AS s
FROM q1 a JOIN q1 b ON a.o_orderkey = b.o_orderkey
ORDER BY k
"""


def _eng(spark, sf_dir):
    eng = HiveEngine(spark, sf_dir)
    eng.register_tables()
    return eng


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_materialized_plan_scans_checkpoint_not_parquet(spark, sf_dir):
    eng = _eng(spark, sf_dir)
    eng.set_var("hive.optimize.cte.materialize.threshold", "-1")
    base = eng.sql(SELF_JOIN).collect()
    eng.set_var("hive.optimize.cte.materialize.threshold", "2")
    mat = eng.sql(SELF_JOIN)
    assert mat.collect() == base
    plan = _plan(mat)
    # the CTE was evaluated once into a checkpoint: the main query's
    # executed plan reads RDD blocks, never the parquet source
    assert "parquet" not in plan.lower()
    assert "ExistingRDD" in plan


def test_below_threshold_not_materialized(spark, sf_dir):
    # cte_mat_2.q contract inverted: two references but threshold 3 →
    # the CTE stays inline and the parquet scan remains in the plan
    eng = _eng(spark, sf_dir)
    eng.set_var("hive.optimize.cte.materialize.threshold", "3")
    df = eng.sql(SELF_JOIN)
    assert "parquet" in _plan(df).lower()


def test_disabled_by_default(spark, sf_dir):
    eng = _eng(spark, sf_dir)  # threshold unset == Hive default -1
    assert "parquet" in _plan(eng.sql(SELF_JOIN)).lower()


def test_temp_table_shadowing_survives(spark, sf_dir):
    # cte_mat_4.q: a temp table named q1 exists; the CTE q1 shadows it
    # inside the query, and the temp table is untouched afterwards
    eng = _eng(spark, sf_dir)
    spark.createDataFrame([(1, "A")], "a int, b string").createOrReplaceTempView(
        "q1"
    )
    eng.set_var("hive.optimize.cte.materialize.threshold", "2")
    rows = eng.sql(SELF_JOIN).collect()
    assert rows and all(r["k"] <= 200 for r in rows)
    assert [tuple(r) for r in spark.table("q1").collect()] == [(1, "A")]
    spark.catalog.dropTempView("q1")


def test_chained_ctes_and_column_list(spark, sf_dir):
    # a later CTE referencing a materialized earlier one, with the
    # (col, ...) alias form on the materialized CTE
    eng = _eng(spark, sf_dir)
    sql = """
    WITH base (k, p) AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 100
    ),
    top AS (SELECT k FROM base WHERE p > 50000)
    SELECT CAST(COUNT(*) AS BIGINT) AS n
    FROM base JOIN top ON base.k = top.k
    """
    eng.set_var("hive.optimize.cte.materialize.threshold", "-1")
    base = eng.sql(sql).collect()
    eng.set_var("hive.optimize.cte.materialize.threshold", "2")
    mat = eng.sql(sql)
    assert mat.collect() == base
    assert "parquet" not in _plan(mat).lower()


def test_string_literals_not_rewritten(spark, sf_dir):
    eng = _eng(spark, sf_dir)
    eng.set_var("hive.optimize.cte.materialize.threshold", "2")
    sql = """
    WITH q1 AS (SELECT o_orderkey FROM orders WHERE o_orderkey <= 10)
    SELECT a.o_orderkey AS k, 'q1 q1' AS tag
    FROM q1 a JOIN q1 b ON a.o_orderkey = b.o_orderkey
    ORDER BY k
    """
    rows = eng.sql(sql).collect()
    assert rows[0]["tag"] == "q1 q1"
