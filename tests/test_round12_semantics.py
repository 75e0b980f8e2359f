"""Round-12 semantic pins for the round-11 ADVICE items:

1. TRUNCATE of one partition must retain rows whose partition column is
   NULL (__HIVE_DEFAULT_PARTITION__) — ~cond is NULL for them, not False.
2. INSERT INTO otherdb.foo must hit the CATALOG table when the session
   temp table foo was created in a different db (temp-table shadowing is
   db-scoped, SemanticAnalyzer.getMetaData).
3. printf's decimal→double literal rewrite must not touch decimals
   inside string literals ('1.5' stays '1.5').
4. percentile_approx over a JOIN must not inject the ambiguous
   _metadata ordering columns (and the fallback catches ambiguity).
5. ``a NOT IN (...) = true`` parenthesizes the WHOLE not-in expression
   (the operand regex must not swallow the NOT keyword).
"""

from __future__ import annotations

import pytest

from apache_hive_2_1_1_src_spark.session import HiveEngine


@pytest.fixture(scope="module")
def eng(spark):
    e = HiveEngine(spark, "/root/testdata/sf0.001")
    e.register_tables()
    yield e
    e._vars = {}


# ------------------------------------------- truncate vs NULL partitions
def test_truncate_partition_keeps_null_partition_rows(eng, spark):
    spark.sql("DROP TABLE IF EXISTS r12_trunc_t")
    eng.sql(
        "create table r12_trunc_t (v int) partitioned by (ds string)"
        " stored as textfile"
    )
    eng.sql("insert into r12_trunc_t partition (ds='1') values (1), (2)")
    # NULL partition value → __HIVE_DEFAULT_PARTITION__
    eng.sql(
        "insert into r12_trunc_t partition (ds) select 9, cast(null as string)"
    )
    eng.sql("truncate table r12_trunc_t partition (ds='1', )")
    rows = eng.sql("select v from r12_trunc_t").collect()
    assert [r[0] for r in rows] == [9]  # the NULL-partition row survives
    eng.sql("drop table r12_trunc_t")


# -------------------------------------- db-qualified temp-table intercept
def test_insert_qualified_name_hits_catalog_not_temp(eng, spark):
    import shutil

    spark.sql("CREATE DATABASE IF NOT EXISTS r12db")
    spark.sql("DROP TABLE IF EXISTS r12db.tshadow")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(
        wh.replace("file:", "") + "/r12db.db/tshadow", ignore_errors=True
    )
    spark.sql("DROP TABLE IF EXISTS tshadow")
    shutil.rmtree(
        wh.replace("file:", "") + "/tshadow", ignore_errors=True
    )
    spark.sql("CREATE TABLE r12db.tshadow (a int) USING parquet")
    # session temp table with the same bare name, created in default db
    eng.sql("create temporary table tshadow (a int)")
    eng.sql("insert into tshadow values (1)")
    # db-qualified insert targets the REAL catalog table
    eng.sql("insert into r12db.tshadow select 42")
    cat = spark.table("r12db.tshadow").collect()
    assert [r[0] for r in cat] == [42]
    # the temp view kept only its own row
    tmp = spark.table("tshadow").collect()
    assert [r[0] for r in tmp] == [1]
    spark.catalog.dropTempView("tshadow")
    getattr(eng, "_temp_tables", set()).discard("tshadow")
    getattr(eng, "_session_temp_tables", set()).discard("tshadow")
    spark.sql("DROP TABLE r12db.tshadow")
    spark.sql("DROP DATABASE r12db")


# ------------------------------------------------ printf string literals
def test_printf_decimal_inside_string_literal_untouched(eng):
    assert (
        eng.sql("select printf('%s', '1.5') as s").collect()[0][0] == "1.5"
    )
    assert (
        eng.sql("select printf('v 1.5 w') as s").collect()[0][0]
        == "v 1.5 w"
    )
    # the numeric-literal rewrite itself still applies
    assert (
        eng.sql("select printf('%f', 1.5) as s").collect()[0][0]
        == "1.500000"
    )


# ------------------------------------- percentile_approx over multi-table
def test_percentile_approx_over_join_no_ambiguous_metadata(eng):
    if not hasattr(eng, "_vars"):
        eng._vars = {}
    eng._vars["hive.percentile.exact"] = "true"
    try:
        v = eng.sql(
            "select percentile_approx(a.n_nationkey, 0.5) as p "
            "from nation a join nation b on a.n_nationkey = b.n_nationkey"
        ).collect()[0][0]
        # the point: no AMBIGUOUS_REFERENCE from an injected _metadata;
        # Hive's histogram interpolation over 0..24 answers 11.5
        assert v is not None and 11.0 <= v <= 13.0
    finally:
        eng._vars.pop("hive.percentile.exact", None)


# ----------------------------------------------- NOT IN (...) = literal
def test_not_in_comparison_parenthesization(eng):
    rows = eng.sql(
        "select (1 not in (1, 2)) = false as x, 2 NOT IN (3) = true as y"
    ).collect()
    assert rows[0][0] is True and rows[0][1] is True
