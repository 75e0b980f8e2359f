"""Row-filter / column-mask policy queries — Hive's TableMask surface.

Reference: ql/src/java/org/apache/hadoop/hive/ql/parse/TableMask.java:42
and the clientpositive masking_1.q–masking_5.q corpus, whose policies
come from the hardcoded test authorizer
itests/util/.../sqlstd/SQLStdHiveAuthorizationValidatorForTest.java:
table ``masking_test`` gets rowFilter ``key % 2 = 0 and key < 10`` and
cell transformer ``reverse(value)`` on column ``value``;
``masking_test_subq`` gets the IN-correlated-subquery rowFilter
``key in (select key from src where src.key = masking_test_subq.key)``.

Spark-first: the engine applies the same single-pass textual rewrite
(operators/masking.py) before Catalyst sees the query, so the masked
scan is an ordinary derived subquery — Catalyst fuses the mask
projection into whole-stage codegen, pushes residual predicates under
it, and plans the correlated row filter as a LeftSemi broadcast join
(verified in tests/test_masking.py).  The oracle is the hand-expanded
rewrite over the same base tables.

Scale: masking adds a projection + filter directly above each masked
scan — no new shuffle at any SF; the row filter runs BEFORE joins so
policy filtering strictly shrinks downstream exchanges.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_PID = os.getpid()

# The (key, value) "src" shape of the masking .q corpus (src key is a
# small-int string there; here the same shape from customer)
_SRC_VIEW = (
    "CREATE OR REPLACE TEMPORARY VIEW src AS "
    "SELECT CAST(c_custkey % 25 AS INT) AS key, c_name AS value FROM customer"
)
_AUTHZ = (
    "set hive.security.authorization.manager="
    "org.apache.hadoop.hive.ql.security.authorization.plugin.sqlstd."
    "SQLStdHiveAuthorizerFactoryForTest"
)


def _engine(spark: SparkSession, sf_dir: str):
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables(sf_dir)
    eng.sql(_SRC_VIEW)
    return eng


def q219_masking_row_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """masking_1.q core shape: ``select * from masking_test where key
    > 0`` under the test authorizer — the policy's row filter ANDs
    with the user predicate and ``value`` comes back reversed; SELECT
    of a single (unmasked vs masked) column included, as the .q file
    does (TableMask.java:42; masking_1.q:7-16)."""
    eng = _engine(spark, sf_dir)
    eng.sql(
        "CREATE OR REPLACE TEMPORARY VIEW masking_test AS "
        "SELECT key, value FROM src"
    )
    eng.sql(_AUTHZ)
    return eng.sql(
        "SELECT key, value, length(value) AS value_len "
        "FROM masking_test WHERE key > 0"
    )


def q220_masking_join_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """masking_1.q join shape + masking_2.q union shape over the
    masked table: both references independently rewritten, aliases
    preserved (masking_1.q:19-20; masking_2.q:13-16)."""
    eng = _engine(spark, sf_dir)
    eng.sql(
        "CREATE OR REPLACE TEMPORARY VIEW masking_test AS "
        "SELECT key, value FROM src"
    )
    eng.sql(_AUTHZ)
    return eng.sql(
        "SELECT a.key, a.value, n.n_name "
        "FROM masking_test a JOIN nation n ON a.key = n.n_nationkey "
        "WHERE a.key > 0 "
        "UNION "
        "SELECT b.key, b.value, 'ALL' AS n_name "
        "FROM masking_test b WHERE b.key > 4"
    )


def q221_masking_subquery_rowfilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """masking_3.q / masking_test_subq shape: the row filter is itself
    an IN-correlated subquery against another table — after the
    rewrite Catalyst plans it as a LeftSemi join under the user's
    residual predicate (ValidatorForTest.java applyRowFilterAndColumnMasking,
    the masking_test_subq branch)."""
    eng = _engine(spark, sf_dir)
    eng.sql(
        "CREATE OR REPLACE TEMPORARY VIEW masking_test_subq AS "
        "SELECT CAST(c_custkey AS INT) AS key, c_name AS value FROM customer"
    )
    eng.sql(_AUTHZ)
    return eng.sql(
        "SELECT key, value FROM masking_test_subq WHERE key < 100"
    )


QUERIES = {
    "q219_masking_row_filter": q219_masking_row_filter,
    "q220_masking_join_union": q220_masking_join_union,
    "q221_masking_subquery_rowfilter": q221_masking_subquery_rowfilter,
}

# Oracles are the hand-expanded TableMask rewrite over the base tables.
_M = (
    "SELECT key, reverse(value) AS value FROM "
    "(SELECT CAST(c_custkey % 25 AS INT) AS key, c_name AS value "
    " FROM customer) t WHERE key % 2 = 0 AND key < 10"
)

ORACLES = {
    "q219_masking_row_filter": f"""
        SELECT key, value, length(value) AS value_len
        FROM ({_M}) m WHERE key > 0
    """,
    "q220_masking_join_union": f"""
        WITH m AS ({_M})
        SELECT a.key, a.value, n.n_name
        FROM m a JOIN nation n ON a.key = n.n_nationkey WHERE a.key > 0
        UNION
        SELECT b.key, b.value, 'ALL' AS n_name FROM m b WHERE b.key > 4
    """,
    "q221_masking_subquery_rowfilter": """
        WITH src AS (SELECT CAST(c_custkey % 25 AS INT) AS key,
                            c_name AS value FROM customer),
             mts AS (SELECT CAST(c_custkey AS INT) AS key,
                            c_name AS value FROM customer)
        SELECT key, value FROM mts
        WHERE key IN (SELECT key FROM src WHERE src.key = mts.key)
          AND key < 100
    """,
}
