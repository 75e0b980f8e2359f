"""MAP / REDUCE / SELECT TRANSFORM statement syntax — mapreduce1.q,
mapreduce2.q and transform_ppr1.q shapes through the SQL text path.

Reference: parse/HiveParser.g trfmClause (MAP and REDUCE are aliases
for SELECT TRANSFORM), executed by exec/ScriptOperator.java:875 with
tab/newline/\\N framing.  Spark's parser accepts the same statement
text and plans a ScriptTransformation node; the DISTRIBUTE BY keys
become the feeding Exchange, SORT BY the intra-partition sort — the
reducer-script shuffle contract.
"""

from __future__ import annotations

from apache_hive_2_1_1_src_spark.session import HiveEngine
from tests.test_correctness import _canon


def _engine(spark, sf_dir):
    eng = HiveEngine(spark, sf_dir)
    eng.register_tables(sf_dir)
    return eng


def _compare(sdf, oracle, dsql):
    scols = [c.lower() for c in sdf.columns]
    rel = oracle.execute(dsql)
    ocols = [d[0].lower() for d in rel.description]
    assert sorted(scols) == sorted(ocols)
    assert _canon(sdf.collect(), scols) == _canon(rel.fetchall(), ocols)


def test_map_statement_identity(spark, sf_dir, oracle):
    """mapreduce1.q: MAP with computed exprs through 'cat'."""
    eng = _engine(spark, sf_dir)
    sdf = eng.sql(
        "FROM nation MAP n_nationkey, n_name USING 'cat' "
        "AS (k STRING, name STRING)"
    )
    _compare(
        sdf,
        oracle,
        "SELECT CAST(n_nationkey AS VARCHAR) AS k, n_name AS name FROM nation",
    )


def test_reduce_statement_real_script(spark, sf_dir, oracle):
    """mapreduce2.q flavor: DISTRIBUTE BY + SORT BY feed a REDUCE
    running a real transformation script (tr a-z A-Z)."""
    eng = _engine(spark, sf_dir)
    sdf = eng.sql(
        """
        SELECT CAST(r AS INT) AS r_key, name AS upper_name FROM (
          FROM (SELECT n_regionkey, n_name FROM nation
                DISTRIBUTE BY n_regionkey SORT BY n_name) t
          REDUCE t.n_regionkey, t.n_name USING 'tr a-z A-Z'
          AS (r STRING, name STRING)
        ) u
        """
    )
    _compare(
        sdf,
        oracle,
        "SELECT CAST(n_regionkey AS INT) AS r_key, upper(n_name) AS upper_name "
        "FROM nation",
    )


def test_select_transform_statement(spark, sf_dir, oracle):
    """transform_ppr1.q shape: SELECT TRANSFORM with a WHERE beneath."""
    eng = _engine(spark, sf_dir)
    sdf = eng.sql(
        "SELECT TRANSFORM (n_nationkey, n_name) USING 'cat' "
        "AS (k STRING, v STRING) FROM nation WHERE n_nationkey < 10"
    )
    _compare(
        sdf,
        oracle,
        "SELECT CAST(n_nationkey AS VARCHAR) AS k, n_name AS v "
        "FROM nation WHERE n_nationkey < 10",
    )


def test_mapreduce_plan_shape(spark, sf_dir):
    """Plan pin: the DISTRIBUTE BY exchange is hash-partitioned on the
    declared keys and the script node is a ScriptTransformation — no
    extra shuffles, no driver collect."""
    eng = _engine(spark, sf_dir)
    sdf = eng.sql(
        """
        FROM nation
        MAP n_nationkey, n_name USING 'cat' AS (k STRING, name STRING)
        DISTRIBUTE BY name SORT BY k
        """
    )
    plan = sdf._jdf.queryExecution().executedPlan().toString()
    assert "ScriptTransformation" in plan
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(name" in plan
