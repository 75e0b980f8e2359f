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


def test_distinct_window_rewrite(spark, sf_dir, oracle):
    """windowing_distinct.q (HIVE-9534): COUNT/SUM/AVG(DISTINCT) OVER a
    partition-only window, rewritten onto collect_set's window form.
    Compared against DuckDB's native distinct window aggregates."""
    eng = _engine(spark, sf_dir)
    sdf = eng.sql(
        "SELECT o_orderkey, "
        "COUNT(DISTINCT o_orderpriority) OVER (PARTITION BY o_orderstatus) AS c, "
        "SUM(DISTINCT o_custkey) OVER (PARTITION BY o_orderstatus) AS s, "
        "ROUND(AVG(DISTINCT o_custkey) OVER (PARTITION BY o_orderstatus), 6) AS a "
        "FROM orders WHERE o_orderkey <= 500"
    )
    # SUM(DISTINCT bigint) is BIGINT in Hive (GenericUDAFSum) — the fold
    # must neither widen to DOUBLE nor lose >2^53 precision
    _compare(
        sdf,
        oracle,
        "SELECT o_orderkey, "
        "COUNT(DISTINCT o_orderpriority) OVER (PARTITION BY o_orderstatus) AS c, "
        "CAST(SUM(DISTINCT o_custkey) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS s, "
        "ROUND(CAST(AVG(DISTINCT o_custkey) OVER (PARTITION BY o_orderstatus) AS DOUBLE), 6) AS a "
        "FROM orders WHERE o_orderkey <= 500",
    )


def test_distinct_window_null_semantics(spark, sf_dir):
    """An all-NULL partition: COUNT(DISTINCT)=0, SUM/AVG(DISTINCT)=NULL
    (collect_set drops NULLs; the size()=0 guard restores NULL)."""
    eng = _engine(spark, sf_dir)
    spark.sql(
        "SELECT * FROM VALUES (1, CAST(NULL AS INT)), (1, CAST(NULL AS INT)), "
        "(2, 5) AS t(k, v)"
    ).createOrReplaceTempView("dw_nulls")
    rows = sorted(
        tuple(r)
        for r in eng.sql(
            "SELECT k, COUNT(DISTINCT v) OVER (PARTITION BY k) AS c, "
            "SUM(DISTINCT v) OVER (PARTITION BY k) AS s, "
            "AVG(DISTINCT v) OVER (PARTITION BY k) AS a FROM dw_nulls"
        ).collect()
    )
    assert rows == [(1, 0, None, None), (1, 0, None, None), (2, 1, 5.0, 5.0)]


def test_distinct_window_order_by_rejected(spark, sf_dir):
    """Hive rejects DISTINCT windowing with ORDER BY (whole-partition
    frame only) — the engine mirrors that instead of silently computing
    something else."""
    import pytest

    eng = _engine(spark, sf_dir)
    with pytest.raises(ValueError, match="HIVE-9534"):
        eng.sql(
            "SELECT COUNT(DISTINCT o_custkey) OVER "
            "(PARTITION BY o_orderstatus ORDER BY o_orderkey) FROM orders"
        )


def test_distinct_window_plain_distinct_untouched(spark, sf_dir):
    """A non-windowed DISTINCT aggregate must pass through unchanged."""
    eng = _engine(spark, sf_dir)
    n = eng.sql("SELECT COUNT(DISTINCT o_orderstatus) AS n FROM orders").collect()
    assert n[0]["n"] == 3


def test_transform_custom_output_delimiter_escaped(spark, sf_dir, oracle):
    """Custom '|' field framing on both sides of the script: Hive splits
    on the literal byte; Spark regex-splits, so the engine escapes the
    metacharacter (a bare '|' would split between every character)."""
    eng = _engine(spark, sf_dir)
    sdf = eng.sql(
        "SELECT TRANSFORM (o_orderkey, o_orderstatus) "
        "ROW FORMAT DELIMITED FIELDS TERMINATED BY '|' "
        "USING 'cat' "
        "AS (k STRING, s STRING) "
        "ROW FORMAT DELIMITED FIELDS TERMINATED BY '|' "
        "FROM orders WHERE o_orderkey <= 50"
    )
    _compare(
        sdf,
        oracle,
        "SELECT CAST(o_orderkey AS VARCHAR) AS k, o_orderstatus AS s "
        "FROM orders WHERE o_orderkey <= 50",
    )


def test_transform_nonmeta_delimiter_untouched(spark, sf_dir, oracle):
    """A non-metacharacter delimiter ('#') passes through unchanged."""
    eng = _engine(spark, sf_dir)
    sdf = eng.sql(
        "SELECT TRANSFORM (o_orderkey, o_orderstatus) "
        "ROW FORMAT DELIMITED FIELDS TERMINATED BY '#' "
        "USING 'cat' "
        "AS (k STRING, s STRING) "
        "ROW FORMAT DELIMITED FIELDS TERMINATED BY '#' "
        "FROM orders WHERE o_orderkey <= 50"
    )
    _compare(
        sdf,
        oracle,
        "SELECT CAST(o_orderkey AS VARCHAR) AS k, o_orderstatus AS s "
        "FROM orders WHERE o_orderkey <= 50",
    )
