"""Negative SQL corpus — the reference's clientnegative strategy
(ql/src/test/queries/clientnegative/*: each .q MUST fail analysis with a
specific error) re-expressed: every case here must raise from
HiveEngine.sql's analysis, with a message naming the offending object —
silent success or a wrong-category error is a parity bug.

Cases are adapted from named clientnegative files; Spark's analyzer
message taxonomy differs from SemanticAnalyzer's ErrorMsg codes, so each
case pins a stable substring (the object name) rather than exact text.
"""

from __future__ import annotations

import pytest

from apache_hive_2_1_1_src_spark.session import HiveEngine

CASES = [
    # (id, sql, must-appear-in-error)
    (
        "invalid_table",  # clientnegative/nonexistent_table.q-style
        "SELECT * FROM no_such_table_xyz",
        "no_such_table_xyz",
    ),
    (
        "invalid_column",  # clientnegative/invalid_select_column.q
        "SELECT o_nonexistent FROM orders",
        "o_nonexistent",
    ),
    (
        "invalid_function",  # clientnegative/invalid_function.q (udf_nonexistent)
        "SELECT totally_not_a_function(o_orderkey) FROM orders",
        "totally_not_a_function",
    ),
    (
        "groupby_key_missing",  # clientnegative/groupby_key.q — non-agg col not in GROUP BY
        "SELECT o_orderstatus, o_orderkey FROM orders GROUP BY o_orderstatus",
        "o_orderkey",
    ),
    (
        "ambiguous_column",  # clientnegative/ambiguous_col.q
        "SELECT o_orderkey FROM orders a JOIN orders b ON a.o_orderkey = b.o_orderkey",
        "o_orderkey",
    ),
    (
        "subquery_multiple_columns",  # clientnegative/subquery_scalar_multi_columns.q
        "SELECT * FROM orders WHERE o_orderkey = "
        "(SELECT o_orderkey, o_custkey FROM orders LIMIT 1)",
        "",  # category check only: must fail
    ),
    (
        "union_column_count",  # clientnegative/union2.q-style arity mismatch
        "SELECT o_orderkey FROM orders UNION ALL "
        "SELECT o_orderkey, o_custkey FROM orders",
        "",
    ),
    (
        "invalid_window_frame",  # clientnegative/windowing_leadlag_in_udaf.q family
        "SELECT LEAD(o_orderkey) FROM orders",
        "",  # window function without OVER must fail analysis
    ),
    (
        "wrong_arg_count",  # clientnegative/udf_function_does_not_implement.q family
        "SELECT substr() FROM orders",
        "",
    ),
    (
        "nonexistent_qualifier",  # clientnegative/unresolved table alias
        "SELECT z.o_orderkey FROM orders o",
        "z",
    ),
    (
        "aggregate_in_where",  # clientnegative/agg_in_where.q — aggregates
        # cannot appear in WHERE (HAVING is the legal spelling)
        "SELECT o_custkey FROM orders WHERE COUNT(*) > 3",
        "",
    ),
    (
        "window_in_where",  # clientnegative/windowing_in_where.q family
        "SELECT o_orderkey FROM orders "
        "WHERE ROW_NUMBER() OVER (ORDER BY o_orderkey) = 1",
        "",
    ),
    (
        "nested_aggregate",  # clientnegative/nested_aggregate.q —
        # an aggregate of an aggregate has no meaning in one scope
        "SELECT SUM(COUNT(o_orderkey)) FROM orders",
        "",
    ),
    (
        "orderby_position_out_of_range",  # clientnegative/orderby_position
        "SELECT o_orderstatus FROM orders ORDER BY 5",
        "",
    ),
    (
        "groupby_position_out_of_range",  # clientnegative/groupby_position
        "SELECT o_orderstatus, COUNT(*) FROM orders GROUP BY 7",
        "",
    ),
    (
        "star_with_groupby",  # clientnegative/select_star_groupby.q —
        # SELECT * cannot combine with GROUP BY over fewer columns
        "SELECT * FROM orders GROUP BY o_orderstatus",
        "",
    ),
    (
        "duplicate_cte_name",  # clientnegative/ambiguous_cte.q
        "WITH x AS (SELECT 1 AS a), x AS (SELECT 2 AS a) SELECT * FROM x",
        "x",
    ),
    (
        "lateral_view_bad_source",  # clientnegative/lateral_view_explode.q —
        # explode over a non-collection column must fail typecheck
        "SELECT e.x FROM orders LATERAL VIEW explode(o_orderkey) e AS x",
        "",
    ),
    (
        "duplicate_column_create",  # clientnegative/create_skewed_table_dup_col_name.q family
        "CREATE TABLE negdup_cols (a INT, a STRING)",
        "a",
    ),
    (
        "drop_nonexistent_table",  # clientnegative/drop_table_failure1.q —
        # which SETs hive.exec.drop.ignorenonexistent=false first; under
        # Hive's TRUE default a bare drop of a missing table is a no-op
        "SET hive.exec.drop.ignorenonexistent=false; "
        "DROP TABLE definitely_missing_tbl",
        "definitely_missing_tbl",
    ),
    (
        "truncate_view",  # clientnegative/authorization_truncate.q family —
        # TRUNCATE must name a table, not a view
        "TRUNCATE TABLE region",
        "region",
    ),
    (
        "cluster_by_with_order_by",  # clientnegative/clusterbyorderby.q
        "SELECT o_orderkey FROM orders CLUSTER BY o_orderkey ORDER BY o_orderkey",
        "",
    ),
    (
        "unknown_stored_as_format",  # clientnegative/fileformat_bad_class.q
        # family — SemanticAnalyzer rejects an unrecognized STORED AS
        "CREATE TABLE negfmt_t (a INT) STORED AS WINGDINGS",
        "wingdings",
    ),
    (
        "stored_by_handler_unsupported",  # hbase-handler DDL must fail
        # loudly as scoped-out, not with a bare parser error
        "CREATE TABLE neghb_t (k STRING, v STRING) STORED BY "
        "'org.apache.hadoop.hive.hbase.HBaseStorageHandler'",
        "HBaseStorageHandler",
    ),
    (
        "distinct_window_order_by",  # HIVE-9534: distinct windowing is
        # whole-partition-frame only; ORDER BY must be rejected, not
        # silently mis-evaluated
        "SELECT COUNT(DISTINCT o_custkey) OVER "
        "(PARTITION BY o_orderstatus ORDER BY o_orderkey) FROM orders",
        "HIVE-9534",
    ),
    (
        "order_by_position_out_of_range",  # clientnegative/orderbysortby
        # family — ordinal beyond the select list
        "SELECT o_orderkey FROM orders ORDER BY 5",
        "5",
    ),
    (
        "having_nonagg_column",  # clientnegative/having1.q — HAVING over
        # a column that is neither grouped nor aggregated
        "SELECT o_orderstatus, COUNT(*) FROM orders "
        "GROUP BY o_orderstatus HAVING o_totalprice > 5",
        "o_totalprice",
    ),
    (
        "udtf_alias_count_mismatch",  # clientnegative/udtf_explode_not_supported /
        # udtf_invalid_place family — two aliases for a one-column UDTF
        "SELECT explode(array(1,2)) AS (a, b) FROM orders LIMIT 1",
        "alias",
    ),
    (
        "limit_negative",  # clientnegative/limit_partition_stats-adjacent:
        # negative LIMIT is rejected at analysis
        "SELECT * FROM orders LIMIT -1",
        "-1",
    ),
    (
        "insert_into_view",  # clientnegative/insert_view_failure.q
        "INSERT INTO region VALUES (99, 'X', 'c')",
        "region",
    ),
    (
        "view_duplicate_columns",  # clientnegative/create_view_failure3.q —
        # duplicate names in the view column list
        "CREATE OR REPLACE TEMPORARY VIEW dup_v (a, a) AS SELECT 1, 2",
        "a",
    ),
    (
        "cast_binary_to_int",  # clientnegative/invalid_cast_from_binary_1.q
        "SELECT CAST(CAST('x' AS BINARY) AS INT) FROM orders LIMIT 1",
        "cast",
    ),
    (
        "date_plus_date",  # clientnegative/invalid_t_alter family — date
        # arithmetic with two dates has no addition rule
        "SELECT DATE '2020-01-01' + DATE '2020-01-02'",
        "date",
    ),
    (
        "udtf_in_where",  # clientnegative/udtf_not_supported2.q — a
        # generator outside the SELECT list
        "SELECT 1 FROM orders WHERE explode(array(true))",
        "generator",
    ),
    (
        "distinct_orderby_not_selected",  # clientnegative/
        # orderbysortby-distinct family: ORDER BY a column SELECT
        # DISTINCT did not keep
        "SELECT DISTINCT o_orderstatus FROM orders ORDER BY o_orderkey",
        "o_orderkey",
    ),
    (
        "aggregate_in_groupby",  # clientnegative/groupby_agg.q-style —
        # aggregate functions cannot key the grouping
        "SELECT COUNT(*) FROM orders GROUP BY COUNT(*)",
        "group by",
    ),
    (
        "window_in_groupby",  # clientnegative windowing misuse family —
        # a window function cannot appear in GROUP BY
        "SELECT 1 FROM orders GROUP BY row_number() OVER (ORDER BY o_orderkey)",
        "window",
    ),
]


@pytest.mark.parametrize("case_id,sql,needle", CASES, ids=[c[0] for c in CASES])
def test_negative_sql(case_id, sql, needle, spark, sf_dir):
    eng = HiveEngine(spark, sf_dir)
    eng.register_tables()
    with pytest.raises(Exception) as excinfo:
        # .schema forces full analysis even for lazily-planned statements
        (eng.run_script(sql) if ";" in sql else eng.sql(sql)).schema
    if needle:
        assert needle.lower() in str(excinfo.value).lower(), (
            f"{case_id}: error should name '{needle}', got: "
            f"{str(excinfo.value)[:300]}"
        )


def test_negative_multi_insert_column_mismatch(spark, sf_dir):
    """clientnegative-style multi-insert arity case: a branch whose
    select list does not match the destination table's column count must
    fail analysis naming the destination (SemanticAnalyzer would raise
    'Cannot insert into target table because column number/types are
    different')."""
    import os

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables()
    dest = f"mi_neg_dest_{os.getpid()}"
    spark.sql(f"DROP TABLE IF EXISTS {dest}")
    spark.sql(f"CREATE TABLE {dest} (k BIGINT, v STRING) USING parquet")
    try:
        with pytest.raises(Exception) as excinfo:
            eng.sql(
                f"FROM orders INSERT OVERWRITE TABLE {dest} SELECT o_orderkey"
            )
        assert dest.lower() in str(excinfo.value).lower() or "column" in str(
            excinfo.value
        ).lower()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {dest}")


def test_negative_multi_insert_into_view(spark, sf_dir):
    """Multi-insert destinations must be writable tables — inserting into
    a (temp) view fails analysis, as Hive's SemanticAnalyzer rejects
    INSERT into a view."""
    eng = HiveEngine(spark, sf_dir)
    eng.register_tables()
    with pytest.raises(Exception):
        eng.sql(
            "FROM orders INSERT OVERWRITE TABLE nation "
            "SELECT o_orderkey, 'x', 'y', 'z'"
        )
