"""Row-filter / column-mask (TableMask) tests — the masking_*.q corpus.

Reference: ql/src/java/org/apache/hadoop/hive/ql/parse/TableMask.java:42
(rewrite construction), policies from
itests/util/.../sqlstd/SQLStdHiveAuthorizationValidatorForTest.java.
"""

from __future__ import annotations

import pytest

from apache_hive_2_1_1_src_spark.operators.masking import (
    MaskingPolicy,
    reference_test_policies,
    rewrite_with_policies,
)
from apache_hive_2_1_1_src_spark.session import HiveEngine
from tests.test_correctness import _canon

_SCHEMA = {"masking_test": [("key", "int"), ("value", "string")]}


def _schema_fn(tab):
    return _SCHEMA.get(tab)


_POL = {"masking_test": MaskingPolicy("key % 2 = 0", {"value": "reverse(value)"})}


class TestRewriteUnit:
    def test_basic_from(self):
        out = rewrite_with_policies(
            "SELECT * FROM masking_test WHERE key > 0", _POL, _schema_fn
        )
        assert (
            "(SELECT key, CAST(reverse(value) AS string) AS value "
            "FROM masking_test WHERE key % 2 = 0) masking_test" in out
        )
        assert out.endswith("WHERE key > 0")

    def test_alias_kept(self):
        out = rewrite_with_policies(
            "SELECT a.key FROM masking_test a", _POL, _schema_fn
        )
        assert out.rstrip().endswith(") a")

    def test_as_alias(self):
        out = rewrite_with_policies(
            "SELECT t.key FROM masking_test AS t", _POL, _schema_fn
        )
        assert out.rstrip().endswith(") t")

    def test_join_reference(self):
        out = rewrite_with_policies(
            "SELECT * FROM nation JOIN masking_test ON key = n_nationkey",
            _POL,
            _schema_fn,
        )
        assert ") masking_test ON key = n_nationkey" in out
        assert out.startswith("SELECT * FROM nation JOIN (SELECT")

    def test_insert_target_not_rewritten(self):
        txt = "INSERT INTO masking_test SELECT * FROM other"
        assert rewrite_with_policies(txt, _POL, _schema_fn) == txt

    def test_insert_overwrite_target_not_rewritten(self):
        txt = "INSERT OVERWRITE TABLE masking_test SELECT 1, 'x'"
        assert rewrite_with_policies(txt, _POL, _schema_fn) == txt

    def test_string_literal_untouched(self):
        txt = "SELECT 'FROM masking_test is a string' FROM nation"
        assert rewrite_with_policies(txt, _POL, _schema_fn) == txt

    def test_unknown_schema_left_alone(self):
        txt = "SELECT * FROM masking_test"
        assert rewrite_with_policies(txt, _POL, lambda t: None) == txt

    def test_default_qualified(self):
        out = rewrite_with_policies(
            "SELECT * FROM default.masking_test", _POL, _schema_fn
        )
        assert ") masking_test" in out

    def test_other_db_not_rewritten(self):
        txt = "SELECT * FROM otherdb.masking_test"
        assert rewrite_with_policies(txt, _POL, _schema_fn) == txt

    def test_from_list_comma(self):
        out = rewrite_with_policies(
            "SELECT * FROM nation, masking_test WHERE key = n_nationkey",
            _POL,
            _schema_fn,
        )
        assert ") masking_test WHERE" in out

    def test_identity_mask_skips_cast(self):
        pol = {"masking_test": MaskingPolicy("key > 1", {"key": "key"})}
        out = rewrite_with_policies("SELECT * FROM masking_test", pol, _schema_fn)
        assert "CAST" not in out
        assert "WHERE key > 1" in out

    def test_filter_only_policy(self):
        pol = {"masking_test": MaskingPolicy("key < 5")}
        out = rewrite_with_policies("SELECT * FROM masking_test", pol, _schema_fn)
        assert "(SELECT key, value FROM masking_test WHERE key < 5)" in out

    def test_mask_only_policy(self):
        pol = {"masking_test": MaskingPolicy(None, {"value": "upper(value)"})}
        out = rewrite_with_policies("SELECT * FROM masking_test", pol, _schema_fn)
        assert "WHERE" not in out
        assert "CAST(upper(value) AS string) AS value" in out

    def test_cte_shadowing_suppresses_policy(self):
        """masking_4.q: a CTE named like a policied table shadows the
        policy — its references must NOT be rewritten (Hive resolves
        the CTE first and never consults the authorizer for it)."""
        txt = (
            "WITH masking_test AS (SELECT 1 AS key, 'x' AS value) "
            "SELECT * FROM masking_test"
        )
        assert rewrite_with_policies(txt, _POL, _schema_fn) == txt

    def test_cte_over_masked_table_still_masks(self):
        """masking_4.q: a CTE READING a policied table gets the mask
        inside the CTE body."""
        out = rewrite_with_policies(
            "WITH q1 AS (SELECT * FROM masking_test WHERE key = 4) "
            "SELECT * FROM q1",
            _POL,
            _schema_fn,
        )
        assert "reverse(value)" in out and "FROM q1" in out

    def test_tablesample_reordered_before_alias(self):
        """masking_5.q: TABLESAMPLE on a masked table — Hive puts the
        sample after the table name; on the derived replacement Spark
        needs it before the alias, same semantics (sample above mask)."""
        out = rewrite_with_policies(
            "SELECT * FROM masking_test tablesample (5 rows) s",
            _POL,
            _schema_fn,
        )
        assert ") tablesample (5 rows) s" in out

    def test_reference_policies_match_validator(self):
        pols = reference_test_policies()
        assert pols["masking_test"].row_filter == "key % 2 = 0 and key < 10"
        assert pols["masking_test"].column_masks == {"value": "reverse(value)"}
        assert "masking_test_subq.key" in pols["masking_test_subq"].row_filter


@pytest.fixture()
def eng(spark, sf_dir):
    e = HiveEngine(spark, sf_dir)
    e.register_tables(sf_dir)
    e.sql(
        "CREATE OR REPLACE TEMPORARY VIEW src AS SELECT "
        "CAST(c_custkey % 25 AS INT) AS key, c_name AS value FROM customer"
    )
    e.sql(
        "CREATE OR REPLACE TEMPORARY VIEW masking_test AS "
        "SELECT key, value FROM src"
    )
    yield e
    spark.catalog.dropTempView("masking_test")
    spark.catalog.dropTempView("src")


_DUCK_M = (
    "SELECT key, reverse(value) AS value FROM "
    "(SELECT CAST(c_custkey % 25 AS INT) AS key, c_name AS value FROM customer) t "
    "WHERE key % 2 = 0 AND key < 10"
)


def _compare(sdf, oracle, dsql):
    scols = [c.lower() for c in sdf.columns]
    srows = sdf.collect()
    rel = oracle.execute(dsql)
    ocols = [d[0].lower() for d in rel.description]
    orows = rel.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert _canon(srows, scols) == _canon(orows, ocols)


class TestMaskingEngine:
    """Ported masking_1.q / masking_2.q statement shapes, engine vs
    DuckDB on the hand-expanded rewrite."""

    def test_policy_via_authorizer_var(self, eng, oracle):
        eng.set_var(
            "hive.security.authorization.manager",
            "org.apache.hadoop.hive.ql.security.authorization.plugin.sqlstd."
            "SQLStdHiveAuthorizerFactoryForTest",
        )
        _compare(
            eng.sql("SELECT * FROM masking_test"),
            oracle,
            _DUCK_M,
        )
        # masking_1.q: single-column projections see the policy too
        _compare(
            eng.sql("SELECT key FROM masking_test WHERE key > 0"),
            oracle,
            f"SELECT key FROM ({_DUCK_M}) m WHERE key > 0",
        )
        _compare(
            eng.sql("SELECT value FROM masking_test WHERE key > 0"),
            oracle,
            f"SELECT value FROM ({_DUCK_M}) m WHERE key > 0",
        )
        eng.drop_masking_policy("masking_test")
        eng.set_var("hive.security.authorization.manager", "")

    def test_programmatic_policy_join(self, eng, oracle):
        eng.set_masking_policy(
            "masking_test",
            row_filter="key % 2 = 0 and key < 10",
            column_masks={"value": "reverse(value)"},
        )
        try:
            _compare(
                eng.sql(
                    "SELECT m.key, m.value, n.n_name FROM masking_test m "
                    "JOIN nation n ON m.key = n.n_nationkey"
                ),
                oracle,
                f"SELECT m.key, m.value, n.n_name FROM ({_DUCK_M}) m "
                "JOIN nation n ON m.key = n.n_nationkey",
            )
        finally:
            eng.drop_masking_policy("masking_test")

    def test_mask_plan_is_codegen_scan(self, eng):
        """Scale pin: the masked reference plans as projection+filter
        directly over the file scan — no extra exchange, no Python."""
        eng.set_masking_policy(
            "masking_test",
            row_filter="key % 2 = 0 and key < 10",
            column_masks={"value": "reverse(value)"},
        )
        try:
            plan = (
                eng.sql("SELECT * FROM masking_test WHERE key > 0")
                ._jdf.queryExecution().executedPlan().toString()
            )
            assert "Exchange" not in plan
            assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
            assert "reverse" in plan
        finally:
            eng.drop_masking_policy("masking_test")

    def test_write_path_unmasked(self, eng, spark):
        """Hive masks read entities only — an INSERT's target table
        reference must not be rewritten (SemanticAnalyzer walks read
        descendants)."""
        eng.set_masking_policy("masking_test", row_filter="key < 0")
        try:
            out = eng._apply_masking(
                "INSERT INTO masking_test SELECT 1 AS key, 'x' AS value"
            )
            assert out == "INSERT INTO masking_test SELECT 1 AS key, 'x' AS value"
        finally:
            eng.drop_masking_policy("masking_test")
