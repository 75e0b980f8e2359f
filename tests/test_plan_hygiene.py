"""Global plan-hygiene gate: no relational registry query may plan a
cartesian product or read through a leaked InMemoryRelation.

Plans are built (analysis + physical planning only, no execution), so the
sweep covers every pure-relational module cheaply.  Storage / streaming /
pipeline queries execute side effects at build time and have their own
plan audits in test_plans.py.
"""

from __future__ import annotations

import pytest

from apache_hive_2_1_1_src_spark.queries import (
    aggregates,
    language_surface,
    relational,
    subqueries,
    tpch_full,
    tpch_like,
    windows,
)

# queries whose shape legitimately contains the pattern
ALLOWED_CARTESIAN = {
    "q15_cross_join",  # explicit CROSS JOIN surface
    "q78_scalar_subquery",  # scalar subquery joins on no keys by design
    "q122_important_parts",  # scalar-threshold HAVING (one-row join)
    "q124_top_supplier",  # broadcast scalar max joined with no keys
    "q126_small_quantity_revenue",  # one-row agg broadcast
    "q130_global_sales_opportunity",  # scalar avg-balance subquery
}

MODULES = [
    relational,
    aggregates,
    windows,
    subqueries,
    tpch_like,
    tpch_full,
    language_surface,
]

ALL = [(m.__name__.rsplit(".", 1)[-1], n, fn) for m in MODULES for n, fn in m.QUERIES.items()]


@pytest.mark.parametrize(
    "name,fn", [(n, fn) for _, n, fn in ALL], ids=[n for _, n, _ in ALL]
)
def test_plan_has_no_cartesian_or_leaked_cache(name, fn, spark, sf_dir):
    if name in {"q80_multi_insert", "q81_update_cow", "q82_delete_cow"}:
        pytest.skip("executes writes at build time; audited elsewhere")
    df = fn(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    assert "InMemoryRelation" not in plan, f"{name}: leaked cache in plan"
    assert "InMemoryTableScan" not in plan, f"{name}: leaked cache in plan"
    if name not in ALLOWED_CARTESIAN:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: nested-loop join — check join keys"
        )


def test_no_table_sized_driver_roundtrip_in_source():
    """No module may materialize a table on the driver just to rebuild a
    DataFrame from it (`createDataFrame(df.collect(), ...)`) — the
    iterative-plan-truncation job belongs to localCheckpoint / a staged
    write.  Regression pin for the q204 fix (acid_queries.py)."""
    import pathlib
    import re

    pkg = pathlib.Path(__file__).resolve().parents[1] / "apache_hive_2_1_1_src_spark"
    bad = []
    for p in pkg.rglob("*.py"):
        src = p.read_text()
        if re.search(r"createDataFrame\(\s*\w+\.collect\(\)", src):
            bad.append(str(p))
    assert bad == [], f"driver-side table round-trip in: {bad}"
