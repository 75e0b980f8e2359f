"""Golden-file SQL corpus — the reference's .q-file strategy
(ql/src/test/queries/clientpositive/* run through QTestUtil with sorted
normalization) re-expressed: each .sql runs through HiveEngine.sql AND
DuckDB, compared order-insensitively.  Exercises the SQL-text surface
(parser/analyzer path) rather than the DataFrame API the registry uses.

QUALIFY is the one dialect divergence in the corpus: Spark lacks it, so
the engine-side text rewrites it to a subquery filter (the same rewrite
Hive's CBO would apply).
"""

from __future__ import annotations

import glob
import os
import re

import pytest

from apache_hive_2_1_1_src_spark.session import HiveEngine
from tests.test_correctness import _canon

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
SQL_FILES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.sql")))


def _spark_compat(sql: str) -> str:
    """Rewrite QUALIFY rn <= k into a subquery filter for Spark."""
    m = re.search(r"QUALIFY\s+(\w+)\s*<=\s*(\d+)", sql, re.IGNORECASE)
    if not m:
        return sql
    inner = sql[: m.start()].strip()
    return f"SELECT * FROM ({inner}) WHERE {m.group(1)} <= {m.group(2)}"


@pytest.mark.parametrize("path", SQL_FILES, ids=[os.path.basename(p) for p in SQL_FILES])
def test_golden_sql(path, spark, sf_dir, oracle):
    sql = open(path).read()
    eng = HiveEngine(spark, sf_dir)
    eng.register_tables()
    sdf = eng.sql(_spark_compat(sql))
    scols = [c.lower() for c in sdf.columns]
    srows = sdf.collect()
    rel = oracle.execute(sql)
    ocols = [d[0].lower() for d in rel.description]
    orows = rel.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert _canon(srows, scols) == _canon(orows, ocols)
