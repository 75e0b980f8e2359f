"""The correctness gate as pytest: every registry query with an oracle must
match DuckDB on row count, column names, and order-insensitive values —
the same sorted-normalization diff QTestUtil applies to golden outputs
(QTestUtil.java:967-971)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from apache_hive_2_1_1_src_spark.queries import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(round(v, 9))
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    import decimal

    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    return repr(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(list(r)[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, oracle):
    sdf = QUERIES[name](spark, sf_dir)
    scols = [c.lower() for c in sdf.columns]
    srows = sdf.collect()
    if name not in ORACLES:
        # rows-only contract: must at least execute and return a stable schema
        assert scols, f"{name}: empty schema"
        return
    rel = oracle.execute(ORACLES[name])
    ocols = [d[0].lower() for d in rel.description]
    orows = rel.fetchall()
    assert sorted(scols) == sorted(ocols), f"{name}: column mismatch"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"
    assert _canon(srows, scols) == _canon(orows, ocols), f"{name}: values differ"
