"""Executable operator inventory — the heart of the correctness gate.

Each submodule exports two dicts keyed by query name:

* ``QUERIES``: name → callable(spark, sf_dir) → DataFrame (the PySpark
  implementation of one SURVEY.md §2 component), and
* ``ORACLES``: name → ANSI SQL string DuckDB runs over the same parquet
  tables.  Names absent from ORACLES get the driver's weaker rows-only
  check (used only for genuinely non-SQL-expressible ops).

Column names are aliased identically on both sides; float aggregates are
rounded on both sides so cross-engine summation order can't flip the
value hash (the driver compares order-insensitively after sorting columns
by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from apache_hive_2_1_1_src_spark.queries import (
    acid_queries,
    aggregates,
    functions_sql,
    language_surface,
    misc,
    pipeline_queries,
    relational,
    storage,
    subqueries,
    tpch_like,
    tpch_full,
    windows,
)

# Merge order = driver sampling order (the correctness gate samples the
# first 50 entries): relational fundamentals, then the ACID/storage
# surface (formats, metastore, JDBC, bucket layout, SHOW, Hive-UDF jars)
# so the gate's sample spans the engine's breadth, then the rest.
_MODULES = [
    relational,
    acid_queries,
    storage,
    pipeline_queries,
    language_surface,
    aggregates,
    windows,
    functions_sql,
    subqueries,
    misc,
    tpch_like,
    tpch_full,
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
