"""Metadata-only query answering — Hive's StatsOptimizer
(ql/src/java/org/apache/hadoop/hive/ql/optimizer/StatsOptimizer.java:97,
gated by hive.compute.query.using.stats): ``SELECT count(*) FROM t``,
``min(c)``/``max(c)``/``count(c)`` over a bare table are answered from
the catalog's ANALYZE stats without scanning a single row — the "instant
count(*)" behavior Hive users notice.

Spark-first re-expression: the stats live in Spark's own catalog
(ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS ...] persists
numRows / per-column min/max/numNulls exactly as Hive's StatsTask +
ColumnStatsTask do), and the rewritten "plan" is a literal one-row
projection with NO relation under it — Catalyst never sees the table.

Safety contract (mirrors StatsOptimizer's StatsSetupConst.ACCURATE
check): a lookup is served ONLY when every needed statistic is present
in the catalog; any gap → ``None`` and the caller falls through to the
scan path.  Like Hive, correctness relies on stats being current —
ANALYZE after writes; the engine flag defaults off
(hive.compute.query.using.stats=false, the reference's default).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

#: SELECT <aggs> FROM <bare table> [WHERE <partition-equality conjuncts>]
#: — no GROUP/JOIN/subquery/LIMIT.
_SHAPE = re.compile(
    r"^\s*SELECT\s+(?P<aggs>.+?)\s+FROM\s+(?P<table>[\w.]+)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_AGG = re.compile(
    r"^(?P<fn>COUNT|MIN|MAX)\s*\(\s*(?P<arg>\*|1|[\w]+)\s*\)"
    r"(?:\s+AS\s+(?P<alias>\w+))?$",
    re.IGNORECASE,
)


def _split_top_level_commas(s: str) -> list[str]:
    out, buf, depth = [], [], 0
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    out.append("".join(buf).strip())
    return out


def _table_row_count(spark: SparkSession, table: str) -> int | None:
    """numRows from the catalog Statistics line (StatsTask persistence)."""
    for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
        if (r[0] or "").strip() == "Statistics":
            m = re.search(r"(\d+)\s+rows", r[1] or "")
            if m:
                return int(m.group(1))
    return None


def _column_stats(spark: SparkSession, table: str, col: str) -> dict | None:
    """min/max/num_nulls from DESCRIBE EXTENDED table col (ColumnStatsTask
    read-back).  Returns None when FOR COLUMNS was never run for ``col``."""
    rows = {r[0]: r[1] for r in spark.sql(f"DESCRIBE EXTENDED {table} {col}").collect()}
    if rows.get("min") in (None, "NULL") and rows.get("num_nulls") in (None, "NULL"):
        return None
    return rows


def _partition_filtered_count(
    spark: SparkSession, table: str, where: str
) -> int | None:
    """Partition-pruned row count from per-partition catalog stats
    (metadata_only_queries_with_filters.q; StatsOptimizer consults
    Partition-level StatsSetupConst.ROW_COUNT when every predicate is an
    equality on a partition column).  Returns None unless ALL conjuncts
    are partition-column equalities and EVERY matching partition carries
    ANALYZE'd numRows — the same all-or-nothing ACCURATE contract as the
    table path."""
    from urllib.parse import unquote

    eqs: dict[str, str] = {}
    for conj in re.split(r"\bAND\b", where, flags=re.IGNORECASE):
        m = re.match(
            r"^\s*(\w+)\s*=\s*(?:'([^']*)'|\"([^\"]*)\"|([\w.-]+))\s*$", conj
        )
        if not m:
            return None
        val = m.group(2) if m.group(2) is not None else (
            m.group(3) if m.group(3) is not None else m.group(4)
        )
        eqs[m.group(1).lower()] = val
    try:
        pcols = {
            c.name.lower()
            for c in spark.catalog.listColumns(table)
            if c.isPartition
        }
    except Exception:
        return None
    if not eqs or not set(eqs) <= pcols:
        return None
    try:
        parts = [r[0] for r in spark.sql(f"SHOW PARTITIONS {table}").collect()]
    except Exception:
        return None
    total = 0
    for p in parts:
        kv = {
            k.lower(): unquote(v)
            for k, v in (seg.split("=", 1) for seg in p.split("/"))
        }
        if not all(kv.get(k) == v for k, v in eqs.items()):
            continue
        spec = ", ".join(f"{k}='{v}'" for k, v in kv.items())
        try:
            desc = spark.sql(
                f"DESCRIBE TABLE EXTENDED {table} PARTITION ({spec})"
            ).collect()
        except Exception:
            return None
        st = next(
            (
                r[1]
                for r in desc
                if (r[0] or "").strip() == "Partition Statistics"
            ),
            None,
        )
        m = re.search(r"(\d+)\s+rows", st or "")
        if not m:
            return None
        total += int(m.group(1))
    return total


def try_stats_only_answer(spark: SparkSession, text: str) -> DataFrame | None:
    """If ``text`` is a pure-aggregate query over one bare table and the
    catalog holds every statistic it needs, return the answer as a
    literal projection (no table relation in the plan); else None."""
    m = _SHAPE.match(text)
    if not m:
        return None
    table = m.group("table")
    body = m.group("aggs")
    where = m.group("where")
    if re.search(
        r"\b(WHERE|GROUP|JOIN|HAVING|LIMIT|UNION|DISTINCT|OVER)\b", body, re.IGNORECASE
    ):
        return None
    if where is not None:
        # partition-equality filters: only the COUNT(*) family can be
        # answered (column min/max stats are table-level here)
        if re.search(
            r"\b(GROUP|JOIN|HAVING|LIMIT|UNION|OR)\b", where, re.IGNORECASE
        ):
            return None
        parts_b = _split_top_level_commas(body)
        exprs_f: list[str] = []
        n_part: int | None = None
        for i, part in enumerate(parts_b):
            am = _AGG.match(part)
            if not am or am.group("fn").upper() != "COUNT" or am.group(
                "arg"
            ) not in ("*", "1"):
                return None
            if n_part is None:
                n_part = _partition_filtered_count(spark, table, where)
            if n_part is None:
                return None
            alias = am.group("alias") or f"c{i}"
            exprs_f.append(f"CAST({n_part} AS BIGINT) AS {alias}")
        return spark.sql("SELECT " + ", ".join(exprs_f))
    try:
        schema = {f.name.lower(): f.dataType.simpleString() for f in spark.table(table).schema.fields}
    except Exception:
        return None
    n_rows: int | None = None
    parts = _split_top_level_commas(body)
    exprs: list[str] = []
    for i, part in enumerate(parts):
        am = _AGG.match(part)
        if not am:
            return None
        fn = am.group("fn").upper()
        arg = am.group("arg")
        alias = am.group("alias") or f"c{i}"
        if fn == "COUNT" and arg in ("*", "1"):
            if n_rows is None:
                n_rows = _table_row_count(spark, table)
            if n_rows is None:
                return None
            exprs.append(f"CAST({n_rows} AS BIGINT) AS {alias}")
            continue
        col = arg.lower()
        if col not in schema:
            return None
        st = _column_stats(spark, table, arg)
        if st is None:
            return None
        if fn == "COUNT":
            if n_rows is None:
                n_rows = _table_row_count(spark, table)
            if n_rows is None or st.get("num_nulls") in (None, "NULL"):
                return None
            exprs.append(
                f"CAST({n_rows - int(st['num_nulls'])} AS BIGINT) AS {alias}"
            )
        else:
            v = st.get("min" if fn == "MIN" else "max")
            if v in (None, "NULL"):
                return None
            ctype = schema[col]
            lit = f"'{v}'" if ctype in ("string", "date", "timestamp") else v
            exprs.append(f"CAST({lit} AS {ctype}) AS {alias}")
    # literal one-row projection: the table never enters the plan
    return spark.sql("SELECT " + ", ".join(exprs))
