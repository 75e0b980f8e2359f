"""MatchPath PTF — row-sequence pattern matching over ordered partitions.

Reference: ql/.../udf/ptf/MatchPath.java (registered as ``matchpath``,
FunctionRegistry.java:470-475): ``matchpath(on t partition by p order by o
arg1('LATE.EARLY*'), ...)`` assigns each row a symbol from boolean
predicates, then for each row attempts to match the symbol-pattern starting
at that row, emitting the row plus its matched-path length.

Spark has no sequence-pattern operator, so per SURVEY.md §2.4 this is the
``applyInPandas`` case: symbols are evaluated Spark-side as JVM boolean
columns (the predicates never run in Python); Python only walks each
partition's ordered symbol string with a compiled regex — O(rows) per
partition, Arrow-batched, no driver involvement.
"""

from __future__ import annotations

import re
from collections.abc import Mapping

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def matchpath(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    symbols: Mapping[str, Column],
    pattern: str,
    keep_cols: list[str],
) -> DataFrame:
    """For every row whose symbol sequence (starting at that row) matches
    ``pattern`` (a regex over single-char symbol names, e.g. ``BS*``),
    emit ``keep_cols`` + ``path_len`` (number of rows matched).

    Matching is greedy-anchored like MatchPath.java's Chain evaluation:
    the longest match at each starting row wins.
    """
    for name in symbols:
        if len(name) != 1:
            raise ValueError("symbol names must be single characters")
    sym_col = None
    for name, cond in symbols.items():
        sym_col = F.when(cond, F.lit(name)) if sym_col is None else sym_col.when(cond, F.lit(name))
    sym_col = sym_col.otherwise(F.lit("."))

    prepared = df.select(
        *partition_by, *order_by, *[c for c in keep_cols if c not in partition_by + order_by],
        sym_col.alias("_sym"),
    )
    out_schema = StructType(
        [prepared.schema[c] for c in keep_cols] + [StructField("path_len", LongType())]
    )
    rx = re.compile(pattern)
    order_names = list(order_by)
    keep = list(keep_cols)

    def match_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_names, kind="mergesort").reset_index(drop=True)
        s = "".join(pdf["_sym"])
        rows = []
        for start in range(len(s)):
            m = rx.match(s, start)
            if m and m.end() > m.start():
                rec = [pdf.at[start, c] for c in keep]
                rec.append(m.end() - m.start())
                rows.append(rec)
        return pd.DataFrame(rows, columns=keep + ["path_len"])

    return prepared.groupBy(*partition_by).applyInPandas(match_partition, out_schema)
