"""Z-order layout clustering — multi-dimensional data-skipping.

Parquet scans skip whole files/row-groups from min/max footer stats, but
that only helps if the writer CLUSTERED the data on the filter columns.
Sorting on one column gives perfect skipping for that column and none
for the second; a Z-order (Morton) curve interleaves the bits of
several columns' rank-buckets so that files stay simultaneously narrow
in EVERY interleaved dimension — the standard lakehouse layout
optimization (the OPTIMIZE ZORDER idea; same goal as Hive's
list-bucketing/sorted-table DDL — storage.q192, SORTED BY — but for
multi-column range predicates).

Scale design: ranks come from ``F.ntile`` over a window ORDER BY each
dimension — one shuffle per dimension on a 2^bits-bucket quantile
split — then the Morton value is pure bit arithmetic (shiftleft/|,
whole-stage codegen), and ``repartitionByRange(z)`` +
``sortWithinPartitions(z)`` writes range-disjoint files.  No Python,
no driver materialization; at 100 TB each step is a standard shuffle.

For rank computation at real scale a global ntile window would bottleneck
on a single partition, so ranks use ``percent_rank``-free quantile
bucketing via ``F.ntile`` only when the dimension cardinality is small;
the default path buckets by ``width_bucket``-style min/max scaling —
O(1) per row after a tiny agg, no global window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension in the Morton code (16 ⇒ 65536 buckets/dim)
DEFAULT_BITS = 8


def _scale_to_bucket(c: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Min/max-scale a numeric column into [0, 2^bits) — the O(1)
    bucketing that replaces a global rank window at scale."""
    n = (1 << bits) - 1
    span = F.when(cmax > cmin, cmax - cmin).otherwise(F.lit(1.0))
    scaled = (c.cast("double") - cmin) / span * F.lit(n)
    return F.least(
        F.greatest(F.round(scaled).cast("long"), F.lit(0)), F.lit(n)
    )


def _interleave(buckets: list[Column], bits: int) -> Column:
    """Morton-interleave the bit patterns of the per-dimension buckets —
    pure shiftleft/|/& codegen, one expression tree."""
    z: Column = F.lit(0).cast("long")
    ndims = len(buckets)
    for bit in range(bits):
        for d, b in enumerate(buckets):
            src_bit = F.shiftright(b, bit).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(src_bit, bit * ndims + d))
    return z


def zorder_value(df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS) -> DataFrame:
    """Append a ``_z`` Morton-code column over ``cols`` (numeric or
    castable).  One tiny min/max aggregate (broadcast back as literals
    via a cross join of a 1-row frame), then pure bit arithmetic."""
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"_max_{c}"))
    stats = df.agg(*aggs)
    joined = df.crossJoin(F.broadcast(stats))
    buckets = [
        _scale_to_bucket(
            F.col(c), F.col(f"_min_{c}"), F.col(f"_max_{c}"), bits
        )
        for c in cols
    ]
    return joined.withColumn("_z", _interleave(buckets, bits)).drop(
        *[f"_min_{c}" for c in cols], *[f"_max_{c}" for c in cols]
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 16,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write ``df`` as ``num_files`` range-disjoint parquet files
    clustered on the Z-curve of ``cols``: repartitionByRange on the
    Morton value keeps each file a compact hyper-rectangle, so min/max
    footer stats prune files for predicates on ANY of the dimensions."""
    z = zorder_value(df, cols, bits)
    (
        z.repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def files_touched(spark, path: str, predicate: str) -> int:
    """How many distinct parquet files a filtered scan actually reads —
    the data-skipping measurement (row-group/file pruning shows up as
    fewer distinct input files contributing rows)."""
    df = spark.read.parquet(path).filter(predicate)
    return (
        df.select(F.input_file_name().alias("f")).distinct().count()
    )
