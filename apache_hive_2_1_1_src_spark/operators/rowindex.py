"""Global row numbering without the single-partition window trap.

A bare ``row_number() OVER (ORDER BY ...)`` forces every row into ONE
partition (Spark warns "No Partition Defined for Window operation") —
the classic accidental serialization at 100 TB.  The distributed
equivalent, used for assigning global sample indices / shard offsets in
training-data pipelines:

1. ``repartitionByRange`` on the order key — Spark samples the key
   distribution and produces contiguous, ordered key ranges.
2. per-partition ``row_number`` keyed by ``spark_partition_id()`` (the
   id is frozen into a column before any further exchange, so its value
   is stable even though the window re-shuffles by it).
3. partition row counts (a k-row aggregate) turn into cumulative
   offsets with a tiny window, broadcast back, and added to the local
   rank.

Total cost: two data shuffles + one k-row side plan, fully parallel at
every step.  Hive's ROW_NUMBER has the same single-reducer pitfall
(PTFOperator with an empty partitioning); this is the scale-out recipe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    *order: Column | str,
    num_partitions: int | None = None,
    out_col: str = "rn",
) -> DataFrame:
    """Dense 1-based global row number in ``order`` — distributed.

    ``order`` must be a total order (include a unique tiebreak column)
    for the result to be deterministic.
    """
    ranged = (
        df.repartitionByRange(num_partitions, *order)
        if num_partitions
        else df.repartitionByRange(*order)
    )
    tagged = ranged.withColumn("_pid", F.spark_partition_id())
    local_w = Window.partitionBy("_pid").orderBy(*order)
    local = tagged.withColumn("_lrn", F.row_number().over(local_w))

    # the offsets side plan is k rows (one per partition) — the window
    # and broadcast below are driver-trivial at any corpus size
    offsets = (
        local.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_lrn") + F.col("_offset")).cast("long"))
        .drop("_pid", "_lrn")
    )
