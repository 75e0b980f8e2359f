"""Temporal join operators the reference engine lacks, built from Spark
primitives per the brief's custom-operator ladder (composition of
DataFrame ops first, UDFs never needed here).

* ``asof_join`` — for each left row, the latest right row with the same
  key and right.ts <= left.ts.  NOT implemented as a range join: both
  sides are unioned, shuffled ONCE on the key, and a single
  last-non-null window over (ts, side) resolves every match — cost is
  one shuffle + one sort regardless of how many right rows precede each
  left row.  This is the scale-correct plan for 100 TB event streams
  (the naive `r.ts <= l.ts` join is quadratic per key).

* ``range_join_binned`` — join points to intervals without a cartesian:
  intervals are exploded into fixed-width time buckets, points carry
  their single bucket, and the join becomes a hash equi-join on bucket
  with a residual range filter.  Shuffle volume is
  |points| + |intervals| × (span/width), never |points| × |intervals|.
  Catalyst alone would plan the raw inequality predicate as a
  BroadcastNestedLoopJoin — fine for tiny interval sets, fatal at scale.

Reference parity note: Hive 2.1 has no ASOF/range-join surface; these
extend the engine (SURVEY.md extension tier).  Semantics follow DuckDB's
ASOF JOIN (backward, inclusive), which the oracle mirrors in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_payload: list[str] | None = None,
    tiebreak: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Backward inclusive as-of join.

    Returns every ``left`` column plus ``match_<c>`` for each payload
    column and ``match_ts``.  Ties on right ``ts`` are broken by the
    highest ``tiebreak`` value (required for determinism when right
    timestamps can repeat per key; defaults to the first payload col).

    how='inner' drops left rows with no preceding right row;
    how='left' keeps them with null matches.
    """
    right_payload = right_payload or []
    tiebreak = tiebreak or (right_payload[0] if right_payload else ts)
    left_cols = left.columns

    r = right.select(
        F.col(on),
        F.col(ts).alias("_ats"),
        F.lit(0).alias("_side"),
        F.col(tiebreak).alias("_tie"),
        F.struct(F.col(ts).alias("match_ts"), *[F.col(c).alias(f"match_{c}") for c in right_payload]).alias("_m"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c != on],
    )
    l = left.select(
        F.col(on),
        F.col(ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("_tie"),
        F.lit(None).cast(r.schema["_m"].dataType).alias("_m"),
        *[F.col(c) for c in left_cols if c != on],
    )
    # right rows sort before left at equal ts (inclusive bound); among
    # equal right ts the tiebreak column's max wins via last().
    w = (
        Window.partitionBy(on)
        .orderBy("_ats", "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        r.unionByName(l)
        .withColumn("_best", F.last("_m", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if how == "inner":
        matched = matched.filter(F.col("_best").isNotNull())
    return matched.select(
        on,
        *[c for c in left_cols if c != on],
        F.col("_best.match_ts").alias("match_ts"),
        *[F.col(f"_best.match_{c}").alias(f"match_{c}") for c in right_payload],
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    bucket_seconds: int = 3600,
    how: str = "left",
) -> DataFrame:
    """Point-in-interval join via bucket equi-join + residual filter.

    Interval semantics: start inclusive, end exclusive.  Each point has
    exactly one bucket, so no post-join dedup is needed.  Returns
    interval columns + point columns (point columns null for unmatched
    intervals under how='left').
    """
    p = points.withColumn(
        "_bkt", F.floor(F.unix_timestamp(F.col(point_ts)) / bucket_seconds)
    ).alias("_p")
    iv = intervals.withColumn(
        "_bkt",
        # end bucket is a safe over-approximation (unix_timestamp truncates
        # sub-seconds); the residual filter removes boundary false matches
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start)) / bucket_seconds),
                F.floor(F.unix_timestamp(F.col(end)) / bucket_seconds),
            )
        ),
    ).alias("_iv")
    cond = (
        (F.col("_iv._bkt") == F.col("_p._bkt"))
        & (F.col(f"_p.{point_ts}") >= F.col(f"_iv.{start}"))
        & (F.col(f"_p.{point_ts}") < F.col(f"_iv.{end}"))
    )
    joined = iv.join(p, cond, how)
    return joined.select(
        *[F.col(f"_iv.{c}") for c in intervals.columns],
        *[F.col(f"_p.{c}") for c in points.columns],
    )
