"""Skew-aware join helpers.

Reference: SkewJoinHandler.java:344 + GenMRSkewJoinProcessor.java offload
runtime-detected skewed keys to a follow-up job; optimizer/SkewJoinOptimizer.java
does the compile-time split.  Spark-first, the primary answer is AQE's
skew-join splitting (enabled in the session preset — it re-plans oversized
shuffle partitions at runtime, subsuming both Hive mechanisms).

``salted_join`` is the explicit fallback for the one case AQE can't fix:
a *broadcast-ineligible* join where one hot key floods a single task and
splitting partitions doesn't help because the hot key still hashes to one
partition.  Salting fans the hot side out over ``salt`` sub-keys and
replicates the other side ``salt`` ways — shuffle volume × salt on the
small side buys parallelism ÷ salt on the hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    other_key: str | None = None,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted over ``salt`` sub-keys.

    Result equals ``skewed.join(other, skewed[key] == other[other_key], how)``
    for inner/left joins (verified in tests/test_skew.py); use only when the
    ``other`` side is too big to broadcast and AQE splitting is insufficient.
    """
    other_key = other_key or key
    salted_left = skewed.withColumn("_salt", (F.rand(seed=7) * salt).cast("int"))
    exploded_right = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    cond = (salted_left[key] == exploded_right[other_key]) & (
        salted_left["_salt"] == exploded_right["_salt"]
    )
    return salted_left.join(exploded_right, cond, how).drop("_salt")
