"""Table maintenance: small-file compaction.

Hive ships compaction for ACID tables (ql/txn/compactor/CompactorMR.java
— major compaction rewrites a partition's delta files into one base); at
100 TB the same problem appears for ANY ingest that commits per
micro-batch or per task: thousands of KB-sized parquet files per
partition turn every scan into a file-listing + task-scheduling
bottleneck.  This operator rewrites a dataset to size-targeted files:

* total bytes come from the filesystem (Hadoop FileSystem API, so the
  same code paths work on HDFS/S3A, not just local disk),
* output file count = ceil(total / target_file_bytes), applied with
  ``repartition(n)`` — one round-robin shuffle that also heals skewed
  input files, and
* the rewrite is offline/atomic in spirit: write to a fresh directory,
  then swap (the swap is the caller's move/rename, same contract as
  Hive's MoveTask after a compaction).

``coalesce(n)`` is deliberately NOT used: it folds the compaction into
upstream lineage without a shuffle, which caps read parallelism at n for
the whole job and inherits input skew; compaction wants the shuffle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def dir_bytes(spark: SparkSession, path: str) -> int:
    """Recursive byte size of a data directory via the Hadoop FS API."""
    jvm = spark._jvm  # noqa: SLF001
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    return fs.getContentSummary(hpath).getLength()


def compact_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Rewrite the parquet dataset at ``src`` into ``dest`` with
    size-targeted files; returns the compacted DataFrame (lazy reader
    over ``dest``)."""
    total = dir_bytes(spark, src)
    n = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(src).repartition(n).write.mode("overwrite").parquet(dest)
    return spark.read.parquet(dest)
