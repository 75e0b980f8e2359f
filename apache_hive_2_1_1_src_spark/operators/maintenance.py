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


def validate_constraints(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    constraints: list[dict],
) -> DataFrame:
    """Informational-constraint validation — the audit query behind Hive
    2.1's PRIMARY KEY / FOREIGN KEY DDL (HIVE-13290; metastore
    add_primary_key/add_foreign_key, metastore/if/hive_metastore.thrift).
    Hive stores these constraints as metadata without enforcement; the
    operational counterpart at 100 TB is a periodic violation audit, one
    row per declared constraint:

    * ``primary_key``:  duplicate-key count (groupBy key, count>1 — one
      shuffle, map-side partial agg)
    * ``foreign_key``:  orphan count (left-anti join child→parent; the
      parent key set is broadcast when dimension-sized)
    * ``not_null``:     null count (narrow aggregate, no shuffle)

    Returns (constraint_name, kind, violation_count).
    """
    from pyspark.sql import functions as F

    rows = []
    for c in constraints:
        kind = c["kind"]
        if kind == "primary_key":
            df = tables[c["table"]]
            v = (
                df.groupBy(*c["columns"])
                .count()
                .filter(F.col("count") > 1)
                .agg(F.coalesce(F.sum(F.col("count") - 1), F.lit(0)).alias("v"))
            )
        elif kind == "foreign_key":
            child = tables[c["table"]]
            parent = tables[c["ref_table"]]
            pk = parent.select(
                *[F.col(rc).alias(cc) for cc, rc in zip(c["columns"], c["ref_columns"])]
            ).distinct()
            # broadcast only when the caller says the parent key set is
            # dimension-sized (default True — fact-sized parents at scale
            # set False and let the planner pick a shuffled anti-join)
            if c.get("broadcast_parent", True):
                pk = F.broadcast(pk)
            # SQL MATCH SIMPLE: a child row with NULL in ANY FK column is
            # exempt, not an orphan
            all_non_null = F.lit(True)
            for col in c["columns"]:
                all_non_null = all_non_null & F.col(col).isNotNull()
            v = (
                child.join(pk, on=list(c["columns"]), how="left_anti")
                .filter(all_non_null)
                .agg(F.count(F.lit(1)).cast("long").alias("v"))
            )
        elif kind == "not_null":
            df = tables[c["table"]]
            v = df.agg(
                F.sum(F.col(c["columns"][0]).isNull().cast("long")).alias("v")
            )
        else:
            raise ValueError(f"unknown constraint kind: {kind}")
        rows.append(
            v.select(
                F.lit(c["name"]).alias("constraint_name"),
                F.lit(kind).alias("kind"),
                F.col("v").cast("long").alias("violation_count"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out
