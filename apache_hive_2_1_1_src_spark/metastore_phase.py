"""Persistent-metastore demo phases, each run in its OWN JVM/process.

The reference keeps a central catalog that outlives any client session
(HiveMetaStore.java; Thrift ``Table`` struct
metastore/if/hive_metastore.thrift:294): databases, tables and
partition lists registered once are visible to every later session.
Spark's equivalent is ``enableHiveSupport()`` backed by an embedded
Derby metastore — catalog state lands in a Derby database on disk, so a
brand-new SparkSession (new JVM, no temp views, nothing registered)
can ``spark.table(...)`` / ``SHOW PARTITIONS`` what an earlier session
created.

Because one JVM cannot host two SparkContexts, the kill-and-rebuild
proof runs as two subprocesses of this module:

* ``create``: CREATE DATABASE + a lang-partitioned managed table loaded
  from the documents parquet, then exit (JVM dies, in-memory state gone).
* ``read``: fresh JVM, same Derby path — list SHOW PARTITIONS and count
  rows per partition via ``spark.table``, writing the result to parquet
  for the caller (q169) to return.  Everything it sees comes from the
  persisted catalog, not session state.
"""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DB = "md_db"
TABLE = f"{DB}.docs_part"


def _hive_session(base: str) -> SparkSession:
    derby = os.path.join(base, "metastore_db")
    return (
        SparkSession.builder.master("local[2]")
        .appName("metastore-phase")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", os.path.join(base, "warehouse"))
        .config(
            "javax.jdo.option.ConnectionURL",
            f"jdbc:derby:;databaseName={derby};create=true",
        )
        .config(
            "spark.driver.extraJavaOptions",
            f"-Dderby.stream.error.file={os.path.join(base, 'derby.log')}",
        )
        .enableHiveSupport()
        .getOrCreate()
    )


def phase_create(base: str, sf_dir: str) -> None:
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    spark = _hive_session(base)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {DB}")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    (
        docs.select("doc_id", "source", "n_chars", "lang")
        .write.mode("overwrite")
        .partitionBy("lang")
        .format("parquet")
        .saveAsTable(TABLE)
    )
    spark.stop()


def phase_read(base: str) -> None:
    spark = _hive_session(base)
    parts = spark.sql(f"SHOW PARTITIONS {TABLE}").select(
        F.col("partition").alias("part")
    )
    counts = (
        spark.table(TABLE)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("chars_total"))
    )
    result = parts.join(
        counts, parts.part == F.concat(F.lit("lang="), counts.lang)
    ).select("part", "n_docs", "chars_total")
    result.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "result")
    )
    spark.stop()


def main() -> None:
    phase = sys.argv[1]
    base = sys.argv[2]
    if phase == "create":
        phase_create(base, sys.argv[3])
    elif phase == "read":
        phase_read(base)
    else:
        raise SystemExit(f"unknown phase {phase!r}")


if __name__ == "__main__":
    main()
