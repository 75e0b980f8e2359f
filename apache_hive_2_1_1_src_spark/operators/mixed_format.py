"""Per-partition storage formats — Hive's partition-level
StorageDescriptor.

In Hive every partition carries its OWN StorageDescriptor (metastore
Partition.sd — hive_metastore.thrift Partition struct), so ``ALTER TABLE
... SET FILEFORMAT`` (alter_file_format.q; DDLSemanticAnalyzer
analyzeAlterTableFileFormat) changes only partitions written AFTERWARD,
and one table legitimately mixes TEXTFILE / SEQUENCEFILE / PARQUET
partitions (exercised by diff_part_input_formats.q and
partition_wise_fileformat*.q — the reader picks each partition's
InputFormat from its SD).

Spark's catalog holds one format per table, so this module keeps the
metastore's per-partition SD as a manifest JSON next to the table root
(the Thrift Partition.sd equivalent) and plans reads as a UNION of
format-native readers, each reader scoped to exactly the directories of
its format.

Scale design: the union is metadata-only — each branch is that format's
native pushdown-capable scan over only its own partition directories
(one branch per FORMAT, not per partition, so the plan stays O(formats)
deep); a point read of one partition opens a single directory with the
single right reader (no manifest scan of the others).  Column pruning
and predicate pushdown still reach the parquet branches; text branches
read only their own files.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_2_1_1_src_spark.io import (
    read_hive_sequencefile,
    read_hive_text,
    write_hive_sequencefile,
    write_hive_text,
)

_FORMATS = ("textfile", "parquet", "sequencefile")


class MixedFormatTable:
    """A partitioned table whose partitions may use different storage
    formats — the Partition.sd emulation."""

    def __init__(self, root: str, part_col: str, schema: str):
        self.root = root
        self.part_col = part_col
        self.schema = schema  # DDL string of the NON-partition columns
        os.makedirs(root, exist_ok=True)
        if not os.path.exists(self._manifest_path):
            self._save({"default": "textfile", "partitions": {}})

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_sd_manifest.json")

    def _load(self) -> dict:
        with open(self._manifest_path) as f:
            return json.load(f)

    def _save(self, m: dict) -> None:
        with open(self._manifest_path, "w") as f:
            json.dump(m, f)

    def set_fileformat(self, fmt: str) -> None:
        """ALTER TABLE ... SET FILEFORMAT: changes the table-level SD —
        only partitions written afterward pick it up (existing
        partitions keep their own SD, exactly Hive's contract)."""
        fmt = fmt.lower()
        if fmt not in _FORMATS:
            raise ValueError(f"unsupported STORED AS format: {fmt}")
        m = self._load()
        m["default"] = fmt
        self._save(m)

    def partition_format(self, value: str) -> str | None:
        return self._load()["partitions"].get(str(value))

    def _part_dir(self, value: str) -> str:
        return os.path.join(self.root, f"{self.part_col}={value}")

    def write_partition(self, df: DataFrame, value: str) -> None:
        """INSERT OVERWRITE one partition in the CURRENT table-level
        format (FileSinkOperator consults the partition SD it creates)."""
        m = self._load()
        fmt = m["default"]
        path = self._part_dir(value)
        data = df.drop(self.part_col)
        if fmt == "textfile":
            write_hive_text(data, path)
        elif fmt == "sequencefile":
            write_hive_sequencefile(data, path)
        else:
            data.write.mode("overwrite").parquet(path)
        m["partitions"][str(value)] = fmt
        self._save(m)

    def read_partition(self, spark: SparkSession, value: str) -> DataFrame:
        """Point read: one directory, the one right reader — no other
        partition or format is touched."""
        fmt = self.partition_format(value)
        if fmt is None:
            raise ValueError(f"no such partition: {self.part_col}={value}")
        path = self._part_dir(str(value))
        if fmt == "textfile":
            df = read_hive_text(spark, path, self.schema)
        elif fmt == "sequencefile":
            df = read_hive_sequencefile(spark, path, self.schema)
        else:
            df = spark.read.schema(self.schema).parquet(path)
        return df.withColumn(self.part_col, F.lit(str(value)))

    def read(self, spark: SparkSession) -> DataFrame:
        """Full-table read: group partitions by format, one native reader
        per FORMAT over all of that format's directories, unioned — the
        plan depth is O(distinct formats), never O(partitions)."""
        m = self._load()
        by_fmt: dict[str, list[str]] = {}
        for value, fmt in sorted(m["partitions"].items()):
            by_fmt.setdefault(fmt, []).append(value)
        out: DataFrame | None = None
        for fmt, values in by_fmt.items():
            if fmt == "parquet":
                # ONE multi-directory scan; basePath makes Spark's file
                # index recover the hive-style partition column itself
                part = (
                    spark.read.schema(self.schema)
                    .option("basePath", self.root)
                    .parquet(*[self._part_dir(v) for v in values])
                    .withColumn(
                        self.part_col, F.col(self.part_col).cast("string")
                    )
                )
                out = part if out is None else out.unionByName(part)
                continue
            # text/sequencefile use the in-repo framing readers: one
            # reader per partition value, still one union BRANCH per
            # format family in the executed plan (Union flattens)
            for v in values:
                one = self.read_partition(spark, v)
                out = one if out is None else out.unionByName(one)
        return out
