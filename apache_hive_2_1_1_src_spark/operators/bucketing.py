"""Hive-bucket-file compatibility: write bucketed tables whose on-disk
layout (bucket count, file naming, key→file assignment) matches what
Hive 2.1 produces, and read them back with file-level bucket pruning.

Reference semantics being re-expressed:

* ``serde/src/java/org/apache/hadoop/hive/serde2/objectinspector/
  ObjectInspectorUtils.java`` — ``hashCode()``: identity for int-likes,
  ``(int)(v ^ (v >>> 32))`` for bigint, ``v ? 1 : 0`` for boolean, and
  the 31-polynomial Text hash for strings (== Java ``String.hashCode``
  on ASCII); multi-column keys combine as ``31*h + h_i``.
* ``ObjectInspectorUtils.getBucketNumber`` — bucket =
  ``(hash & Integer.MAX_VALUE) % numBuckets`` (mask, NOT pmod: Hive
  masks the sign bit first, which differs from pmod for negative
  hashes).
* ``ql/src/java/org/apache/hadoop/hive/ql/exec/Utilities.java``
  ``getBucketIdFromFile`` — bucket files are named ``000000_0``,
  ``000001_0``, … (6-digit bucket id + attempt suffix); readers map
  file name → bucket id positionally.

SURVEY §1.4 notes Spark's ``bucketBy`` writes murmur3 buckets that Hive
cannot read as bucketed; this module closes that gap WITHOUT touching
``bucketBy``: it computes Hive's bucket id as a JVM-side expression,
shuffles once on it (each bucket lands wholly in one task), writes via
``partitionBy`` into a staging dir, and renames each bucket's single
file into the flat Hive layout.  Empty buckets get schema-valid empty
parquet files, preserving the positional file↔bucket mapping Hive's
bucket map-join relies on.

100 TB: the write is one hash shuffle on the bucket id (identical cost
to any bucketed write); a pruned point-read opens exactly ONE file of
the table regardless of table size — the same 1/N I/O Hive's
TABLESAMPLE(BUCKET x OUT OF N) and bucket map-join get.  String hashing
uses the per-char aggregate (whole-stage codegen, no Python); non-ASCII
strings are rejected loudly rather than silently mis-bucketed (Text
hashes UTF-8 bytes; the char aggregate only equals it for ASCII).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INT_MAX = 2147483647


def _wrap32(c: Column) -> Column:
    """Java int overflow semantics for a long-valued expression."""
    return c.cast("int")


def hive_hash_col(df: DataFrame, col: str) -> Column:
    """ObjectInspectorUtils.hashCode as a codegen-friendly expression,
    dispatched on the column's Spark type."""
    dt = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
        h = c.cast("int")
    elif isinstance(dt, T.LongType):
        h = _wrap32(c.bitwiseXOR(F.shiftrightunsigned(c, 32)))
    elif isinstance(dt, T.BooleanType):
        h = F.when(c, F.lit(1)).otherwise(F.lit(0))
    elif isinstance(dt, T.StringType):
        # Java String.hashCode == Hive Text hash on ASCII; guard non-ASCII
        h = F.aggregate(
            F.split(c, ""),
            F.lit(0),
            lambda acc, ch: _wrap32(acc * F.lit(31) + F.ascii(ch)),
        )
    else:
        raise TypeError(f"unsupported bucket key type for {col}: {dt}")
    return F.when(c.isNull(), F.lit(0)).otherwise(h)


def hive_bucket_id(df: DataFrame, cols: list[str], num_buckets: int) -> Column:
    """``(31-combined hash & Integer.MAX_VALUE) % n`` — the exact
    getBucketNumber arithmetic (mask then mod, not pmod)."""
    h: Column = F.lit(0)
    for c in cols:
        h = _wrap32(h * F.lit(31) + hive_hash_col(df, c))
    return h.bitwiseAND(F.lit(_INT_MAX)) % F.lit(num_buckets)


def java_string_hashcode(s: str) -> int:
    """Driver-side mirror of Java String.hashCode (ASCII), for planning
    pruned reads of string-keyed tables."""
    if any(ord(ch) > 127 for ch in s):
        raise ValueError("non-ASCII bucket keys unsupported (Text hashes UTF-8 bytes)")
    h = 0
    for ch in s:
        h = (31 * h + ord(ch)) & 0xFFFFFFFF
    return h - 0x100000000 if h >= 0x80000000 else h


def _hash_literal(v, typ: str) -> int:
    """ObjectInspectorUtils.hashCode of one literal, by COLUMN type —
    the type matters: Long.hashCode folds high into low bits, so e.g.
    hash(-1 as bigint) is 0 while hash(-1 as int) is -1."""
    if v is None:
        return 0
    if typ == "boolean":
        return 1 if v else 0
    if typ == "int":
        return int(v)
    if typ == "bigint":
        x = int(v) & 0xFFFFFFFFFFFFFFFF
        hv = (x ^ (x >> 32)) & 0xFFFFFFFF
        return hv - 0x100000000 if hv >= 0x80000000 else hv
    if typ == "string":
        return java_string_hashcode(v)
    raise TypeError(f"unsupported bucket key type: {typ}")


def _default_type(v) -> str:
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "bigint"  # parquet integer keys are usually int64
    if isinstance(v, str):
        return "string"
    raise TypeError(f"unsupported bucket key literal: {type(v)}")


def hive_bucket_of(
    values: list, num_buckets: int, types: list[str] | None = None
) -> int:
    """Driver-side bucket id for a literal key tuple.  ``types`` entries
    are 'int' | 'bigint' | 'string' | 'boolean'; unspecified ints are
    treated as bigint (the common parquet key type)."""
    types = types or [_default_type(v) for v in values]
    h = 0
    for v, typ in zip(values, types):
        h = (31 * h + _hash_literal(v, typ)) & 0xFFFFFFFF
        h = h - 0x100000000 if h >= 0x80000000 else h
    return (h & _INT_MAX) % num_buckets


def bucket_file(b: int) -> str:
    """Hive bucket file name (Utilities.getBucketIdFromFile inverse)."""
    return f"{b:06d}_0"


def hive_bucketed_write(
    df: DataFrame, path: str, key_cols: list[str], num_buckets: int
) -> None:
    """Write ``df`` as a Hive-layout bucketed table at ``path``: flat
    directory of ``000000_0 … 00000N_0`` parquet files where file i
    holds exactly the rows Hive would put in bucket i.

    One shuffle on the Hive bucket id (so each bucket is one task →
    one file), then a constant-count rename pass (metadata-only moves,
    no data rewrite — same cost on HDFS/S3A committers)."""
    spark = df.sparkSession
    staging = path.rstrip("/") + ".__staging__"
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(path, ignore_errors=True)
    bid = hive_bucket_id(df, key_cols, num_buckets)
    (
        df.withColumn("_hive_bucket", bid)
        .repartition(num_buckets, "_hive_bucket")
        .write.partitionBy("_hive_bucket")
        .mode("overwrite")
        .parquet(staging)
    )
    os.makedirs(path)
    empty = None
    for b in range(num_buckets):
        parts = glob.glob(os.path.join(staging, f"_hive_bucket={b}", "part-*.parquet"))
        if len(parts) > 1:  # one bucket == one partition == one file
            raise RuntimeError(f"bucket {b} split across {len(parts)} files")
        if parts:
            shutil.move(parts[0], os.path.join(path, bucket_file(b)))
        else:
            # Hive writes schema-valid empty files for empty buckets so
            # positional file↔bucket mapping survives
            if empty is None:
                edir = staging + ".empty"
                df.limit(0).coalesce(1).write.mode("overwrite").parquet(edir)
                empty = glob.glob(os.path.join(edir, "part-*.parquet"))[0]
            shutil.copy(empty, os.path.join(path, bucket_file(b)))
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(staging + ".empty", ignore_errors=True)
    _ = spark  # session retained for API symmetry / future FS handles


def read_bucketed(spark: SparkSession, path: str) -> DataFrame:
    """Full-table read of a Hive-layout bucketed dir, with the bucket id
    recovered from the file name (Utilities.getBucketIdFromFile)."""
    files = sorted(glob.glob(os.path.join(path, "*_0")))
    return (
        spark.read.parquet(*files)
        .withColumn(
            "_hive_bucket",
            F.regexp_extract(F.input_file_name(), r"(\d{6})_\d+$", 1).cast("int"),
        )
    )


def bucket_pruned_read(
    spark: SparkSession, path: str, key_cols: list[str], num_buckets: int, key_values: list
) -> DataFrame:
    """Point/key read that opens exactly ONE bucket file — the I/O shape
    of Hive's bucket map-join probe and TABLESAMPLE(BUCKET x OUT OF N):
    1/N of the table regardless of scale.  Key types come from the
    table's own schema (a footer-only read of bucket file 0), so the
    literal hash always matches what the writer computed."""
    schema = spark.read.parquet(os.path.join(path, bucket_file(0))).schema
    _SPARK_TO_HIVE = {
        T.ByteType: "int",
        T.ShortType: "int",
        T.IntegerType: "int",
        T.LongType: "bigint",
        T.BooleanType: "boolean",
        T.StringType: "string",
    }
    types = [_SPARK_TO_HIVE[type(schema[c].dataType)] for c in key_cols]
    b = hive_bucket_of(key_values, num_buckets, types)
    df = spark.read.parquet(os.path.join(path, bucket_file(b)))
    cond = F.lit(True)
    for c, v in zip(key_cols, key_values):
        cond = cond & (F.col(c) == F.lit(v))
    return df.filter(cond)
