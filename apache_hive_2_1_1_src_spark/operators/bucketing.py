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

Type coverage: int-family / bigint / boolean / string (ASCII) are pure
codegen; date (DateWritable.hashCode == daysSinceEpoch) is codegen via
datediff; double / float (IEEE-754 bit hashes — no Spark builtin
exposes the bits) and decimal (HiveDecimalWritable → normalized
BigDecimal.hashCode) go through Arrow-vectorized pandas UDFs, pinned
against literal values produced by an actual Java run of the same
arithmetic (tests/test_bucketing.py).  Anything else fails loudly.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INT_MAX = 2147483647
_JAVA_DOUBLE_NAN_BITS = 0x7FF8000000000000  # doubleToLongBits canonical NaN
_JAVA_FLOAT_NAN_BITS = 0x7FC00000  # floatToIntBits canonical NaN


def _wrap32(c: Column) -> Column:
    """Java int overflow semantics for a long-valued expression."""
    return c.cast("int")


def _to_signed32(h: int) -> int:
    h &= 0xFFFFFFFF
    return h - 0x100000000 if h >= 0x80000000 else h


def _java_bigint_hash(n: int) -> int:
    """java.math.BigInteger.hashCode: fold the big-endian 32-bit
    magnitude words with the 31 polynomial, then multiply by signum."""
    if n == 0:
        return 0
    sign = 1 if n > 0 else -1
    mag, words = abs(n), []
    while mag:
        words.append(mag & 0xFFFFFFFF)
        mag >>= 32
    h = 0
    for w in reversed(words):
        h = (31 * h + w) & 0xFFFFFFFF
    return _to_signed32(h * sign)


def _hive_decimal_parts(d) -> tuple[int, int]:
    """HiveDecimal normalization (storage-api/.../HiveDecimal.java:245
    trim): strip trailing zeros, no negative scale (5E+2 → scale 0),
    exact zero → (0, 0).  Returns (unscaledValue, scale)."""
    import decimal

    d = decimal.Decimal(d)
    if d == 0:
        return 0, 0
    t = d.normalize()
    sign, digits, exp = t.as_tuple()
    if exp > 0:  # stripTrailingZeros left a negative scale -> setScale(0)
        return int(t), 0
    unscaled = (-1 if sign else 1) * int("".join(map(str, digits)))
    return unscaled, -exp


def _java_bigdecimal_hash(unscaled: int, scale: int) -> int:
    """java.math.BigDecimal.hashCode = 31 * unscaled.hashCode() + scale
    (int wraparound) — what HiveDecimalWritable.hashCode bottoms out in."""
    return _to_signed32(31 * _java_bigint_hash(unscaled) + scale)


def _double_hash_udf():
    """Arrow-vectorized Double.hashCode ((int)((bits>>>32)^bits)) — no
    Spark builtin exposes IEEE-754 bits, so this is the one honest
    Python hop; numpy bit-views keep it batch-vectorized."""
    import numpy as np
    import pandas as pd

    def h(s):
        v = s.to_numpy(dtype=np.float64)
        bits = v.view(np.uint64).copy()
        bits[np.isnan(v)] = np.uint64(_JAVA_DOUBLE_NAN_BITS)
        out = ((bits >> np.uint64(32)) ^ bits).astype(np.uint32).view(np.int32)
        return pd.Series(out)

    return F.pandas_udf(h, "int")


def _float_hash_udf():
    """Arrow-vectorized Float.floatToIntBits."""
    import numpy as np
    import pandas as pd

    def h(s):
        v = s.to_numpy(dtype=np.float32)
        bits = v.view(np.uint32).copy()
        bits[np.isnan(v)] = np.uint32(_JAVA_FLOAT_NAN_BITS)
        return pd.Series(bits.view(np.int32))

    return F.pandas_udf(h, "int")


def _decimal_hash_udf():
    """HiveDecimalWritable.hashCode over a decimal column (Arrow batch
    transfer; per-value Python BigDecimal-hash arithmetic — decimal
    bucket keys are a cold write-path case)."""
    import pandas as pd

    def h(s):
        return s.map(
            lambda d: 0
            if d is None
            else _java_bigdecimal_hash(*_hive_decimal_parts(d))
        ).astype("int32")

    return F.pandas_udf(h, "int")


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
    elif isinstance(dt, T.DateType):
        # DateWritable.hashCode == daysSinceEpoch (serde2/io/DateWritable
        # .java:222) — pure codegen, no Python
        h = F.datediff(c, F.to_date(F.lit("1970-01-01")))
    elif isinstance(dt, T.DoubleType):
        h = _double_hash_udf()(c)
    elif isinstance(dt, T.FloatType):
        h = _float_hash_udf()(c)
    elif isinstance(dt, T.DecimalType):
        h = _decimal_hash_udf()(c)
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
    if typ == "date":
        import datetime as _dt

        if isinstance(v, _dt.datetime):
            v = v.date()
        return (v - _dt.date(1970, 1, 1)).days
    if typ == "double":
        import math
        import struct

        bits = (
            _JAVA_DOUBLE_NAN_BITS
            if math.isnan(v)
            else struct.unpack(">Q", struct.pack(">d", float(v)))[0]
        )
        return _to_signed32((bits >> 32) ^ bits)
    if typ == "float":
        import math
        import struct

        bits = (
            _JAVA_FLOAT_NAN_BITS
            if math.isnan(v)
            else struct.unpack(">I", struct.pack(">f", float(v)))[0]
        )
        return _to_signed32(bits)
    if typ == "decimal":
        return _java_bigdecimal_hash(*_hive_decimal_parts(v))
    raise TypeError(f"unsupported bucket key type: {typ}")


def _default_type(v) -> str:
    import datetime as _dt
    import decimal as _decimal

    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "bigint"  # parquet integer keys are usually int64
    if isinstance(v, str):
        return "string"
    if isinstance(v, float):
        return "double"
    if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
        return "date"
    if isinstance(v, _decimal.Decimal):
        return "decimal"
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
        T.DateType: "date",
        T.DoubleType: "double",
        T.FloatType: "float",
        T.DecimalType: "decimal",
    }
    types = [_SPARK_TO_HIVE[type(schema[c].dataType)] for c in key_cols]
    b = hive_bucket_of(key_values, num_buckets, types)
    df = spark.read.parquet(os.path.join(path, bucket_file(b)))
    cond = F.lit(True)
    for c, v in zip(key_cols, key_values):
        cond = cond & (F.col(c) == F.lit(v))
    return df.filter(cond)
