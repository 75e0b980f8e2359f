"""Pure-Python Avro Object Container File reader/writer, distributed
through Spark — real Avro IO for environments without the external
spark-avro connector jar.

Parity target: the reference's AvroSerDe
(serde/src/java/org/apache/hadoop/hive/serde2/avro/AvroSerDe.java:1,
AvroSerializer/AvroDeserializer) — Hive tables stored as Avro container
files.  Spark's own connector is an external module; this container
cannot fetch it, so the encode/decode here is implemented from the
public Avro 1.x specification (container-file magic, metadata map,
zigzag-varint primitives, sync-marked blocks).  The files it writes are
valid per the OFFICIAL Apache Avro Java library — the Spark classpath
ships avro-1.12.1, and tests/test_avro.py reads our output back through
``org.apache.avro.file.DataFileReader`` over py4j to prove
cross-implementation compatibility.

Distribution model (the part that must scale):

* **write**: ``mapInPandas`` over the source DataFrame — each Arrow
  batch stream (one task per input partition) encodes its rows and
  writes one ``part-*.avro`` container file, returning a one-row
  manifest (path, n_records).  No driver-side data movement; the
  manifest is the only thing collected.
* **read**: ``spark.read.format("binaryFile")`` lists and splits the
  files across tasks; ``mapInPandas`` decodes each container into
  typed rows.  Avro container files are block-splittable in principle;
  file-granularity parallelism matches what Hive's AvroContainerInput-
  Format achieves per split at these file sizes.

Schema subset: flat records of long/int/double/float/boolean/string/
bytes, nullable via ``["null", T]`` unions — the shapes the TPC-H-ish
tables need; nested types raise loudly rather than mis-encode.
"""

from __future__ import annotations

import io
import json
import os
import struct
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"Obj\x01"

_SPARK_TO_AVRO = {
    T.LongType: "long",
    T.IntegerType: "int",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.BooleanType: "boolean",
    T.StringType: "string",
    T.BinaryType: "bytes",
}


def _plain_type(t) -> str:
    """Primitive type name of a field type that may be a ["null", T]
    optional union."""
    if isinstance(t, list):
        return next(x for x in t if x != "null")
    return t


def spark_schema_to_avro(schema: T.StructType, name: str = "row") -> dict:
    """Map a flat Spark schema to an Avro record schema (nullable fields
    become ``["null", T]`` unions, Avro's idiom for optional)."""
    fields = []
    for f in schema.fields:
        avro_type = None
        for spark_t, avro_t in _SPARK_TO_AVRO.items():
            if isinstance(f.dataType, spark_t):
                avro_type = avro_t
                break
        if avro_type is None:
            raise TypeError(
                f"avro_io supports flat primitive schemas; field {f.name!r} "
                f"has {f.dataType.simpleString()}"
            )
        fields.append(
            {"name": f.name, "type": ["null", avro_type] if f.nullable else avro_type}
        )
    return {"type": "record", "name": name, "fields": fields}


# ---- primitive codec (Avro spec: binary encoding) ----


def _write_long(buf: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _read_long(buf: io.BufferedReader) -> int:
    shift, acc = 0, 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


def _write_bytes(buf: io.BytesIO, data: bytes) -> None:
    _write_long(buf, len(data))
    buf.write(data)


def _read_bytes(buf: io.BufferedReader) -> bytes:
    return buf.read(_read_long(buf))


def _encode_value(buf: io.BytesIO, avro_type, value) -> None:
    if isinstance(avro_type, list):  # ["null", T] union
        if value is None:
            _write_long(buf, 0)
            return
        _write_long(buf, 1)
        avro_type = avro_type[1]
    if avro_type in ("long", "int"):
        _write_long(buf, int(value))
    elif avro_type == "double":
        buf.write(struct.pack("<d", float(value)))
    elif avro_type == "float":
        buf.write(struct.pack("<f", float(value)))
    elif avro_type == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif avro_type == "string":
        _write_bytes(buf, str(value).encode("utf-8"))
    elif avro_type == "bytes":
        _write_bytes(buf, bytes(value))
    else:
        raise TypeError(f"unsupported avro type {avro_type!r}")


def _decode_value(buf: io.BufferedReader, avro_type):
    if isinstance(avro_type, list):
        if _read_long(buf) == 0:
            return None
        avro_type = avro_type[1]
    if avro_type in ("long", "int"):
        return _read_long(buf)
    if avro_type == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if avro_type == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if avro_type == "boolean":
        return buf.read(1) == b"\x01"
    if avro_type == "string":
        return _read_bytes(buf).decode("utf-8")
    if avro_type == "bytes":
        return _read_bytes(buf)
    raise TypeError(f"unsupported avro type {avro_type!r}")


# ---- container file (Avro spec: object container files) ----


def encode_container(rows: Iterator[tuple], avro_schema: dict, sync: bytes) -> bytes:
    """One Avro container file as bytes: header (magic, metadata map with
    avro.schema/avro.codec, sync marker) + one data block per call batch."""
    assert len(sync) == 16
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(avro_schema).encode(),
        "avro.codec": b"null",
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)  # end of metadata map
    out.write(sync)

    types = [f["type"] for f in avro_schema["fields"]]
    block = io.BytesIO()
    n = 0
    for row in rows:
        for avro_type, value in zip(types, row):
            _encode_value(block, avro_type, value)
        n += 1
    if n:
        _write_long(out, n)
        _write_bytes(out, block.getvalue())
        out.write(sync)
    return out.getvalue()


def decode_container(data: bytes) -> tuple[dict, list[tuple]]:
    """Parse one container file → (avro schema, rows).  Handles the null
    and deflate codecs (raw DEFLATE per the Avro spec — the reference's
    own doctors.avro fixture is deflate-compressed) and the full type
    lattice via _read_datum: records, arrays, maps, enums, fixed,
    arbitrary unions, and decimal/date/timestamp logical types
    (serde2/avro/AvroDeserializer.java is the parity target)."""
    import zlib

    buf = io.BufferedReader(io.BytesIO(data))
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        count = _read_long(buf)
        if count == 0:
            break
        if count < 0:  # negative count: abs items, preceded by block size
            _read_long(buf)
            count = -count
        for _ in range(count):
            key = _read_bytes(buf).decode()
            meta[key] = _read_bytes(buf)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b"", b"deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    sync = buf.read(16)
    named: dict[str, dict] = {}
    _register_named(schema, named)
    rows: list[tuple] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, os.SEEK_CUR)
        n = _read_long(buf)
        payload = _read_bytes(buf)
        if codec == b"deflate":
            # spec: raw DEFLATE stream, no zlib header (wbits=-15)
            payload = zlib.decompress(payload, -15)
        block = io.BufferedReader(io.BytesIO(payload))
        for _ in range(n):
            rec = _read_datum(block, schema, named)
            rows.append(tuple(rec[f["name"]] for f in schema["fields"]))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch — corrupt container")
    return schema, rows


def _register_named(schema, named: dict) -> None:
    """Collect named types (record/enum/fixed) so later references by
    name resolve (Avro spec: named type definitions are usable as type
    references after first definition)."""
    if isinstance(schema, list):
        for s in schema:
            _register_named(s, named)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    if t in ("record", "enum", "fixed"):
        name = schema.get("name")
        ns = schema.get("namespace")
        if name:
            named[name] = schema
            if ns:
                named[f"{ns}.{name}"] = schema
    if t == "record":
        for f in schema.get("fields", []):
            _register_named(f.get("type"), named)
    elif t == "array":
        _register_named(schema.get("items"), named)
    elif t == "map":
        _register_named(schema.get("values"), named)


def _logical(schema: dict, raw):
    """Apply a logical-type annotation to a decoded raw value
    (AvroSerDe's decimal/date/timestamp-millis handling; dec_old.avro
    carries precision/scale as STRINGS — Hive accepts both)."""
    import datetime
    import decimal

    lt = schema.get("logicalType")
    if lt == "decimal" and isinstance(raw, (bytes, bytearray)):
        scale = int(schema.get("scale", 0))
        unscaled = int.from_bytes(bytes(raw), "big", signed=True)
        return decimal.Decimal(unscaled).scaleb(-scale)
    if lt == "date" and isinstance(raw, int):
        return datetime.date(1970, 1, 1) + datetime.timedelta(days=raw)
    if lt in ("timestamp-millis", "timestamp-micros") and isinstance(raw, int):
        # Build a timezone-aware UTC instant: Spark interprets NAIVE
        # datetimes in the session timezone, which would shift the stored
        # instant by the zone offset vs AvroDeserializer's
        # ``new Timestamp(millis)`` when the session is not UTC.
        div = 1_000 if lt == "timestamp-millis" else 1_000_000
        micros = raw * (1_000_000 // div)
        epoch = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
        return epoch + datetime.timedelta(microseconds=micros)
    return raw


def _read_datum(buf, schema, named: dict):
    """Decode one value of any Avro schema node → Python object
    (records as dicts, arrays as lists, maps as dicts)."""
    if isinstance(schema, str):
        if schema in named:
            return _read_datum(buf, named[schema], named)
        if schema == "null":
            return None
        return _decode_value(buf, schema)
    if isinstance(schema, list):  # union: branch index then datum
        idx = _read_long(buf)
        return _read_datum(buf, schema[idx], named)
    t = schema["type"]
    if isinstance(t, (dict, list)):  # {"type": {...nested...}}
        return _read_datum(buf, t, named)
    if t == "record":
        return {
            f["name"]: _read_datum(buf, f["type"], named)
            for f in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                _read_long(buf)  # block byte size (skippable form)
                n = -n
            for _ in range(n):
                out.append(_read_datum(buf, schema["items"], named))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _read_datum(buf, schema["values"], named)
        return out
    if t == "enum":
        return schema["symbols"][_read_long(buf)]
    if t == "fixed":
        raw = buf.read(int(schema["size"]))
        return _logical(schema, raw)
    return _logical(schema, _decode_value(buf, t))


# ---- Avro schema → Hive/Spark types (SchemaToTypeInfo.java parity) ----


def avro_to_hive_type(schema) -> str:
    """One Avro schema node → the Hive type string AvroSerDe infers
    (serde2/avro/SchemaToTypeInfo.java): unions with null unwrap to the
    non-null branch, enum→string, fixed→binary, logical decimal/date/
    timestamp-millis map to their Hive types."""
    if isinstance(schema, str):
        return {
            "null": "void",
            "boolean": "boolean",
            "int": "int",
            "long": "bigint",
            "float": "float",
            "double": "double",
            "bytes": "binary",
            "string": "string",
        }.get(schema, "string")
    if isinstance(schema, list):
        branches = [s for s in schema if s != "null"]
        if len(branches) == 1:
            return avro_to_hive_type(branches[0])
        # multi-branch union: Hive makes a uniontype (no Spark
        # equivalent); follow the spark-avro connector's public
        # convention instead — struct<member0:..,member1:..> — so the
        # DDL stays creatable (avro_schema_literal.q)
        inner = ",".join(
            f"member{i}:{avro_to_hive_type(b)}"
            for i, b in enumerate(branches)
        )
        return f"struct<{inner}>"
    t = schema.get("type")
    if isinstance(t, (dict, list)):
        return avro_to_hive_type(t)
    lt = schema.get("logicalType")
    if lt == "decimal":
        p = int(schema.get("precision", 10))
        s = int(schema.get("scale", 0))
        return f"decimal({p},{s})"
    if lt == "date":
        return "date"
    if lt in ("timestamp-millis", "timestamp-micros"):
        return "timestamp"
    if t == "record":
        inner = ",".join(
            f"{f['name']}:{avro_to_hive_type(f['type'])}"
            for f in schema["fields"]
        )
        return f"struct<{inner}>"
    if t == "array":
        return f"array<{avro_to_hive_type(schema['items'])}>"
    if t == "map":
        return f"map<string,{avro_to_hive_type(schema['values'])}>"
    if t == "enum":
        return "string"
    if t == "fixed":
        return "binary"
    return avro_to_hive_type(t)


def avro_default(field: dict):
    """Reader-schema default for a field absent from the writer
    (Avro spec schema resolution; avro_add_column's 'fishfingers and
    custard')."""
    if "default" not in field:
        return None
    d = field["default"]
    return d if d != "null" else None


def read_avro_resolved(spark: SparkSession, path: str, schema: T.StructType,
                       reader_schema: dict | None = None) -> DataFrame:
    """Distributed Avro container read resolved to a TABLE schema:
    binaryFile lists/distributes the files; each task decodes its
    containers with the embedded WRITER schema, then maps writer fields
    to the table's columns by (lowercased) name — a reader column the
    writer lacks takes the reader-schema default (schema evolution,
    avro_add_column.q), extra writer fields are dropped.  Values convert
    via createDataFrame-compatible Python objects against the declared
    Spark schema (decimals/dates/timestamps arrive as their Python
    types from _logical)."""
    import pandas as pd

    cols = [f.name for f in schema.fields]
    # a DECLARED decimal scale narrower than the writer's rescales with
    # HALF_UP (HiveDecimal.enforcePrecisionScale — avro_decimal.q reads
    # a scale-2 file as decimal(4,1) and the golden shows 234.79→234.8)
    dec_scale = {
        f.name: f.dataType.scale
        for f in schema.fields
        if isinstance(f.dataType, T.DecimalType)
    }
    defaults = {}
    if reader_schema:
        for f in reader_schema.get("fields", []):
            defaults[f["name"].lower()] = avro_default(f)

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import decimal

        def fit(c: str, vals: list) -> list:
            if c not in dec_scale:
                return vals
            q = decimal.Decimal(1).scaleb(-dec_scale[c])
            return [
                None
                if v is None
                else decimal.Decimal(v).quantize(
                    q, rounding=decimal.ROUND_HALF_UP
                )
                for v in vals
            ]

        for pdf in batches:
            for content in pdf["content"]:
                w_schema, tuples = decode_container(bytes(content))
                w_names = [f["name"].lower() for f in w_schema["fields"]]
                idx = {n: i for i, n in enumerate(w_names)}
                data = {}
                for c in cols:
                    ci = idx.get(c.lower())
                    if ci is None:
                        dflt = defaults.get(c.lower())
                        data[c] = [dflt] * len(tuples)
                    else:
                        data[c] = fit(c, [r[ci] for r in tuples])
                yield pd.DataFrame(data, columns=cols)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*")
        .load(path)
    )
    # mapInPandas carries Python objects through Arrow per the DECLARED
    # Spark schema — nested array/map/struct columns included
    return files.select("content").mapInPandas(decode, schema)


# ---- Spark integration ----


def write_avro(df: DataFrame, path: str) -> int:
    """Distributed Avro write: one container file per input partition via
    mapInPandas (Arrow batches → encoded rows, written task-side).
    Returns the total record count from the collected manifest (the only
    driver-side data)."""
    import pandas as pd

    os.makedirs(path, exist_ok=True)
    avro_schema = spark_schema_to_avro(df.schema)
    binary_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.BinaryType)
    ]
    # Arrow→pandas turns a nullable int64 batch into float64 (silently
    # corrupting longs above 2^53) and folds genuine NaN doubles into
    # null.  Counter both BEFORE the bridge: integers travel as exact
    # decimal strings; float/double columns get a companion isNull flag
    # so NaN-the-value survives distinct from null.
    int_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.LongType, T.IntegerType))
    ]
    float_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.DoubleType, T.FloatType))
    ]
    proj = df
    for c in int_cols:
        proj = proj.withColumn(c, F.col(c).cast("string"))
    flag_of = {c: f"__isnull__{c}" for c in float_cols}
    for c, flag in flag_of.items():
        proj = proj.withColumn(flag, F.col(c).isNull())
    data_cols = [f.name for f in df.schema.fields]

    def write_partition(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows: list[tuple] = []
        for pdf in batches:
            out = {}
            for col in data_cols:
                if col in binary_cols:
                    out[col] = [
                        None if v is None else bytes(v) for v in pdf[col]
                    ]
                elif col in int_cols:  # exact decimal strings → int
                    out[col] = [
                        None if v is None else int(v)
                        for v in pdf[col].astype(object).where(
                            pdf[col].notna(), None
                        )
                    ]
                elif col in float_cols:  # flag distinguishes null from NaN
                    out[col] = [
                        None if isnull else float(v)
                        for v, isnull in zip(pdf[col], pdf[flag_of[col]])
                    ]
                else:
                    out[col] = list(
                        pdf[col].astype(object).where(pdf[col].notna(), None)
                    )
            rows.extend(zip(*[out[c] for c in data_cols]))
        # deterministic sync marker per file (spec requires 16 bytes;
        # randomness is not required, only consistency within the file)
        import hashlib

        sync = hashlib.md5(f"sync-{pid}-{len(rows)}".encode()).digest()
        data = encode_container(iter(rows), avro_schema, sync)
        out = os.path.join(path, f"part-{pid:05d}.avro")
        with open(out, "wb") as fh:
            fh.write(data)
        yield pd.DataFrame({"path": [out], "n_records": [len(rows)]})

    manifest = proj.mapInPandas(write_partition, "path string, n_records long")
    return sum(r.n_records for r in manifest.collect())


def read_avro(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Distributed Avro read: binaryFile source lists/distributes the
    container files, mapInPandas decodes each into typed rows.  The
    caller-declared read schema is validated against every file's
    embedded writer schema (name + type per field), Hive-style
    schema-on-read."""
    import pyarrow as pa

    expected = spark_schema_to_avro(schema)["fields"]
    _ARROW = {
        "long": pa.int64(),
        "int": pa.int32(),
        "double": pa.float64(),
        "float": pa.float32(),
        "boolean": pa.bool_(),
        "string": pa.string(),
        "bytes": pa.binary(),
    }
    pa_types = [_ARROW[_plain_type(f["type"])] for f in expected]
    cols = [f.name for f in schema.fields]

    # mapInArrow, not mapInPandas: building arrays from Python lists with
    # explicit arrow types keeps NaN a VALUE and None a null — the
    # pandas bridge would fold NaN doubles into nulls on the way back
    def decode(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            for content in batch.column("content"):
                file_schema, rows = decode_container(content.as_py())
                if file_schema["fields"] != expected:
                    raise ValueError(
                        f"writer schema {file_schema['fields']} != reader "
                        f"schema {expected}"
                    )
                arrays = [
                    pa.array([r[i] for r in rows], type=pa_types[i])
                    for i in range(len(cols))
                ]
                yield pa.RecordBatch.from_arrays(arrays, names=cols)

    files = spark.read.format("binaryFile").option("pathGlobFilter", "*.avro").load(path)
    return files.select("content").mapInArrow(decode, schema)


def roundtrip_format(spark: SparkSession) -> str:
    """'spark-avro' when the external connector is present, else
    'avro-pure-python' — q92 reports which real Avro path ran."""
    from apache_hive_2_1_1_src_spark.io import has_avro_support

    return "spark-avro" if has_avro_support(spark) else "avro-pure-python"


__all__ = [
    "decode_container",
    "encode_container",
    "read_avro",
    "roundtrip_format",
    "spark_schema_to_avro",
    "write_avro",
]
