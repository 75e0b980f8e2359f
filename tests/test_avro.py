"""Avro container-file codec tests (avro_io.py).

The decisive check is cross-implementation: files written by our
spec-implemented Python encoder must be readable by the OFFICIAL Apache
Avro Java library (avro-1.12.1, already on the Spark JVM classpath) —
that is what makes q92's 'avro' claim real rather than self-certified.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from apache_hive_2_1_1_src_spark.avro_io import (
    decode_container,
    encode_container,
    read_avro,
    spark_schema_to_avro,
    write_avro,
)
from apache_hive_2_1_1_src_spark.io import load_table


def test_codec_roundtrip_primitives():
    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "double"},
            {"name": "c", "type": "string"},
            {"name": "d", "type": "boolean"},
            {"name": "e", "type": ["null", "string"]},
        ],
    }
    rows = [
        (1, 1.5, "x", True, None),
        (-2, -0.25, "émoji ✓", False, "present"),
        (2**40, 0.0, "", True, ""),
    ]
    data = encode_container(iter(rows), schema, b"0123456789abcdef")
    got_schema, got_rows = decode_container(data)
    assert got_schema == schema
    assert got_rows == rows


def test_spark_distributed_roundtrip(spark, sf_dir, tmp_path):
    supp = load_table(spark, sf_dir, "supplier")
    out = str(tmp_path / "supplier_avro")
    n = write_avro(supp, out)
    assert n == supp.count()
    assert any(f.endswith(".avro") for f in os.listdir(out))
    back = read_avro(spark, out, supp.schema)
    assert back.schema == supp.schema
    a = supp.orderBy("s_suppkey").collect()
    b = back.orderBy("s_suppkey").collect()
    assert a == b


def test_java_avro_library_reads_our_files(spark, sf_dir, tmp_path):
    """Cross-implementation proof: org.apache.avro.file.DataFileReader
    (the reference implementation Hive's AvroSerDe builds on) parses a
    container our Python codec wrote, and sees the same records."""
    supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_suppkey") <= 20)
    out = str(tmp_path / "supplier_avro_java")
    write_avro(supp, out)
    files = sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".avro")
    )
    jvm = spark._jvm  # noqa: SLF001
    seen = {}
    for path in files:
        reader = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(path),
            jvm.org.apache.avro.generic.GenericDatumReader(),
        )
        assert reader.getSchema().getName() == "row"
        while reader.hasNext():
            rec = reader.next()
            seen[rec.get("s_suppkey")] = (
                str(rec.get("s_name")),
                float(rec.get("s_acctbal")),
            )
        reader.close()
    expected = {
        r.s_suppkey: (r.s_name, r.s_acctbal)
        for r in supp.select("s_suppkey", "s_name", "s_acctbal").collect()
    }
    assert seen == expected


def test_read_rejects_schema_mismatch(spark, sf_dir, tmp_path):
    supp = load_table(spark, sf_dir, "supplier")
    out = str(tmp_path / "supplier_avro_mismatch")
    write_avro(supp, out)
    wrong = T.StructType(
        [T.StructField("s_suppkey", T.LongType()), T.StructField("nope", T.StringType())]
    )
    with pytest.raises(Exception, match="reader|schema"):
        read_avro(spark, out, wrong).collect()


def test_nested_types_fail_loudly():
    schema = T.StructType(
        [T.StructField("a", T.ArrayType(T.LongType()))]
    )
    with pytest.raises(TypeError, match="flat primitive"):
        spark_schema_to_avro(schema)


def test_nullable_long_precision_and_nan_vs_null(spark, tmp_path):
    """Arrow→pandas float64 coercion must not corrupt nullable bigints
    above 2^53 nor fold a genuine NaN double into null (write_avro
    routes integers as exact strings and floats with an isNull flag)."""
    import math

    path = str(tmp_path / "avro_precision")
    big = 2**60 + 1
    df = spark.createDataFrame(
        [(1, big, 1.5), (2, None, float("nan")), (3, -(2**61) - 7, None)],
        T.StructType(
            [
                T.StructField("k", T.LongType(), False),
                T.StructField("v", T.LongType(), True),
                T.StructField("d", T.DoubleType(), True),
            ]
        ),
    )
    n = write_avro(df, path)
    assert n == 3
    back = read_avro(spark, path, df.schema)
    rows = {r["k"]: (r["v"], r["d"]) for r in back.collect()}
    assert rows[1][0] == big and rows[1][1] == 1.5
    assert rows[2][0] is None
    assert rows[2][1] is not None and math.isnan(rows[2][1])  # NaN, NOT null
    assert rows[3][0] == -(2**61) - 7
    assert rows[3][1] is None  # null, NOT NaN
