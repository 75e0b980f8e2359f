"""Unsupported-surface stubs + uniontype struct encoding."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_hive_2_1_1_src_spark.functions.unsupported import (
    encode_uniontype_as_struct,
    register_unsupported_stubs,
)


def test_unsupported_functions_raise_with_guidance(spark):
    register_unsupported_stubs(spark)
    df = spark.range(1)
    df.createOrReplaceTempView("one_row")
    with pytest.raises(Exception) as exc:
        spark.sql("SELECT ewah_bitmap(id) FROM one_row").collect()
    assert "not supported" in str(exc.value)


def test_reflect_and_java_method_are_native(spark):
    """reflect/java_method (FunctionRegistry.java:409-411) are NOT stubbed:
    Spark's CallMethodViaReflection implements Hive's static-method form
    natively, so the stubs must not shadow it."""
    register_unsupported_stubs(spark)
    row = spark.sql(
        "SELECT reflect('java.lang.Math', 'abs', -1) AS a, "
        "java_method('java.lang.Integer', 'toHexString', 255) AS h"
    ).collect()[0]
    assert row.a == "1" and row.h == "ff"


def test_uniontype_struct_encoding(spark):
    df = spark.range(1).select(
        encode_uniontype_as_struct(0, F.lit(42), F.lit("s")).alias("u0"),
        encode_uniontype_as_struct(1, F.lit(42), F.lit("s")).alias("u1"),
    )
    row = df.collect()[0]
    assert row.u0.tag == 0 and row.u0.field0 == 42 and row.u0.field1 is None
    assert row.u1.tag == 1 and row.u1.field0 is None and row.u1.field1 == "s"
