"""Explicitly-unsupported reference surface — fail loudly, not silently.

SURVEY.md §2.5/§7: the ewah_* bitmap-index internals and index DDL are
out of scope (Hive 3 itself removed indexes).  Hive's own pattern for
removed features is a clear compile-time error — mirrored here by
registering stub UDFs that raise with guidance.

reflect2 (GenericUDFReflect2's instance-method form) WAS listed here
until round 12 implemented it for real (functions/hive_misc_udfs.py,
including the 1900-based Timestamp getters) — it is no longer a stub.

reflect / java_method (FunctionRegistry.java:409-411, GenericUDFReflect)
are NOT stubbed: Spark ships them natively (CallMethodViaReflection,
static-method form, same semantics as Hive's) — covered by q212 and
pinned in tests/test_unsupported.py.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

UNSUPPORTED: dict[str, str] = {
    "ewah_bitmap": "bitmap-index internal; Hive indexes were removed in Hive 3",
    "ewah_bitmap_and": "bitmap-index internal",
    "ewah_bitmap_or": "bitmap-index internal",
    "ewah_bitmap_empty": "bitmap-index internal",
}


def register_unsupported_stubs(spark: SparkSession) -> None:
    """Register each unsupported function as a stub that raises a clear
    error naming the replacement (Hive-3-style removal errors)."""
    for name, reason in UNSUPPORTED.items():
        def make_stub(fn_name: str, fn_reason: str):
            def stub(*_args):
                raise NotImplementedError(
                    f"{fn_name} is not supported by this engine: {fn_reason}"
                )

            return stub

        spark.udf.register(name, make_stub(name, reason))


def encode_uniontype_as_struct(tag: int, *values):
    """uniontype<T0,T1,...> → struct<tag:tinyint, field0:T0, field1:T1,...>
    encoding (SURVEY.md §1.2: Spark has no union type; only the tagged
    field is non-null).  Returns a Column."""
    from pyspark.sql import functions as F

    fields = [F.lit(tag).cast("tinyint").alias("tag")]
    for i, v in enumerate(values):
        col = v if i == tag else F.lit(None)
        fields.append((col if hasattr(col, "alias") else F.lit(col)).alias(f"field{i}"))
    return F.struct(*fields)
