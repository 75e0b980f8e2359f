"""Round-9 semantic pins: union+LIMIT binding, Hive typed hash(),
masking db-qualification, LazyBoolean vs GenericUDFToBoolean truth
tables, legacy outer-join filter pushing, Avro container IO, partition
metadata-only answers, and qtest cell framing.

Each pin cites the reference behavior it locks (file:line or .q golden)
so a regression is traceable to the semantics it breaks.
"""

from __future__ import annotations

import datetime
import os
import decimal

import pytest

from apache_hive_2_1_1_src_spark.session import HiveEngine


@pytest.fixture(scope="module")
def eng(spark):
    e = HiveEngine(spark, "/root/testdata/sf0.001")
    e.register_tables()
    yield e
    e._vars = {}


# ---------------------------------------------------------------- union+LIMIT
def test_union_limit_binds_to_whole_union(eng, spark):
    """HiveParser binds a trailing LIMIT to the WHOLE union
    (parquet_ppd_char.q.out fixture = 10 rows; merge4.q.out's union
    insert lists only the single limited row's partition)."""
    spark.sql("DROP TABLE IF EXISTS r9_union_t")
    spark.sql("CREATE TABLE r9_union_t (c string) USING parquet")
    eng.sql(
        "insert overwrite table r9_union_t select * from ("
        "select 'a' from region union all select 'b' from nation limit 10"
        ") u"
    )
    rows = [r.c for r in spark.table("r9_union_t").collect()]
    assert len(rows) == 10
    # Hive's MR round-robin keeps an even split (5 apple + 5 hello in
    # the ppd goldens)
    assert rows.count("a") == 5 and rows.count("b") == 5
    spark.sql("DROP TABLE r9_union_t")


# --------------------------------------------------------------- typed hash()
def test_hive_hash_typed_matches_reference_goldens(eng):
    """Per-type hash rules (ObjectInspectorUtils.java:600-669):
    char→Text hash of stripped value, varchar→Text hash, decimal→
    normalized BigDecimal hash, date→epoch days, boolean→1/0.  The
    composite value is pinned by orc_ppd_varchar.q.out's digest
    -252951929000 = 500 rows × -505903858."""
    eng.spark.sql("DROP TABLE IF EXISTS r9_hash_t")
    eng.sql(
        "create table r9_hash_t (c char(10), v varchar(10), d decimal(5,3),"
        " da date) stored as textfile"
    )
    eng.sql(
        "insert into r9_hash_t select cast('apple' as char(10)), "
        "cast('bee' as varchar(10)), 0.22, cast('1970-02-20' as date)"
    )
    got = eng.sql("select hash(*) as h from r9_hash_t").collect()[0].h
    assert got == -505903858
    eng.spark.sql("DROP TABLE r9_hash_t")


def test_hive_hash_literals_match_udf_hash_golden(eng):
    """udf_hash.q.out: float hashes its float32 bits (1067450368 for
    1.25), booleans hash 1/0, hash(1,2,3)=1026."""
    row = eng.sql(
        "SELECT hash(CAST(1.25 AS FLOAT)) AS f, hash(TRUE) AS t, "
        "hash(FALSE) AS fa, hash(1, 2, 3) AS c FROM region LIMIT 1"
    ).collect()[0]
    assert (row.f, row.t, row.fa, row.c) == (1067450368, 1, 0, 1026)


# ------------------------------------------------------------------- masking
def test_masking_applies_to_db_qualified_reference(eng):
    """A db-qualified read of a policied table must still be rewritten
    (SQLStdHiveAuthorizationValidatorForTest filters by table NAME;
    masking_1_newdb.q golden returns 6 masked rows, not 500 raw)."""
    from apache_hive_2_1_1_src_spark.operators import masking as mk

    pol = mk.MaskingPolicy(
        row_filter="key % 2 = 0", column_masks={"value": "reverse(value)"}
    )
    out = mk.rewrite_with_policies(
        "select * from otherdb.masking_test",
        {"masking_test": pol},
        lambda t: [("key", "int"), ("value", "string")],
    )
    assert "otherdb.masking_test" in out
    assert "reverse" in out and "key % 2 = 0" in out


# ------------------------------------------------------------------ booleans
def test_lazy_boolean_text_read_is_strict(eng, spark, tmp_path):
    """LazyBoolean.java accepts exactly TRUE/FALSE; 't'/'1' read as NULL
    (bool_literal.q.out first block)."""
    p = tmp_path / "bools.txt"
    p.write_text("1\x01TRUE\n2\x01t\n3\x011\n4\x01FALSE\n")
    spark.sql("DROP TABLE IF EXISTS r9_bool_t")
    eng.sql("create table r9_bool_t (k int, b boolean) stored as textfile")
    eng.sql(f"LOAD DATA LOCAL INPATH '{p}' INTO TABLE r9_bool_t")
    got = {r.k: r.b for r in spark.table("r9_bool_t").collect()}
    assert got == {1: True, 2: None, 3: None, 4: False}
    spark.sql("DROP TABLE r9_bool_t")


def test_cast_string_to_boolean_is_nonempty_rule(eng):
    """GenericUDFToBoolean: any non-empty string → true, '' → false
    (PrimitiveObjectInspectorUtils.java:550-558; udf_to_boolean.q)."""
    row = eng.sql(
        "SELECT CAST('Foo' AS BOOLEAN) AS a, CAST('' AS BOOLEAN) AS b, "
        "CAST('false' AS BOOLEAN) AS c"
    ).collect()[0]
    assert (row.a, row.b, row.c) == (True, False, True)


# ------------------------------------------------- legacy outer-join filters
def test_legacy_outer_filter_prefilters_preserved_side(eng, spark):
    """hive.outerjoin.supports.filters=false pushes single-sided ON
    conjuncts BEFORE the join (SemanticAnalyzer.java:2688-2810) — a
    preserved row failing its filter disappears instead of
    null-extending (join_1to1.q 21-row goldens)."""
    spark.sql("DROP TABLE IF EXISTS r9_oj")
    spark.sql("CREATE TABLE r9_oj (k int, v int) USING parquet")
    spark.sql("INSERT INTO r9_oj VALUES (1, 66), (2, 77)")
    eng.set_var("hive.outerjoin.supports.filters", "false")
    try:
        legacy = eng.sql(
            "SELECT * FROM r9_oj a FULL OUTER JOIN r9_oj b "
            "ON a.k = b.k AND a.v = 66 AND b.v = 66"
        ).collect()
    finally:
        eng._vars.pop("hive.outerjoin.supports.filters", None)
    # legacy: both sides pre-filtered to v=66 → one matched row plus
    # NOTHING for k=2 on either side... except full outer keeps no
    # unmatched rows because both inputs shrank to the k=1 row
    assert len(legacy) == 1
    modern = eng.sql(
        "SELECT * FROM r9_oj a FULL OUTER JOIN r9_oj b "
        "ON a.k = b.k AND a.v = 66 AND b.v = 66"
    ).collect()
    # modern: 2 a-rows preserved + 1 unmatched b-row = 3
    assert len(modern) == 3
    spark.sql("DROP TABLE r9_oj")


# ------------------------------------------------------------------ avro IO
def test_avro_deflate_container_and_schema_resolution(spark):
    """The reference's doctors.avro is deflate-compressed; reading it
    against a reader schema carrying an extra defaulted field applies
    the default (avro_add_column.q / avro_joins.q goldens)."""
    from pyspark.sql import types as T

    from apache_hive_2_1_1_src_spark.avro_io import (
        decode_container,
        read_avro_resolved,
    )

    raw = open("/root/reference/data/files/doctors.avro", "rb").read()
    schema, rows = decode_container(raw)
    assert len(rows) == 11
    assert schema["fields"][0]["name"] == "number"
    reader = {
        "type": "record",
        "name": "doctors",
        "fields": [
            {"name": "number", "type": "int"},
            {"name": "first_name", "type": "string"},
            {"name": "extra", "type": "string", "default": "fishfingers"},
        ],
    }
    tbl_schema = T.StructType(
        [
            T.StructField("number", T.IntegerType()),
            T.StructField("first_name", T.StringType()),
            T.StructField("extra", T.StringType()),
        ]
    )
    df = read_avro_resolved(
        spark, "/root/reference/data/files/doctors.avro", tbl_schema, reader
    )
    got = {r.number: (r.first_name, r.extra) for r in df.collect()}
    assert len(got) == 11
    assert all(v[1] == "fishfingers" for v in got.values())


def test_avro_decimal_logical_type_rescales_half_up(spark):
    """dec.avro carries decimal(5,2); read as decimal(4,1) Hive
    rescales HALF_UP (avro_decimal.q golden 234.79→234.8)."""
    from pyspark.sql import types as T

    from apache_hive_2_1_1_src_spark.avro_io import read_avro_resolved

    tbl = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("value", T.DecimalType(4, 1)),
        ]
    )
    df = read_avro_resolved(
        spark, "/root/reference/data/files/dec.avro", tbl, None
    )
    vals = sorted(str(r.value) for r in df.collect())
    assert "234.8" in vals and len(vals) == 10


# -------------------------------------------------- partition metadata-only
def test_partition_key_answers_from_partition_list(eng, spark):
    """MetadataOnlyOptimizer: max(pcol) over EMPTY partitions answers
    from partition VALUES (metadataonly1.q golden '1')."""
    import shutil

    spark.sql("DROP TABLE IF EXISTS r9_meta_t")
    # an empty ADDed partition leaves its directory behind after DROP —
    # clear the managed location so re-runs don't trip
    # LOCATION_ALREADY_EXISTS
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(
        os.path.join(wh.removeprefix("file:"), "r9_meta_t"),
        ignore_errors=True,
    )
    spark.sql(
        "CREATE TABLE r9_meta_t (a int) USING parquet PARTITIONED BY (ds string)"
    )
    spark.sql("ALTER TABLE r9_meta_t ADD PARTITION (ds='7')")
    got = eng.sql("select max(ds) as m from r9_meta_t").collect()
    assert got[0].m == "7"
    # non-distinct count counts DATA rows — still 0
    got = eng.sql("select count(ds) as c from r9_meta_t").collect()
    assert got[0].c == 0
    spark.sql("DROP TABLE r9_meta_t")


# ------------------------------------------------------------- qtest framing
def test_canon_braces_sorts_map_entries_only_within_groups():
    from apache_hive_2_1_1_src_spark.qtest import _canon_braces

    a = 'x\t{"Earth":42,"Bob":31}\ty'
    b = 'x\t{"Bob":31,"Earth":42}\ty'
    assert _canon_braces(a) == _canon_braces(b)
    # quoted braces/commas survive untouched
    s = '{"k":"a,b}c"}'
    assert _canon_braces(s) == s


def test_decimal_cell_renders_plain_notation():
    from apache_hive_2_1_1_src_spark.qtest import hive_cell

    assert hive_cell(decimal.Decimal("0E-18")) == "0.000000000000000000"
    assert hive_cell(decimal.Decimal("1.5")) == "1.5"


def test_nested_dates_quote_like_strings():
    from apache_hive_2_1_1_src_spark.qtest import hive_cell

    assert (
        hive_cell({"bar": datetime.date(1998, 5, 7)}) == '{"bar":"1998-05-07"}'
    )
