"""Round-10 semantic pins for the round-9 ADVICE items:

1. MetadataOnlyOptimizer must NOT rewrite a bare ``SELECT pcol FROM t``
   (MetadataOnlyOptimizer.java requires distinct/group-by context).
2. union+LIMIT even-split must satisfy the outer LIMIT when one branch
   is shorter than ceil(N/K) (no silent underfill).
3. Avro timestamp-millis/micros decode as timezone-aware UTC instants
   (AvroDeserializer's ``new Timestamp(millis)``).
4. FMEstimator string hashing iterates UTF-16 code units like Java's
   String.hashCode (astral characters hash their surrogate pair).
5. dfs -cat of an existing DIRECTORY cats its own files, not siblings.
"""

from __future__ import annotations

import datetime

import pytest

from apache_hive_2_1_1_src_spark.session import HiveEngine


@pytest.fixture(scope="module")
def eng(spark):
    e = HiveEngine(spark, "/root/testdata/sf0.001")
    e.register_tables()
    yield e
    e._vars = {}


# ------------------------------------------------- metadata-only projection
def test_bare_partition_projection_not_collapsed(eng, spark):
    """``SELECT pcol FROM t`` must return one row per DATA row —
    MetadataOnlyOptimizer.java only rewrites distinct/aggregate shapes,
    so the metadata path collapsing 2000 rows to the partition count is
    a silent wrong answer."""
    spark.sql("DROP TABLE IF EXISTS r10_meta_t")
    eng.sql(
        "create table r10_meta_t (v int) partitioned by (ds string)"
        " stored as textfile"
    )
    eng.sql("insert into r10_meta_t partition (ds='1') values (1), (2), (3)")
    eng.sql("insert into r10_meta_t partition (ds='2') values (4), (5)")
    rows = eng.sql("select ds from r10_meta_t").collect()
    assert len(rows) == 5  # one per data row, NOT one per partition
    # the aggregate shapes still answer from partition metadata
    assert eng.sql("select max(ds) from r10_meta_t").collect()[0][0] == "2"
    assert len(eng.sql("select distinct ds from r10_meta_t").collect()) == 2
    eng.sql("drop table r10_meta_t")


# -------------------------------------------------------- union+LIMIT fill
def test_union_limit_short_branch_no_underfill(eng, spark):
    """When one branch holds fewer than ceil(N/K) rows, the outer
    LIMIT N must still be satisfied from the other branches
    (HiveParser binds the LIMIT to the WHOLE union)."""
    spark.sql("DROP TABLE IF EXISTS r10_union_t")
    spark.sql("CREATE TABLE r10_union_t (c string) USING parquet")
    # branch A: 5 rows (region), branch B: plenty (nation=25) — LIMIT 20
    # needs 15 from B; the old ceil(N/K)=10-per-branch split returned 15.
    eng.sql(
        "insert overwrite table r10_union_t select * from ("
        "select 'a' from region union all select 'b' from nation limit 20"
        ") u"
    )
    rows = [r.c for r in spark.table("r10_union_t").collect()]
    assert len(rows) == 20
    assert rows.count("a") == 5 and rows.count("b") == 15
    # LIMIT larger than the whole union: every row, no duplicates
    eng.sql(
        "insert overwrite table r10_union_t select * from ("
        "select 'a' from region union all select 'b' from region limit 99"
        ") u"
    )
    rows = [r.c for r in spark.table("r10_union_t").collect()]
    assert len(rows) == 10
    spark.sql("DROP TABLE r10_union_t")


def test_union_limit_last_branch_priority(eng, spark):
    """merge4.q golden: LIMIT 1 over a union keeps the LAST branch's
    row (Hive MR round-robin starts from the last branch)."""
    spark.sql("DROP TABLE IF EXISTS r10_union_l1")
    spark.sql("CREATE TABLE r10_union_l1 (c string) USING parquet")
    eng.sql(
        "insert overwrite table r10_union_l1 select * from ("
        "select 'a' from region union all select 'b' from region limit 1"
        ") u"
    )
    assert [r.c for r in spark.table("r10_union_l1").collect()] == ["b"]
    spark.sql("DROP TABLE r10_union_l1")


# ------------------------------------------------------- avro timestamp tz
def test_avro_timestamp_logical_is_utc_instant():
    """timestamp-millis 0 is the epoch INSTANT regardless of session
    zone — a naive datetime would shift by the zone offset when Spark
    localizes it (avro_io decodes what AvroDeserializer reads as
    ``new Timestamp(millis)``)."""
    from apache_hive_2_1_1_src_spark.avro_io import _logical

    v = _logical({"logicalType": "timestamp-millis"}, 1_500_000_123)
    assert v.tzinfo is not None
    assert v == datetime.datetime(
        1970, 1, 18, 8, 40, 0, 123000, tzinfo=datetime.timezone.utc
    )
    v2 = _logical({"logicalType": "timestamp-micros"}, 1_500_000_123_456)
    assert v2 == datetime.datetime(
        1970, 1, 18, 8, 40, 0, 123456, tzinfo=datetime.timezone.utc
    )


# ------------------------------------------------------ FM sketch UTF-16
def test_fm_estimator_hashes_utf16_code_units():
    """Java String.hashCode over "a💡b" iterates 4 UTF-16 units
    (0x61, 0xD83D, 0xDCA1, 0x62); hashing code points diverges on any
    astral character."""
    from apache_hive_2_1_1_src_spark.functions.compute_stats import FMEstimator

    def java_hash(units):
        h = 0
        for u in units:
            h = (31 * h + u) & 0xFFFFFFFF
        return h - 0x100000000 if h >= 0x80000000 else h

    s = "a\U0001f4a1b"
    expected = java_hash([0x61, 0xD83D, 0xDCA1, 0x62])
    captured = []
    fm = FMEstimator(1)
    fm.add_long, orig = captured.append, fm.add_long  # intercept
    fm.add_string(s)
    assert captured == [expected]
    # BMP strings unchanged vs the known "val_0" Java hash
    captured.clear()
    fm.add_string("val_0")
    assert captured == [java_hash([ord(c) for c in "val_0"])]


# ------------------------------------------------------------ dfs -cat dir
def test_dfs_cat_of_directory_lists_own_files(tmp_path):
    from apache_hive_2_1_1_src_spark.qtest import _emulate_dfs

    class _Eng:
        def substitute(self, s):
            return s

    d = tmp_path / "out"
    d.mkdir()
    (d / "000000_0").write_text("inside\n")
    (tmp_path / "sibling.txt").write_text("sibling\n")
    lines = _emulate_dfs(_Eng(), f"dfs -cat {d}")
    assert lines == ["inside"]


# ---------------------------------------------------- round-10 semantics
def test_values_hive_text_protocol(eng, spark):
    """VALUES render to text then convert with UDFToX rules
    (SemanticAnalyzer.unparseExprForValuesClause +
    GenericUDFToBoolean/UDFToByte): 0→boolean true, FALSE→''→false,
    '255'→tinyint NULL."""
    spark.sql("DROP TABLE IF EXISTS r10_vt")
    eng.sql("create table r10_vt (b boolean, t tinyint) stored as textfile")
    eng.sql("insert into r10_vt values (0, 255), (false, 1)")
    rows = sorted(
        eng.sql("select b, t from r10_vt").collect(),
        key=lambda r: (r.b is not True, r.t or 0),
    )
    assert (rows[0].b, rows[0].t) == (True, None)
    assert (rows[1].b, rows[1].t) == (False, 1)
    eng.sql("drop table r10_vt")


def test_adjacent_literal_concat(eng):
    """HiveQL lexes 'face''book' as two adjacent literals and the
    parser concatenates (literal_string.q golden)."""
    r = eng.sql("select 'face''book' as a, 'x' 'y' 'z' as b").collect()[0]
    assert r.a == "facebook" and r.b == "xyz"


def test_samp_variance_single_element(eng):
    """GenericUDAFVarianceSample.terminate:86 — one element → 0.0, not
    NULL (SQL standard)."""
    r = eng.sql(
        "select var_samp(x) as v, stddev_samp(x) as s "
        "from (select cast(3.5 as double) as x) t"
    ).collect()[0]
    assert r.v == 0.0 and r.s == 0.0


def test_struct_fields_named_colN(eng):
    """GenericUDFStruct names fields col1..colN even for plain column
    references (udf_max.q's {"col1":..} framing)."""
    row = eng.sql(
        "select struct(r_regionkey, r_name) as s from region limit 1"
    ).collect()[0]
    assert row.s.__fields__ == ["col1", "col2"]


def test_percentile_approx_hive_exact(eng):
    """Within the bin budget the Ben-Haim/Tom-Tov histogram is exact and
    NumericHistogram.quantile interpolates 0.5 over {1,2,3,4} to 2.0:
    first bin with csum/sum >= q is x=2, and r = 1 + (0.5*4-1)*(2-1)/1.
    (A GK sketch — Spark's native — picks a sample point instead; the
    udaf_percentile_approx goldens pin the histogram arithmetic.)"""
    eng.hive_exact_percentile = True  # compat path (engine default: GK)
    try:
        r = eng.sql(
            "select percentile_approx(cast(x as double), 0.5) as m from "
            "(select explode(array(1, 2, 3, 4)) as x) t"
        ).collect()[0]
    finally:
        eng.hive_exact_percentile = False
    assert abs(r.m - 2.0) < 1e-9


def test_map_keys_of_null_map_is_empty(eng):
    r = eng.sql(
        "select map_keys(cast(null as map<int,string>)) as ks"
    ).collect()[0]
    assert r.ks == []
