"""RCFile on-disk interop pins.

Certifies that rcfile_io writes/reads the actual Hive RCFile container
layout (ql/.../io/RCFile.java): Hadoop-vlong codec, ColumnBuffer
run-length value-length encoding, sync escapes, record framing — by
pure-Python roundtrip AND byte-level cross-validation against the real
Java ``RCFile$Reader`` / ``RCFile$Writer`` from the hive-exec jar on
Spark's classpath."""

import glob
import hashlib
import io
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from apache_hive_2_1_1_src_spark.rcfile_io import (
    DEFAULT_CODEC,
    GZIP_CODEC,
    MAGIC,
    NULL_BYTES,
    _decode_rle_lengths,
    _rle_lengths,
    decode_rcfile,
    encode_rcfile,
    java_rcfile_reader_rows,
    java_rcfile_write,
    read_rcfile,
    read_vlong,
    write_rcfile,
    write_vlong,
)

SYNC = hashlib.md5(b"test-sync").digest()


def _roundtrip_vlong(v: int) -> int:
    buf = io.BytesIO()
    write_vlong(buf, v)
    buf.seek(0)
    return read_vlong(buf)


def test_vlong_codec_roundtrip():
    for v in [0, 1, -1, 112, 127, 128, -112, -113, 255, 256, 65535,
              10**6, -(10**6), 2**31 - 1, -(2**31), 2**53, -(2**53)]:
        assert _roundtrip_vlong(v) == v


def test_vlong_single_byte_window():
    # WritableUtils stores [-112, 127] in exactly one byte
    for v in (-112, 0, 127):
        buf = io.BytesIO()
        write_vlong(buf, v)
        assert len(buf.getvalue()) == 1
    for v in (-113, 128):
        buf = io.BytesIO()
        write_vlong(buf, v)
        assert len(buf.getvalue()) > 1


def test_rle_lengths_matches_columnbuffer_convention():
    # RCFile.java:868-875: lengths 1,1,1,2 encode as 1, ~2, 2
    enc = _rle_lengths([1, 1, 1, 2])
    buf = io.BytesIO(enc)
    assert read_vlong(buf) == 1
    assert read_vlong(buf) == ~2
    assert read_vlong(buf) == 2
    assert _decode_rle_lengths(enc, 4) == [1, 1, 1, 2]
    # no run: 1,2,3 encodes plainly
    enc2 = _rle_lengths([1, 2, 3])
    buf2 = io.BytesIO(enc2)
    assert [read_vlong(buf2) for _ in range(3)] == [1, 2, 3]


def test_pure_python_roundtrip_with_sync_escapes():
    rows = [tuple(f"row{r}col{c}".encode() for c in range(4)) for r in range(5000)]
    rows[3] = (b"", NULL_BYTES, b"tab\there", b"multi\nline")
    data = encode_rcfile(rows, 4, SYNC, rowgroup_rows=256)
    assert data[:3] == MAGIC
    # enough row groups that at least one sync escape was emitted
    assert data.count(SYNC) > 2
    ncols, back = decode_rcfile(data)
    assert ncols == 4 and back == rows


def test_decode_rejects_garbage():
    with pytest.raises(ValueError, match="not an RCFile"):
        decode_rcfile(b"PAR1not-an-rcfile")


def test_java_reads_python_rcfile(spark, tmp_path):
    rows = [tuple(f"r{r}c{c}".encode() for c in range(3)) for r in range(700)]
    rows[7] = (b"", NULL_BYTES, b"x" * 100)
    p = str(tmp_path / "py.rc")
    with open(p, "wb") as fh:
        fh.write(encode_rcfile(rows, 3, SYNC, rowgroup_rows=128))
    assert java_rcfile_reader_rows(spark, p) == rows


def test_python_reads_java_rcfile(spark, tmp_path):
    rows = [tuple(f"jr{r}c{c}".encode() for c in range(3)) for r in range(400)]
    p = str(tmp_path / "java.rc")
    java_rcfile_write(spark, p, rows, 3)
    with open(p, "rb") as fh:
        ncols, back = decode_rcfile(fh.read())
    assert ncols == 3 and back == rows


def test_compressed_pure_python_roundtrip():
    rows = [tuple(f"r{r}c{c}".encode() * 3 for c in range(3)) for r in range(2000)]
    rows[5] = (b"", NULL_BYTES, b"zz")
    plain = encode_rcfile(rows, 3, SYNC, rowgroup_rows=256)
    comp = encode_rcfile(rows, 3, SYNC, rowgroup_rows=256, codec=DEFAULT_CODEC)
    assert len(comp) < len(plain) // 2  # repetitive text should compress
    ncols, back = decode_rcfile(comp)
    assert ncols == 3 and back == rows


def test_java_reads_python_compressed(spark, tmp_path):
    rows = [tuple(f"r{r}c{c}".encode() * 3 for c in range(3)) for r in range(900)]
    p = str(tmp_path / "pyz.rc")
    with open(p, "wb") as fh:
        fh.write(encode_rcfile(rows, 3, SYNC, rowgroup_rows=128, codec=DEFAULT_CODEC))
    assert java_rcfile_reader_rows(spark, p) == rows


@pytest.mark.parametrize("codec", [DEFAULT_CODEC, GZIP_CODEC])
def test_python_reads_java_compressed(spark, tmp_path, codec):
    rows = [tuple(f"jz{r}c{c}".encode() * 2 for c in range(3)) for r in range(700)]
    p = str(tmp_path / "javaz.rc")
    java_rcfile_write(spark, p, rows, 3, codec=codec)
    with open(p, "rb") as fh:
        ncols, back = decode_rcfile(fh.read())
    assert ncols == 3 and back == rows


def test_spark_roundtrip_exact(spark, tmp_path, sf_dir):
    lt = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    out = str(tmp_path / "lineitem_rc")
    n = write_rcfile(lt.repartition(4), out)
    assert n == lt.count()
    assert len(glob.glob(out + "/*.rc")) == 4  # one container per partition
    back = read_rcfile(spark, out, lt.schema)
    assert back.schema == lt.schema
    # row-exact across every column/type (long, int, double, string, ts)
    assert lt.exceptAll(back).count() == 0
    assert back.exceptAll(lt).count() == 0


def test_null_cells_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, None, 2.5), (2, "b", None), (3, "\\N-lookalike", 0.0)],
        T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("s", T.StringType()),
                T.StructField("v", T.DoubleType()),
            ]
        ),
    )
    out = str(tmp_path / "nulls_rc")
    write_rcfile(df.coalesce(1), out)
    back = read_rcfile(spark, out, df.schema).orderBy("k").collect()
    assert back[0].s is None and back[1].v is None
    assert back[2].v == 0.0


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False


if _HAVE_HYP:

    @given(
        rows=st.lists(
            st.tuples(
                st.binary(max_size=40),
                st.binary(max_size=40),
                st.binary(max_size=40),
            ),
            max_size=200,
        ),
        rowgroup=st.integers(min_value=1, max_value=64),
    )
    @settings(max_examples=60, deadline=None)
    def test_rcfile_codec_roundtrip_property(rows, rowgroup):
        """Arbitrary binary cells (including empty, delimiter-looking and
        non-UTF8 bytes) survive encode→decode bit-exactly at any
        row-group size — the container is byte-transparent."""
        data = encode_rcfile(rows, 3, SYNC, rowgroup_rows=rowgroup)
        ncols, back = decode_rcfile(data)
        assert ncols == 3 and back == rows

    @given(
        lengths=st.lists(st.integers(min_value=0, max_value=300), max_size=300)
    )
    @settings(max_examples=60, deadline=None)
    def test_rle_lengths_roundtrip_property(lengths):
        assert _decode_rle_lengths(_rle_lengths(lengths), len(lengths)) == lengths
