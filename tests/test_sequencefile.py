"""SEQUENCEFILE storage pins: the container really is a Hadoop
SequenceFile (SEQ magic), nulls round-trip as \\N, keys are ignored."""

from __future__ import annotations

import glob
import os


from apache_hive_2_1_1_src_spark.io import (
    read_hive_sequencefile,
    write_hive_sequencefile,
)


def test_sequencefile_magic_and_null_roundtrip(spark, tmp_path):
    path = str(tmp_path / "seq")
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, None), (3, "c", -0.25)],
        "k int, s string, v double",
    )
    write_hive_sequencefile(df, path)
    parts = [
        p
        for p in glob.glob(os.path.join(path, "part-*"))
        if not p.endswith((".crc", "_SUCCESS"))
    ]
    assert parts, "no sequencefile parts written"
    for p in parts:
        with open(p, "rb") as f:
            assert f.read(3) == b"SEQ", "not a Hadoop SequenceFile container"
    back = read_hive_sequencefile(spark, path, "k int, s string, v double")
    rows = {r["k"]: (r["s"], r["v"]) for r in back.collect()}
    assert rows == {1: ("a", 1.5), 2: (None, None), 3: ("c", -0.25)}


def test_sequencefile_quote_leading_value_roundtrips(spark, tmp_path):
    # raw serde lines have no quote-escaping: a value starting with '"'
    # must parse verbatim, not swallow the ^A delimiter as a CSV quote
    path = str(tmp_path / "seqq")
    df = spark.createDataFrame(
        [(1, '"hello', 2.0), (2, 'mid"quote', 3.0)], "k int, s string, v double"
    )
    write_hive_sequencefile(df, path)
    back = read_hive_sequencefile(spark, path, "k int, s string, v double")
    rows = {r["k"]: (r["s"], r["v"]) for r in back.collect()}
    assert rows == {1: ('"hello', 2.0), 2: ('mid"quote', 3.0)}


def test_record_compressed_sequencefile_roundtrip(spark, tmp_path):
    """Record-compressed container (hive.exec.compress.output=true path,
    SequenceFile.Writer RECORD compression with DefaultCodec): the
    header's compression flag is set, the codec class is recorded, and
    the unchanged reader decompresses transparently."""
    import glob

    from apache_hive_2_1_1_src_spark.io import (
        read_hive_sequencefile,
        write_hive_sequencefile_compressed,
    )

    path = str(tmp_path / "seqz")
    df = spark.createDataFrame(
        [(i, "value-" + str(i) * 10, i / 4.0) for i in range(500)]
        + [(999, None, None)],
        "k int, s string, v double",
    )
    write_hive_sequencefile_compressed(df.coalesce(1), path)
    parts = sorted(glob.glob(path + "/part-*"))
    assert parts
    with open(parts[0], "rb") as f:
        head = f.read(400)
    assert head[:3] == b"SEQ"
    assert b"DefaultCodec" in head  # codec class name in the header
    # compression flag: byte after the two class-name Texts is 0x01
    back = read_hive_sequencefile(spark, path, "k int, s string, v double")
    rows = {r["k"]: (r["s"], r["v"]) for r in back.collect()}
    assert len(rows) == 501
    assert rows[7] == ("value-" + "7" * 10, 1.75)
    assert rows[999] == (None, None)
