"""Per-partition storage format pins (operators/mixed_format.py — the
metastore Partition.sd behavior of diff_part_input_formats.q /
partition_wise_fileformat*.q / alter_file_format.q)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from apache_hive_2_1_1_src_spark.operators.mixed_format import MixedFormatTable

SCHEMA = "k bigint, v string"


@pytest.fixture()
def mixed_tbl(spark, tmp_path):
    mt = MixedFormatTable(str(tmp_path / "mt"), "p", SCHEMA)
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "x"), (3, "c", "y"), (4, "d", "z")],
        "k bigint, v string, p string",
    )
    mt.write_partition(df.filter("p = 'x'"), "x")        # textfile (default)
    mt.set_fileformat("sequencefile")
    mt.write_partition(df.filter("p = 'y'"), "y")        # sequencefile
    mt.set_fileformat("parquet")
    mt.write_partition(df.filter("p = 'z'"), "z")        # parquet
    return mt


def test_three_formats_one_table(mixed_tbl, spark):
    assert mixed_tbl.partition_format("x") == "textfile"
    assert mixed_tbl.partition_format("y") == "sequencefile"
    assert mixed_tbl.partition_format("z") == "parquet"
    rows = sorted(
        (r.k, r.v, r.p) for r in mixed_tbl.read(spark).collect()
    )
    assert rows == [(1, "a", "x"), (2, "b", "x"), (3, "c", "y"), (4, "d", "z")]


def test_set_fileformat_only_affects_future_partitions(mixed_tbl, spark):
    """Hive's ALTER SET FILEFORMAT contract: existing partitions keep
    their SD."""
    mixed_tbl.set_fileformat("textfile")
    assert mixed_tbl.partition_format("z") == "parquet"


def test_point_read_single_partition(mixed_tbl, spark):
    got = mixed_tbl.read_partition(spark, "y").collect()
    assert [(r.k, r.v, r.p) for r in got] == [(3, "c", "y")]


def test_overwrite_partition_adopts_current_format(mixed_tbl, spark):
    """INSERT OVERWRITE after an ALTER rewrites that partition in the
    new table-level format."""
    df = spark.createDataFrame([(9, "zz")], SCHEMA).withColumn("p", F.lit("x"))
    mixed_tbl.set_fileformat("parquet")
    mixed_tbl.write_partition(df, "x")
    assert mixed_tbl.partition_format("x") == "parquet"
    rows = sorted((r.k, r.v) for r in mixed_tbl.read_partition(spark, "x").collect())
    assert rows == [(9, "zz")]


def test_unknown_format_rejected(mixed_tbl):
    with pytest.raises(ValueError, match="wingdings"):
        mixed_tbl.set_fileformat("wingdings")


def test_missing_partition_rejected(mixed_tbl, spark):
    with pytest.raises(ValueError, match="p=nope"):
        mixed_tbl.read_partition(spark, "nope")


def test_manifest_survives_reopen(mixed_tbl, spark):
    """The SD manifest is durable — a fresh handle over the same root
    sees identical per-partition formats (metastore persistence)."""
    again = MixedFormatTable(mixed_tbl.root, "p", SCHEMA)
    assert again.partition_format("y") == "sequencefile"
    assert len(again.read(spark).collect()) == 4
