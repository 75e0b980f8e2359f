"""ALTER TABLE ARCHIVE/UNARCHIVE PARTITION pins (DDLTask.archive,
archive_excludeHadoop20.q + the clientnegative archive_* family)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from apache_hive_2_1_1_src_spark.io import load_table
from apache_hive_2_1_1_src_spark.operators.archive import (
    ARCHIVE_NAME,
    archive_partition,
    is_archived,
    read_archived,
    read_mixed_partitioned,
    unarchive_partition,
)


def _write_parts(spark, sf_dir, root):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    orders.repartition(2).write.partitionBy("o_orderstatus").parquet(root)
    return orders


def test_archive_roundtrip_preserves_rows(spark, sf_dir, tmp_path):
    root = str(tmp_path / "t")
    orders = _write_parts(spark, sf_dir, root)
    want = orders.filter("o_orderstatus = 'F'").count()
    fdir = os.path.join(root, "o_orderstatus=F")
    n = archive_partition(fdir)
    assert n >= 1 and is_archived(fdir)
    assert glob.glob(os.path.join(fdir, "*.parquet")) == []
    got = read_archived(spark, fdir).count()
    assert got == want
    unarchive_partition(fdir)
    assert not is_archived(fdir)
    assert len(glob.glob(os.path.join(fdir, "*.parquet"))) == n
    assert spark.read.parquet(root).filter("o_orderstatus='F'").count() == want


def test_mixed_reader_matches_all_live(spark, sf_dir, tmp_path):
    root = str(tmp_path / "t2")
    orders = _write_parts(spark, sf_dir, root)
    baseline = {
        r["o_orderstatus"]: r["n"]
        for r in orders.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()
    }
    archive_partition(os.path.join(root, "o_orderstatus=F"))
    mixed = {
        r["o_orderstatus"]: r["n"]
        for r in read_mixed_partitioned(spark, root, "o_orderstatus")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert mixed == baseline


def test_double_archive_and_bare_unarchive_refused(spark, sf_dir, tmp_path):
    root = str(tmp_path / "t3")
    _write_parts(spark, sf_dir, root)
    fdir = os.path.join(root, "o_orderstatus=O")
    with pytest.raises(ValueError, match="not archived"):
        unarchive_partition(fdir)
    archive_partition(fdir)
    with pytest.raises(ValueError, match="already archived"):
        archive_partition(fdir)


def test_container_is_stored_zip_of_original_files(spark, sf_dir, tmp_path):
    import zipfile

    root = str(tmp_path / "t4")
    _write_parts(spark, sf_dir, root)
    fdir = os.path.join(root, "o_orderstatus=P")
    names_before = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(fdir, "*.parquet"))
    )
    archive_partition(fdir)
    with zipfile.ZipFile(os.path.join(fdir, ARCHIVE_NAME)) as zf:
        assert sorted(zf.namelist()) == names_before
        # aggregation container, not a codec: members stored uncompressed
        assert all(i.compress_type == zipfile.ZIP_STORED for i in zf.infolist())
