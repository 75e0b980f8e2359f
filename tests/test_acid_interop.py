"""ORC-ACID on-disk interop pins (operators/acid_interop.py): the
exported layout must match the reference's AcidUtils/OrcRecordUpdater
contracts by name and schema, and round-trip through the
OrcRawRecordMerger visibility rules to the exact table state."""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

from apache_hive_2_1_1_src_spark.operators.acid import AcidTable
from apache_hive_2_1_1_src_spark.operators.acid_interop import (
    export_hive_acid,
    read_hive_acid,
)


@pytest.fixture()
def tbl(spark, tmp_path):
    base = spark.createDataFrame(
        [(i, "g" if i % 2 == 0 else "h", float(i * 10)) for i in range(1, 21)],
        "k int, grp string, v double",
    )
    t = AcidTable.create(spark, str(tmp_path / "acid_src"), base, key_col="k")
    tx = t.begin()
    tx.update(F.col("k") == 5, {"v": F.lit(999.0)})
    tx.commit()
    tx = t.begin()
    tx.delete(F.col("k") > 18)
    tx.commit()
    tx = t.begin()
    tx.insert(
        spark.createDataFrame([(100, "z", 1.0), (101, "z", 2.0)], "k int, grp string, v double")
    )
    tx.commit()
    return t


def _rows(df):
    return sorted((r["k"], r["grp"], r["v"]) for r in df.collect())


def test_layout_names_match_acidutils(spark, tbl, tmp_path):
    """base_%07d / delta_%07d_%07d dirs, bucket_%05d files
    (AcidUtils.java:56-146)."""
    dest = str(tmp_path / "hive_layout")
    export_hive_acid(tbl, dest)
    names = sorted(os.listdir(dest))
    assert names == [
        "base_0000000",
        "delta_0000001_0000001",
        "delta_0000002_0000002",
        "delta_0000003_0000003",
    ]
    for n in names:
        files = os.listdir(os.path.join(dest, n))
        assert files == ["bucket_00000"], (n, files)


def test_event_schema_matches_orcrecordupdater(spark, tbl, tmp_path):
    """Field names, order, and types of OrcRecordUpdater.createEventSchema
    (OrcRecordUpdater.java:162-178)."""
    dest = str(tmp_path / "hive_layout")
    export_hive_acid(tbl, dest)
    df = spark.read.format("orc").load(os.path.join(dest, "base_0000000"))
    assert [(f.name, f.dataType.simpleString().split("<")[0]) for f in df.schema.fields] == [
        ("operation", "int"),
        ("originalTransaction", "bigint"),
        ("bucket", "int"),
        ("rowId", "bigint"),
        ("currentTransaction", "bigint"),
        ("row", "struct"),
    ]
    assert df.schema["row"].dataType.simpleString() == "struct<k:int,grp:string,v:double>"


def test_operation_codes_and_event_shapes(spark, tbl, tmp_path):
    """Update delta = DELETE(old triple) + INSERT(new rowId); delete
    delta = DELETE events with null row; rowIds dense per file."""
    dest = str(tmp_path / "hive_layout")
    export_hive_acid(tbl, dest)
    d1 = spark.read.format("orc").load(os.path.join(dest, "delta_0000001_0000001"))
    ops = sorted((r.operation, r.currentTransaction) for r in d1.collect())
    assert ops == [(0, 1), (2, 1)]  # split-update: one insert + one delete
    del_ev = d1.filter("operation = 2").first()
    # delete events carry no row data (all-null fields; see module doc
    # for why a present struct stands in for Hive's row=null)
    assert del_ev.row is None or all(
        v is None for v in del_ev.row.asDict().values()
    )
    assert del_ev.originalTransaction == 0
    ins_ev = d1.filter("operation = 0").first()
    assert ins_ev.row.k == 5 and ins_ev.row.v == 999.0
    d2 = spark.read.format("orc").load(os.path.join(dest, "delta_0000002_0000002"))
    assert {r.operation for r in d2.collect()} == {2}
    base = spark.read.format("orc").load(os.path.join(dest, "base_0000000"))
    rids = sorted(r.rowId for r in base.collect())
    assert rids == list(range(20))


def test_roundtrip_matches_table_read(spark, tbl, tmp_path):
    dest = str(tmp_path / "hive_layout")
    export_hive_acid(tbl, dest)
    assert _rows(read_hive_acid(spark, dest)) == _rows(tbl.read())


def test_valid_until_time_travel(spark, tbl, tmp_path):
    dest = str(tmp_path / "hive_layout")
    export_hive_acid(tbl, dest)
    for wid in (0, 1, 2, 3):
        assert _rows(read_hive_acid(spark, dest, valid_until=wid)) == _rows(
            tbl.read(tbl.snapshot_at(wid))
        )


def test_folded_delta_exports_range_dir(spark, tmp_path):
    """After compact_minor, the fold exports as delta_lo_hi with delete
    events stamped at their ORIGINAL write ids — the shape Hive's own
    minor compaction produces."""
    base = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(1, 11)], "k int, grp string, v double"
    )
    t = AcidTable.create(spark, str(tmp_path / "acid_fold"), base, key_col="k")
    for val in (100.0, 200.0):
        tx = t.begin()
        tx.update(F.col("k") == 3, {"v": F.lit(val)})
        tx.commit()
    tx = t.begin()
    tx.delete(F.col("k") == 9)
    tx.commit()
    t.compact_minor()
    dest = str(tmp_path / "hive_fold_layout")
    export_hive_acid(t, dest)
    names = sorted(os.listdir(dest))
    assert names == ["base_0000000", "delta_0000001_0000003"]
    assert _rows(read_hive_acid(spark, dest)) == _rows(t.read())
    ctids = {
        r.currentTransaction
        for r in spark.read.format("orc")
        .load(os.path.join(dest, names[1]))
        .filter("operation = 2")
        .collect()
    }
    assert ctids == {2, 3}  # delete events keep their original txn ids


def test_read_after_major_compaction_base(spark, tmp_path):
    """Major compaction exports base_%07d at the high watermark; the
    reader's best-base selection must pick it, and time travel below it
    must refuse (the getAcidState contract)."""
    base = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(1, 11)], "k int, grp string, v double"
    )
    t = AcidTable.create(spark, str(tmp_path / "acid_major"), base, key_col="k")
    tx = t.begin()
    tx.delete(F.col("k") <= 5)
    tx.commit()
    t.compact_major()
    dest = str(tmp_path / "hive_major_layout")
    export_hive_acid(t, dest)
    assert sorted(os.listdir(dest)) == ["base_0000001"]
    assert _rows(read_hive_acid(spark, dest)) == _rows(t.read())
    with pytest.raises(ValueError, match="folded"):
        read_hive_acid(spark, dest, valid_until=0)


def test_bucket_and_dir_regexes_are_hive_parseable(spark, tbl, tmp_path):
    """Every emitted name must parse with the exact AcidUtils regex
    shapes so Hive's directory scanner would classify them."""
    dest = str(tmp_path / "hive_layout")
    export_hive_acid(tbl, dest)
    for n in os.listdir(dest):
        assert re.match(r"^(base_\d{7}|delta_\d{7}_\d{7})$", n), n
        for f in os.listdir(os.path.join(dest, n)):
            assert re.match(r"^bucket_\d{5}$", f), f


def test_multibucket_export_roundtrip(spark, tmp_path):
    """num_buckets=4: events route to Hive's own key-hash bucket, each
    dir carries only bucket_%05d files for touched buckets, all of a
    key's events share one bucket, and the merge round-trips — the
    bucketed-transactional-table layout."""
    from apache_hive_2_1_1_src_spark.operators.bucketing import hive_bucket_of

    base = spark.createDataFrame(
        [(i, "g" if i % 2 == 0 else "h", float(i * 10)) for i in range(1, 41)],
        "k int, grp string, v double",
    )
    t = AcidTable.create(spark, str(tmp_path / "acid_mb"), base, key_col="k")
    tx = t.begin()
    tx.update(F.col("k") % 5 == 0, {"v": F.lit(-1.0)})
    tx.commit()
    tx = t.begin()
    tx.delete(F.col("k") % 11 == 0)
    tx.commit()
    dest = str(tmp_path / "mb_layout")
    export_hive_acid(t, dest, num_buckets=4)

    for d in sorted(os.listdir(dest)):
        files = os.listdir(os.path.join(dest, d))
        assert all(re.match(r"^bucket_\d{5}$", f) for f in files), (d, files)
        assert 1 <= len(files) <= 4
    base_files = sorted(os.listdir(os.path.join(dest, "base_0000000")))
    assert base_files == [f"bucket_{b:05d}" for b in range(4)]

    # every event's bucket column equals the Hive hash of its key, and
    # the file it sits in matches
    for d in sorted(os.listdir(dest)):
        for fname in os.listdir(os.path.join(dest, d)):
            fb = int(fname.split("_")[1])
            ev = spark.read.format("orc").load(os.path.join(dest, d, fname))
            rows = ev.collect()
            assert all(r.bucket == fb for r in rows), (d, fname)
            for r in rows:
                if r.operation == 0:
                    assert hive_bucket_of([r.row.k], 4, ["int"]) == fb

    assert _rows(read_hive_acid(spark, dest)) == _rows(t.read())
    for wid in (0, 1, 2):
        assert _rows(read_hive_acid(spark, dest, valid_until=wid)) == _rows(
            t.read(t.snapshot_at(wid))
        )


def test_multibucket_rowids_dense_per_bucket(spark, tmp_path):
    """rowIds restart at 0 within every (delta, bucket) file —
    OrcRecordUpdater numbers rows per bucket, not globally."""
    base = spark.createDataFrame(
        [(i, "x", float(i)) for i in range(1, 41)], "k int, grp string, v double"
    )
    t = AcidTable.create(spark, str(tmp_path / "acid_mbr"), base, key_col="k")
    dest = str(tmp_path / "mbr_layout")
    export_hive_acid(t, dest, num_buckets=4)
    for fname in sorted(os.listdir(os.path.join(dest, "base_0000000"))):
        ev = spark.read.format("orc").load(
            os.path.join(dest, "base_0000000", fname)
        )
        rids = sorted(r.rowId for r in ev.collect())
        assert rids == list(range(len(rids))), fname
