"""Z-order layout pins (operators/layout.py): Morton interleave
correctness, range-disjoint files, data skipping vs round-robin, and a
codegen-only plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_hive_2_1_1_src_spark.operators.layout import (
    _interleave,
    files_touched,
    write_zordered,
    zorder_value,
)


def test_morton_interleave_known_values(spark):
    """z(x=0b11, y=0b01) with 2 dims: bits x0,y0,x1,y1 -> 0b0111 = 7."""
    df = spark.createDataFrame([(3, 1)], "x long, y long")
    z = df.select(
        _interleave([F.col("x"), F.col("y")], bits=2).alias("z")
    ).first().z
    assert z == 0b0111
    df2 = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (1, 1)], "x long, y long")
    zs = [
        r.z
        for r in df2.select(
            _interleave([F.col("x"), F.col("y")], bits=1).alias("z")
        ).collect()
    ]
    assert zs == [0, 1, 2, 3]


def test_zorder_value_is_codegen_only(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    z = zorder_value(ev, ["user_id", "value"])
    plan = z._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        z._jdf.queryExecution(), "formatted"
    )
    for bad in ("PythonUDF", "MapInPandas", "Window"):
        assert bad not in plan, bad


def test_zorder_skips_files(spark, sf_dir, tmp_path):
    """The headline property: a 2-D box over the Z-clustered layout
    touches strictly fewer files than over round-robin."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts_hour", F.hour("ts") + F.dayofyear("ts") * 24
    )
    zp, rp = str(tmp_path / "z"), str(tmp_path / "r")
    write_zordered(ev, zp, ["user_id", "ts_hour"], num_files=16)
    ev.repartition(16).write.mode("overwrite").parquet(rp)
    pred = "user_id <= 2 AND ts_hour BETWEEN 120 AND 264"
    fz, fr = files_touched(spark, zp, pred), files_touched(spark, rp, pred)
    assert fz < fr, (fz, fr)
    # and the data is layout-invariant
    a = spark.read.parquet(zp).filter(pred).count()
    b = spark.read.parquet(rp).filter(pred).count()
    assert a == b and a > 0


def test_zorder_roundtrip_no_row_loss(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = str(tmp_path / "zr")
    write_zordered(ev, out, ["user_id", "value"], num_files=8)
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    assert sorted(back.columns) == sorted(ev.columns)
