#!/usr/bin/env python
"""RCFile IO scaling measurement (Spark-only): times the distributed
RCFile write + read-back-aggregate at sf0.01 and sf0.1 lineitem
(~60k → ~600k rows, 10x).

Claim under test (SCALE_DESIGN.md): the writer is one mapInPandas pass
(one container per partition, no shuffle, only a tiny manifest to the
driver) and the reader is binaryFile + mapInArrow + JVM casts — both
should scale ~linearly with input size; partition count, not data
volume, is the only driver-side state.

Usage: python scripts/rcfile_scale.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from apache_hive_2_1_1_src_spark.rcfile_io import (  # noqa: E402
    read_rcfile,
    write_rcfile,
)
from apache_hive_2_1_1_src_spark.session import build_session  # noqa: E402


def measure(spark, sf_dir: str) -> tuple[int, float, float]:
    lt = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).repartition(16)
    n = lt.count()
    out = tempfile.mkdtemp(prefix="rcfile_scale_")
    try:
        t0 = time.time()
        write_rcfile(lt, out)
        t_write = time.time() - t0
        t0 = time.time()
        back = read_rcfile(spark, out, lt.schema)
        back.agg(F.count("*"), F.sum("l_quantity")).collect()
        t_read = time.time() - t0
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return n, t_write, t_read


def main() -> None:
    spark = build_session(app_name="rcfile-scale", shuffle_partitions=16)
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        n, tw, tr = measure(spark, sf_dir)
        print(
            f"{sf_dir}: rows={n} write={tw:.2f}s read+agg={tr:.2f}s "
            f"({n / max(tw, 1e-9):,.0f} rows/s write, "
            f"{n / max(tr, 1e-9):,.0f} rows/s read)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
