"""skip.header.line.count / skip.footer.line.count pins (HIVE-5795,
file_with_header_footer.q): skips are per FILE; poison header/footer rows
must never leak; a header+footer-only file yields zero rows; nulls and
the zero-skip degenerate case round-trip."""

from __future__ import annotations

import glob
import os

from apache_hive_2_1_1_src_spark.io import (
    read_hive_text_skips,
    write_text_with_header_footer,
)

SCHEMA = "k int, s string, v double"


def _write(spark, path, n_files=3):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, None), (3, "c", -0.25), (4, "d", 0.0)],
        SCHEMA,
    )
    n = write_text_with_header_footer(
        df.repartition(n_files),
        path,
        ["900\tHEADER\t0.0"],
        ["901\tFOOT1\t0.0", "902\tFOOT2\t0.0"],
        sep="\t",
    )
    assert n == 4
    return df


def test_header_footer_skipped_per_file(spark, tmp_path):
    path = str(tmp_path / "hf")
    _write(spark, path, n_files=3)
    files = glob.glob(os.path.join(path, "*.txt"))
    assert len(files) == 3, "expected one file per partition"
    # every file individually carries the header and two footers
    for p in files:
        lines = open(p, encoding="utf-8").read().splitlines()
        assert lines[0].startswith("900\t")
        assert lines[-2].startswith("901\t") and lines[-1].startswith("902\t")
    back = read_hive_text_skips(
        spark, path, SCHEMA, skip_header=1, skip_footer=2, sep="\t"
    )
    rows = {r["k"]: (r["s"], r["v"]) for r in back.collect()}
    # poison keys 900-902 absent (x3 files!), nulls round-trip via \N
    assert rows == {1: ("a", 1.5), 2: (None, None), 3: ("c", -0.25), 4: ("d", 0.0)}


def test_header_footer_only_file_yields_zero_rows(spark, tmp_path):
    # the reference's `emptytable` case: fewer lines than header+footer
    path = str(tmp_path / "hf_empty")
    os.makedirs(path)
    with open(os.path.join(path, "part-empty.txt"), "w", encoding="utf-8") as fh:
        fh.write("900\tHEADER\t0.0\n901\tFOOT1\t0.0\n902\tFOOT2\t0.0\n")
    back = read_hive_text_skips(
        spark, path, SCHEMA, skip_header=1, skip_footer=2, sep="\t"
    )
    assert back.count() == 0


def test_zero_skips_reads_everything(spark, tmp_path):
    path = str(tmp_path / "hf_zero")
    _write(spark, path, n_files=1)
    back = read_hive_text_skips(spark, path, SCHEMA, sep="\t")
    # with no skips the poison rows ARE data (they parse as valid rows)
    assert back.count() == 4 + 3
    ks = {r["k"] for r in back.collect()}
    assert {900, 901, 902} <= ks


def test_skips_leak_if_applied_per_table_shape(spark, tmp_path):
    # negative control: 3 files x (1 header + 2 footers) = 9 poison lines;
    # a per-TABLE skip of (1,2) would leave 6 of them. The per-FILE reader
    # removes all 9 — pin the distinction explicitly.
    path = str(tmp_path / "hf_ptable")
    _write(spark, path, n_files=3)
    back = read_hive_text_skips(
        spark, path, SCHEMA, skip_header=1, skip_footer=2, sep="\t"
    )
    assert back.filter("k >= 900").count() == 0
    assert back.count() == 4
