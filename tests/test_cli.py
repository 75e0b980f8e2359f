"""CLI entry-point pins (CliDriver.java:111 parity surface): -e / -f,
${hivevar} substitution, tab/NULL formatting, header conf, silent mode.
Runs the module in a subprocess — the real user path."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def run_cli(*argv: str):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("SPARK_GRAFT_CPUS", "4")
    return subprocess.run(
        [sys.executable, "-m", "apache_hive_2_1_1_src_spark.cli", *argv],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=REPO,
    )


def test_e_flag_tab_separated_and_null(tmp_path):
    import duckdb

    want = duckdb.sql(
        f"SELECT n_name, n_regionkey FROM '{SF}/nation.parquet' "
        "WHERE n_nationkey <= 1 ORDER BY n_nationkey"
    ).fetchall()
    p = run_cli(
        "-e",
        "SELECT n_name, NULLIF(n_regionkey, CAST(${zero} AS INT)) AS r FROM nation "
        "WHERE n_nationkey <= 1 ORDER BY n_nationkey",
        "--hivevar",
        "zero=0",
        "--sf-dir",
        SF,
        "-S",
    )
    assert p.returncode == 0, p.stderr[-2000:]
    expect = [
        f"{name}\t{'NULL' if rk == 0 else rk}" for name, rk in want
    ]
    assert p.stdout.splitlines() == expect


def test_f_script_hivevar_header_multi_statement(tmp_path):
    import duckdb

    (n_regions,) = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF}/region.parquet'"
    ).fetchone()
    (rname,) = duckdb.sql(
        f"SELECT r_name FROM '{SF}/region.parquet' WHERE r_regionkey = 2"
    ).fetchone()
    script = tmp_path / "s.hql"
    script.write_text(
        "-- comment only statement;\n"
        "SELECT COUNT(*) AS n FROM region;\n"
        "SELECT r_name FROM region WHERE r_regionkey = ${rk};\n"
    )
    p = run_cli(
        "-f",
        str(script),
        "--hivevar",
        "rk=2",
        "--hiveconf",
        "hive.cli.print.header=true",
        "--sf-dir",
        SF,
        "-S",
    )
    assert p.returncode == 0, p.stderr[-2000:]
    assert p.stdout.splitlines() == ["n", str(n_regions), "r_name", rname]


def test_hplsql_flag_runs_procedural_script(tmp_path):
    """--hplsql mirrors the reference's separate `hplsql` binary
    (hplsql/src/main/java/.../Hplsql.java main): procedural control
    flow on the client, SQL pushed to the engine."""
    script = tmp_path / "p.sql"
    script.write_text(
        "DECLARE total INT = 0;\n"
        "FOR rec IN (SELECT r_regionkey FROM region ORDER BY r_regionkey) LOOP\n"
        "  SET total = total + rec.r_regionkey;\n"
        "END LOOP;\n"
        "IF total = 10 THEN PRINT 'total=' || total; END IF;\n"
    )
    p = run_cli("-f", str(script), "--hplsql", "--sf-dir", SF, "-S")
    assert p.returncode == 0, p.stderr[-2000:]
    assert p.stdout.splitlines() == ["total=10"]
