"""``hive``-style command-line entry point — the reference's primary
entry path (SURVEY §3.1: ``cli/src/java/org/apache/hadoop/hive/cli/
CliDriver.java:111`` processCmd → Driver.run), re-expressed over
HiveEngine/Catalyst.

Supported flags mirror the reference CLI's surface::

    python -m apache_hive_2_1_1_src_spark.cli -e "SELECT ..."
    python -m apache_hive_2_1_1_src_spark.cli -f script.hql
    --hivevar k=v / -d k=v    ${k} / ${hivevar:k} substitution
    --hiveconf k=v            session conf (hive.cli.print.header honored)
    -S                        silent: results only, no status lines
    --sf-dir DIR              parquet table directory (default
                              $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1)

Output formatting matches Hive's CLI contract: tab-separated columns,
NULL printed as ``NULL``, one line per row, optional header row when
``hive.cli.print.header=true``.  Every statement's result is printed
(CliDriver prints per-statement, unlike run_script's last-only return).
"""

from __future__ import annotations

import argparse
import sys
import time


def _fmt(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, list):
        return "[" + ",".join(_fmt(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{_fmt(k)}:{_fmt(x)}" for k, x in v.items()) + "}"
    return str(v)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="hive-spark", add_help=True)
    ap.add_argument("-e", dest="query", help="SQL from the command line")
    ap.add_argument("-f", dest="file", help="SQL script file")
    ap.add_argument(
        "--hivevar", "-d", dest="hivevars", action="append", default=[],
        metavar="K=V", help="variable for ${k} substitution",
    )
    ap.add_argument(
        "--hiveconf", dest="hiveconfs", action="append", default=[],
        metavar="K=V", help="session configuration",
    )
    ap.add_argument("-S", dest="silent", action="store_true", help="silent mode")
    ap.add_argument("--sf-dir", dest="sf_dir", default=None)
    ap.add_argument(
        "--hplsql", dest="hplsql", action="store_true",
        help="treat the input as an HPL/SQL procedural script "
        "(the reference's separate `hplsql` binary)",
    )
    args = ap.parse_args(argv)

    if bool(args.query) == bool(args.file):
        ap.error("exactly one of -e or -f is required")

    from apache_hive_2_1_1_src_spark.session import HiveEngine

    t0 = time.time()
    eng = HiveEngine(sf_dir=args.sf_dir)
    eng.register_tables()

    conf = {}
    for kv in args.hiveconfs:
        k, _, v = kv.partition("=")
        conf[k] = v
        # spark-recognized keys pass through to the session conf
        try:
            eng.spark.conf.set(k, v)
        except Exception:
            pass
    for kv in args.hivevars:
        k, _, v = kv.partition("=")
        eng.set_var(k, v)

    script = args.query if args.query else open(args.file).read()
    print_header = conf.get("hive.cli.print.header", "false").lower() == "true"

    if not args.silent:
        print(f"Session ready in {time.time() - t0:.3f} seconds", file=sys.stderr)
    if args.hplsql:
        from apache_hive_2_1_1_src_spark.hplsql import run_script

        for line in run_script(script, engine=eng):
            print(line)
        return 0
    for stmt in eng.split_statements(script):
        t_stmt = time.time()  # per-statement, matching Hive's CLI output
        df = eng.sql(stmt)
        rows = df.collect()
        if print_header:
            print("\t".join(df.columns))
        for r in rows:
            print("\t".join(_fmt(v) for v in r))
        if not args.silent:
            print(
                f"Time taken: {time.time() - t_stmt:.3f} seconds, "
                f"Fetched: {len(rows)} row(s)",
                file=sys.stderr,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
