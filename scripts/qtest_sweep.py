#!/usr/bin/env python
"""Sweep the reference's SORT_QUERY_RESULTS .q files through the qtest
verbatim runner and record which pass against their own .q.out goldens.

Eligibility pre-filter (structural, before any execution): the file must
only need the classic fixtures (src/src1/srcpart) plus tables it creates
itself, and must avoid surfaces the runner deliberately excludes
(dfs/jar commands, TRANSFORM scripts with repo-relative paths, fixture
tables we do not build).  Everything that survives the filter is RUN;
pass/fail is recorded to qtest_sweep_results.txt.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apache_hive_2_1_1_src_spark import qtest  # noqa: E402
from apache_hive_2_1_1_src_spark.session import HiveEngine, build_session  # noqa: E402

EXCLUDE = re.compile(
    r"\b(add\s+jar|add\s+file|src_thrift|src_json|src_sequencefile|"
    r"alltypesorc|srcbucket|cbo_t4|cbo_t5|cbo_t6|"
    r"creat\w+\s+index|"
    # TRANSFORM is supported; only scripts outside the checkout are not
    r"USING\s+'[^']*\.(py|sh|pl|jar)'|"
    r"druid|import\s|export\s|show\s+locks|"
    r"touch\s|archive\s|unarchive\s|"
    r"tablesample\s*\(\s*bucket|rand\s*\(|"
    r"hive\.server2|windowing_windowspec)\b",
    re.IGNORECASE,
)
#: whole families the runner scopes out (fixture formats / ALTER surfaces
#: the engine covers through its own gate entries instead)
EXCLUDE_NAME = re.compile(
    r"^(encryption_|llap_|vector)"
)


def eligible(name: str, qtext: str) -> bool:
    """Round-8 widening: dfs commands are emulated (qtest._emulate_dfs),
    rcfile_/avro_/alter_ families run through the engine's own format and
    DDL surfaces, and the SORT_QUERY_RESULTS directive is no longer
    required — the runner compares SORTED row sets on both sides, so an
    order-sensitive golden is still value-comparable (only files whose
    goldens depend on Hive-specific row CHOICE, e.g. LIMIT without ORDER
    BY, can legitimately mismatch)."""
    if EXCLUDE_NAME.match(name):
        return False
    if EXCLUDE.search(qtext):
        return False
    # QTestUtil version gates: the reference runs on Hadoop 2 ("0.23"),
    # so 0.20S-only files are excluded there too (their goldens bake
    # the OLD shuffle order — udaf_percentile_approx_20.q)
    m = re.search(
        r"INCLUDE_HADOOP_MAJOR_VERSIONS\s*\(\s*([^)]*)\)", qtext
    )
    if m and "0.23" not in m.group(1):
        return False
    return True


def main() -> None:
    names = []
    for f in sorted(os.listdir(qtest.Q_DIR)):
        if not f.endswith(".q"):
            continue
        name = f[:-2]
        if not os.path.exists(os.path.join(qtest.OUT_DIR, f + ".out")):
            continue
        try:
            qtext = open(os.path.join(qtest.Q_DIR, f), encoding="utf-8").read()
        except Exception:
            continue
        if eligible(name, qtext):
            names.append(name)
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("limit", nargs="?", type=int, default=None)
    ap.add_argument("--skip-file", help="results file whose names to skip")
    ap.add_argument("--shard", help="i/N slice of the name list")
    ap.add_argument("--out", default="qtest_sweep_results.txt")
    # NOT under /tmp: tmpwatch-style cleanup mid-sweep killed shard 2's
    # tail in round 11 (40 stage-failure ERRORs, all late stages)
    ap.add_argument(
        "--warehouse",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".qtest-sweep-warehouse",
        ),
    )
    args = ap.parse_args()
    if args.skip_file and os.path.exists(args.skip_file):
        done = {
            ln.split("\t", 1)[0] for ln in open(args.skip_file) if "\t" in ln
        }
        names = [n for n in names if n not in done]
    if args.shard:
        i, n = (int(x) for x in args.shard.split("/"))
        names = names[i::n]
    if args.limit:
        names = names[: args.limit]
    print(f"{len(names)} eligible files")
    # isolated warehouse: the sweep runs for a long time and must not
    # collide with other engine sessions dropping/creating the same
    # fixture tables in the default spark-warehouse
    spark = build_session(
        app_name="qtest-sweep",
        shuffle_partitions=8,
        warehouse_dir=args.warehouse,
    )
    spark.sparkContext.setLogLevel("ERROR")
    eng = HiveEngine(spark, "/root/testdata/sf0.001")
    qtest.init_classic_tables(eng)
    out = open(args.out, "w")
    n_pass = 0
    for i, name in enumerate(names):
        try:
            rep = qtest.run_qfile(eng, name)
            if rep.ok and rep.compared > 0:
                # tol = statements matching only under float tolerance
                # (cross-engine double accumulation ulps) — visible, not
                # hidden inside the byte-match count
                suffix = f" tol={rep.tol}" if rep.tol else ""
                status = f"PASS compared={rep.compared}{suffix}"
                n_pass += 1
            elif rep.ok:
                status = "NO_RESULTS"
            elif rep.error:
                status = f"STRUCT {rep.error[:80]}"
            else:
                status = f"MISMATCH {rep.mismatches[0][:120]}"
        except Exception as e:  # noqa: BLE001
            status = "ERROR " + " ".join(str(e).split())[:160]
        out.write(f"{name}\t{status}\n")
        out.flush()
        print(f"[{i + 1}/{len(names)}] {name}: {status.split()[0]}", flush=True)
    out.write(f"# {n_pass} verbatim-pass of {len(names)} attempted\n")
    out.close()
    print(f"{n_pass}/{len(names)} verbatim-pass")
    spark.stop()


if __name__ == "__main__":
    main()
