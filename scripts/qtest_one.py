#!/usr/bin/env python
"""Run specific named .q files through the qtest runner — fast iteration
loop for fixing individual golden-file mismatches.

Usage: python scripts/qtest_one.py name1 [name2 ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apache_hive_2_1_1_src_spark import qtest  # noqa: E402
from apache_hive_2_1_1_src_spark.session import HiveEngine, build_session  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    import os as _os

    spark = build_session(
        app_name="qtest-one",
        shuffle_partitions=8,
        warehouse_dir=_os.environ.get("QTEST_ONE_WAREHOUSE"),
    )
    spark.sparkContext.setLogLevel("ERROR")
    eng = HiveEngine(spark, "/root/testdata/sf0.001")
    qtest.init_classic_tables(eng)
    n_pass = 0
    for name in names:
        try:
            rep = qtest.run_qfile(eng, name)
            if rep.ok and rep.compared > 0:
                suffix = f" tol={rep.tol}" if rep.tol else ""
                status = f"PASS compared={rep.compared}{suffix}"
                n_pass += 1
            elif rep.ok:
                status = "NO_RESULTS"
            elif rep.error:
                status = f"STRUCT {rep.error[:300]}"
            else:
                status = "MISMATCH " + " || ".join(m[:300] for m in rep.mismatches[:4])
        except Exception as e:  # noqa: BLE001
            status = "ERROR " + " ".join(str(e).split())[:300]
        print(f"{name}\t{status}", flush=True)
    print(f"{n_pass}/{len(names)} pass")
    spark.stop()


if __name__ == "__main__":
    main()
