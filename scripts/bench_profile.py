#!/usr/bin/env python
"""Round-13 optimization measurement harness (guide §1).

Two modes:
  plans  — capture .explain("formatted") for every headline query into
           plans/r13/<query>_<tag>.txt (judge-checkable plan evidence).
  time   — per-query isolation timing: best-of-N wall time for the SAME
           action bench.py uses (df.count(), q85 collect) AND the noop
           sink (df.write.format('noop')) which computes every column
           (guide §1.4).  Prints one JSON line per query.

Usage:
  python scripts/bench_profile.py plans  [tag] [query ...]
  python scripts/bench_profile.py time   [reps] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apache_hive_2_1_1_src_spark.queries import all_queries  # noqa: E402
from apache_hive_2_1_1_src_spark.session import build_session  # noqa: E402

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q10_broadcast_region_revenue",
    "q116_local_supplier_volume",
    "q129_waiting_orders",
    "q24_count_distinct",
    "q29_grouping_sets",
    "q40_row_number_topk",
    "q79_cte",
    "q85_write_partitioned",
    "p01_dedup_exact",
    "p02_dedup_minhash_lsh",
    "p06_ann_bruteforce",
    "p08_text_quality",
    "p14_tfidf",
    "q96_streaming_window_counts",
    "q103_sessionization",
    "q142_asof_join",
    "q144_time_rollup",
    "p31_corpus_pipeline",
]


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(
        app_name=f"bench-profile-{mode}",
        shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.coalescePartitions.parallelismFirst": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    if mode == "plans":
        tag = sys.argv[2] if len(sys.argv) > 2 else "before"
        names = sys.argv[3:] or HEADLINE
        outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = queries[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(outdir, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
        return

    # time mode
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3:] or HEADLINE
    # warm JVM + listing cache, same as bench.py
    queries["q01_pricing_summary"](spark, sf_dir).collect()
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        best_cnt = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            if name == "q85_write_partitioned":
                df.collect()
            else:
                df.count()
            best_cnt = min(best_cnt, time.perf_counter() - t0)
        best_noop = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best_noop = min(best_noop, time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        print(
            json.dumps(
                {"query": name, "count_sec": round(best_cnt, 3), "noop_sec": round(best_noop, 3)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
