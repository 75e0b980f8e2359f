#!/usr/bin/env python
"""DSIR importance-resampling scaling measurement (Spark-only).

The claim under test (SCALE_DESIGN.md p44): the two hashed-unigram
feature tables are dim rows regardless of corpus size, both joins ride
broadcast, and the only corpus-sized work is two feature-count groupBys
plus the per-doc aggregation — so end-to-end time should grow ~linearly
with corpus size, and the Gumbel-top-k must stay a distributed
TakeOrderedAndProject at every scale.

Builds a 100x key-shifted documents derivative under .bench_scratch/
(self-contained; reuses scale_crossover's explode-expand trick) if it
is not already present.

Usage: python scripts/dsir_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from apache_hive_2_1_1_src_spark.pipeline.curation import dsir_resample  # noqa: E402
from apache_hive_2_1_1_src_spark.session import build_session  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1/documents.parquet"
SCRATCH = os.path.join(REPO, ".bench_scratch/dsir100x/documents.parquet")
COPIES = 100


def build_scaled(spark) -> None:
    if os.path.isdir(SCRATCH):
        return
    docs = spark.read.parquet(SRC)
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    copies = F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1))).alias("__copy")
    (
        docs.repartition(32)
        .select("*", copies)
        .withColumn("doc_id", F.col("doc_id") + F.col("__copy").cast("long") * max_doc)
        .drop("__copy")
        .write.mode("overwrite")
        .parquet(SCRATCH)
    )


def main() -> None:
    spark = build_session(app_name="dsir-scale", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled(spark)
    for label, path in [("1x", SRC), ("100x", SCRATCH)]:
        docs = spark.read.parquet(path)
        n = docs.count()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            sel = dsir_resample(docs, target_source="src0", k=200, dim=256)
            n_sel = sel.count()
            best = min(best, time.perf_counter() - t0)
        plan = sel._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        print(
            f"{label}: docs={n} selected={n_sel} time={best:.2f}s "
            f"take_ordered={'TakeOrderedAndProject' in plan}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
