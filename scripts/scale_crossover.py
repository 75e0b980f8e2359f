#!/usr/bin/env python
"""Scale-crossover experiment: Spark-vs-DuckDB ratio as data grows.

BASELINE.md documents why sf0.1 timings are floor-bound for Spark
(single-row-group files + fixed per-query scheduling cost).  This script
makes that claim empirical: it derives a 10x dataset (sf~1: ~6M lineitem
rows, 16 parquet files) from the driver's sf0.1 tables by unioning
key-shifted copies, then times three representative shapes at 1x and 10x
on both engines:

* agg      — the flagship pricing-summary aggregation (scan+filter+agg)
* join     — orders JOIN lineitem revenue top-N (shuffle join)
* text     — per-document word/stopword feature extraction (compute-bound)

Expected result (recorded in BASELINE.md): the Spark/DuckDB ratio drops
by roughly the scale factor on scan/agg shapes (fixed costs amortize)
and Spark overtakes DuckDB on the compute-bound text shape, because the
work parallelizes across local[32] while DuckDB saturates.

Scratch data lives under .bench_scratch/ (gitignored); pass --keep to
skip regeneration on reruns.

Usage: python scripts/scale_crossover.py [--keep]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from apache_hive_2_1_1_src_spark.session import build_session  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.1"
COPIES = int(
    sys.argv[sys.argv.index("--copies") + 1] if "--copies" in sys.argv else 10
)
SCRATCH = os.path.join(REPO, ".bench_scratch", f"sf1x{COPIES}")

AGG_SQL = """
  SELECT l_returnflag, l_linestatus,
         CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
         CAST(SUM(l_extendedprice * (1 - l_discount)) AS DOUBLE) AS sum_disc,
         COUNT(*) AS n
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
  GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
"""
JOIN_SQL = """
  SELECT o_orderpriority,
         CAST(SUM(l_extendedprice * (1 - l_discount)) AS DOUBLE) AS revenue
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  GROUP BY o_orderpriority ORDER BY revenue DESC LIMIT 5
"""
TEXT_SQL = """
  SELECT CAST(AVG(nw) AS DOUBLE) AS avg_words,
         CAST(AVG(ns * 1.0 / GREATEST(nw, 1)) AS DOUBLE) AS avg_stop_ratio
  FROM (SELECT len(w) AS nw,
               len(list_intersect(w, ['the','a','an','and','or','of','to','in','is','it'])) AS ns
        FROM (SELECT list_filter(string_split_regex(lower(text), '\\s+'),
                                 x -> x != '') AS w
              FROM documents))
"""


def build_scaled(spark) -> None:
    if os.path.isdir(SCRATCH):
        if "--keep" in sys.argv:
            return
        shutil.rmtree(SCRATCH)
    os.makedirs(SCRATCH, exist_ok=True)
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    od = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    max_ok = od.agg(F.max("o_orderkey")).collect()[0][0] + 1
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1

    nfiles = max(16, COPIES // 3)

    def shift(df, col, step, nf):
        # copy-expand via explode(range) — one job, not COPIES unions.
        # repartition BEFORE the explode so the 100x fan-out runs on all
        # cores (the single-row-group source reads as ~3 tasks otherwise)
        # and the output lands pre-spread across nf files.
        copies = F.explode(
            F.sequence(F.lit(0), F.lit(COPIES - 1))
        ).alias("__copy")
        return (
            df.repartition(nf)
            .select("*", copies)
            .withColumn(col, F.col(col) + F.col("__copy").cast("long") * step)
            .drop("__copy")
        )

    shift(li, "l_orderkey", max_ok, nfiles).write.mode(
        "overwrite"
    ).parquet(f"{SCRATCH}/lineitem.parquet")
    shift(od, "o_orderkey", max_ok, nfiles // 2).write.mode(
        "overwrite"
    ).parquet(f"{SCRATCH}/orders.parquet")
    shift(docs, "doc_id", max_doc, nfiles // 2).write.mode(
        "overwrite"
    ).parquet(f"{SCRATCH}/documents.parquet")


def spark_queries(spark, d):
    li = spark.read.parquet(f"{d}/lineitem.parquet")
    od = spark.read.parquet(f"{d}/orders.parquet")
    docs = spark.read.parquet(f"{d}/documents.parquet")
    agg = (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
    join = (
        od.join(li, od.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"))
        .limit(5)
    )
    words = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda w: w != "")
    stop = F.array(*[F.lit(s) for s in ("the", "a", "an", "and", "or", "of",
                                        "to", "in", "is", "it")])
    text = docs.select(
        F.size(words).alias("nw"),
        F.size(F.filter(words, lambda w: F.array_contains(stop, w))).alias("ns"),
    ).agg(
        F.avg("nw").alias("avg_words"),
        F.avg(F.col("ns") / F.greatest(F.col("nw"), F.lit(1))).alias(
            "avg_stop_ratio"
        ),
    )
    return {"agg": agg, "join": join, "text": text}


def best_of(fn, n=2):
    b = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        b = min(b, time.perf_counter() - t0)
    return b


def main() -> None:
    spark = build_session(
        app_name="scale-crossover",
        shuffle_partitions=16,
        extra_conf={"spark.sql.adaptive.coalescePartitions.parallelismFirst": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled(spark)

    for label, d in (("1x (sf0.1)", SF_DIR), (f"{COPIES}x", SCRATCH)):
        con = duckdb.connect()
        for tname in ("lineitem", "orders", "documents"):
            # scaled dirs hold multi-file datasets; sf0.1 holds single files
            path = f"{d}/{tname}.parquet"
            glob = f"{path}/*.parquet" if os.path.isdir(path) else path
            con.execute(f"CREATE VIEW {tname} AS SELECT * FROM '{glob}'")
        sq = spark_queries(spark, d)
        sq["agg"].count()  # warm file listing
        print(f"== {label} ==")
        for shape, duck_sql in (("agg", AGG_SQL), ("join", JOIN_SQL),
                                ("text", TEXT_SQL)):
            s = best_of(lambda: sq[shape].count())
            k = best_of(lambda: con.execute(duck_sql).fetchall())
            print(
                f"  {shape:5s} spark={s:7.3f}s duckdb={k:7.3f}s "
                f"ratio={s / k:6.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
