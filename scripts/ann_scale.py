#!/usr/bin/env python
"""ANN scaling measurement on a 100x embeddings corpus (200k vectors):
index-build cost (train + assign, paid ONCE and materialized — the real
deployment shape per pipeline/ivf.py step 2) vs per-batch probe cost,
against brute force, for a 200-query batch.

Claim under test (SCALE_DESIGN.md): the probe joins |Q| x
(nprobe/num_centroids) x |corpus| instead of |Q| x |corpus|, so query
batches against a built index beat brute force by ~num_centroids/nprobe
minus join overhead; the one-time build amortizes across batches.

Usage: python scripts/ann_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from apache_hive_2_1_1_src_spark.pipeline.dedup import cosine  # noqa: E402
from apache_hive_2_1_1_src_spark.pipeline.ivf import (  # noqa: E402
    assign_lists,
    train_centroids,
)
from apache_hive_2_1_1_src_spark.pipeline.similarity import (  # noqa: E402
    brute_force_topk,
)
from apache_hive_2_1_1_src_spark.session import build_session  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = os.path.join(REPO, ".bench_scratch", "emb100x")
INDEX = os.path.join(REPO, ".bench_scratch", "emb100x_ivf")
COPIES = 100
NC, NPROBE, K, NQ = 64, 4, 5, 200


def main() -> None:
    spark = build_session(app_name="ann-scale", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(SCRATCH):
        emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        max_id = emb.agg(F.max("vec_id")).collect()[0][0] + 1
        copies = F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1))).alias("__c")
        (
            emb.repartition(32)
            .select("*", copies)
            .select(
                (F.col("vec_id") + F.col("__c").cast("long") * max_id).alias(
                    "vec_id"
                ),
                F.concat(
                    F.array(
                        F.element_at("embedding", 1)
                        + F.col("__c").cast("float") / 1000.0
                    ),
                    F.slice("embedding", 2, 10_000),
                ).alias("embedding"),
                "label",
            )
            .write.mode("overwrite")
            .parquet(SCRATCH)
        )
    emb = spark.read.parquet(SCRATCH)
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < NQ)

    # one-time index build: train codebook + assign lists, written
    # partitioned by cid (the "built once, probed many times" artifact)
    t0 = time.perf_counter()
    centroids = train_centroids(emb, num_centroids=NC, iterations=2)
    centroids.cache().count()
    assign_lists(emb, centroids).select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("cv"), "cid"
    ).write.mode("overwrite").partitionBy("cid").parquet(INDEX)
    t_build = time.perf_counter() - t0
    index = spark.read.parquet(INDEX)

    def probe():
        q = queries.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        )
        pw = Window.partitionBy("query_id").orderBy(F.desc("cos_c"), F.asc("cid"))
        probes = (
            q.join(F.broadcast(centroids))
            .withColumn("cos_c", cosine(F.col("qv"), F.col("centroid")))
            .withColumn("pr", F.row_number().over(pw))
            .filter(F.col("pr") <= NPROBE)
            .select("query_id", "qv", "cid")
        )
        scored = index.join(
            F.broadcast(probes),
            (index["cid"] == probes["cid"])
            & (F.col("query_id") != F.col("neighbor_id")),
        ).select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cos_exact"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos_exact"), F.asc("neighbor_id")
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= K)
            .select("query_id", "neighbor_id")
        )

    def best(fn, runs=2):
        b = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            b = min(b, time.perf_counter() - t0)
        return b

    t_ivf = best(lambda: probe().count())
    bf = brute_force_topk(emb, queries, k=K).select("query_id", "neighbor_id")
    t_brute = best(lambda: bf.count())
    exact = {(r.query_id, r.neighbor_id) for r in bf.collect()}
    approx = {(r.query_id, r.neighbor_id) for r in probe().collect()}
    recall = len(exact & approx) / max(len(exact), 1)
    print(
        f"vectors={n} queries={NQ} build_once={t_build:.2f}s "
        f"probe={t_ivf:.2f}s brute={t_brute:.2f}s "
        f"speedup={t_brute / t_ivf:.1f}x recall={recall:.2f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
