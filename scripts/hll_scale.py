#!/usr/bin/env python
"""HyperLogLog (p55) scaling measurement: register build at 1x and
100x documents.

Claim under test: the register table is a FIXED m = 2^p rows no matter
the corpus size (the entire point of the sketch — a 100 TB corpus and a
1 GB corpus both reduce to a 32 KiB summary per shard), and build time
grows ~linearly with the token stream because the per-row work is pure
whole-stage-codegen expressions (xxhash64 + bit ops + one
map-side-combined MAX groupBy; no Python in the row path).

The 100x corpus is the 1x documents unioned under shifted doc_ids, so
the TRUE distinct-token cardinality is unchanged — which also lets us
pin that the 100x estimate equals the 1x estimate exactly (identical
registers: same tokens → same hashes → same maxima).

Usage: python scripts/hll_scale.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from apache_hive_2_1_1_src_spark.pipeline.sketches import (  # noqa: E402
    hll_estimate,
    hll_registers,
)
from apache_hive_2_1_1_src_spark.session import build_session  # noqa: E402

COPIES = 100


def tokens_of(docs):
    return docs.select(
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda w: w != "")
        ).alias("token")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(app_name="hll-scale", shuffle_partitions=32)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()

    big = docs
    for i in range(1, COPIES):
        big = big.unionByName(
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                "text",
                "lang",
                "source",
                "n_chars",
            )
        )
    big = big.repartition(32).cache()
    n_big = big.count()

    t0 = time.time()
    r1 = hll_registers(tokens_of(docs), "token").collect()
    t1x = time.time() - t0

    t0 = time.time()
    r100 = hll_registers(tokens_of(big), "token").collect()
    t100x = time.time() - t0

    e1 = hll_estimate(
        spark.createDataFrame(r1, "bucket long, M int")
    )
    e100 = hll_estimate(
        spark.createDataFrame(r100, "bucket long, M int")
    )
    same = {(r.bucket, r.M) for r in r1} == {(r.bucket, r.M) for r in r100}
    print(
        f"tokens (vocab fixed at 31): docs 1x={n_docs} 100x={n_big}; "
        f"registers 1x={len(r1)} 100x={len(r100)} (m=4096 cap); "
        f"time 1x={t1x:.2f}s 100x={t100x:.2f}s ({t100x / t1x:.1f}x); "
        f"estimate 1x={e1:.0f} 100x={e100:.0f}; "
        f"registers identical={same}"
    )
    assert same, "100x replicated corpus must produce identical registers"

    # growing-cardinality case: doc_id is unique per row, so the true
    # cardinality grows 100x while the register table stays <= m rows
    t0 = time.time()
    k1 = hll_registers(docs.select(F.col("doc_id").cast("string").alias("k")), "k")
    rk1 = k1.collect()
    ek1 = hll_estimate(spark.createDataFrame(rk1, "bucket long, M int"))
    tk1 = time.time() - t0
    t0 = time.time()
    k100 = hll_registers(big.select(F.col("doc_id").cast("string").alias("k")), "k")
    rk100 = k100.collect()
    ek100 = hll_estimate(spark.createDataFrame(rk100, "bucket long, M int"))
    tk100 = time.time() - t0
    err1 = abs(ek1 - n_docs) / n_docs
    err100 = abs(ek100 - n_big) / n_big
    print(
        f"doc_id (true card grows 100x: {n_docs} -> {n_big}): "
        f"registers {len(rk1)} -> {len(rk100)} rows (m=4096 cap, "
        f"fixed summary size); estimate {ek1:.0f} (err {err1:.1%}) -> "
        f"{ek100:.0f} (err {err100:.1%}); time {tk1:.2f}s -> {tk100:.2f}s"
    )
    assert err1 <= 0.05 and err100 <= 0.05
    spark.stop()


if __name__ == "__main__":
    main()
