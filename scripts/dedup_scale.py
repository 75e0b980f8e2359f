#!/usr/bin/env python
"""MinHash-LSH dedup scaling measurement (Spark-only — DuckDB has no
minhash to compare against): times pipeline.dedup.minhash_dedup on the
sf0.1 documents table and its 100x derivative (built by
scale_crossover.py; rerun that first with --copies 100 --keep).

The claim under test (SCALE_DESIGN.md): banded LSH emits linearly
(bands x rows) and pairs only within band buckets, so end-to-end time
should grow ~linearly in corpus size — not quadratically like all-pairs.

Usage: python scripts/dedup_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apache_hive_2_1_1_src_spark.pipeline.dedup import (  # noqa: E402
    incremental_dedup,
    md5_band_table,
    md5_minhash_signatures,
    minhash_dedup,
)
from apache_hive_2_1_1_src_spark.session import build_session  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATASETS = [
    ("1x", "/root/testdata/sf0.1/documents.parquet"),
    ("100x", os.path.join(REPO, ".bench_scratch/sf1x100/documents.parquet")),
]


def main() -> None:
    spark = build_session(app_name="dedup-scale", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    for label, path in DATASETS:
        if not os.path.exists(path):
            print(f"{label}: missing {path} (run scale_crossover.py first)")
            continue
        docs = spark.read.parquet(path)
        n = docs.count()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            n_pairs = minhash_dedup(docs, num_hashes=32, bands=8, threshold=0.4).count()
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: docs={n} pairs={n_pairs} time={best:.2f}s", flush=True)

    # Incremental claim (VERDICT r4 #3/#4): a FIXED-size new batch deduped
    # against a growing corpus should cost ~O(batch + corpus-signature
    # scan), not O(batch x corpus) — band blocking makes candidate volume
    # track bucket occupancy, and a precomputed corpus band table (the
    # stage-table deployment shape) removes the per-batch signature
    # rebuild entirely.
    batch_src = spark.read.parquet(DATASETS[0][1])
    batch = batch_src.filter(batch_src.doc_id % 50 == 0).localCheckpoint()
    nb = batch.count()
    for label, path in DATASETS:
        if not os.path.exists(path):
            continue
        corpus = spark.read.parquet(path)
        corpus_bands = md5_band_table(
            md5_minhash_signatures(corpus)
        ).localCheckpoint()  # the stored signature stage table
        t0 = time.perf_counter()
        flagged = (
            incremental_dedup(batch, corpus, corpus_bands=corpus_bands)
            .filter("is_near_dup OR is_exact_dup")
            .count()
        )
        dt = time.perf_counter() - t0
        print(
            f"incremental vs {label}: batch={nb} corpus={corpus.count()} "
            f"flagged={flagged} time={dt:.2f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
