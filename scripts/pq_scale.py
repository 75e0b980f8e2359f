#!/usr/bin/env python
"""PQ scaling measurement on the 100x embeddings corpus (~200k vectors):
index compression ratio (the reason PQ exists), one-time build cost
(train codebooks + encode, written once), ADC-probe cost for a query
batch, and recall@5 after exact re-rank — against brute force on the
identical batch.

Honesty note: full-corpus ADC is the same O(|Q|x|corpus|) asymptotics
as brute force — its win is the 4-byte-per-vector working set (here:
measured parquet footprint), not FLOPs; the latency win at 100 TB comes
from composing with IVF list restriction (SCALE_DESIGN.md, FAISS
IVFADC).  Both numbers are reported as measured.

Usage: python scripts/pq_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from apache_hive_2_1_1_src_spark.pipeline.pq import (  # noqa: E402
    ivfadc_build,
    ivfadc_probe,
    pq_encode,
    pq_topk,
    train_pq_codebooks,
)
from apache_hive_2_1_1_src_spark.pipeline.similarity import (  # noqa: E402
    brute_force_topk,
)
from apache_hive_2_1_1_src_spark.session import build_session  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = os.path.join(REPO, ".bench_scratch", "emb100x")
CODES = os.path.join(REPO, ".bench_scratch", "emb100x_pq_codes")
M, CPS, K, NQ, RERANK = 8, 16, 5, 50, 50


def _dir_bytes(path: str) -> int:
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )


def main() -> None:
    spark = build_session(app_name="pq-scale", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(SCRATCH):
        raise SystemExit("run scripts/ann_scale.py first (builds the 100x corpus)")
    emb = spark.read.parquet(SCRATCH)
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < NQ)

    t0 = time.perf_counter()
    books = train_pq_codebooks(emb, m=M, codes_per_sub=CPS)
    books.cache().count()
    # pack the per-vector codes into ONE array row for the storage
    # artifact (m small ints per vector — the deployment layout)
    pq_encode(emb, books, m=M).groupBy("id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "code"))), lambda s: s["code"]
        ).alias("codes")
    ).write.mode("overwrite").parquet(CODES)
    t_build = time.perf_counter() - t0

    raw_b = _dir_bytes(SCRATCH)
    code_b = _dir_bytes(CODES)

    t0 = time.perf_counter()
    ap = pq_topk(
        emb, queries, k=K, m=M, codes_per_sub=CPS, rerank=RERANK
    ).select("query_id", "neighbor_id")
    ap.count()
    t_pq = time.perf_counter() - t0

    t0 = time.perf_counter()
    bf = brute_force_topk(emb, queries, k=K).select("query_id", "neighbor_id")
    bf.count()
    t_bf = time.perf_counter() - t0

    # IVFADC: one-time build materialized (cid-bucketed codes table +
    # cached broadcast-sized centroids/books), then the per-batch probe
    IVFADC_IDX = os.path.join(REPO, ".bench_scratch", "emb100x_ivfadc")
    t0 = time.perf_counter()
    centroids, books, index = ivfadc_build(
        emb, num_centroids=64, m=M, codes_per_sub=CPS
    )
    centroids.cache().count()
    books.cache().count()
    index.write.mode("overwrite").partitionBy("cid").parquet(IVFADC_IDX)
    t_ivfadc_build = time.perf_counter() - t0
    index_m = spark.read.parquet(IVFADC_IDX)

    def composed_probe(nprobe: int = 4):
        return ivfadc_probe(
            emb, centroids, books, index_m, queries, k=K, nprobe=nprobe, m=M,
            rerank=RERANK,
        ).select("query_id", "neighbor_id")

    t0 = time.perf_counter()
    composed_probe().count()
    t_ivfadc = time.perf_counter() - t0
    composed = composed_probe()

    exact = {(r.query_id, r.neighbor_id) for r in bf.collect()}
    approx = {(r.query_id, r.neighbor_id) for r in ap.collect()}
    comp = {(r.query_id, r.neighbor_id) for r in composed.collect()}
    recall = len(exact & approx) / max(len(exact), 1)
    recall_c = len(exact & comp) / max(len(exact), 1)

    # nprobe sweep — the recall/latency tuning curve a 100 TB deployment
    # dials (FAISS-style): more probed lists = more candidates = higher
    # recall at linearly more ADC work.  Recorded in BASELINE.md.
    curve = []
    for np_ in (2, 4, 8, 16):
        t0 = time.perf_counter()
        got = {(r.query_id, r.neighbor_id) for r in composed_probe(np_).collect()}
        dt = time.perf_counter() - t0
        curve.append((np_, dt, len(exact & got) / max(len(exact), 1)))
    curve_s = " ".join(f"nprobe={n}:{t:.2f}s/r{r:.3f}" for n, t, r in curve)
    # On-disk ratio understates the win here: the synthetic 100x corpus
    # duplicates vectors so parquet compresses the float side unusually
    # well.  The scan-width ratio is the in-memory working-set story:
    # 64 float dims (256 B) vs m one-byte codes.
    width_ratio = 64 * 4 / M
    print(
        f"vectors={n} queries={NQ} m={M} cps={CPS} "
        f"build_once={t_build:.2f}s pq_probe={t_pq:.2f}s brute={t_bf:.2f}s "
        f"raw_bytes={raw_b} code_bytes={code_b} "
        f"disk_compression={raw_b / max(code_b, 1):.1f}x "
        f"scan_width_ratio={width_ratio:.0f}x recall@{K}={recall:.3f} "
        f"ivfadc_build_once={t_ivfadc_build:.2f}s "
        f"ivfadc_probe={t_ivfadc:.2f}s ivfadc_recall@{K}={recall_c:.3f} "
        f"curve[{curve_s}]"
    )


if __name__ == "__main__":
    main()
