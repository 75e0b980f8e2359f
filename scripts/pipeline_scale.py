#!/usr/bin/env python
"""Pipeline-tier scaling measurement (Spark-only): times the composed
curation funnel (p31), repeated-passage detection (p42), and the
per-stratum adaptive quality filter (p45) on sf0.1 documents and the
100x key-shifted derivative that scripts/dsir_scale.py builds.

Claims under test (SCALE_DESIGN.md): the funnel executes as ONE plan
with one substantive shuffle; passage detection emits linearly
(n_tokens/stride windows per doc) with a content-uniform groupBy; the
adaptive filter's only corpus-sized work is the score projection plus a
|strata|-row aggregate.  All three should scale ~linearly, far below
the 10,000x a quadratic shape would show at 100x.

Usage: python scripts/dsir_scale.py   # builds the 100x derivative
       python scripts/pipeline_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apache_hive_2_1_1_src_spark.pipeline.bloom import (  # noqa: E402
    bloom_membership_probe,
)
from apache_hive_2_1_1_src_spark.pipeline.curation import (  # noqa: E402
    corpus_pipeline,
    epoch_shuffle,
    length_bucketed_batching,
)
from apache_hive_2_1_1_src_spark.pipeline.dedup import (  # noqa: E402
    duplicated_span_fraction,
)
from apache_hive_2_1_1_src_spark.pipeline.text import (  # noqa: E402
    adaptive_quality_filter,
)
from apache_hive_2_1_1_src_spark.session import build_session  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATASETS = [
    ("1x", "/root/testdata/sf0.1/documents.parquet"),
    ("100x", os.path.join(REPO, ".bench_scratch/dsir100x/documents.parquet")),
]
from pyspark.sql import functions as _F  # noqa: E402


def _bloom(d):
    # 100x corpus needs a bigger filter: scale m with the corpus so the
    # fill (1-exp(-nk/m)) stays comparable — the config-only resize the
    # table form allows (SCALE_DESIGN.md)
    n = d.count()
    m = 1 << 16 if n <= 10_000 else 1 << 23
    return bloom_membership_probe(
        d.filter(_F.col("doc_id") % 5 == 0),
        d.filter(_F.col("doc_id") % 5 != 0),
        num_bits=m,
    )


OPS = [
    ("p31_funnel", lambda d: corpus_pipeline(d)),
    ("p42_passages", lambda d: duplicated_span_fraction(d)),
    ("p45_adaptive_filter", lambda d: adaptive_quality_filter(d)),
    ("p46_bloom_probe", _bloom),
    # checksum-aggregate the positions so Catalyst cannot prune the
    # window out of a bare count()
    (
        "p47_epoch_shuffle",
        lambda d: epoch_shuffle(d, seed=2, n_shards=256)
        .groupBy("shard")
        .agg(_F.sum("pos").alias("pos_sum")),
    ),
    ("p51_length_buckets", lambda d: length_bucketed_batching(d)),
    # near-dup pairs on adjacent ids keep the component graph sparse at
    # both scales; the op under test is the CC + side-assignment chain
    (
        "p57_leakage_split",
        lambda d: __import__(
            "apache_hive_2_1_1_src_spark.pipeline.dedup", fromlist=["x"]
        ).leakage_safe_split(
            d.select(_F.col("doc_id").alias("vec_id")),
            d.select(
                _F.col("doc_id").alias("id_a"),
                (_F.col("doc_id") + 1).alias("id_b"),
            ).filter(_F.col("id_a") % 50 == 0),
            id_col="vec_id",
        ),
    ),
    (
        "p58_temp_rebalance",
        lambda d: __import__(
            "apache_hive_2_1_1_src_spark.pipeline.curation", fromlist=["x"]
        ).temperature_rebalance(d, temperature=2.0, target_frac=0.5),
    ),
]


def main() -> None:
    spark = build_session(app_name="pipeline-scale", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    for label, path in DATASETS:
        if not os.path.exists(path):
            print(f"{label}: missing {path} (run scripts/dsir_scale.py first)")
            continue
        docs = spark.read.parquet(path)
        n = docs.count()
        for op_name, fn in OPS:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                cnt = fn(docs).count()
                best = min(best, time.perf_counter() - t0)
            print(f"{label} {op_name}: docs={n} out_rows={cnt} time={best:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
