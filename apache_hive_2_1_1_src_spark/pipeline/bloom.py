"""Bloom-filter membership probe for incremental corpus dedup.

The reference ships Bloom filters as ORC row-group indexes
(``orc.bloom.filter.columns``; ql/src/java/org/apache/hadoop/hive/ql/io/
filters Bloom usage in OrcRecordReader) so point predicates can skip
stripes without reading them.  Re-expressed Spark-first for the
training-pipeline membership problem: "has this document's key been seen
in the corpus?" without joining the batch against the full corpus.

Design (100 TB story):

* The filter is a **bit-position table**, not a driver-side bitset:
  ``DISTINCT hash_i(key) % m`` over the corpus — at most ``m`` rows
  (65,536 by default, a few hundred KB), produced by one map-side-combined
  aggregation over the corpus and **broadcast** to the probe side.  The
  corpus is scanned once, the batch never shuffles.
* ``k`` hash functions are disjoint 16-bit slices of the key's md5 —
  pure JVM expressions (``conv(substring(md5(key), …), 16, 10)``), no
  Python, no UDF.
* Probe: explode each batch key into its ``k`` positions, broadcast-join
  the bit table, and a key is *maybe-present* iff all ``k`` positions hit
  (``min(hit)`` per key).  False positives are possible (rate ~fill^k),
  false negatives are not — ``tests/test_pipeline_invariants.py`` pins the
  no-false-negative guarantee and the oracle recomputes both flags
  bit-for-bit.
* Verify: ground-truth ``exact_dup`` is computed ONLY for keys the
  filter flagged (``bloom_maybe``) — the corpus is semi-joined against
  the broadcast *candidate* key set, so no corpus-sized structure is
  ever broadcast (plan-pinned in tests/test_plans.py).
* Sizing: ``m`` must scale with corpus keys (fill ≈ 1-exp(-n*k/m)); at
  100 TB you'd size m per shard-of-corpus or use repeated filters per
  partition epoch — the table form keeps that a pure config change.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Disjoint 4-hex-char (16-bit) slices of md5 — k=5 uses 20 of 32 chars.
_SLICE_WIDTH = 4


def _positions(key: Column, num_hashes: int, num_bits: int) -> Column:
    """Array of ``num_hashes`` bit positions in [0, num_bits) for a key."""
    h = F.md5(key)
    return F.array(
        *[
            F.conv(
                F.substring(h, 1 + _SLICE_WIDTH * i, _SLICE_WIDTH), 16, 10
            ).cast("long")
            % num_bits
            for i in range(num_hashes)
        ]
    )


def bloom_membership_probe(
    new_batch: DataFrame,
    corpus: DataFrame,
    key_col: Column | None = None,
    num_bits: int = 65536,
    num_hashes: int = 5,
) -> DataFrame:
    """Probe each ``new_batch`` document's key against a Bloom filter built
    from ``corpus`` keys.

    Returns (doc_id, bloom_maybe, exact_dup): ``bloom_maybe`` is the
    filter's verdict, ``exact_dup`` the ground-truth key equality (the
    "verify on candidates" stage a real pipeline would run only where
    ``bloom_maybe`` is true).  Invariant: ``exact_dup → bloom_maybe``.
    """
    if key_col is None:
        key_col = F.substring(F.col("text"), 1, 30)

    corpus_keys = corpus.select(key_col.alias("k"))
    bits = (
        corpus_keys.select(
            F.explode(_positions(F.col("k"), num_hashes, num_bits)).alias("pos")
        )
        .distinct()
        .withColumn("hit", F.lit(1))
    )

    probe = new_batch.select(
        "doc_id",
        key_col.alias("k"),
        F.explode(_positions(key_col, num_hashes, num_bits)).alias("pos"),
    )
    maybe = (
        probe.join(F.broadcast(bits), "pos", "left")
        .groupBy("doc_id", "k")
        .agg((F.min(F.coalesce(F.col("hit"), F.lit(0))) == 1).alias("bloom_maybe"))
    )

    # Verify stage — ONLY where bloom_maybe is true, never against the
    # whole corpus: the candidate key set (true dups + false positives,
    # ~fill^k of the batch) is the broadcast side; the corpus is probed
    # with a semi-join and never materialized on one node.  The Bloom
    # guarantee (no false negatives) makes skipping non-candidates safe.
    cand_keys = maybe.filter(F.col("bloom_maybe")).select("k").distinct()
    exact = (
        corpus_keys.join(F.broadcast(cand_keys), "k", "leftsemi")
        .distinct()
        .withColumn("exact_hit", F.lit(True))
    )
    return (
        maybe.join(F.broadcast(exact), "k", "left")
        .select(
            "doc_id",
            "bloom_maybe",
            F.coalesce(F.col("exact_hit"), F.lit(False)).alias("exact_dup"),
        )
    )
