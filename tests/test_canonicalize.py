"""Label-propagation canonicalization: transitive closure within hops."""

from __future__ import annotations

from apache_hive_2_1_1_src_spark.pipeline.dedup import canonicalize_pairs


def test_canonicalize_transitive_chain(spark):
    # chain 1-2, 2-3, 3-4 plus isolated pair 10-11
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    labels = {r.id: r.canonical for r in canonicalize_pairs(pairs, iterations=3).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_canonicalize_bounded_hops(spark):
    # a 6-node path needs 5 hops to fully converge; with 2 iterations the
    # far end only sees its 2-hop minimum — documented bounded behavior
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "id_a long, id_b long"
    )
    labels = {r.id: r.canonical for r in canonicalize_pairs(pairs, iterations=2).collect()}
    assert labels[1] == 1 and labels[2] == 1 and labels[3] == 1
    assert labels[6] == 4  # 2 hops up the chain from 6
