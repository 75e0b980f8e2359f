"""LLM-training-data pipeline operators — beyond the reference's surface.

Hive 2.1.1 has no dedup/similarity/multimodal operators; these are the
100 TB data-pipeline extensions the brief requires, built Spark-first:

* ``dedup``      — exact (hash groupBy), MinHash-LSH (banded, shuffle-
                   bounded), SimHash (bit-aggregated), n-gram Jaccard,
                   embedding-cosine near-dup.
* ``similarity`` — brute-force cosine top-k baseline + random-hyperplane
                   LSH bucketed ANN (the scale path).
* ``text``       — quality scoring, token counting, language ID
                   (marker-word heuristic), rolling-hash fingerprinting.
* ``multimodal`` — binary-column plumbing with typed metadata and a
                   stubbed decode behind mapInPandas (decode libs not in
                   this container; Spark-side schema/batching is real).
"""
