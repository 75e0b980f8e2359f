"""apache_hive_2_1_1_src_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of Apache Hive 2.1.1 (reference:
BUPTAnderson/apache-hive-2.1.1-src).

Architecture (SURVEY.md §7): a thin, idiomatic PySpark layer over
``SparkSession`` — Catalyst/Tungsten/AQE *are* the optimizer and runtime
(they subsume Hive's Optimizer.java / Vectorizer.java / SkewJoinResolver
wholesale, see SURVEY.md §4).  This package supplies:

* ``session``    — Hive-compatible SparkSession preset (ANSI off, AQE on,
                   UTC, broadcast thresholds) mirroring HiveConf defaults.
* ``io``         — table loading + Hive storage-format defaults
                   (text ^A-delimited ``\\N``-null, ORC, parquet, JSON),
                   mirroring ql/.../io/* and serde2/lazy/LazySimpleSerDe.java.
* ``functions``  — the function-catalog gap set (nvl, field, elt,
                   parse_url_tuple, ngrams, context_ngrams, hive hash...),
                   mirroring ql/.../exec/FunctionRegistry.java:183-520.
* ``operators``  — write paths (partitioned / bucketed / insert-overwrite)
                   and copy-on-write UPDATE/DELETE, mirroring
                   ql/.../exec/FileSinkOperator.java and ACID semantics.
* ``queries``    — the executable operator inventory: one named query per
                   SURVEY.md §2 component, each paired with an ANSI-SQL
                   oracle (DuckDB-runnable) for the correctness gate.
* ``pipeline``   — LLM-training-data operators beyond Hive's surface:
                   dedup (exact / MinHash-LSH / SimHash / embedding),
                   similarity search (brute-force + LSH ANN), text
                   analysis, multimodal column plumbing.
"""

__version__ = "0.2.0"

from apache_hive_2_1_1_src_spark.session import HiveEngine, build_session  # noqa: F401
