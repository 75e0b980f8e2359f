"""Structured Streaming surface.

The reference has no streaming *query* semantics — its only streaming API
is transactional ingest (hcatalog/streaming/.../HiveEndPoint.java, append-
only ACID writes; SURVEY.md §2.9), so none of this is parity-required.
It exists because a 100 TB training-data pipeline ingests continuously:
``readStream`` over a landing directory, event-time windowed aggregation
with watermarks, and ``Trigger.AvailableNow`` for deterministic catch-up
batch runs (used by the correctness gate: a stream processed to completion
must equal the batch answer over the same data).
"""

from apache_hive_2_1_1_src_spark.streaming.jobs import (  # noqa: F401
    streaming_event_counts,
    windowed_event_counts_batch_equivalent,
)
