"""Streaming jobs with batch-equivalent semantics.

The deterministic contract: a windowed streaming aggregation run with
``Trigger.AvailableNow`` over a static directory must produce exactly the
batch GROUP BY window() answer — which is what the DuckDB oracle checks
(tumbling windows are date_trunc buckets).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_2_1_1_src_spark.io import load_events


def _events_with_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_events(spark, sf_dir)


def streaming_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling-window event counts computed as a *stream*:
    readStream over the events data, 30-minute watermark, availableNow
    trigger, memory sink — then returned as a static DataFrame.

    Mirrors the shape of a production ingest pipeline; the watermark is
    semantically inert here (bounded input) but exercises the state-store
    path.
    """
    src_dir = os.path.join(tempfile.gettempdir(), f"hive_spark_stream_src_{os.getpid()}")
    # stage the static events as the stream's landing directory (retain
    # schema; ts restored from nanos in load_events)
    events = _events_with_ts(spark, sf_dir).select("event_id", "ts", "event_type", "value")
    events.write.mode("overwrite").parquet(src_dir)

    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, event_type string, value double"
        )
        .parquet(src_dir)
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    query_name = f"stream_event_counts_{os.getpid()}"
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name).select(
        F.col("win.start").alias("win_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


def windowed_event_counts_batch_equivalent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch twin of streaming_event_counts (same window(), same aggs) —
    used by tests to assert stream == batch."""
    events = _events_with_ts(spark, sf_dir)
    return (
        events.groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("win.start").alias("win_start"), "event_type", "n_events", "sum_value")
    )
