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


def _stage_once(tag: str, sf_dir: str, write) -> str:
    """Stage a stream's landing directory once per (process, sf_dir).

    Staging is ingest setup, not part of the streaming computation; a
    real pipeline reads a directory that already exists.  Keyed by
    sf_dir so different scale factors never share a landing dir, and by
    pid so parallel test runs stay isolated.  ``write(path)`` runs only
    on the first call.
    """
    key = abs(hash(sf_dir)) % 10**8  # salted per process; pid disambiguates
    path = os.path.join(
        tempfile.gettempdir(), f"hive_spark_{tag}_{os.getpid()}_{key}"
    )
    if not os.path.isdir(path):
        write(path)
    return path


def streaming_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling-window event counts computed as a *stream*:
    readStream over the events data, 30-minute watermark, availableNow
    trigger, memory sink — then returned as a static DataFrame.

    Mirrors the shape of a production ingest pipeline; the watermark is
    semantically inert here (bounded input) but exercises the state-store
    path.
    """
    # stage the static events as the stream's landing directory (retain
    # schema; ts restored from nanos in load_events)
    src_dir = _stage_once(
        "stream_src",
        sf_dir,
        lambda p: _events_with_ts(spark, sf_dir)
        .select("event_id", "ts", "event_type", "value")
        .write.mode("overwrite")
        .parquet(p),
    )

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


def stateful_user_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running summary (event count, value sum, first/last event id)
    kept in explicit GroupState — the arbitrary-state API the brief calls
    out for operators windowed aggregation can't express.

    Run with availableNow over a static staging dir, so the final state
    equals the batch GROUP BY answer — which is the oracle.
    """
    import os
    import tempfile
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src_dir = _stage_once(
        "state_src",
        sf_dir,
        lambda p: _events_with_ts(spark, sf_dir)
        .select("user_id", "event_id", "value")
        .write.mode("overwrite")
        .parquet(p),
    )

    output_schema = (
        "user_id bigint, n_events bigint, sum_value double, "
        "first_event bigint, last_event bigint"
    )
    state_schema = "n bigint, s double, first bigint, last bigint"

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s, first, last = state.get if state.exists else (0, 0.0, None, None)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            lo = int(pdf["event_id"].min())
            hi = int(pdf["event_id"].max())
            first = lo if first is None else min(first, lo)
            last = hi if last is None else max(last, hi)
        state.update((n, s, first, last))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [round(s, 2)],
                "first_event": [first],
                "last_event": [last],
            }
        )

    stream = (
        spark.readStream.schema("user_id bigint, event_id bigint, value double")
        .parquet(src_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            output_schema,
            state_schema,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
    query_name = f"stateful_user_summary_{os.getpid()}"
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update-mode memory sink may hold one row per state update; keep the
    # final (max n_events) row per user for the deterministic comparison
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    out = spark.table(query_name)
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
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


def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication through the state store: dropDuplicates on
    (user_id, event_type) with a watermark, availableNow trigger.  WHICH
    physical row survives is arrival-order-dependent, so the job returns
    only the deduplicated KEY SET — deterministic, and exactly the batch
    SELECT DISTINCT answer (the oracle).

    At scale the watermark bounds state: keys older than the delay are
    evicted, which is what makes streaming dedup viable indefinitely.
    """
    src_dir = _stage_once(
        "dedup_src",
        sf_dir,
        lambda p: _events_with_ts(spark, sf_dir)
        .select("user_id", "event_type", "ts")
        .write.mode("overwrite")
        .parquet(p),
    )

    stream = (
        spark.readStream.schema("user_id bigint, event_type string, ts timestamp")
        .parquet(src_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    query_name = f"stream_dedup_{os.getpid()}"
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name).orderBy("user_id", "event_type")


def streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with watermarks and a time-bound condition:
    each purchase joined to views by the same user within the preceding
    hour.  With availableNow over bounded input the emitted match set is
    exactly the batch time-bound join (the oracle); the watermark + range
    condition is what lets Spark evict join state at scale.
    """
    src_dir = _stage_once(
        "ssjoin_src",
        sf_dir,
        lambda p: _events_with_ts(spark, sf_dir)
        .select("event_id", "user_id", "event_type", "ts")
        .write.mode("overwrite")
        .parquet(p),
    )
    schema = "event_id bigint, user_id bigint, event_type string, ts timestamp"

    views = (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        .filter(F.col("event_type") == "view")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
    )
    buys = (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("b_user"),
            F.col("event_id").alias("buy_id"),
            F.col("ts").alias("b_ts"),
        )
    )
    joined = views.join(
        buys,
        (F.col("v_user") == F.col("b_user"))
        & (F.col("v_ts") <= F.col("b_ts"))
        & (F.col("b_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("b_user", "buy_id", "view_id")
    query_name = f"stream_ssjoin_{os.getpid()}"
    q = (
        joined.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(query_name)
        .groupBy("b_user")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("buy_id").alias("first_buy"),
        )
        .orderBy("b_user")
    )


def streaming_foreach_batch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch idempotent sink: per-user aggregates streamed into a
    parquet target keyed by batch id — the exactly-once recipe for sinks
    without transactional streaming support (re-run of a batch id
    overwrites its own directory instead of double-appending; the
    checkpoint ties batch id to input range).

    With availableNow over bounded input the final table equals the
    batch GROUP BY, which is what the oracle checks.
    """
    src_dir = _stage_once(
        "fb_src",
        sf_dir,
        lambda p: _events_with_ts(spark, sf_dir)
        .select("event_id", "user_id", "value")
        .write.mode("overwrite")
        .parquet(p),
    )
    out_dir = os.path.join(
        tempfile.gettempdir(), f"hive_spark_fb_out_{os.getpid()}"
    )
    ckpt_dir = os.path.join(
        tempfile.gettempdir(), f"hive_spark_fb_ckpt_{os.getpid()}"
    )
    import shutil

    for d in (out_dir, ckpt_dir):
        shutil.rmtree(d, ignore_errors=True)

    stream = (
        spark.readStream.schema("event_id bigint, user_id bigint, value double")
        .parquet(src_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # idempotent: the batch's own directory is replaced wholesale on
        # retry — never appended
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .outputMode("complete")
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # read back the LAST batch (complete mode: each batch is the full
    # answer; the max batch id is the final state)
    batches = spark.read.option("basePath", out_dir).parquet(out_dir)
    last = batches.agg(F.max("batch_id")).collect()[0][0]
    return (
        batches.filter(F.col("batch_id") == last)
        .select("user_id", "n_events", "sum_value")
        .orderBy("user_id")
    )


def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (F.session_window, 30-min gap) run to
    completion with availableNow — the stream counterpart of the batch
    q150 shape, and the state-merge path Hive never had: Spark's state
    store merges adjacent per-batch sessions whose gap is under the
    timeout, so the final table equals the batch islands answer exactly.

    Complete output mode re-emits the whole result each trigger, which
    sidesteps append-mode's "sessions past the final watermark never
    close" truncation on bounded input.
    """
    src_dir = _stage_once(
        "sesswin_src",
        sf_dir,
        lambda p: _events_with_ts(spark, sf_dir)
        .select("user_id", "event_id", "ts")
        .write.mode("overwrite")
        .parquet(p),
    )
    stream = (
        spark.readStream.schema("user_id bigint, event_id bigint, ts timestamp")
        .parquet(src_dir)
        .filter(F.col("user_id") < 150)
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("first_event"),
        )
    )
    query_name = f"stream_session_windows_{os.getpid()}"
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name).select(
        "user_id",
        F.col("w.start").alias("session_start"),
        "n_events",
        "first_event",
    ).orderBy("user_id", "session_start")


def streaming_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGE upsert via foreachBatch — the Structured-Streaming
    upsert pattern (stream of changes merged into a base table per
    micro-batch) without a transactional table format: each batch applies
    the q160 copy-on-write full-outer rewrite and commits a new table
    VERSION directory plus a pointer file (exactly the version-pointer
    commit a COW table format performs; retries overwrite their own
    version → idempotent).

    Updates: keys %13==0 get price+500; inserts: keys %509==0 arrive
    shifted past MAX(o_orderkey) with status 'N'.  With availableNow over
    bounded input the final version equals the one-shot batch merge,
    which the oracle checks.
    """
    import json
    import shutil

    from apache_hive_2_1_1_src_spark.io import load_table

    orders = load_table(spark, sf_dir, "orders")
    max_key = orders.agg(F.max("o_orderkey")).collect()[0][0]

    def stage_updates(p: str) -> None:
        upd = orders.filter(F.col("o_orderkey") % 13 == 0).select(
            F.col("o_orderkey").alias("k"),
            (F.col("o_totalprice") + 500).alias("new_price"),
        )
        ins = orders.filter(F.col("o_orderkey") % 509 == 0).select(
            (F.col("o_orderkey") + F.lit(max_key) + 1).alias("k"),
            F.lit(50.0).alias("new_price"),
        )
        upd.union(ins).write.mode("overwrite").parquet(p)

    src_dir = _stage_once("upsert_src", sf_dir, stage_updates)

    table_root = os.path.join(
        tempfile.gettempdir(), f"hive_spark_upsert_tbl_{os.getpid()}"
    )
    ckpt_dir = os.path.join(
        tempfile.gettempdir(), f"hive_spark_upsert_ckpt_{os.getpid()}"
    )
    for d in (table_root, ckpt_dir):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(table_root)
    # version 0 = the base table (narrow projection of the merge columns)
    base = orders.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    base.write.mode("overwrite").parquet(os.path.join(table_root, "v0"))
    pointer = os.path.join(table_root, "_CURRENT")
    with open(pointer, "w") as f:
        json.dump({"version": 0}, f)

    def current_version() -> int:
        with open(pointer) as f:
            return json.load(f)["version"]

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        cur = current_version()
        tbl = spark.read.parquet(os.path.join(table_root, f"v{cur}"))
        src = batch_df
        m = tbl.join(src, tbl["key"] == src["k"], "full_outer")
        merged = m.select(
            F.coalesce(F.col("key"), F.col("k")).alias("key"),
            F.when(F.col("key").isNull(), F.lit("N"))
            .otherwise(F.col("status"))
            .alias("status"),
            F.when(F.col("k").isNotNull(), F.col("new_price"))
            .otherwise(F.col("price"))
            .alias("price"),
        )
        # commit = write the new version dir (idempotent on retry), then
        # flip the pointer
        merged.write.mode("overwrite").parquet(
            os.path.join(table_root, f"v{batch_id + 1}")
        )
        with open(pointer, "w") as f:
            json.dump({"version": batch_id + 1}, f)

    # maxFilesPerTrigger=1 forces one micro-batch per staged file, so the
    # version chain exercises REAL incremental merges (v0→v1→…→vN), not a
    # single catch-all batch; each key appears in exactly one update file,
    # so slice-by-slice upserts land the same final state the oracle checks
    stream = (
        spark.readStream.schema("k bigint, new_price double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final = spark.read.parquet(
        os.path.join(table_root, f"v{current_version()}")
    )
    return (
        final.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("price"), 2).alias("total_price"),
        )
        .orderBy("status")
    )


def stream_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join — the dimension-enrichment shape every ingest
    pipeline runs: a stream of events joins a STATIC dimension table
    (customer) row-by-row as micro-batches arrive.  Stream-static inner
    joins are stateless (no watermark, no state store — each batch joins
    against the static snapshot), and the static side broadcasts, so the
    stream side never shuffles for the join.

    availableNow over bounded input ⇒ result equals the batch join, which
    the oracle checks (counts + value sums per market segment).
    """
    src_dir = _stage_once(
        "enrich_src",
        sf_dir,
        lambda p: _events_with_ts(spark, sf_dir)
        .select("event_id", "user_id", "value")
        .write.mode("overwrite")
        .parquet(p),
    )
    from apache_hive_2_1_1_src_spark.io import load_table

    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    stream = (
        spark.readStream.schema("event_id bigint, user_id bigint, value double")
        .parquet(src_dir)
        .join(F.broadcast(dim), F.col("user_id") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    query_name = f"stream_enrich_{os.getpid()}"
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name).orderBy("c_mktsegment")


def streaming_checkpoint_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint crash/restart recovery with exactly-once output — the
    guarantee a production ingest pipeline actually relies on.

    Deterministic two-run protocol (no timing games):

    1. stage HALF the events (even event_id) into the landing dir and
       run an availableNow query to completion — the checkpoint records
       every processed file;
    2. append the other half and START A NEW QUERY over the SAME
       checkpoint: Structured Streaming's file-source log makes the
       restarted query process ONLY the unseen files.

    The sink is the idempotent foreachBatch per-batch-directory pattern
    in append mode (each micro-batch writes its own partial aggregate;
    retries overwrite their own directory).  Final answer = re-aggregate
    of all batch partials.  If recovery double-processed the first half
    — or dropped it — the per-type counts diverge from the batch oracle,
    so the driver's hash IS the exactly-once check.
    """
    import shutil

    base = os.path.join(
        tempfile.gettempdir(),
        f"hive_spark_ckpt_recovery_{os.getpid()}_{abs(hash(sf_dir)) % 10**8}",
    )
    land, sink, ckpt = (os.path.join(base, d) for d in ("land", "sink", "ckpt"))
    events = _events_with_ts(spark, sf_dir).select("event_id", "event_type", "value")

    first_visit = not os.path.isdir(base)
    if first_visit:
        shutil.rmtree(base, ignore_errors=True)
        events.filter(F.col("event_id") % 2 == 0).write.mode("overwrite").parquet(land)

    def run_once() -> None:
        # stateless stream: the thing under test is the file-source
        # commit log (which files a restarted query re-reads), so the
        # per-batch PARTIAL aggregate lives in foreachBatch — summing
        # partials across batches is correct iff no file is read twice
        stream = spark.readStream.schema(
            "event_id bigint, event_type string, value double"
        ).parquet(land)

        def write_batch(batch_df: DataFrame, batch_id: int) -> None:
            partial = batch_df.groupBy("event_type").agg(
                F.count(F.lit(1)).alias("n_partial"),
                F.sum("value").alias("sum_partial"),
            )
            partial.write.mode("overwrite").parquet(
                os.path.join(sink, f"run_batch={batch_id}")
            )

        q = (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()  # run 1: first half, then the "crash" (query object discarded)
    if first_visit:
        events.filter(F.col("event_id") % 2 == 1).write.mode("append").parquet(land)
    run_once()  # run 2: SAME checkpoint — must pick up only the new files

    partials = spark.read.parquet(os.path.join(sink, "run_batch=*"))
    return (
        partials.groupBy("event_type")
        .agg(
            F.sum("n_partial").alias("n_events"),
            F.round(F.sum("sum_partial"), 2).alias("sum_value"),
        )
        .orderBy("event_type")
    )


def streaming_late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data DROP semantics (append mode) — the one
    watermark behavior the rest of the streaming suite doesn't pin:
    a row arriving after the watermark has passed its window is
    discarded, not merged.

    Spark only GUARANTEES dropping once the window's state has been
    evicted (late rows arriving while state survives may still merge —
    verified empirically), so the construction forces eviction first:

    * batch 1: events with event_id % 3 != 0 → watermark becomes
      max_ts(batch1) - 30min after the batch commits;
    * batch 2: one watermark-pusher row (max_ts + 1h) — processing it
      EMITS AND EVICTS every window ending below that watermark;
    * batch 3: the remaining events — rows whose window was evicted
      (window_end <= wm1) are now guaranteed-dropped; rows whose window
      state survived merge normally;
    * batch 4: a far-future sentinel flushes every remaining window
      through the append sink.

    ``maxFilesPerTrigger=1`` + mtime ordering makes file→batch
    assignment exact; the oracle excludes exactly the evicted-window
    rows — merged-late or dropped-on-time events flip the counts.
    """
    import datetime as _dt
    import glob as _glob
    import shutil
    import time as _time

    base = os.path.join(
        tempfile.gettempdir(),
        f"hive_spark_late_drop_{os.getpid()}_{abs(hash(sf_dir)) % 10**8}",
    )
    land, sink, ckpt = (os.path.join(base, d) for d in ("land", "sink", "ckpt"))
    ev = _events_with_ts(spark, sf_dir).select("event_id", "ts", "event_type", "value")

    if not os.path.isdir(base):
        os.makedirs(land)
        max_ts = ev.agg(F.max("ts").alias("m")).first()["m"]

        def sentinel(eid: int, ts) -> DataFrame:
            return spark.createDataFrame(
                [(eid, ts, "zz_sentinel", 0.0)],
                "event_id bigint, ts timestamp, event_type string, value double",
            )

        batches = [
            ("f1", ev.filter(F.col("event_id") % 3 != 0)),
            ("f2", sentinel(-1, max_ts + _dt.timedelta(hours=1))),
            ("f3", ev.filter(F.col("event_id") % 3 == 0)),
            ("f4", sentinel(-2, max_ts + _dt.timedelta(days=365))),
        ]
        now = _time.time()
        for i, (name, df) in enumerate(batches):
            d = os.path.join(base, name + ".dir")
            df.coalesce(1).write.mode("overwrite").parquet(d)
            f = os.path.join(land, name)
            shutil.move(_glob.glob(os.path.join(d, "part-*.parquet"))[0], f)
            shutil.rmtree(d)
            age = now - (len(batches) - i) * 120
            os.utime(f, (age, age))

    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, event_type string, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(land)
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(sink)
        .filter(F.col("event_type") != "zz_sentinel")
        .select(F.col("win.start").alias("win_start"), "event_type", "n_events")
        .orderBy("win_start", "event_type")
    )


def streaming_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join with watermark-driven null emission —
    the outer-join semantics the inner q137 doesn't pin: a view with no
    qualifying purchase must eventually emit null-extended, but only
    once the watermark has passed its join-state eviction time (Spark
    holds the left row back while a future match is still possible).

    Construction (the q178 staged-batch technique):

    * batch 1: all real events — matches emit inner-join style, every
      unmatched view sits in state;
    * batch 2: one far-future sentinel per side (user -1 view, user -2
      purchase; both sides need one because the query watermark is the
      min across inputs) pushes the watermark past every real row's
      eviction time, and the trailing no-data micro-batch then flushes
      every unmatched view as a null-extended row.

    With full eviction forced, the emitted set is EXACTLY the batch
    left join under the same time-range condition — the DuckDB oracle.
    """
    import datetime as _dt
    import glob as _glob
    import shutil
    import time as _time

    base = os.path.join(
        tempfile.gettempdir(),
        f"hive_spark_lojoin_{os.getpid()}_{abs(hash(sf_dir)) % 10**8}",
    )
    land, sink, ckpt = (os.path.join(base, d) for d in ("land", "sink", "ckpt"))
    schema = "event_id bigint, user_id bigint, event_type string, ts timestamp"
    ev = _events_with_ts(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "ts"
    )

    if not os.path.isdir(base):
        os.makedirs(land)
        max_ts = ev.agg(F.max("ts").alias("m")).first()["m"]
        far = max_ts + _dt.timedelta(days=365)
        sentinels = spark.createDataFrame(
            [(-1, -1, "view", far), (-2, -2, "purchase", far)], schema
        )
        now = _time.time()
        for i, (name, df) in enumerate([("f1", ev), ("f2", sentinels)]):
            d = os.path.join(base, name + ".dir")
            df.coalesce(1).write.mode("overwrite").parquet(d)
            f = os.path.join(land, name)
            shutil.move(_glob.glob(os.path.join(d, "part-*.parquet"))[0], f)
            shutil.rmtree(d)
            age = now - (2 - i) * 120
            os.utime(f, (age, age))

    views = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(land)
        .filter(F.col("event_type") == "view")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
    )
    buys = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(land)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("b_user"),
            F.col("event_id").alias("buy_id"),
            F.col("ts").alias("b_ts"),
        )
    )
    joined = views.join(
        buys,
        (F.col("v_user") == F.col("b_user"))
        & (F.col("v_ts") <= F.col("b_ts"))
        & (F.col("b_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    ).select("v_user", "view_id", "buy_id")
    q = (
        joined.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(sink)
        .filter(F.col("v_user") >= 0)
        .groupBy("v_user")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("buy_id").alias("n_matched"),
        )
        .orderBy("v_user")
    )


def transform_with_state_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running summary via ``transformWithStateInPandas`` —
    Spark 4's successor to applyInPandasWithState (the arbitrary-state
    operator q115 demonstrates on the old API): an explicit
    StatefulProcessor with a typed ValueState, RocksDB-backed state
    store, availableNow run over the static landing dir so the final
    state equals the batch GROUP BY (the oracle).

    Beyond-parity surface: Hive 2.1 has no streaming semantics at all;
    this pins the modern Spark stateful API the way q115 pins the
    legacy one, so an engine user can migrate between them with both
    ends oracle-checked.

    ENVIRONMENT GATE (honest, like the multimodal decoders): the
    transformWithState Python worker needs a functional
    ``google.protobuf`` (its state-server protocol is proto-encoded),
    which this container lacks — the operator raises ImportError
    eagerly here rather than crashing mid-query, the pytest pin skips
    with that reason, and it is deliberately NOT a registry entry so
    no green row over-certifies it (the q92-Avro lesson).  On a stock
    Spark 4 cluster it runs as written.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as ex:
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf, "
            "unavailable in this environment"
        ) from ex
    import os
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    src_dir = _stage_once(
        "state_src",
        sf_dir,
        lambda p: _events_with_ts(spark, sf_dir)
        .select("user_id", "event_id", "value")
        .write.mode("overwrite")
        .parquet(p),
    )

    output_schema = (
        "user_id bigint, n_events bigint, sum_value double, "
        "first_event bigint, last_event bigint"
    )

    class SummaryProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "summary", "n bigint, s double, first bigint, last bigint"
            )

        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            if self._state.exists():
                n, s, first, last = self._state.get()
            else:
                n, s, first, last = 0, 0.0, None, None
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
                lo = int(pdf["event_id"].min())
                hi = int(pdf["event_id"].max())
                first = lo if first is None else min(first, lo)
                last = hi if last is None else max(last, hi)
            self._state.update((n, s, first, last))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [round(s, 2)],
                    "first_event": [first],
                    "last_event": [last],
                }
            )

        def close(self) -> None:
            pass

    stream = (
        spark.readStream.schema("user_id bigint, event_id bigint, value double")
        .parquet(src_dir)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SummaryProcessor(),
            outputStructType=output_schema,
            outputMode="Update",
            timeMode="None",
        )
    )
    query_name = f"tws_user_summary_{os.getpid()}"
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from pyspark.sql import Window

    out = spark.table(query_name)
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("user_id")
    )


def streaming_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark (Spark 3.5+): unlike q136's
    dropDuplicates — whose state holds every key forever within the
    watermark column's range — this variant guarantees dedup only for
    duplicates arriving within the watermark DELAY of each other and
    evicts each key's state as soon as the watermark passes its first
    sighting, so state size is bounded by the delay window alone (the
    operational contract that keeps infinite streams viable).

    With one availableNow batch over a static landing dir every
    duplicate is co-batched, so the result is exactly the batch
    SELECT DISTINCT — the oracle; the semantic DIFFERENCE from q136 is
    in the state lifecycle, which the state-eviction guarantee makes
    untestable in a single batch and is therefore documented, not
    oracle-claimed.
    """
    src_dir = _stage_once(
        "dedup_src",
        sf_dir,
        lambda p: _events_with_ts(spark, sf_dir)
        .select("user_id", "event_type", "ts")
        .write.mode("overwrite")
        .parquet(p),
    )

    stream = (
        spark.readStream.schema("user_id bigint, event_type string, ts timestamp")
        .parquet(src_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    query_name = f"stream_dedup_ww_{os.getpid()}"
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name).orderBy("user_id", "event_type")
