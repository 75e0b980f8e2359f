"""TRANSFORM scripts, ANALYZE statistics, and streaming — the remaining
SURVEY.md §2 surfaces (ScriptOperator.java:875, StatsTask.java, §2.9).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_2_1_1_src_spark.operators.transform_script import (
    analyze_table_rowcount,
    transform_script,
)
from apache_hive_2_1_1_src_spark.queries._util import t


def q94_transform_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSFORM ... USING 'tr a-z A-Z' (ScriptOperator subprocess piping
    with Hive's tab/newline/\\N framing) over nation."""
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    out = transform_script(
        nation, ["tr", "a-z", "A-Z"], "n_nationkey int, upper_name string"
    )
    return out.orderBy("n_nationkey")


def q222_mapreduce_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive's MAP/REDUCE script-transform STATEMENT syntax — the
    mapreduce1.q shape (``FROM src MAP expr, … USING 'cat' AS (cols)
    DISTRIBUTE BY … SORT BY …``; MAP and REDUCE are parser aliases for
    SELECT TRANSFORM, parse/HiveParser.g trfmClause; executed by
    exec/ScriptOperator.java:875 with tab/newline framing).  Spark's
    parser accepts the identical statement text (script transform with
    the default ROW FORMAT DELIMITED — the same \\t field framing) and
    plans it as a ScriptTransformation node fed by an Exchange on the
    DISTRIBUTE BY keys with intra-partition SORT BY — Hive's exact
    shuffle contract for reducer-side scripts.

    Scale: the script runs once per partition streaming through a
    pipe — no driver collect; the DISTRIBUTE BY exchange is the only
    shuffle, keyed exactly as the statement asks.
    """
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables(sf_dir)
    return eng.sql(
        """
        SELECT CAST(k AS INT) AS tkey, CAST(ten AS INT) AS ten,
               CAST(one AS INT) AS one, name AS tvalue
        FROM (
          FROM nation
          MAP nation.n_nationkey, CAST(nation.n_nationkey / 10 AS INT),
              CAST(nation.n_nationkey % 10 AS INT), nation.n_name
          USING 'cat' AS (k STRING, ten STRING, one STRING, name STRING)
          DISTRIBUTE BY name, k
          SORT BY ten, one
        ) t
        """
    )


def q231_transform_custom_delimiters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT TRANSFORM with custom ROW FORMAT DELIMITED field
    delimiters on BOTH sides of the script (HiveParser.g trfmClause
    inSerde/outSerde; LazySimpleSerDe framing in
    exec/ScriptOperator.java).  Hive splits script output on the
    literal delimiter byte while Spark's ScriptTransformation
    regex-splits — the engine escapes metacharacter delimiters so the
    verbatim Hive statement (here '|'-framed through tr) round-trips.
    One pipe per partition, no shuffle."""
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables(sf_dir)
    return eng.sql(
        """
        SELECT CAST(k AS BIGINT) AS o_key, s AS status_uc, p AS prio_uc
        FROM (
          SELECT TRANSFORM (o_orderkey, o_orderstatus, o_orderpriority)
          ROW FORMAT DELIMITED FIELDS TERMINATED BY '|'
          USING 'tr a-z A-Z'
          AS (k STRING, s STRING, p STRING)
          ROW FORMAT DELIMITED FIELDS TERMINATED BY '|'
          FROM orders WHERE o_orderkey <= 300
        ) t
        """
    )


def q95_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE COMPUTE STATISTICS → stats-backed row count must match
    reality (ColumnStatsTask/StatsTask persistence)."""
    from apache_hive_2_1_1_src_spark.queries.storage import drop_table

    stats_tbl = f"stats_customer_{os.getpid()}"
    drop_table(spark, stats_tbl)
    t(spark, sf_dir, "customer").write.saveAsTable(stats_tbl)
    n_stats = analyze_table_rowcount(spark, stats_tbl)
    actual = spark.table(stats_tbl).count()
    return spark.createDataFrame(
        [(int(n_stats), int(actual))], "n_rows_stats bigint, n_rows_actual bigint"
    )


def q96_streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming windowed aggregation run to completion
    (availableNow) — must equal the batch/oracle answer over the same data
    (SURVEY.md §2.9: beyond-parity surface)."""
    from apache_hive_2_1_1_src_spark.streaming.jobs import streaming_event_counts

    return streaming_event_counts(spark, sf_dir)


def q97_cluster_by_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER BY SQL surface (HiveParser.g:95-100; = DISTRIBUTE BY +
    SORT BY on the same keys).  Result set equals the plain projection —
    the oracle checks the multiset."""
    t(spark, sf_dir, "supplier").createOrReplaceTempView("misc_supplier")
    return spark.sql(
        "SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 2) AS bal "
        "FROM misc_supplier CLUSTER BY s_nationkey"
    )


def q98_insert_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT INTO (append) vs INSERT OVERWRITE: two appends accumulate
    (MoveTask append path)."""
    import os
    import tempfile

    out = os.path.join(tempfile.gettempdir(), f"hive_spark_append_{os.getpid()}")
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    region = t(spark, sf_dir, "region")
    region.write.mode("append").parquet(out)
    region.write.mode("append").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("r_name").agg(F.count(F.lit(1)).alias("n")).orderBy("r_name")


def q99_mask_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mask* family (FunctionRegistry.java:484-489 → Spark 3.4+ mask):
    upper→X, lower→x, digit→n."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    return c.select(
        "c_custkey",
        F.mask(F.col("c_name")).alias("masked"),
        F.mask(F.col("c_name"), F.lit("U"), F.lit("l"), F.lit("#"), F.lit("*")).alias(
            "masked_custom"
        ),
    )


def q100_tpch_q2_style(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar-min subquery over a join
    (min-cost-supplier pattern) — stresses subquery decorrelation the way
    Hive's CalcitePlanner rewrites do."""
    for name in ("part", "lineitem", "supplier"):
        t(spark, sf_dir, name).createOrReplaceTempView(f"misc_{name}")
    return spark.sql(
        """
        SELECT p.p_partkey, p.p_brand, ROUND(l.l_extendedprice, 2) AS min_price,
               s.s_name
        FROM misc_part p
        JOIN misc_lineitem l ON l.l_partkey = p.p_partkey
        JOIN misc_supplier s ON l.l_suppkey = s.s_suppkey
        WHERE p.p_size = 15
          AND l.l_extendedprice = (
            SELECT MIN(l2.l_extendedprice) FROM misc_lineitem l2
            WHERE l2.l_partkey = p.p_partkey)
        """
    )


def q101_matchpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """matchpath PTF (MatchPath.java): per customer ordered by order date,
    find each big order (B) and the run of small orders (S*) following it —
    pattern 'BS*', emitting the start row and matched path length."""
    from apache_hive_2_1_1_src_spark.operators.matchpath import matchpath

    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    out = matchpath(
        orders,
        partition_by=["o_custkey"],
        order_by=["o_orderdate", "o_orderkey"],
        symbols={
            "B": F.col("o_totalprice") > 300000.0,
            "S": F.col("o_totalprice") <= 300000.0,
        },
        pattern="BS*",
        keep_cols=["o_custkey", "o_orderkey"],
    )
    return out.orderBy("o_custkey", "o_orderkey")


def q102_decimal_char_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-system surface (SURVEY.md §1.2): decimal(38,x) arithmetic,
    char(n) padding, varchar(n) truncation — Hive and Spark share these
    semantics exactly; the oracle mirrors with DuckDB DECIMAL/CAST."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return o.select(
        "o_orderkey",
        dec.alias("price_dec"),
        (dec * F.lit(2).cast("decimal(2,0)")).cast("decimal(20,2)").alias("price_x2"),
        (dec / F.lit(4).cast("decimal(2,0)")).cast("decimal(24,6)").alias("price_div"),
        F.col("o_orderstatus").cast("varchar(1)").alias("status_vc"),
        F.rpad(F.col("o_orderstatus"), 3, " ").alias("status_char3"),
        F.substring(F.col("o_orderpriority"), 1, 4).cast("varchar(4)").alias("prio_trunc"),
    )


def q103_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event sessionization — gap > 30 min starts a new session (lag +
    conditional cumulative sum, the canonical events-table window recipe;
    built only on §2.4 window primitives)."""
    from apache_hive_2_1_1_src_spark.io import load_events
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir).filter(F.col("user_id") < 200)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long"), 1).over(w)
    with_flag = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("new_sess"),
    )
    sess = with_flag.withColumn(
        "session_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("first_event"),
        )
        .orderBy("user_id", "session_id")
    )


def q104_percentile_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile(col, array(...)) multi-quantile signature
    (GenericUDAFPercentile array form) — output canonicalized to a string
    for the oracle."""
    li = t(spark, sf_dir, "lineitem")
    quartiles = F.percentile("l_quantity", F.lit([0.25, 0.5, 0.75]))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.array_join(
                F.transform(quartiles, lambda v: F.round(v, 4).cast("string")), ","
            ).alias("quartiles")
        )
        .orderBy("l_returnflag")
    )


def q105_like_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / RLIKE operators (FunctionRegistry like:, rlike/regexp:) as
    filters and projections."""
    p = t(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("%ARG%") | F.col("p_name").rlike("^[bc].*[td]$")
    ).select(
        "p_partkey",
        "p_type",
        F.col("p_name").like("b%").alias("starts_b"),
        F.col("p_type").rlike("LARGE|SMALL").alias("sized"),
    )


def q115_stateful_user_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState custom stateful operator (beyond-parity
    streaming surface): per-user GroupState summary, availableNow run,
    verified equal to the batch GROUP BY by the oracle."""
    from apache_hive_2_1_1_src_spark.streaming.jobs import stateful_user_summary

    return stateful_user_summary(spark, sf_dir)


def q136_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates through the state store (availableNow);
    returns the deduplicated key set == batch SELECT DISTINCT (oracle)."""
    from apache_hive_2_1_1_src_spark.streaming.jobs import streaming_dedup

    return streaming_dedup(spark, sf_dir)


def q137_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream join (purchase⋈view within 1h per user);
    availableNow over bounded input == the batch time-bound join."""
    from apache_hive_2_1_1_src_spark.streaming.jobs import streaming_stream_join

    return streaming_stream_join(spark, sf_dir)


def q181_stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join with watermark eviction: unmatched
    views emit null-extended only after the watermark passes their join
    window; a far-future sentinel batch forces full eviction so the
    emitted set equals the batch left join (the oracle)."""
    from apache_hive_2_1_1_src_spark.streaming.jobs import streaming_left_outer_join

    return streaming_left_outer_join(spark, sf_dir)


def q183_column_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level lineage (LineageLogger.java's edge set): for each
    output column of a 4-table join, the leaf table columns it depends
    on — computed by Catalyst's own column pruning (project to one
    column, read the pruned physical scans), so the engine cannot
    disagree with its own optimizer.  Closure semantics: join keys and
    filter columns count as dependencies.  The oracle is the expected
    edge list."""
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables(sf_dir)
    sql = """
        SELECT o.o_orderkey AS k,
               ROUND(o.o_totalprice * (1 - l.l_discount), 2) AS net,
               n.n_name AS nation
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_shipdate IS NOT NULL
    """
    edges = eng.column_lineage(sql)
    return spark.createDataFrame(
        edges, "out_col string, src_table string, src_col string"
    ).orderBy("out_col", "src_table", "src_col")


def q184_explain_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPLAIN ANALYZE runtime row counts (HIVE-13353 runtime-stats
    annotation): execute scan→filter→agg over orders and report each
    operator's actual numOutputRows — scan must equal the table count,
    filter the predicate count, and the topmost (final) aggregate the
    group count, all recomputable in SQL.  Partial-aggregate rows are
    partitioning-dependent and excluded."""
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables(sf_dir)
    # Parquet predicate pushdown may legitimately prune whole row groups
    # on the price filter, making the scan metric < table count on any
    # multi-row-group layout; pin it off so "scan == table count" is a
    # deterministic oracle rather than a writer-settings-dependent one.
    prev = spark.conf.get("spark.sql.parquet.filterPushdown")
    spark.conf.set("spark.sql.parquet.filterPushdown", "false")
    try:
        metrics = eng.explain_analyze(
            "SELECT o_orderstatus, COUNT(*) AS n FROM orders "
            "WHERE o_totalprice > 100000 GROUP BY o_orderstatus"
        )
    finally:
        spark.conf.set("spark.sql.parquet.filterPushdown", prev)
    scan = next(r for name, r in metrics if name.startswith("Scan"))
    filt = next(r for name, r in metrics if name == "Filter")
    agg_final = next(r for name, r in metrics if name == "HashAggregate")
    rows = [("agg_final", agg_final), ("filter", filt), ("scan", scan)]
    return spark.createDataFrame(rows, "op string, n_rows bigint").orderBy("op")


def q189_temporary_macro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TEMPORARY MACRO (HIVE-2655, FunctionSemanticAnalyzer
    CreateMacroDesc): expression macros with typed parameters, usable
    anywhere an expression is — including a macro calling another macro.
    HiveEngine expands call sites textually (semantically identical to
    Hive's GenericUDFMacro tree since bodies are pure expressions); the
    oracle inlines the same arithmetic."""
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables(sf_dir)
    eng.sql("CREATE TEMPORARY MACRO net_price(p DOUBLE, d DOUBLE) p * (1 - d)")
    eng.sql(
        "CREATE TEMPORARY MACRO taxed_net(p DOUBLE, d DOUBLE, t DOUBLE) "
        "net_price(p, d) * (1 + t)"
    )
    out = eng.sql(
        """
        SELECT l_returnflag,
               ROUND(SUM(net_price(l_extendedprice, l_discount)), 2) AS net,
               ROUND(SUM(taxed_net(l_extendedprice, l_discount, l_tax)), 2)
                 AS taxed
        FROM lineitem WHERE l_orderkey <= 2000
        GROUP BY l_returnflag ORDER BY l_returnflag
        """
    )
    eng.sql("DROP TEMPORARY MACRO net_price")
    eng.sql("DROP TEMPORARY MACRO taxed_net")
    return out


def q142_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward, inclusive): each purchase matched to the
    user's latest preceding view — single-shuffle union+window plan, not
    a per-key range scan (operators/temporal.asof_join).  Deterministic
    tie-break on the view's event_id."""
    from apache_hive_2_1_1_src_spark.io import load_events
    from apache_hive_2_1_1_src_spark.operators.temporal import asof_join

    ev = load_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view")
    out = asof_join(
        purchases,
        views,
        on="user_id",
        ts="ts",
        right_payload=["event_id", "value"],
        tiebreak="event_id",
        how="inner",
    )
    return out.select(
        "purchase_id",
        "user_id",
        F.col("match_ts").alias("view_ts"),
        F.col("match_event_id").alias("view_id"),
        F.round("match_value", 2).alias("view_value"),
    ).orderBy("purchase_id")


def q143_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join: incident windows (every 199th event,
    2h span) × all events, planned as a bucketed hash equi-join + residual
    filter instead of the BroadcastNestedLoopJoin Catalyst would pick for
    the raw inequality (operators/temporal.range_join_binned)."""
    from apache_hive_2_1_1_src_spark.io import load_events
    from apache_hive_2_1_1_src_spark.operators.temporal import range_join_binned

    ev = load_events(spark, sf_dir)
    incidents = ev.filter(F.col("event_id") % 199 == 0).select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )
    points = ev.select(F.col("event_id").alias("pt_id"), F.col("ts").alias("pt_ts"), "value")
    joined = range_join_binned(
        points, incidents, point_ts="pt_ts", start="start_ts", end="end_ts", how="left"
    )
    return (
        joined.groupBy("incident_id")
        .agg(
            F.count("pt_id").alias("n_events"),
            F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 2).alias("sum_value"),
        )
        .orderBy("incident_id")
    )


def q144_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: hour→day→type continuous
    aggregate levels from ONE scan via GROUPING SETS (partial aggregation
    map-side; no re-scan per resolution)."""
    from apache_hive_2_1_1_src_spark.io import load_events

    ev = load_events(spark, sf_dir).select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.hour("ts").alias("hh"),
        "value",
    )
    return (
        ev.groupingSets(
            [["event_type", "day", "hh"], ["event_type", "day"], ["event_type"]],
            "event_type",
            "day",
            "hh",
        )
        .agg(
            F.grouping_id().alias("lvl"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("lvl", "event_type", "day", "hh")
    )


def q150_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (F.session_window, 30-min gap) in batch
    mode — same semantics as the islands formulation the oracle uses
    (session splits when the gap is >= the timeout; Spark's window end
    is exclusive at start+gap).  Complements q103, which builds sessions
    from raw window primitives."""
    from apache_hive_2_1_1_src_spark.io import load_events

    ev = load_events(spark, sf_dir).filter(F.col("user_id") < 200)
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("first_event"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "first_event",
        )
        .orderBy("user_id", "session_start")
    )


def q159_streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows computed as a STREAM (state-store session merge,
    availableNow, complete mode) — must equal the batch islands answer;
    the streaming counterpart of q150."""
    from apache_hive_2_1_1_src_spark.streaming.jobs import (
        streaming_session_windows,
    )

    return streaming_session_windows(spark, sf_dir)


def q151_global_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed global row numbering (operators/rowindex.py): range
    repartition + per-partition rank + broadcast offsets — equals the
    single-partition ROW_NUMBER() OVER (ORDER BY ...) the oracle runs,
    without the one-reducer bottleneck."""
    from apache_hive_2_1_1_src_spark.operators.rowindex import global_row_number

    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranked = global_row_number(
        orders, F.desc("o_totalprice"), F.asc("o_orderkey"), out_col="rn"
    )
    return ranked.select("o_orderkey", "rn").orderBy("rn")


def q155_foreach_batch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch exactly-once sink: per-batch-id overwrite directories
    make retries idempotent; final state == batch GROUP BY (oracle)."""
    from apache_hive_2_1_1_src_spark.streaming.jobs import streaming_foreach_batch_sink

    return streaming_foreach_batch_sink(spark, sf_dir)


def q161_constraint_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Informational PK/FK/NOT NULL constraints (HIVE-13290 — Hive 2.1's
    ALTER TABLE ADD CONSTRAINT metadata, unenforced) realized as the
    violation audit a warehouse runs: dup-key, orphan-FK, and null
    counts, one row per declared constraint (operators/maintenance.py).
    All counts are zero on the TPC-H-shaped testdata — the audit plan
    (broadcast anti-joins, partial-agg dup counts) is the deliverable."""
    from apache_hive_2_1_1_src_spark.operators.maintenance import (
        validate_constraints,
    )

    tables = {
        "orders": t(spark, sf_dir, "orders"),
        "customer": t(spark, sf_dir, "customer"),
        "lineitem": t(spark, sf_dir, "lineitem"),
    }
    constraints = [
        {"name": "pk_orders", "kind": "primary_key", "table": "orders",
         "columns": ["o_orderkey"]},
        {"name": "pk_customer", "kind": "primary_key", "table": "customer",
         "columns": ["c_custkey"]},
        {"name": "fk_orders_customer", "kind": "foreign_key", "table": "orders",
         "columns": ["o_custkey"], "ref_table": "customer",
         "ref_columns": ["c_custkey"]},
        # orders is fact-sized at scale: no broadcast hint — the planner
        # picks a shuffled anti-join (SHJ under the compat preset)
        {"name": "fk_lineitem_orders", "kind": "foreign_key", "table": "lineitem",
         "columns": ["l_orderkey"], "ref_table": "orders",
         "ref_columns": ["o_orderkey"], "broadcast_parent": False},
        {"name": "nn_orders_status", "kind": "not_null", "table": "orders",
         "columns": ["o_orderstatus"]},
    ]
    return validate_constraints(spark, tables, constraints).orderBy(
        "constraint_name"
    )


def q162_streaming_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGE upsert via foreachBatch + version-pointer COW
    commits (streaming/jobs.py streaming_upsert_orders) — the
    change-data-capture upsert shape; final table equals the one-shot
    batch merge (full oracle)."""
    from apache_hive_2_1_1_src_spark.streaming.jobs import streaming_upsert_orders

    return streaming_upsert_orders(spark, sf_dir)


def q175_explain_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPLAIN DEPENDENCY surface (ExplainTask.java getJSONDependencies,
    tools/LineageInfo.java): input-table lineage of a query mixing a
    CTE, a correlated subquery, and joins — the dependency list must
    name exactly the base tables (customer/nation/orders/region), never
    the CTE alias.  Full oracle (VALUES)."""
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables(sf_dir)
    deps = eng.explain_dependency(
        """
        WITH big_nations AS (
          SELECT n_nationkey, n_regionkey FROM nation WHERE n_nationkey >= 0
        )
        SELECT c_name, r_name
        FROM customer
        JOIN big_nations bn ON c_nationkey = bn.n_nationkey
        JOIN region ON bn.n_regionkey = r_regionkey
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """
    )
    return spark.createDataFrame([(d,) for d in deps], "input_table string").orderBy(
        "input_table"
    )


def q201_explain_authorization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPLAIN AUTHORIZATION surface (Driver.doAuthorization;
    ExplainTask formatAuthorizationInfo — the INPUTS/OUTPUTS/
    CURRENT_USER/OPERATION block): digested to (item, value) rows for a
    join-plus-subquery query; the user is non-empty but host-dependent,
    so it certifies as a boolean."""
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables(sf_dir)
    auth = eng.explain_authorization(
        """
        SELECT c_mktsegment, COUNT(*)
        FROM customer JOIN orders ON c_custkey = o_custkey
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation)
        GROUP BY c_mktsegment
        """
    )
    rows = [
        ("inputs", ",".join(auth["inputs"])),
        ("n_outputs", str(len(auth["outputs"]))),
        ("operation", auth["operation"]),
        ("user_nonempty", str(bool(auth["current_user"])).lower()),
    ]
    return spark.createDataFrame(rows, "item string, value string").orderBy("item")


def q247_authorization_sql_statements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-TEXT authorization statements (HiveParser grantPrivileges /
    revokePrivileges / createRoleStatement / setRole; authorization_1.q,
    set_role_admin.q, grant_* family): the statement forms a migrating
    user's scripts contain — CREATE ROLE, GRANT ROLE, GRANT/REVOKE
    privileges, SET ROLE with NONE/ALL, SHOW ROLES/CURRENT ROLES/GRANT —
    run through HiveEngine.sql against the session Authorizer.  The
    result is the deterministic privilege matrix at each stage, checked
    against a VALUES oracle."""
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.sql("SET hive.session.user=alice")
    eng.sql("CREATE ROLE analysts")
    eng.sql("CREATE ROLE loaders")
    eng.sql("GRANT ROLE analysts TO USER alice")
    eng.sql("GRANT ROLE loaders TO USER alice")
    eng.sql("GRANT SELECT ON TABLE orders TO ROLE analysts")
    eng.sql("GRANT INSERT, DELETE ON TABLE orders TO ROLE loaders")
    eng.sql("GRANT UPDATE ON TABLE orders TO USER alice")

    def matrix(stage: str) -> list[tuple]:
        az, u = eng.authz, "alice"
        return [
            (
                stage,
                bool(az.has_privilege(u, "orders", "SELECT")),
                bool(az.has_privilege(u, "orders", "INSERT")),
                bool(az.has_privilege(u, "orders", "UPDATE")),
                len(eng.sql("SHOW CURRENT ROLES").collect()),
                len(eng.sql("SHOW ROLES").collect()),
            )
        ]

    rows = matrix("s1_all_roles")
    eng.sql("SET ROLE analysts")
    rows += matrix("s2_analysts_only")
    eng.sql("SET ROLE NONE")
    rows += matrix("s3_none")
    eng.sql("SET ROLE ALL")
    eng.sql("REVOKE INSERT ON TABLE orders FROM ROLE loaders")
    rows += matrix("s4_after_revoke")
    return spark.createDataFrame(
        rows,
        "stage string, can_select boolean, can_insert boolean, "
        "can_update boolean, n_current_roles int, n_roles int",
    ).orderBy("stage")


def q202_sql_std_authorization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard authorization surface (SQLStdHiveAccessController /
    SQLStdHiveAuthorizationValidator, ql/.../authorization/plugin/sqlstd/;
    role+grant tables in metastore ObjectStore): CREATE ROLE, role-to-
    role membership with transitive closure and cycle rejection,
    GRANT/REVOKE object privileges to users and roles, SHOW GRANT /
    SHOW CURRENT ROLES, and the validator check — scripted into
    oracle-checked (item, value) certificates."""
    from apache_hive_2_1_1_src_spark.operators.authz import (
        AuthorizationError,
        Authorizer,
    )

    az = Authorizer()
    az.create_role("analyst")
    az.create_role("data_eng")
    az.grant_role("data_eng", "analyst")       # role -> role
    az.grant_role("analyst", "alice")          # user alice -> analyst
    az.grant("SELECT", "orders", "data_eng")   # via transitive role
    az.grant("INSERT", "orders", "bob")        # direct user grant

    alice_select = az.has_privilege("alice", "orders", "SELECT")
    alice_insert = az.has_privilege("alice", "orders", "INSERT")
    bob_insert = az.has_privilege("bob", "orders", "INSERT")
    bob_select = az.has_privilege("bob", "orders", "SELECT")
    try:
        az.check("bob", "orders", "SELECT")
        check_raises = False
    except AuthorizationError:
        check_raises = True
    try:
        az.grant_role("analyst", "data_eng")   # would close a cycle
        cycle_rejected = False
    except ValueError:
        cycle_rejected = True
    current = ",".join(az.show_current_roles("alice"))
    grants = ";".join("|".join(g) for g in az.show_grant())
    az.revoke_role("analyst", "alice")
    alice_after_revoke = az.has_privilege("alice", "orders", "SELECT")

    rows = [
        ("1_alice_select_via_role_chain", str(alice_select).lower()),
        ("2_alice_insert_denied", str(not alice_insert).lower()),
        ("3_bob_insert_direct", str(bob_insert).lower()),
        ("4_bob_select_denied", str(not bob_select).lower()),
        ("5_check_raises", str(check_raises).lower()),
        ("6_cycle_rejected", str(cycle_rejected).lower()),
        ("7_current_roles_alice", current),
        ("8_show_grant", grants),
        ("9_revoke_strips_privilege", str(not alice_after_revoke).lower()),
    ]
    return spark.createDataFrame(rows, "item string, value string").orderBy("item")


def q206_streaming_dedup_within_watermark(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """dropDuplicatesWithinWatermark streaming dedup (the
    bounded-state successor to q136's dropDuplicates): per-key state is
    evicted once the watermark passes, bounding state by the delay
    window; single availableNow batch == batch DISTINCT (the oracle)."""
    from apache_hive_2_1_1_src_spark.streaming.jobs import (
        streaming_dedup_within_watermark,
    )

    return streaming_dedup_within_watermark(spark, sf_dir)


def q207_describe_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE FUNCTION [EXTENDED] (DDLTask.describeFunction;
    FunctionRegistry.getFunctionInfo usage/example text — Hive prints
    name + usage, EXTENDED adds examples): digested per function to
    booleans a fixed oracle checks — the name line matches, usage text
    is present, EXTENDED carries an example block — across a builtin,
    a math fn and an aggregate."""
    rows = []
    for fn in ("substr", "abs", "percentile_approx"):
        desc = "\n".join(
            r.function_desc
            for r in spark.sql(f"DESCRIBE FUNCTION EXTENDED {fn}").collect()
        )
        rows.append(
            (
                fn,
                f"Function: {fn}" in desc,
                "Usage:" in desc and len(desc) > 40,
                "Examples:" in desc,
            )
        )
    return spark.createDataFrame(
        rows,
        "fn string, name_line boolean, has_usage boolean, has_examples boolean",
    ).orderBy("fn")


def q178_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data DROP (append mode): two deterministic
    micro-batches; batch-2 rows whose 1-hour window closed below the
    batch-1 watermark must be discarded, on-time batch-2 rows merged
    (streaming/jobs.streaming_late_data_drop).  Oracle excludes the
    late rows analytically — merged-late or dropped-on-time rows flip
    the per-window counts."""
    from apache_hive_2_1_1_src_spark.streaming.jobs import streaming_late_data_drop

    return streaming_late_data_drop(spark, sf_dir)


def q174_checkpoint_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming checkpoint crash/restart recovery with exactly-once
    output (streaming/jobs.streaming_checkpoint_recovery): half the
    input is processed, the query is discarded, the rest lands, and a
    NEW query over the SAME checkpoint must process only unseen files.
    Full oracle — double-processing or data loss flips the per-type
    digest."""
    from apache_hive_2_1_1_src_spark.streaming.jobs import (
        streaming_checkpoint_recovery,
    )

    return streaming_checkpoint_recovery(spark, sf_dir)


def q163_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment (stateless broadcast join per
    micro-batch; streaming/jobs.stream_static_enrichment) — full oracle
    (== batch join aggregate)."""
    from apache_hive_2_1_1_src_spark.streaming.jobs import stream_static_enrichment

    return stream_static_enrichment(spark, sf_dir)


def q164_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS — Hive's
    ColumnStatsTask/ColumnStatsUpdateTask surface (ql/.../stats): column
    min/max/null-count/NDV persisted to the catalog and read back via
    DESCRIBE EXTENDED.  min/max/nulls are exact → oracle-checked
    directly; NDV is an HLL sketch (rsd=0.05) → accuracy certificate at
    a 3-sigma 15% envelope (column ndv_within_15pct).  The catalog
    read-back is metadata, not data — stats feed the CBO exactly as
    Hive's do."""
    from apache_hive_2_1_1_src_spark.queries.storage import drop_table

    tbl = f"colstats_orders_{os.getpid()}"
    drop_table(spark, tbl)
    t(spark, sf_dir, "orders").write.saveAsTable(tbl)
    spark.sql(
        f"ANALYZE TABLE {tbl} COMPUTE STATISTICS FOR COLUMNS o_totalprice, o_custkey"
    )

    def col_stats(col: str) -> dict:
        rows = spark.sql(f"DESCRIBE EXTENDED {tbl} {col}").collect()
        return {r[0]: r[1] for r in rows}

    exact_ndv = {
        r["c"]: r["n"]
        for r in spark.table(tbl)
        .selectExpr(
            "stack(2, 'o_totalprice', count(distinct o_totalprice), "
            "'o_custkey', count(distinct o_custkey)) AS (c, n)"
        )
        .collect()
    }
    out = []
    for col in ("o_custkey", "o_totalprice"):
        s = col_stats(col)
        ndv = int(s["distinct_count"])
        out.append(
            (
                col,
                float(s["min"]),
                float(s["max"]),
                int(s["num_nulls"]),
                abs(ndv - exact_ndv[col]) <= 0.15 * exact_ndv[col],
            )
        )
    return spark.createDataFrame(
        out,
        "col_name string, min_val double, max_val double, n_nulls bigint, "
        "ndv_within_15pct boolean",
    ).orderBy("col_name")


def q209_stats_only_answers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StatsOptimizer metadata-only answers (ql/.../optimizer/
    StatsOptimizer.java:97, gated by hive.compute.query.using.stats):
    after ANALYZE [FOR COLUMNS], ``SELECT count(*), min, max, count(col)
    FROM t`` is served straight from catalog statistics — the "instant
    count(*)" Hive behavior.  Two in-result certificates: the stats path
    equals the scan path value-for-value (flag toggled off for the
    recompute), and the stats plan contains NO scan relation at all
    (checked on the executed plan, q184-style)."""
    from apache_hive_2_1_1_src_spark.queries.storage import drop_table
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    tbl = f"statsopt_orders_{os.getpid()}"
    drop_table(spark, tbl)
    t(spark, sf_dir, "orders").write.saveAsTable(tbl)
    spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS")
    spark.sql(
        f"ANALYZE TABLE {tbl} COMPUTE STATISTICS FOR COLUMNS o_totalprice, o_custkey"
    )
    q = (
        "SELECT COUNT(*) AS n, MIN(o_totalprice) AS min_price, "
        "MAX(o_totalprice) AS max_price, COUNT(o_custkey) AS n_cust "
        f"FROM {tbl}"
    )
    eng.set_var("hive.compute.query.using.stats", "true")
    fast = eng.sql(q)
    plan = fast._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    no_scan = "FileScan" not in plan and "Scan parquet" not in plan
    eng.set_var("hive.compute.query.using.stats", "false")
    f_row, s_row = fast.first(), eng.sql(q).first()
    matches = all(
        abs(float(f_row[i]) - float(s_row[i])) <= 1e-9 for i in range(4)
    )
    drop_table(spark, tbl)
    return spark.createDataFrame(
        [
            (
                int(f_row.n),
                round(float(f_row.min_price), 2),
                round(float(f_row.max_price), 2),
                int(f_row.n_cust),
                bool(matches),
                bool(no_scan),
            )
        ],
        "n bigint, min_price double, max_price double, n_cust bigint, "
        "stats_equals_scan boolean, plan_has_no_scan boolean",
    )


def q230_stats_only_partition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-filtered metadata-only answers
    (metadata_only_queries_with_filters.q; StatsOptimizer consults
    partition-level ROW_COUNT when every WHERE conjunct is an equality
    on a partition column).  After ANALYZE TABLE ... PARTITION(...),
    ``SELECT count(*) FROM t WHERE pcol = 'v'`` is served from the
    summed per-partition stats with NO scan; a missing partition value
    answers 0.  Certificates: stats path == scan path per value, and
    the fast plan contains no file scan."""
    from apache_hive_2_1_1_src_spark.queries.storage import drop_table
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    tbl = f"statsopt_part_{os.getpid()}"
    drop_table(spark, tbl)
    (
        t(spark, sf_dir, "orders")
        .write.partitionBy("o_orderstatus")
        .saveAsTable(tbl)
    )
    spark.sql(f"ANALYZE TABLE {tbl} PARTITION (o_orderstatus) COMPUTE STATISTICS")
    eng.set_var("hive.compute.query.using.stats", "true")
    rows = []
    for val in ("F", "O", "P", "ZZ"):
        q = f"SELECT COUNT(*) AS n FROM {tbl} WHERE o_orderstatus = '{val}'"
        fast = eng.sql(q)
        plan = fast._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        no_scan = "FileScan" not in plan and "Scan parquet" not in plan
        n_fast = fast.first().n
        eng.set_var("hive.compute.query.using.stats", "false")
        n_scan = eng.sql(q).first().n
        eng.set_var("hive.compute.query.using.stats", "true")
        rows.append((val, int(n_fast), bool(n_fast == n_scan), bool(no_scan)))
    eng.set_var("hive.compute.query.using.stats", "false")
    drop_table(spark, tbl)
    return spark.createDataFrame(
        rows, "status string, n bigint, stats_equals_scan boolean, plan_has_no_scan boolean"
    )


def q240_stats_autogather(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hive.stats.autogather (HiveConf HIVESTATSAUTOGATHER, default true
    in the reference; StatsTask.java chained after every FileSink;
    stats*.q toggle it): with the flag on, every INSERT/CTAS through the
    SQL entry refreshes catalog statistics, so a later
    hive.compute.query.using.stats COUNT(*) answers metadata-only with
    NO ANALYZE ever issued by the user.

    Three probes: after CTAS (stats exist), after INSERT INTO (stats
    REFRESHED — the count must include the appended rows, not the stale
    CTAS value), and with autogather OFF for a second insert (stale
    stats are never served as accurate: Spark drops numRows on writes
    without a re-gather, so the optimizer falls through to the scan —
    StatsSetupConst.ACCURATE semantics).  Each probe certifies
    scan-free-ness on the executed plan and equality with the scan
    path."""
    from apache_hive_2_1_1_src_spark.queries.storage import drop_table
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables()
    tbl = f"autogather_orders_{os.getpid()}"
    drop_table(spark, tbl)
    eng.set_var("hive.stats.autogather", "true")
    eng.sql(
        f"CREATE TABLE {tbl} USING parquet AS "
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey <= 1000"
    )
    probe = f"SELECT COUNT(*) AS n FROM {tbl}"

    def measure(stage: str):
        eng.set_var("hive.compute.query.using.stats", "true")
        fast = eng.sql(probe)
        plan = fast._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        no_scan = "FileScan" not in plan and "Scan parquet" not in plan
        eng.set_var("hive.compute.query.using.stats", "false")
        n_fast, n_scan = fast.first().n, eng.sql(probe).first().n
        return (stage, int(n_fast), bool(n_fast == n_scan), bool(no_scan))

    rows = [measure("s1_after_ctas")]
    eng.sql(
        f"INSERT INTO {tbl} "
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_orderkey > 1000 AND o_orderkey <= 1500"
    )
    rows.append(measure("s2_after_insert"))
    eng.set_var("hive.stats.autogather", "false")
    eng.sql(
        f"INSERT INTO {tbl} "
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_orderkey > 1500 AND o_orderkey <= 1600"
    )
    s3 = measure("s3_autogather_off")
    # stale stats must NOT be served: the fast path fell back to a scan
    rows.append((s3[0], s3[1], s3[2], s3[3]))
    drop_table(spark, tbl)
    return spark.createDataFrame(
        rows,
        "stage string, n bigint, stats_equals_scan boolean, "
        "plan_has_no_scan boolean",
    ).orderBy("stage")


def q165_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLS FIRST / NULLS LAST ordering (HiveParser.g:2149-2150 —
    HIVE-12994, new in 2.1; Hive's default NULLS FIRST for ASC matches
    Spark's).  The driver compare is order-insensitive, so each null
    placement is materialized as a row_number rank column.  Global
    window on 300 rows is a deliberate semantics probe, not a scale
    pattern (q151 is the distributed row-numbering shape)."""
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 300)
    v = (
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("o_totalprice"))
    )
    base = o.select("o_orderkey", v.alias("v"))
    w_first = Window.orderBy(F.asc_nulls_first("v"), F.asc("o_orderkey"))
    w_last = Window.orderBy(F.asc_nulls_last("v"), F.asc("o_orderkey"))
    return base.select(
        "o_orderkey",
        "v",
        F.row_number().over(w_first).alias("rn_nulls_first"),
        F.row_number().over(w_last).alias("rn_nulls_last"),
    ).orderBy("o_orderkey")


def q213_hplsql_procedure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HPL/SQL procedural script end-to-end (reference module hplsql/:
    Hplsql.g4 grammar, Exec.java evaluator, Stmt.java CALL/FOR/cursor
    handlers): a script declares accumulators, iterates a cursor over a
    grouped join, calls a procedure with an OUT parameter, and invokes a
    user FUNCTION — the interpreter's final state is returned as one row
    the SQL oracle recomputes declaratively."""
    from apache_hive_2_1_1_src_spark.hplsql import HplsqlInterpreter
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables()
    interp = HplsqlInterpreter(engine=eng)
    interp.run(
        """
        DECLARE total_nations INT = 0;
        DECLARE n_regions INT = 0;
        DECLARE biggest STRING;
        DECLARE biggest_n INT = -1;
        FOR rec IN (SELECT r.r_name AS name, COUNT(n.n_nationkey) AS n
                    FROM region r JOIN nation n
                      ON r.r_regionkey = n.n_regionkey
                    GROUP BY r.r_name ORDER BY r.r_name) LOOP
          SET total_nations = total_nations + rec.n;
          SET n_regions = n_regions + 1;
          IF rec.n > biggest_n OR (rec.n = biggest_n AND rec.name < biggest) THEN
            SET biggest = rec.name;
            SET biggest_n = rec.n;
          END IF;
        END LOOP;
        CREATE PROCEDURE describe_corpus(IN r INT, IN n INT, OUT msg STRING)
        BEGIN
          SET msg = r || ' regions / ' || n || ' nations';
        END;
        DECLARE summary STRING;
        CALL describe_corpus(n_regions, total_nations, summary);
        CREATE FUNCTION avg_per_region(t INT, r INT)
          RETURNS INT
        BEGIN
          RETURN t / r;
        END;
        """
    )
    avg = interp.call_routine(
        "avg_per_region", [("lit", interp.vars["total_nations"]),
                           ("lit", interp.vars["n_regions"])]
    )
    row = [
        (
            int(interp.vars["n_regions"]),
            int(interp.vars["total_nations"]),
            interp.vars["biggest"],
            int(interp.vars["biggest_n"]),
            interp.vars["summary"],
            float(avg),
        )
    ]
    return spark.createDataFrame(
        row,
        "n_regions int, total_nations int, biggest string, "
        "biggest_n int, summary string, avg_per_region double",
    )


def q249_union_limit_whole(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A trailing LIMIT binds to the WHOLE union in Hive 2.1, with rows
    drawn round-robin from the LAST branch first (parquet_ppd_char.q's
    5-apple/5-hello fixture; merge4.q's POSTHOOK outputs list only the
    limited row's partition).  The round-8 branch-binding rewrite
    silently inflated such queries 100x — this pins both the COUNT and
    the even split."""
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables(sf_dir)
    return eng.sql(
        "select c, count(*) as n from ("
        "  select 'a' as c from region union all"
        "  select 'b' as c from nation limit 10"
        ") u group by c order by c"
    )


def q250_legacy_outer_join_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hive.outerjoin.supports.filters=false (pre-HIVE-1534 legacy,
    SemanticAnalyzer.java:2688-2810): single-sided ON filters of an
    OUTER join are pushed BEFORE the join, so preserved-side rows
    failing their own filter DISAPPEAR (join_1to1.q's 21-row goldens).
    The oracle expresses the pushing explicitly with pre-filtered
    derived tables."""
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables(sf_dir)
    eng.set_var("hive.outerjoin.supports.filters", "false")
    try:
        return eng.sql(
            "select n.n_name, r.r_name from nation n "
            "full outer join region r on n.n_regionkey = r.r_regionkey"
            " and n.n_nationkey < 5 and r.r_regionkey < 3"
        )
    finally:
        eng._vars.pop("hive.outerjoin.supports.filters", None)


def q251_compute_stats_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """compute_stats() (GenericUDAFComputeStats.java) over region.r_name:
    maxlength/avglength/countnulls plus the Flajolet-Martin NDV bit
    vectors reproduced BIT-EXACTLY (fixed-seed java.util.Random LCG —
    NumDistinctValueEstimator.java:80).  region is the same 5 rows at
    every SF, so the full display string is a deterministic constant
    the oracle pins verbatim."""
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables(sf_dir)
    return eng.sql(
        "select compute_stats(r_name, 16) as stats from region"
    )


def q252_partition_metadata_answers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MetadataOnlyOptimizer (optimizer/physical/MetadataOnlyOptimizer
    .java, on by default): partition-KEY-only aggregates answer from the
    partition LIST even when partitions hold zero rows — metadataonly1.q
    pins max(ds)='1' over an empty partition while the non-distinct
    count stays 0 (real rows)."""
    import os as _os
    import shutil as _shutil

    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    spark.sql("DROP TABLE IF EXISTS q252_meta_t")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    _shutil.rmtree(
        _os.path.join(wh.removeprefix("file:"), "q252_meta_t"),
        ignore_errors=True,
    )
    spark.sql(
        "CREATE TABLE q252_meta_t (a int) USING parquet "
        "PARTITIONED BY (ds string)"
    )
    spark.sql("ALTER TABLE q252_meta_t ADD PARTITION (ds='1')")
    spark.sql("ALTER TABLE q252_meta_t ADD PARTITION (ds='2')")
    mx = eng.sql("select max(ds) as m from q252_meta_t").collect()[0].m
    nd = eng.sql(
        "select count(distinct ds) as n from q252_meta_t"
    ).collect()[0].n
    cnt = eng.sql("select count(ds) as c from q252_meta_t").collect()[0].c
    spark.sql("DROP TABLE q252_meta_t")
    return spark.createDataFrame(
        [(mx, int(nd), int(cnt))], "max_ds string, ndv_ds bigint, cnt_ds bigint"
    )


def q253_values_text_protocol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT ... VALUES through Hive's values__tmp__table protocol
    (SemanticAnalyzer.genValuesTempTable + unparseExprForValuesClause):
    every element renders to TEXT (FALSE→'' so UDFToBoolean round-trips
    false, TRUE→'TRUE'), then string→column-type conversion applies
    UDFToX CAST rules — 0→boolean TRUE (non-empty string), '255'→tinyint
    NULL (strict range-checked parse), 'nope'→int NULL.
    schema_evol_text_nonvec_mapwork_part_all_primitive.q pins the
    matrix."""
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables(sf_dir)
    spark.sql("DROP TABLE IF EXISTS q253_vals_t")
    eng.sql(
        "create table q253_vals_t (i int, b boolean, t tinyint, s string)"
        " stored as textfile"
    )
    try:
        eng.sql(
            "insert into q253_vals_t values "
            "(1, 0, 255, 'x'), (2, false, 1, ''), (3, true, 'nope', NULL)"
        )
        return eng.sql(
            "select i, b, t, s from q253_vals_t order by i"
        ).localCheckpoint(eager=True)
    finally:
        spark.sql("DROP TABLE IF EXISTS q253_vals_t")


def q254_percentile_approx_hive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx re-expressed as Hive's NumericHistogram
    (GenericUDAFPercentileApprox + NumericHistogram.java — Ben-Haim &
    Tom-Tov): distinct counts within the 10000-bin budget make the
    histogram EXACT, so the quantile is the deterministic interpolation
    the oracle reproduces with window arithmetic (the udaf_percentile_
    approx_23.q family pins 255.5 where Spark's GK sketch says 256)."""
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables(sf_dir)
    # this entry PINS the Hive-exact path (the engine default is
    # Spark's mergeable native sketch — see the scale gate in
    # session._rewrite_percentile_approx)
    eng.hive_exact_percentile = True
    return eng.sql(
        "select l_returnflag, "
        "round(percentile_approx(cast(l_quantity as double), 0.5), 4) "
        "as median_qty from lineitem group by l_returnflag "
        "order by l_returnflag"
    )


def q255_hive_lexer_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HiveQL lexing + null-collection semantics in one row:
    adjacent string literals CONCATENATE (literal_string.q's
    'face''book' = 'facebook' — '' is NOT an ANSI escaped quote),
    map_keys/map_values of a NULL map return EMPTY lists
    (GenericUDFMapKeys' loop never runs — nullMap.q), and the SAMPLE
    variance of a single element is 0.0, not NULL
    (GenericUDAFVarianceSample.terminate:86)."""
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables(sf_dir)
    return eng.sql(
        "select 'face''book' as concat1, 'face' 'book' as concat2, "
        "size(map_keys(cast(null as map<int,string>))) as null_map_keys, "
        "var_samp(x) as vs1, stddev_samp(x) as ss1 "
        "from (select cast(7.5 as double) as x from region limit 1) t"
    )


def q256_mr_limit_key_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... LIMIT with no ORDER BY: Hive's MR shuffle sorts on
    the group key, so the reducer emits groups in key order and LIMIT
    keeps the SMALLEST keys (bucket_groupby.q golden) — re-expressed as
    a TakeOrderedAndProject (TopK, not a global sort)."""
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables(sf_dir)
    eng._mr_limit_key_order = True
    try:
        return eng.sql(
            "select n_name, count(*) as c from nation group by n_name "
            "limit 5"
        )
    finally:
        eng._mr_limit_key_order = False


def q257_regex_serde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RegexSerDe (serde2/RegexSerDe.java): LOAD parses each line by
    input.regex, capture group i+1 feeding column i; a NON-PARTICIPATING
    optional group reads NULL and a non-matching line reads all-NULL
    (serde_regex.q row 1's missing referer).  Arrow-batched kernel with
    Python fullmatch — regexp_extract cannot distinguish an empty match
    from a non-participating group."""
    import os as _os
    import tempfile as _tf

    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables(sf_dir)
    d = _tf.mkdtemp(prefix="q257_regex_")
    fpath = _os.path.join(d, "log.txt")
    with open(fpath, "w") as fh:
        fh.write("alpha 10 extra\nbeta 20\nno-match-line!\n")
    spark.sql("DROP TABLE IF EXISTS q257_regex_t")
    eng.sql(
        "create table q257_regex_t (name string, n int, tail string) "
        "row format serde 'org.apache.hadoop.hive.serde2.RegexSerDe' "
        "with serdeproperties ("
        "\"input.regex\" = \"(\\\\w+) (\\\\d+)(?: (\\\\w+))?\") "
        "stored as textfile"
    )
    try:
        eng.sql(
            f"load data local inpath '{fpath}' into table q257_regex_t"
        )
        return eng.sql(
            "select name, n, tail from q257_regex_t order by name nulls last"
        ).localCheckpoint(eager=True)
    finally:
        spark.sql("DROP TABLE IF EXISTS q257_regex_t")


def q258_mask_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional mask family (GenericUDFMaskFirstN/ShowLastN/MaskHash,
    ql/src/java/.../generic/ — udf_mask_first_n.q semantics): category
    masking over the first-N span, show-last-N, and md5 hashing."""
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables(sf_dir)
    return eng.sql(
        """
        select c_custkey,
               mask_first_n(c_name, 9) as m_first,
               mask_show_last_n(c_name, 4) as m_show_last,
               mask_hash(c_name) as m_hash
        from customer where c_custkey <= 100
        """
    ).localCheckpoint(eager=True)


def q259_field_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """field() (GenericUDFField.java): 1-based index of the value in
    the argument list, SAME primitive category only, 0 when absent."""
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables(sf_dir)
    return eng.sql(
        """
        select o_orderkey,
               field(o_orderpriority, '1-URGENT', '2-HIGH', '3-MEDIUM')
                 as pri_idx,
               field(cast(o_orderkey as int), 1, 2, 3) as key_idx
        from orders where o_orderkey <= 200
        """
    ).localCheckpoint(eager=True)


def q260_ngrams_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ngrams UDAF (GenericUDAFnGrams.java / udaf_ngrams.q): top-k
    n-gram frequencies over sentences() — rewritten to an explode +
    group-by + top-k plan (one shuffle; the estimator is exact at this
    k).  Oracle omitted: DuckDB has no sentences() tokenizer with
    Spark's BreakIterator semantics, so the driver records a rows-only
    check for this entry."""
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables(sf_dir)
    return eng.sql(
        "SELECT ngrams(sentences(lower(text)), 2, 10, 1000)"
        ".estfrequency FROM documents"
    ).localCheckpoint(eager=True)


QUERIES = {
    "q258_mask_positional": q258_mask_positional,
    "q259_field_function": q259_field_function,
    "q260_ngrams_udaf": q260_ngrams_udaf,
    "q253_values_text_protocol": q253_values_text_protocol,
    "q254_percentile_approx_hive": q254_percentile_approx_hive,
    "q255_hive_lexer_semantics": q255_hive_lexer_semantics,
    "q256_mr_limit_key_order": q256_mr_limit_key_order,
    "q257_regex_serde": q257_regex_serde,
    "q249_union_limit_whole": q249_union_limit_whole,
    "q250_legacy_outer_join_filters": q250_legacy_outer_join_filters,
    "q251_compute_stats_udaf": q251_compute_stats_udaf,
    "q252_partition_metadata_answers": q252_partition_metadata_answers,
    "q247_authorization_sql_statements": q247_authorization_sql_statements,
    "q240_stats_autogather": q240_stats_autogather,
    "q213_hplsql_procedure": q213_hplsql_procedure,
    "q161_constraint_validation": q161_constraint_validation,
    "q165_nulls_ordering": q165_nulls_ordering,
    "q162_streaming_upsert": q162_streaming_upsert,
    "q163_stream_static_join": q163_stream_static_join,
    "q174_checkpoint_recovery": q174_checkpoint_recovery,
    "q178_watermark_late_drop": q178_watermark_late_drop,
    "q175_explain_dependency": q175_explain_dependency,
    "q207_describe_function": q207_describe_function,
    "q206_streaming_dedup_within_watermark": q206_streaming_dedup_within_watermark,
    "q202_sql_std_authorization": q202_sql_std_authorization,
    "q201_explain_authorization": q201_explain_authorization,
    "q164_column_stats": q164_column_stats,
    "q136_streaming_dedup": q136_streaming_dedup,
    "q142_asof_join": q142_asof_join,
    "q150_session_window": q150_session_window,
    "q159_streaming_session_windows": q159_streaming_session_windows,
    "q151_global_row_number": q151_global_row_number,
    "q155_foreach_batch_sink": q155_foreach_batch_sink,
    "q143_range_join": q143_range_join,
    "q144_time_rollup": q144_time_rollup,
    "q137_stream_stream_join": q137_stream_stream_join,
    "q181_stream_left_outer_join": q181_stream_left_outer_join,
    "q183_column_lineage": q183_column_lineage,
    "q184_explain_analyze": q184_explain_analyze,
    "q209_stats_only_answers": q209_stats_only_answers,
    "q231_transform_custom_delimiters": q231_transform_custom_delimiters,
    "q230_stats_only_partition_filter": q230_stats_only_partition_filter,
    "q189_temporary_macro": q189_temporary_macro,
    "q94_transform_script": q94_transform_script,
    "q222_mapreduce_sql": q222_mapreduce_sql,
    "q115_stateful_user_summary": q115_stateful_user_summary,
    "q104_percentile_array": q104_percentile_array,
    "q105_like_rlike": q105_like_rlike,
    "q101_matchpath": q101_matchpath,
    "q102_decimal_char_types": q102_decimal_char_types,
    "q103_sessionization": q103_sessionization,
    "q95_analyze_stats": q95_analyze_stats,
    "q96_streaming_window_counts": q96_streaming_window_counts,
    "q97_cluster_by_sql": q97_cluster_by_sql,
    "q98_insert_append": q98_insert_append,
    "q99_mask_functions": q99_mask_functions,
    "q100_tpch_q2_style": q100_tpch_q2_style,
}

ORACLES = {
    "q258_mask_positional": """
        SELECT c_custkey,
               regexp_replace(regexp_replace(regexp_replace(
                   substr(c_name, 1, 9),
                   '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
                   '[0-9]', 'n', 'g')
                 || substr(c_name, 10) AS m_first,
               regexp_replace(regexp_replace(regexp_replace(
                   substr(c_name, 1, length(c_name) - 4),
                   '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
                   '[0-9]', 'n', 'g')
                 || substr(c_name, length(c_name) - 3) AS m_show_last,
               md5(c_name) AS m_hash
        FROM customer WHERE c_custkey <= 100
    """,
    "q259_field_function": """
        SELECT o_orderkey,
               CASE o_orderpriority
                    WHEN '1-URGENT' THEN 1
                    WHEN '2-HIGH' THEN 2
                    WHEN '3-MEDIUM' THEN 3
                    ELSE 0 END AS pri_idx,
               CASE WHEN o_orderkey = 1 THEN 1
                    WHEN o_orderkey = 2 THEN 2
                    WHEN o_orderkey = 3 THEN 3
                    ELSE 0 END AS key_idx
        FROM orders WHERE o_orderkey <= 200
    """,
    "q253_values_text_protocol": """
        SELECT * FROM (VALUES
          (1, TRUE,  CAST(NULL AS TINYINT), 'x'),
          (2, FALSE, CAST(1 AS TINYINT),    ''),
          (3, TRUE,  CAST(NULL AS TINYINT), CAST(NULL AS VARCHAR))
        ) AS t(i, b, t, s) ORDER BY i
    """,
    # the exact-histogram interpolation (csum/total >= q; linear between
    # the previous bin x and this bin x weighted by this bin's count)
    "q254_percentile_approx_hive": """
        WITH h AS (
          SELECT l_returnflag AS f, CAST(l_quantity AS DOUBLE) AS x,
                 CAST(COUNT(*) AS DOUBLE) AS y
          FROM lineitem GROUP BY 1, 2
        ), c AS (
          SELECT f, x, y,
                 SUM(y) OVER (PARTITION BY f ORDER BY x) AS csum,
                 SUM(y) OVER (PARTITION BY f) AS total,
                 LAG(x) OVER (PARTITION BY f ORDER BY x) AS px,
                 ROW_NUMBER() OVER (PARTITION BY f ORDER BY x) AS rn
          FROM h
        )
        SELECT f AS l_returnflag,
               ROUND(CASE WHEN rn = 1 THEN x
                     ELSE px + (0.5 * total - (csum - y)) * (x - px) / y
                     END, 4) AS median_qty
        FROM c
        WHERE csum / total >= 0.5
        QUALIFY ROW_NUMBER() OVER (PARTITION BY f ORDER BY x) = 1
        ORDER BY f
    """,
    "q255_hive_lexer_semantics": """
        SELECT 'facebook' AS concat1, 'facebook' AS concat2,
               0 AS null_map_keys, 0.0 AS vs1, 0.0 AS ss1
    """,
    "q256_mr_limit_key_order": """
        SELECT n_name, CAST(COUNT(*) AS BIGINT) AS c FROM nation
        GROUP BY n_name ORDER BY n_name LIMIT 5
    """,
    "q257_regex_serde": """
        SELECT * FROM (VALUES
          ('alpha', 10, 'extra'),
          ('beta', 20, CAST(NULL AS VARCHAR)),
          (CAST(NULL AS VARCHAR), CAST(NULL AS INT),
           CAST(NULL AS VARCHAR))
        ) AS t(name, n, tail) ORDER BY name NULLS LAST
    """,
    "q249_union_limit_whole": """
        SELECT 'a' AS c, CAST(5 AS BIGINT) AS n
        UNION ALL SELECT 'b', CAST(5 AS BIGINT) ORDER BY c
    """,
    "q250_legacy_outer_join_filters": """
        SELECT n.n_name, r.r_name
        FROM (SELECT * FROM nation WHERE n_nationkey < 5) n
        FULL OUTER JOIN (SELECT * FROM region WHERE r_regionkey < 3) r
          ON n.n_regionkey = r.r_regionkey
    """,
    # the FM sketch is deterministic (fixed-seed LCG) and region is the
    # same 5 rows at every SF — the display string is a constant
    "q251_compute_stats_udaf": """
        SELECT '{"columntype":"String","maxlength":11,"avglength":6.8,'
            || '"countnulls":0,"numdistinctvalues":7,"ndvbitvector":'
            || '"{0, 2, 4}{0, 1, 2}{0, 1}{0, 1, 2, 3}{0, 1, 2}{0, 1, 2}'
            || '{0, 1, 2, 3}{0, 1, 3}{0, 1, 3, 5}{0, 2, 3, 4}{0, 1, 2, 3}'
            || '{0, 1}{0, 2}{0, 1, 2}{0}{0, 1, 2}"}' AS stats
    """,
    "q252_partition_metadata_answers": """
        SELECT '2' AS max_ds, CAST(2 AS BIGINT) AS ndv_ds,
               CAST(0 AS BIGINT) AS cnt_ds
    """,
    "q247_authorization_sql_statements": """
        SELECT * FROM (VALUES
          ('s1_all_roles',     TRUE,  TRUE,  TRUE, 2, 4),
          ('s2_analysts_only', TRUE,  FALSE, TRUE, 1, 4),
          ('s3_none',          FALSE, FALSE, TRUE, 0, 4),
          ('s4_after_revoke',  TRUE,  FALSE, TRUE, 2, 4)
        ) AS t(stage, can_select, can_insert, can_update,
               n_current_roles, n_roles)
        ORDER BY stage
    """,
    "q240_stats_autogather": """
        SELECT 's1_after_ctas' AS stage, CAST(COUNT(*) AS BIGINT) AS n,
               TRUE AS stats_equals_scan, TRUE AS plan_has_no_scan
        FROM orders WHERE o_orderkey <= 1000
        UNION ALL
        SELECT 's2_after_insert', CAST(COUNT(*) AS BIGINT), TRUE, TRUE
        FROM orders WHERE o_orderkey <= 1500
        UNION ALL
        SELECT 's3_autogather_off', CAST(COUNT(*) AS BIGINT), TRUE, FALSE
        FROM orders WHERE o_orderkey <= 1600
        ORDER BY stage
    """,
    "q213_hplsql_procedure": """
        WITH per_region AS (
          SELECT r.r_name AS name, CAST(COUNT(n.n_nationkey) AS INT) AS n
          FROM region r JOIN nation n ON r.r_regionkey = n.n_regionkey
          GROUP BY r.r_name
        )
        SELECT CAST(COUNT(*) AS INT) AS n_regions,
               CAST(SUM(n) AS INT) AS total_nations,
               (SELECT name FROM per_region ORDER BY n DESC, name LIMIT 1)
                 AS biggest,
               CAST(MAX(n) AS INT) AS biggest_n,
               CAST(COUNT(*) AS VARCHAR) || ' regions / ' ||
                 CAST(CAST(SUM(n) AS INT) AS VARCHAR) || ' nations' AS summary,
               CAST(SUM(n) AS DOUBLE) / COUNT(*) AS avg_per_region
        FROM per_region
    """,
    "q165_nulls_ordering": """
        SELECT o_orderkey, v,
               ROW_NUMBER() OVER (ORDER BY v ASC NULLS FIRST, o_orderkey)
                 AS rn_nulls_first,
               ROW_NUMBER() OVER (ORDER BY v ASC NULLS LAST, o_orderkey)
                 AS rn_nulls_last
        FROM (SELECT o_orderkey,
                     CASE WHEN o_orderkey % 7 = 0 THEN NULL
                          ELSE o_totalprice END AS v
              FROM orders WHERE o_orderkey <= 300)
        ORDER BY o_orderkey
    """,
    "q164_column_stats": """
        SELECT 'o_custkey' AS col_name,
               CAST(MIN(o_custkey) AS DOUBLE) AS min_val,
               CAST(MAX(o_custkey) AS DOUBLE) AS max_val,
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_nulls,
               TRUE AS ndv_within_15pct
        FROM orders
        UNION ALL
        SELECT 'o_totalprice',
               CAST(MIN(o_totalprice) AS DOUBLE),
               CAST(MAX(o_totalprice) AS DOUBLE),
               CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               TRUE
        FROM orders
        ORDER BY col_name
    """,
    "q206_streaming_dedup_within_watermark": """
        SELECT DISTINCT user_id, event_type
        FROM events ORDER BY user_id, event_type
    """,
    "q207_describe_function": """
        SELECT * FROM (VALUES
          ('abs', TRUE, TRUE, TRUE),
          ('percentile_approx', TRUE, TRUE, TRUE),
          ('substr', TRUE, TRUE, TRUE)
        ) AS t(fn, name_line, has_usage, has_examples) ORDER BY fn
    """,
    "q202_sql_std_authorization": """
        SELECT * FROM (VALUES
          ('1_alice_select_via_role_chain', 'true'),
          ('2_alice_insert_denied', 'true'),
          ('3_bob_insert_direct', 'true'),
          ('4_bob_select_denied', 'true'),
          ('5_check_raises', 'true'),
          ('6_cycle_rejected', 'true'),
          ('7_current_roles_alice', 'analyst,data_eng'),
          ('8_show_grant', 'orders|bob|INSERT;orders|data_eng|SELECT'),
          ('9_revoke_strips_privilege', 'true')
        ) AS t(item, value) ORDER BY item
    """,
    "q201_explain_authorization": """
        SELECT * FROM (VALUES
          ('inputs', 'customer,nation,orders'),
          ('n_outputs', '0'),
          ('operation', 'QUERY'),
          ('user_nonempty', 'true')
        ) AS t(item, value) ORDER BY item
    """,
    "q175_explain_dependency": """
        SELECT * FROM (VALUES ('customer'), ('nation'), ('orders'), ('region'))
          AS t(input_table)
        ORDER BY input_table
    """,
    "q178_watermark_late_drop": """
        WITH b1 AS (
          SELECT event_id, ts, event_type FROM events WHERE event_id % 3 <> 0
        ), wm AS (
          SELECT MAX(ts) - INTERVAL 30 MINUTE AS w FROM b1
        ), kept AS (
          SELECT event_id, ts, event_type FROM b1
          UNION ALL
          SELECT e.event_id, e.ts, e.event_type
          FROM events e, wm
          WHERE e.event_id % 3 = 0
            AND date_trunc('hour', e.ts) + INTERVAL 1 HOUR > wm.w
        )
        SELECT date_trunc('hour', ts) AS win_start, event_type,
               COUNT(*) AS n_events
        FROM kept GROUP BY 1, 2 ORDER BY win_start, event_type
    """,
    "q174_checkpoint_recovery": """
        SELECT event_type, COUNT(*) AS n_events,
               ROUND(CAST(SUM(value) AS DOUBLE), 2) AS sum_value
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "q163_stream_static_join": """
        SELECT c.c_mktsegment, COUNT(*) AS n_events,
               ROUND(SUM(e.value), 2) AS sum_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
    "q162_streaming_upsert": """
        WITH mk AS (SELECT MAX(o_orderkey) AS mk FROM orders),
        src AS (
          SELECT o_orderkey AS k, o_totalprice + 500 AS new_price
          FROM orders WHERE o_orderkey % 13 = 0
          UNION ALL
          SELECT o_orderkey + mk.mk + 1, 50.0
          FROM orders, mk WHERE o_orderkey % 509 = 0
        ),
        merged AS (
          SELECT CASE WHEN o.o_orderkey IS NULL THEN 'N'
                      ELSE o.o_orderstatus END AS status,
                 CASE WHEN s.k IS NOT NULL THEN s.new_price
                      ELSE o.o_totalprice END AS price
          FROM orders o FULL JOIN src s ON o.o_orderkey = s.k
        )
        SELECT status, COUNT(*) AS n, ROUND(SUM(price), 2) AS total_price
        FROM merged GROUP BY status ORDER BY status
    """,
    "q161_constraint_validation": """
        SELECT 'fk_lineitem_orders' AS constraint_name, 'foreign_key' AS kind,
               (SELECT COUNT(*) FROM lineitem l
                WHERE l.l_orderkey IS NOT NULL
                  AND NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey))
                 AS violation_count
        UNION ALL
        SELECT 'fk_orders_customer', 'foreign_key',
               (SELECT COUNT(*) FROM orders o
                WHERE o.o_custkey IS NOT NULL
                  AND NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))
        UNION ALL
        SELECT 'nn_orders_status', 'not_null',
               (SELECT COUNT(*) FROM orders WHERE o_orderstatus IS NULL)
        UNION ALL
        SELECT 'pk_customer', 'primary_key',
               CAST((SELECT COALESCE(SUM(n - 1), 0) FROM
                 (SELECT COUNT(*) AS n FROM customer GROUP BY c_custkey
                  HAVING COUNT(*) > 1)) AS BIGINT)
        UNION ALL
        SELECT 'pk_orders', 'primary_key',
               CAST((SELECT COALESCE(SUM(n - 1), 0) FROM
                 (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey
                  HAVING COUNT(*) > 1)) AS BIGINT)
        ORDER BY constraint_name
    """,
    "q155_foreach_batch_sink": """
        SELECT user_id, COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS sum_value
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    "q151_global_row_number": """
        SELECT o_orderkey,
               CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
                    AS BIGINT) AS rn
        FROM orders ORDER BY rn
    """,
    "q159_streaming_session_windows": """
        WITH flagged AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                      OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
          FROM events WHERE user_id < 150
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
          SELECT user_id, event_id, ts,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_id
          FROM flagged
        )
        SELECT user_id, MIN(ts) AS session_start,
               COUNT(*) AS n_events, MIN(event_id) AS first_event
        FROM sess GROUP BY user_id, session_id
        ORDER BY user_id, session_start
    """,
    "q150_session_window": """
        WITH flagged AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                      OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
          FROM events WHERE user_id < 200
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
          SELECT user_id, event_id, ts,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_id
          FROM flagged
        )
        SELECT user_id, MIN(ts) AS session_start,
               COUNT(*) AS n_events, MIN(event_id) AS first_event
        FROM sess GROUP BY user_id, session_id
        ORDER BY user_id, session_start
    """,
    "q142_asof_join": """
        WITH j AS (
          SELECT p.event_id AS purchase_id, p.user_id,
                 v.ts AS view_ts, v.event_id AS view_id,
                 ROUND(v.value, 2) AS view_value,
                 row_number() OVER (PARTITION BY p.event_id
                                    ORDER BY v.ts DESC, v.event_id DESC) AS rn
          FROM (SELECT * FROM events WHERE event_type = 'purchase') p
          JOIN (SELECT * FROM events WHERE event_type = 'view') v
            ON v.user_id = p.user_id AND v.ts <= p.ts
        )
        SELECT purchase_id, user_id, view_ts, view_id, view_value
        FROM j WHERE rn = 1 ORDER BY purchase_id
    """,
    "q143_range_join": """
        SELECT i.incident_id,
               COUNT(e.event_id) AS n_events,
               ROUND(COALESCE(SUM(e.value), 0), 2) AS sum_value
        FROM (SELECT event_id AS incident_id, ts AS start_ts,
                     ts + INTERVAL 2 HOUR AS end_ts
              FROM events WHERE event_id % 199 = 0) i
        LEFT JOIN events e ON e.ts >= i.start_ts AND e.ts < i.end_ts
        GROUP BY i.incident_id ORDER BY i.incident_id
    """,
    "q144_time_rollup": """
        SELECT event_type, day, hh,
               CAST(GROUPING(event_type, day, hh) AS INT) AS lvl,
               COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
        FROM (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                     hour(ts) AS hh, value
              FROM events)
        GROUP BY GROUPING SETS ((event_type, day, hh), (event_type, day), (event_type))
        ORDER BY lvl, event_type, day, hh
    """,
    "q137_stream_stream_join": """
        SELECT v.b_user, COUNT(*) AS n_pairs, MIN(buy_id) AS first_buy
        FROM (
          SELECT b.user_id AS b_user, b.event_id AS buy_id,
                 v.event_id AS view_id
          FROM (SELECT * FROM events WHERE event_type = 'purchase') b
          JOIN (SELECT * FROM events WHERE event_type = 'view') v
            ON v.user_id = b.user_id
           AND v.ts <= b.ts AND b.ts <= v.ts + INTERVAL 1 HOUR
        ) v
        GROUP BY v.b_user ORDER BY v.b_user
    """,
    "q189_temporary_macro": """
        SELECT l_returnflag,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS net,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                 AS taxed
        FROM lineitem WHERE l_orderkey <= 2000
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q231_transform_custom_delimiters": """
        SELECT o_orderkey AS o_key,
               UPPER(o_orderstatus) AS status_uc,
               UPPER(o_orderpriority) AS prio_uc
        FROM orders WHERE o_orderkey <= 300
    """,
    "q230_stats_only_partition_filter": """
        SELECT status, n, TRUE AS stats_equals_scan, TRUE AS plan_has_no_scan
        FROM (
          SELECT s.status,
                 CAST(COALESCE(c.n, 0) AS BIGINT) AS n
          FROM (SELECT UNNEST(['F', 'O', 'P', 'ZZ']) AS status) s
          LEFT JOIN (
            SELECT o_orderstatus AS status, COUNT(*) AS n
            FROM orders GROUP BY o_orderstatus
          ) c ON s.status = c.status
        )
    """,
    "q209_stats_only_answers": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(MIN(o_totalprice), 2) AS min_price,
               ROUND(MAX(o_totalprice), 2) AS max_price,
               CAST(COUNT(o_custkey) AS BIGINT) AS n_cust,
               TRUE AS stats_equals_scan,
               TRUE AS plan_has_no_scan
        FROM orders
    """,
    "q184_explain_analyze": """
        SELECT 'agg_final' AS op,
               CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_rows
        FROM orders WHERE o_totalprice > 100000
        UNION ALL
        SELECT 'filter', CAST(COUNT(*) AS BIGINT)
        FROM orders WHERE o_totalprice > 100000
        UNION ALL
        SELECT 'scan', CAST(COUNT(*) AS BIGINT) FROM orders
        ORDER BY op
    """,
    "q183_column_lineage": """
        SELECT * FROM (VALUES
          ('k', 'customer', 'c_custkey'),
          ('k', 'customer', 'c_nationkey'),
          ('k', 'lineitem', 'l_orderkey'),
          ('k', 'lineitem', 'l_shipdate'),
          ('k', 'nation', 'n_nationkey'),
          ('k', 'orders', 'o_custkey'),
          ('k', 'orders', 'o_orderkey'),
          ('net', 'customer', 'c_custkey'),
          ('net', 'customer', 'c_nationkey'),
          ('net', 'lineitem', 'l_discount'),
          ('net', 'lineitem', 'l_orderkey'),
          ('net', 'lineitem', 'l_shipdate'),
          ('net', 'nation', 'n_nationkey'),
          ('net', 'orders', 'o_custkey'),
          ('net', 'orders', 'o_orderkey'),
          ('net', 'orders', 'o_totalprice'),
          ('nation', 'customer', 'c_custkey'),
          ('nation', 'customer', 'c_nationkey'),
          ('nation', 'lineitem', 'l_orderkey'),
          ('nation', 'lineitem', 'l_shipdate'),
          ('nation', 'nation', 'n_name'),
          ('nation', 'nation', 'n_nationkey'),
          ('nation', 'orders', 'o_custkey'),
          ('nation', 'orders', 'o_orderkey')
        ) AS t(out_col, src_table, src_col)
        ORDER BY out_col, src_table, src_col
    """,
    "q181_stream_left_outer_join": """
        SELECT v.user_id AS v_user, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(b.event_id) AS BIGINT) AS n_matched
        FROM (SELECT * FROM events WHERE event_type = 'view') v
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
          ON v.user_id = b.user_id
         AND v.ts <= b.ts AND b.ts <= v.ts + INTERVAL 1 HOUR
        GROUP BY v.user_id ORDER BY v.user_id
    """,
    "q136_streaming_dedup": """
        SELECT DISTINCT user_id, event_type FROM events
        ORDER BY user_id, event_type
    """,
    "q94_transform_script": """
        SELECT n_nationkey, upper(n_name) AS upper_name
        FROM nation ORDER BY n_nationkey
    """,
    "q222_mapreduce_sql": """
        -- identity script ('cat'): the oracle is the MAP expression list
        -- itself; FLOOR because Spark CASTs double->int by truncation
        -- while DuckDB rounds
        SELECT CAST(n_nationkey AS INT) AS tkey,
               CAST(FLOOR(n_nationkey / 10) AS INT) AS ten,
               CAST(n_nationkey % 10 AS INT) AS one,
               n_name AS tvalue
        FROM nation
    """,
    "q95_analyze_stats": """
        SELECT COUNT(*) AS n_rows_stats, COUNT(*) AS n_rows_actual FROM customer
    """,
    "q96_streaming_window_counts": """
        SELECT date_trunc('hour', ts) AS win_start, event_type,
               COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "q97_cluster_by_sql": """
        SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 2) AS bal FROM supplier
    """,
    "q98_insert_append": """
        SELECT r_name, CAST(2 AS BIGINT) AS n FROM region ORDER BY r_name
    """,
    "q99_mask_functions": """
        SELECT c_custkey,
               regexp_replace(regexp_replace(regexp_replace(c_name,
                 '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS masked,
               regexp_replace(regexp_replace(regexp_replace(regexp_replace(c_name,
                 '[A-Z]', 'U', 'g'), '[a-z]', 'l', 'g'), '[^Ul0-9]', '*', 'g'),
                 '[0-9]', '#', 'g') AS masked_custom
        FROM customer WHERE c_custkey <= 100
    """,
    "q101_matchpath": """
        WITH seq AS (
          SELECT o_custkey, o_orderkey,
                 (o_totalprice > 300000) AS big,
                 row_number() OVER w AS rn,
                 COUNT(*) OVER (PARTITION BY o_custkey) AS n,
                 MIN(CASE WHEN o_totalprice > 300000 THEN rn_inner END)
                   OVER (PARTITION BY o_custkey ORDER BY rn_inner
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_big_rn
          FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey) AS rn_inner
                FROM orders WHERE o_custkey < 200)
          WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        )
        SELECT o_custkey, o_orderkey,
               COALESCE(next_big_rn - rn, n - rn + 1) AS path_len
        FROM seq WHERE big ORDER BY o_custkey, o_orderkey
    """,
    "q115_stateful_user_summary": """
        SELECT user_id, COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS sum_value,
               MIN(event_id) AS first_event, MAX(event_id) AS last_event
        FROM events GROUP BY user_id
    """,
    "q104_percentile_array": """
        SELECT l_returnflag,
               array_to_string(list_transform(
                 [quantile_cont(l_quantity, 0.25), quantile_cont(l_quantity, 0.5),
                  quantile_cont(l_quantity, 0.75)],
                 v -> CAST(ROUND(v, 4) AS VARCHAR)), ',') AS quartiles
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q105_like_rlike": """
        SELECT p_partkey, p_type,
               (p_name LIKE 'b%') AS starts_b,
               regexp_matches(p_type, 'LARGE|SMALL') AS sized
        FROM part
        WHERE p_type LIKE '%ARG%' OR regexp_matches(p_name, '^[bc].*[td]$')
    """,
    "q103_sessionization": """
        WITH flagged AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN lag_ts IS NULL OR epoch(ts) - epoch(lag_ts) > 1800
                      THEN 1 ELSE 0 END AS new_sess
          FROM (SELECT user_id, event_id, ts,
                       lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag_ts
                FROM events WHERE user_id < 200)
        ), sess AS (
          SELECT user_id, event_id,
                 CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
          FROM flagged
        )
        SELECT user_id, session_id, COUNT(*) AS n_events,
               MIN(event_id) AS first_event
        FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id
    """,
    "q102_decimal_char_types": """
        SELECT o_orderkey,
               CAST(o_totalprice AS DECIMAL(18,2)) AS price_dec,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DECIMAL(20,2)) AS price_x2,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) / 4 AS DECIMAL(24,6)) AS price_div,
               CAST(o_orderstatus AS VARCHAR) AS status_vc,
               rpad(o_orderstatus, 3, ' ') AS status_char3,
               CAST(substr(o_orderpriority, 1, 4) AS VARCHAR) AS prio_trunc
        FROM orders WHERE o_orderkey <= 500
    """,
    "q100_tpch_q2_style": """
        SELECT p.p_partkey, p.p_brand, ROUND(l.l_extendedprice, 2) AS min_price,
               s.s_name
        FROM part p
        JOIN lineitem l ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE p.p_size = 15
          AND l.l_extendedprice = (
            SELECT MIN(l2.l_extendedprice) FROM lineitem l2
            WHERE l2.l_partkey = p.p_partkey)
    """,
}
