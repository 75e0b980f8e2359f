"""Remaining HiveQL language-surface constructs: LATERAL VIEW OUTER,
GROUPING__ID, TABLESAMPLE(n PERCENT), and virtual columns.

Reference surface:
* LATERAL VIEW [OUTER] — grammar HiveParser.g:290-291, executed by
  LateralViewJoinOperator.java:1 (OUTER emits the input row with NULL
  generator output when the UDTF produces nothing).
* GROUPING__ID virtual column — GroupByDesc.java:64-66 grouping-sets
  expansion; Spark's grouping_id() uses the same first-arg-is-MSB bit
  order as Hive.
* TABLESAMPLE(n PERCENT) — parse/SplitSample.java:1 (split-based, so
  row choice is engine-specific; Spark's Bernoulli df.sample is the
  scalable equivalent — seeded, executor-local, no shuffle).
* INPUT__FILE__NAME virtual column — exec/TableScanOperator.java:388
  virtual-column emission → Spark's input_file_name().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_2_1_1_src_spark.queries._util import t


def q131_lateral_view_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW OUTER explode over a sometimes-empty array: rows whose
    array is empty survive with a NULL element (LateralViewJoinOperator's
    OUTER contract), exercised through the actual HiveQL syntax."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("tl_orders")
    return spark.sql(
        """
        SELECT o_orderkey, part
        FROM (
          SELECT o_orderkey,
                 CASE WHEN o_orderstatus = 'P' THEN array()
                      ELSE split(o_orderpriority, '-') END AS parts
          FROM tl_orders WHERE o_orderkey <= 2000
        ) LATERAL VIEW OUTER explode(parts) x AS part
        ORDER BY o_orderkey, part
        """
    )


def q132_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with the GROUPING__ID bitmask (first grouping column in the
    most-significant bit, as Hive's grouping-sets expansion emits it)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


def q133_percent_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE (10 PERCENT) (SplitSample, HiveParser.g splitSample).
    Hive samples the first ~n% of input bytes/splits — deterministic given
    one file layout but not portable across layouts, which is exactly what
    breaks at 100 TB.  The scale-portable equivalent is a deterministic
    hash-space sample: keep rows whose md5(row key) lands in the first 10%
    of hash space (substr(md5, 1, 4) <= '1998' ⇔ 0x0000..0x1998 of 0x10000
    ≈ 10.0%) — layout-independent, reproducible on any cluster, and
    identically computable by the oracle.  The seeded-Bernoulli variant
    (.sample(fraction, seed)) stays pinned in tests."""
    li = t(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    return li.filter(F.substring(F.md5(key), 1, 4) <= "1998").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


def q134_input_file_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INPUT__FILE__NAME virtual column: per-file row counts via
    input_file_name() (TableScanOperator's virtual-column surface)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.regexp_extract(F.input_file_name(), r"([^/]+?)(\?.*)?$", 1).alias(
                "file"
            )
        )
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("file")
    )


def q199_file_metadata_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive's physical virtual columns beyond INPUT__FILE__NAME —
    BLOCK__OFFSET__INSIDE__FILE / ROW__OFFSET__INSIDE__BLOCK
    (ql/.../metadata/VirtualColumn.java) — re-expressed through Spark's
    _metadata struct (file_name, file_size, file_block_start,
    file_modification_time): per-file row counts with certificates that
    the block offsets and sizes are coherent (block starts at 0 for a
    single-row-group file, size positive, name matches the scan)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.col("_metadata.file_name").alias("file"),
            F.col("_metadata.file_size").alias("fsize"),
            F.col("_metadata.file_block_start").alias("bstart"),
        )
        .groupBy("file")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.min("fsize") > 0).alias("size_positive"),
            (F.min("bstart") >= 0).alias("offset_nonneg"),
            (F.countDistinct("fsize") == 1).alias("size_consistent"),
        )
        .orderBy("file")
    )


def q148_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT — Hive users spell this as CASE-conditional aggregates
    (there's no PIVOT keyword in 2.1); Spark's relational pivot compiles
    to the same single-scan conditional-agg plan.  Order counts and
    revenue by status, pivoted across priorities."""
    o = t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", ["1-URGENT", "2-HIGH", "3-MEDIUM"])
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    return piv.select(
        "o_orderstatus",
        F.col("1-URGENT").alias("urgent_total"),
        F.col("2-HIGH").alias("high_total"),
        F.col("3-MEDIUM").alias("medium_total"),
    ).orderBy("o_orderstatus")


def q149_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / stack: wide metric columns back to (metric, value) rows
    — one projection + explode, no shuffle until the final agg."""
    li = t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("price"),
        F.round(F.sum("l_tax"), 2).alias("tax"),
    )
    return (
        wide.unpivot("l_returnflag", ["qty", "price", "tax"], "metric", "metric_value")
        .orderBy("l_returnflag", "metric")
    )


def q223_regex_cols_offset_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regex_col.q + offset_limit.q surfaces: with
    ``set hive.support.quoted.identifiers=none`` a backticked
    identifier is a column REGEX (ParseDriver; HiveConf
    SUPPORT_QUOTED_IDENTIFIERS — Spark's identical switch is
    spark.sql.parser.quotedRegexColumnNames), and Hive's two-operand
    ``LIMIT offset, count`` (HiveParser.g limitClause) translates to
    ANSI LIMIT/OFFSET.  Deterministic: total ORDER BY before the
    offset window."""
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables(sf_dir)
    eng.sql("set hive.support.quoted.identifiers=none")
    try:
        return eng.sql(
            "SELECT `o_order(key|status)` FROM orders "
            "ORDER BY o_orderkey LIMIT 5, 10"
        )
    finally:
        eng.sql("set hive.support.quoted.identifiers=column")


def q228_lateral_view_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained LATERAL VIEWs with predicate pushdown across the UDTF
    (lateral_view_ppd.q; HIVE-4293 pins that a WHERE *after* the UDTF
    inside the subquery must not be pushed above it) and the no-alias
    column form (lateral_view_noalias.q; HIVE-2608 — explode(map)
    yields the default key/value names).  Catalyst plans each Generate
    inline in the scan stage — no shuffle; the o_orderkey filter IS
    pushed to the parquet scan while myCol > 1 stays post-Generate."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("lvc_orders")
    return spark.sql(
        """
        SELECT o_orderkey, myCol, myCol2, key AS mkey, value AS mval
        FROM (
          SELECT o_orderkey, myCol, myCol2, mt.key, mt.value
          FROM lvc_orders
          LATERAL VIEW explode(array(1, 2, 3)) myTable AS myCol
          LATERAL VIEW explode(array(10, 20)) myTable2 AS myCol2
          LATERAL VIEW explode(map('key1', 100, 'key2', 200)) mt
          WHERE myCol > 1
        ) a
        WHERE o_orderkey <= 100
        """
    )


def q229_literal_coercion_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive literal and implicit-coercion surface
    (literal_decimal.q: the BD BigDecimal literal suffix;
    num_op_type_conv.q: NULL arithmetic propagation and string-numeric
    modulo; null_cast.q: NULL inside complex-type constructors;
    parenthesis_star_by.q: parenthesized CLUSTER BY column lists) — all
    parsed natively by Spark's Hive-compatible grammar through the
    engine's SQL path; pure literal projection, no scan work."""
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables(sf_dir)
    return eng.sql(
        """
        SELECT o_orderkey,
               3.14BD AS bd_lit,
               -99999999999999999BD AS bd_big,
               NULL + 7 AS null_plus,
               CAST(1.0 - NULL AS DOUBLE) AS null_minus,
               CAST(9 % '3' AS DOUBLE) AS str_mod,
               CAST(CAST(21 AS BIGINT) % CAST(5 AS TINYINT) AS BIGINT) AS mixed_mod,
               ARRAY(NULL, 0) AS arr_null,
               SIZE(ARRAY(NULL, ARRAY())) AS arr_nested_n
        FROM (SELECT o_orderkey FROM orders
              WHERE o_orderkey <= 50 CLUSTER BY (o_orderkey))
        """
    )


def q232_quoted_identifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quoted identifiers with hostile characters (quotedid_basic.q;
    hive.support.quoted.identifiers=column, HIVE-6013 — backticked names
    like `x+1` and `!@#$%^&*()_q` flow through SELECT / WHERE / GROUP
    BY / HAVING / window PARTITION BY, resolved case-insensitively).
    Spark's backtick quoting is the same surface; outputs re-aliased to
    plain names for the oracle compare."""
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    eng.register_tables(sf_dir)
    spark.sql(
        "SELECT o_orderkey AS `x+1`, o_orderstatus AS `y&y`, "
        "o_orderpriority AS `!@#$%^&*()_q` "
        "FROM orders WHERE o_orderkey <= 2000"
    ).createOrReplaceTempView("qid_t1")
    return eng.sql(
        """
        SELECT `X+1` AS xp1, `Y&y` AS yy, `!@#$%^&*()_Q` AS prio,
               CAST(rank() OVER (PARTITION BY `!@#$%^&*()_q`
                    ORDER BY `y&y`, `x+1`) AS INT) AS r
        FROM qid_t1 WHERE `!@#$%^&*()_q` LIKE '1%'
        GROUP BY `x+1`, `y&Y`, `!@#$%^&*()_q`
        HAVING `!@#$%^&*()_Q` LIKE '%URGENT%'
        """
    )


QUERIES = {
    "q131_lateral_view_outer": q131_lateral_view_outer,
    "q228_lateral_view_chain": q228_lateral_view_chain,
    "q229_literal_coercion_battery": q229_literal_coercion_battery,
    "q232_quoted_identifiers": q232_quoted_identifiers,
    "q148_pivot": q148_pivot,
    "q149_unpivot": q149_unpivot,
    "q223_regex_cols_offset_limit": q223_regex_cols_offset_limit,
    "q132_grouping_id": q132_grouping_id,
    "q133_percent_sample": q133_percent_sample,
    "q134_input_file_name": q134_input_file_name,
    "q199_file_metadata_columns": q199_file_metadata_columns,
}

ORACLES = {
    "q228_lateral_view_chain": """
        SELECT o_orderkey, myCol, myCol2, mkey, mval
        FROM orders
        CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS myCol)
        CROSS JOIN (SELECT UNNEST([10, 20]) AS myCol2)
        CROSS JOIN (SELECT 'key1' AS mkey, 100 AS mval
                    UNION ALL SELECT 'key2', 200)
        WHERE myCol > 1 AND o_orderkey <= 100
    """,
    "q232_quoted_identifiers": """
        SELECT o_orderkey AS xp1, o_orderstatus AS yy,
               o_orderpriority AS prio,
               CAST(rank() OVER (PARTITION BY o_orderpriority
                    ORDER BY o_orderstatus, o_orderkey) AS INT) AS r
        FROM orders
        WHERE o_orderkey <= 2000 AND o_orderpriority LIKE '1%'
          AND o_orderpriority LIKE '%URGENT%'
    """,
    "q229_literal_coercion_battery": """
        SELECT o_orderkey,
               CAST(3.14 AS DECIMAL(3,2)) AS bd_lit,
               CAST(-99999999999999999 AS DECIMAL(17,0)) AS bd_big,
               CAST(NULL AS INT) + 7 AS null_plus,
               CAST(1.0 - NULL AS DOUBLE) AS null_minus,
               CAST(0 AS DOUBLE) AS str_mod,
               CAST(21 % 5 AS BIGINT) AS mixed_mod,
               [NULL, 0] AS arr_null,
               2 AS arr_nested_n
        FROM orders WHERE o_orderkey <= 50
    """,
    "q199_file_metadata_columns": """
        SELECT 'lineitem.parquet' AS file, COUNT(*) AS n_rows,
               TRUE AS size_positive, TRUE AS offset_nonneg,
               TRUE AS size_consistent
        FROM lineitem
    """,
    "q223_regex_cols_offset_limit": """
        SELECT o_orderkey, o_orderstatus FROM orders
        ORDER BY o_orderkey LIMIT 10 OFFSET 5
    """,
    "q148_pivot": """
        SELECT o_orderstatus,
               ROUND(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END), 2) AS urgent_total,
               ROUND(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END), 2) AS high_total,
               ROUND(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END), 2) AS medium_total
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "q149_unpivot": """
        WITH wide AS (
          SELECT l_returnflag,
                 ROUND(SUM(l_quantity), 2) AS qty,
                 ROUND(SUM(l_extendedprice), 2) AS price,
                 ROUND(SUM(l_tax), 2) AS tax
          FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, metric, metric_value FROM (
          SELECT l_returnflag, 'qty' AS metric, qty AS metric_value FROM wide
          UNION ALL
          SELECT l_returnflag, 'price', price FROM wide
          UNION ALL
          SELECT l_returnflag, 'tax', tax FROM wide
        ) ORDER BY l_returnflag, metric
    """,
    "q131_lateral_view_outer": """
        SELECT o_orderkey, u AS part
        FROM (
          SELECT o_orderkey,
                 CASE WHEN o_orderstatus = 'P' THEN []
                      ELSE string_split(o_orderpriority, '-') END AS parts
          FROM orders WHERE o_orderkey <= 2000
        ), LATERAL UNNEST(CASE WHEN len(parts) = 0 THEN [NULL]
                               ELSE parts END) AS x(u)
        ORDER BY o_orderkey, part
    """,
    "q132_grouping_id": """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY gid, l_returnflag, l_linestatus
    """,
    "q133_percent_sample": """
        SELECT COUNT(*) AS n_rows,
               COUNT(DISTINCT l_orderkey) AS n_orders
        FROM lineitem
        WHERE substr(md5(l_orderkey::VARCHAR || '|' || l_linenumber::VARCHAR), 1, 4)
              <= '1998'
    """,
    "q134_input_file_name": """
        SELECT 'lineitem.parquet' AS file, COUNT(*) AS n_rows FROM lineitem
    """,
}
