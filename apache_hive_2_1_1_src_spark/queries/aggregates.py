"""Aggregation surface: UDAFs, DISTINCT aggs, grouping sets/rollup/cube.

Reference (SURVEY.md §2.3): built-in UDAFs registered at
ql/.../exec/FunctionRegistry.java:376-405 (max/min/sum/$SUM0/count/avg/
stddev*/var*/covar*/corr/percentile*/histogram_numeric/collect_*/ngrams/
context_ngrams); GroupByOperator.java:1159 with modes
plan/GroupByDesc.java:54-56; DISTINCT via GroupByDesc.isDistinct (:71);
grouping-sets flags GroupByDesc.java:64-66.

Scale notes: every groupBy here relies on Catalyst's partial aggregation
(map-side combine) so the shuffle carries pre-aggregated state, not raw
rows.  count(DISTINCT) expands keys exactly like Hive's
HiveExpandDistinctAggregatesRule — Catalyst does the same rewrite.
approx_count_distinct is the HLL sketch path for 100 TB cardinalities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_2_1_1_src_spark.functions.compat import sum0
from apache_hive_2_1_1_src_spark.functions.ngrams import context_ngrams, ngrams
from apache_hive_2_1_1_src_spark.queries._util import t


def q20_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count("l_quantity").alias("n_qty_nonnull"),
        )
        .orderBy("l_returnflag")
    )


def q21_sum0_empty_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$SUM0 (GenericUDAFSumEmptyIsZero, FunctionRegistry.java:379): sum over
    an all-NULL input yields 0, not NULL."""
    li = t(spark, sf_dir, "lineitem")
    never = F.when(F.col("l_quantity") < 0, F.col("l_quantity"))  # always NULL
    return (
        li.groupBy("l_returnflag")
        .agg(
            sum0(never).alias("sum0_empty"),
            F.sum(never).alias("sum_null"),
        )
        .orderBy("l_returnflag")
    )


def q22_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance family (FunctionRegistry.java:383-391; Hive `std` and
    `stddev` are population stddev)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.round(F.stddev_pop("l_quantity"), 4).alias("stddev_pop_qty"),
            F.round(F.stddev_samp("l_quantity"), 4).alias("stddev_samp_qty"),
            F.round(F.var_pop("l_quantity"), 4).alias("var_pop_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_samp_qty"),
        )
        .orderBy("l_linestatus")
    )


def q23_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corr/covar_pop/covar_samp (FunctionRegistry.java:389-391)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covar_pop_qp"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_samp_qp"),
        )
        .orderBy("l_returnflag")
    )


def q24_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(DISTINCT x) — Hive expands the distinct key into the group key
    (HiveExpandDistinctAggregatesRule); Catalyst performs the same Expand."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("nd_parts"),
            F.countDistinct("l_suppkey").alias("nd_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


def q25_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch cardinality (approx_count_distinct, rsd=0.01) — the
    100 TB path where exact COUNT(DISTINCT) is a full Expand+shuffle.
    The sketch estimate itself is engine-specific, so the oracle-checked
    contract is its accuracy certificate: |approx - exact| <= 5%·exact
    (generous envelope for rsd=0.01), emitted alongside the exact count
    (GenericUDAFComputeStats-family sketch surface)."""
    li = t(spark, sf_dir, "lineitem")
    exact = F.countDistinct("l_orderkey")
    approx = F.approx_count_distinct("l_orderkey", 0.01)
    return li.agg(
        exact.alias("exact_orders"),
        (
            F.abs(approx.cast("double") - exact.cast("double"))
            <= 0.05 * exact.cast("double")
        ).alias("approx_within_5pct"),
    )


def q26_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile with linear interpolation
    (GenericUDAFPercentileApprox's exact sibling, FunctionRegistry.java:405)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", 0.5), 4).alias("p50_qty"),
            F.round(F.percentile("l_extendedprice", 0.9), 4).alias("p90_price"),
        )
        .orderBy("l_returnflag")
    )


def q27_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (FunctionRegistry.java:394) — GK-style quantile
    sketch.  The sketch value is engine-specific, so the oracle-checked
    contract is its accuracy certificate per group: within 2% of the exact
    interpolated median, emitted alongside the exact value."""
    li = t(spark, sf_dir, "lineitem")
    exact = F.percentile("l_extendedprice", 0.5)
    approx = F.percentile_approx("l_extendedprice", 0.5, 10000)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(exact, 4).alias("exact_median_price"),
            (F.abs(approx - exact) <= 0.02 * exact).alias("approx_within_2pct"),
        )
        .orderBy("l_returnflag")
    )


def q28_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set/collect_list (FunctionRegistry.java:396-397); output
    canonicalized with sort_array + join for deterministic comparison."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.array_join(F.array_sort(F.collect_set("o_orderpriority")), "|").alias(
                "priorities"
            ),
            F.size(F.collect_list("o_orderpriority")).alias("n_collected"),
        )
        .orderBy("o_orderstatus")
    )


def q29_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with grouping() flags (GroupByDesc.java:64-66 expansion;
    SQL surface HiveParser.g).  Expressed via Spark SQL on a temp view."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("ags_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls,
               COUNT(*) AS n_rows, ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM ags_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ())
        """
    )


def q30_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
    )


def q31_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def q32_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING = post-aggregation filter (Hive plans it as Filter above
    GroupBy — ppd/OpProcFactory.java keeps it there)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_lines"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("n_lines") >= 8)
        .orderBy("l_partkey")
    )


def q33_histogram_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram_numeric (FunctionRegistry.java:393) — Spark 3.3+ ships the
    same NumericHistogram algorithm (GenericUDAFHistogramNumeric.java).
    Bin placement is data-order dependent, so the oracle-checked contract is
    the algorithm's exact invariants: bin count, total mass (= non-null row
    count), mass-weighted centroid mean ≈ column mean (pairwise bin merging
    preserves the weighted sum in exact arithmetic; O(n) float merges can
    drift, so this is an epsilon CERTIFICATE — the q25/q27 pattern — not a
    rounded-value compare that a half-way rounding boundary could flip),
    and centroids within [min, max].  Raw bins stay pinned in
    tests/test_rows_only_invariants.py."""
    li = t(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.expr("histogram_numeric(l_quantity, 5)").alias("bins"),
        F.min("l_quantity").alias("lo"),
        F.max("l_quantity").alias("hi"),
        F.count("l_quantity").alias("n"),
        F.avg("l_quantity").alias("mean"),
    )
    wmean = (
        F.expr("aggregate(bins, cast(0 as double), (a, b) -> a + b.x * b.y)")
        / F.col("n")
    )
    return agg.select(
        F.size("bins").cast("long").alias("nbins"),
        F.round(
            F.expr("aggregate(bins, cast(0 as double), (a, b) -> a + b.y)"), 3
        ).alias("total_mass"),
        (
            F.abs(wmean - F.col("mean"))
            <= F.lit(1e-6) * F.greatest(F.lit(1.0), F.abs(F.col("mean")))
        ).alias("wmean_matches_avg"),
        F.expr(
            "aggregate(bins, true, (a, b) -> a AND b.x >= lo AND b.x <= hi)"
        ).alias("centroids_in_range"),
    )


def q34_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ngrams UDAF (GenericUDAFnGrams.java) — top-20 bigrams over documents;
    exact distributed implementation in functions/ngrams.py."""
    docs = t(spark, sf_dir, "documents")
    return ngrams(docs, "text", n=2, k=20)


def q35_context_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """context_ngrams (GenericUDAFContextNGrams.java): words following
    'data' — context ['data', NULL]."""
    docs = t(spark, sf_dir, "documents")
    return context_ngrams(docs, "text", ["data", None], k=15)


QUERIES = {
    "q20_agg_basic": q20_agg_basic,
    "q21_sum0_empty_group": q21_sum0_empty_group,
    "q22_stats_agg": q22_stats_agg,
    "q23_corr_covar": q23_corr_covar,
    "q24_count_distinct": q24_count_distinct,
    "q25_approx_count_distinct": q25_approx_count_distinct,
    "q26_percentile_exact": q26_percentile_exact,
    "q27_percentile_approx": q27_percentile_approx,
    "q28_collect_sorted": q28_collect_sorted,
    "q29_grouping_sets": q29_grouping_sets,
    "q30_rollup": q30_rollup,
    "q31_cube": q31_cube,
    "q32_having": q32_having,
    "q33_histogram_numeric": q33_histogram_numeric,
    "q34_ngrams": q34_ngrams,
    "q35_context_ngrams": q35_context_ngrams,
}

ORACLES = {
    "q20_agg_basic": """
        SELECT l_returnflag,
               MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(AVG(l_extendedprice), 4) AS avg_price,
               COUNT(*) AS n_rows, COUNT(l_quantity) AS n_qty_nonnull
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q21_sum0_empty_group": """
        SELECT l_returnflag,
               COALESCE(SUM(CASE WHEN l_quantity < 0 THEN l_quantity END), 0.0) AS sum0_empty,
               SUM(CASE WHEN l_quantity < 0 THEN l_quantity END) AS sum_null
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q22_stats_agg": """
        SELECT l_linestatus,
               ROUND(stddev_pop(l_quantity), 4) AS stddev_pop_qty,
               ROUND(stddev_samp(l_quantity), 4) AS stddev_samp_qty,
               ROUND(var_pop(l_quantity), 4) AS var_pop_qty,
               ROUND(var_samp(l_quantity), 4) AS var_samp_qty
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    "q23_corr_covar": """
        SELECT l_returnflag,
               ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
               ROUND(covar_pop(l_quantity, l_extendedprice), 4) AS covar_pop_qp,
               ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_samp_qp
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q24_count_distinct": """
        SELECT l_returnflag,
               COUNT(DISTINCT l_partkey) AS nd_parts,
               COUNT(DISTINCT l_suppkey) AS nd_supps,
               COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q25_approx_count_distinct": """
        SELECT COUNT(DISTINCT l_orderkey) AS exact_orders,
               TRUE AS approx_within_5pct
        FROM lineitem
    """,
    "q27_percentile_approx": """
        SELECT l_returnflag,
               ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS exact_median_price,
               TRUE AS approx_within_2pct
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q33_histogram_numeric": """
        SELECT CAST(LEAST(5, COUNT(DISTINCT l_quantity)) AS BIGINT) AS nbins,
               ROUND(CAST(COUNT(l_quantity) AS DOUBLE), 3) AS total_mass,
               TRUE AS wmean_matches_avg,
               TRUE AS centroids_in_range
        FROM lineitem
    """,
    "q26_percentile_exact": """
        SELECT l_returnflag,
               ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
               ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q28_collect_sorted": """
        SELECT o_orderstatus,
               string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority) AS priorities,
               CAST(COUNT(o_orderpriority) AS INT) AS n_collected
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "q29_grouping_sets": """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
               COUNT(*) AS n_rows, ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus), ())
    """,
    "q30_rollup": """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "q31_cube": """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "q32_having": """
        SELECT l_partkey, COUNT(*) AS n_lines, ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY l_partkey HAVING COUNT(*) >= 8 ORDER BY l_partkey
    """,
    "q34_ngrams": """
        SELECT ng AS ngram, CAST(cnt AS BIGINT) AS freq FROM (
          SELECT ng, COUNT(*) AS cnt FROM (
            SELECT UNNEST(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS ng
            FROM (SELECT string_split_regex(lower(text), '\\s+') AS w FROM documents)
          ) GROUP BY ng
        ) ORDER BY freq DESC, ngram ASC LIMIT 20
    """,
    "q35_context_ngrams": """
        SELECT ngram, CAST(cnt AS BIGINT) AS freq FROM (
          SELECT w2 AS ngram, COUNT(*) AS cnt FROM (
            SELECT UNNEST(list_transform(range(1, len(w)), i -> w[i])) AS w1,
                   UNNEST(list_transform(range(1, len(w)), i -> w[i+1])) AS w2
            FROM (SELECT string_split_regex(lower(text), '\\s+') AS w FROM documents)
          ) WHERE w1 = 'data' GROUP BY w2
        ) ORDER BY freq DESC, ngram ASC LIMIT 15
    """,
}
