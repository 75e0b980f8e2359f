"""Salted join must be result-equivalent to the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_hive_2_1_1_src_spark.io import load_table
from apache_hive_2_1_1_src_spark.operators.skew import salted_join


def test_salted_join_equivalent(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    plain = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    salted = (
        salted_join(li, supp, "l_suppkey", "s_suppkey", salt=8)
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
