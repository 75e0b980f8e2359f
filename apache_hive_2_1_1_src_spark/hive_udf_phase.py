"""Hive-UDF-jar compatibility phase (own JVM): run UNMODIFIED Hive
GenericUDF classes through CREATE TEMPORARY FUNCTION.

The reference's user-extension story is "write a GenericUDF, ADD JAR,
CREATE FUNCTION" (ql/.../parse/FunctionSemanticAnalyzer.java;
ql/.../udf/generic/GenericUDF.java).  Spark keeps that story intact: a
Hive-enabled session can register the exact same classes — here the
GenericUDFs that ship in the hive-exec jar already on Spark's
classpath stand in for a user's jar (same loading path Spark uses for
ADD JAR'd code).

Runs as a subprocess because CREATE TEMPORARY FUNCTION over Hive
classes requires a Hive session catalog (enableHiveSupport), which must
be chosen at JVM/session birth — the engine's normal in-memory-catalog
sessions can't be upgraded in place.

Certificates: each Hive UDF's output is compared IN-PLAN against
Spark's builtin of the same semantics (soundex, conv, base64-ish) —
two independent implementations agreeing per row.
"""

from __future__ import annotations

import os
import shutil
import sys

from pyspark.sql import functions as F

from apache_hive_2_1_1_src_spark.metastore_phase import _hive_session


def main(out_dir: str, sf_dir: str) -> None:
    base = out_dir + ".session"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    spark = _hive_session(base)
    for name, cls in [
        ("hive_soundex", "org.apache.hadoop.hive.ql.udf.generic.GenericUDFSoundex"),
        ("hive_conv", "org.apache.hadoop.hive.ql.udf.UDFConv"),
        ("hive_ascii", "org.apache.hadoop.hive.ql.udf.UDFAscii"),
    ]:
        spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {name}")
        spark.sql(f"CREATE TEMPORARY FUNCTION {name} AS '{cls}'")

    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).filter(
        F.col("c_custkey") <= 500
    )
    cust.createOrReplaceTempView("cust_v")
    out = spark.sql(
        """
        SELECT c_mktsegment,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN hive_soundex(c_name) = soundex(c_name)
                             THEN 1 ELSE 0 END) AS BIGINT) AS soundex_agree,
               CAST(SUM(CASE WHEN hive_conv(CAST(c_custkey AS STRING), 10, 16)
                                  = conv(CAST(c_custkey AS STRING), 10, 16)
                             THEN 1 ELSE 0 END) AS BIGINT) AS conv_agree,
               CAST(SUM(CASE WHEN hive_ascii(c_name) = ascii(c_name)
                             THEN 1 ELSE 0 END) AS BIGINT) AS ascii_agree
        FROM cust_v GROUP BY c_mktsegment
        """
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    out.coalesce(1).write.mode("overwrite").parquet(out_dir)
    spark.stop()
    shutil.rmtree(base, ignore_errors=True)


def main_udaf(out_dir: str, sf_dir: str) -> None:
    """UDAF + UDTF leg of the jar path: Hive's exact-percentile UDAF
    (org.apache.hadoop.hive.ql.udf.UDAFPercentile — the old-style UDAF
    bridge) and GenericUDTFExplode registered via CREATE TEMPORARY
    FUNCTION, certified against Spark's independent percentile builtin
    per group and against plain-SQL arithmetic for the exploded sums."""
    base = out_dir + ".session"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    spark = _hive_session(base)
    for name, cls in [
        ("hive_percentile", "org.apache.hadoop.hive.ql.udf.UDAFPercentile"),
        ("hive_explode", "org.apache.hadoop.hive.ql.udf.generic.GenericUDTFExplode"),
    ]:
        spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {name}")
        spark.sql(f"CREATE TEMPORARY FUNCTION {name} AS '{cls}'")

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).filter(
        F.col("o_orderkey") <= 3000
    )
    orders.createOrReplaceTempView("ord_v")
    out = spark.sql(
        """
        WITH u AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_exploded,
                 CAST(SUM(x) AS BIGINT) AS sum_x
          FROM (SELECT x FROM ord_v
                LATERAL VIEW hive_explode(array(o_orderkey % 3, o_orderkey % 5)) t AS x) z
        )
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(ROUND(hive_percentile(o_orderkey, 0.5), 4) AS DOUBLE) AS med,
               CAST(ABS(hive_percentile(o_orderkey, 0.5)
                        - percentile(o_orderkey, 0.5)) < 1e-9 AS BOOLEAN) AS pct_agree,
               u.n_exploded, u.sum_x
        FROM ord_v CROSS JOIN u
        GROUP BY o_orderstatus, u.n_exploded, u.sum_x
        """
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    out.coalesce(1).write.mode("overwrite").parquet(out_dir)
    spark.stop()
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[3] == "udaf":
        main_udaf(sys.argv[1], sys.argv[2])
    else:
        main(sys.argv[1], sys.argv[2])
