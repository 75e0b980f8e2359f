"""HiveServer2-protocol endpoint demo phase (own process/JVM).

The reference serves JDBC/Thrift clients through HiveServer2
(service/src/java/org/apache/hive/service/cli/operation/SQLOperation.java:153
compiles and runs each statement; the Thrift CLI service streams result
batches back).  SURVEY §3.2 scopes this to "reuse Spark's Thrift
Server" — this module demonstrates exactly that, end-to-end inside one
spawned JVM:

* start ``HiveThriftServer2.startWithContext`` on this session
  (``spark.sql.hive.thriftServer.singleSession=true`` so the JDBC
  session shares the catalog with the registering session, matching
  HiveServer2's shared-metastore visibility);
* register the orders parquet as a view;
* connect back over ``jdbc:hive2://localhost:<port>`` with the stock
  Hive JDBC driver (hive-jdbc jar, the same driver beeline uses),
  via the JVM's own DriverManager — a real localhost Thrift socket,
  not an in-process shortcut;
* run an aggregate, stream the ResultSet through the HiveServer2 wire
  protocol, and also list the catalog through ``DatabaseMetaData``
  (GetTables — the Thrift metadata operation);
* write the fetched rows to parquet for the registry entry to return.

Runs as a subprocess of q172 because the Thrift server binds the JVM
for the rest of its life — the engine's long-lived test sessions must
not inherit it.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

from pyspark.sql import SparkSession


def main(out_dir: str, sf_dir: str) -> None:
    port = 10200 + os.getpid() % 500
    from apache_hive_2_1_1_src_spark.session import build_session

    spark = build_session(
        app_name="jdbc-endpoint-phase",
        shuffle_partitions=4,
        extra_conf={
            "spark.hive.server2.thrift.port": str(port),
            "hive.server2.thrift.port": str(port),
            "spark.sql.hive.thriftServer.singleSession": "true",
            "spark.ui.enabled": "false",
        },
    )
    jvm = spark._jvm  # noqa: SLF001
    jsql = spark._jsparkSession.sqlContext()  # noqa: SLF001
    jvm.org.apache.spark.sql.hive.thriftserver.HiveThriftServer2.startWithContext(jsql)

    spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).createOrReplaceTempView(
        "orders_v"
    )

    conn = None
    # poll at 200 ms, not 2 s — the server usually binds well under a
    # second after startWithContext, and the coarse poll quantized up to
    # ~2 s of pure wait into every q172 run (round 13; same 120 s budget)
    for _ in range(600):
        try:
            conn = jvm.java.sql.DriverManager.getConnection(
                f"jdbc:hive2://localhost:{port}/default", "anon", ""
            )
            break
        except Exception:
            time.sleep(0.2)
    if conn is None:
        raise RuntimeError("thrift server never came up")

    # Thrift GetTables metadata operation (SQLOperation's sibling
    # MetadataOperation) — the view must be visible to the JDBC client
    md = conn.getMetaData()
    trs = md.getTables(None, None, "orders_v", None)
    table_visible = False
    while trs.next():
        table_visible = table_visible or trs.getString(3) == "orders_v"

    st = conn.createStatement()
    rs = st.executeQuery(
        "SELECT o_orderpriority, COUNT(*) AS n, "
        "ROUND(SUM(o_totalprice), 2) AS total "
        "FROM orders_v GROUP BY o_orderpriority ORDER BY o_orderpriority"
    )
    rows = []
    while rs.next():
        rows.append((rs.getString(1), rs.getLong(2), rs.getDouble(3)))
    conn.close()

    out = spark.createDataFrame(
        [(p, n, t, True, bool(table_visible)) for p, n, t in rows],
        "o_orderpriority string, n bigint, total double, "
        "jdbc_roundtrip boolean, table_visible boolean",
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    out.coalesce(1).write.mode("overwrite").parquet(out_dir)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
