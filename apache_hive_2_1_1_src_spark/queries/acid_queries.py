"""ACID transaction surface — registry entry for operators/acid.py.

Completes SURVEY §2.1 component #30 (previously "ACID-lite"): MVCC
snapshot isolation, optimistic write-conflict detection, abort
invisibility, and minor+major compaction with snapshot-safe cleaning —
the behavior of Hive 2.1's transactional tables
(metastore/.../txn/TxnHandler.java, ql/.../io/AcidUtils.java,
ql/.../txn/compactor/Worker.java) re-expressed as a base+delta parquet
layout with distributed snapshot reconstruction.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apache_hive_2_1_1_src_spark.operators.acid import AcidTable, WriteConflictError
from apache_hive_2_1_1_src_spark.queries._util import t


def q170_acid_snapshot_isolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scripted multi-txn ACID scenario, ending in a digest of the final
    table plus three in-plan certificates:

    1. txn1 UPDATE: open-status orders with key%3==0 get price*1.05;
    2. snapshot S pinned (ValidTxnList at high-watermark 1);
    3. txn2 DELETE: key%7==0 — S must still see the deleted rows;
    4. txnA and txnB race: both UPDATE overlapping keys (%5 vs %10);
       A commits first, B's commit must raise WriteConflictError and
       leave no trace (abort invisibility);
    5. minor then major compaction + clean (S kept live) — the latest
       digest must be unchanged and S must still read its pinned state.

    Certificates: conflict_detected (B aborted), snapshot_isolated
    (S's row count pinned through delete AND compaction+clean),
    compaction_preserved (digest identical before/after folding).
    The oracle replays the surviving txns as plain SQL — the aborted
    txnB must have zero effect on the digest.
    """
    root = os.path.join(tempfile.gettempdir(), f"hive_spark_acid_{os.getpid()}")
    base = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 2000)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    n_base = base.count()
    tbl = AcidTable.create(spark, root, base, key_col="o_orderkey")

    tx1 = tbl.begin()
    tx1.update(
        (F.col("o_orderstatus") == "O") & (F.col("o_orderkey") % 3 == 0),
        {"o_totalprice": F.col("o_totalprice") * 1.05},
    )
    tx1.commit()

    snap = tbl.snapshot()  # pinned BEFORE the delete

    tx2 = tbl.begin()
    tx2.delete(F.col("o_orderkey") % 7 == 0)
    tx2.commit()
    n_deleted = tbl.read(snap).filter(F.col("o_orderkey") % 7 == 0).count()

    # optimistic-concurrency race: A wins, B must abort
    tx_a = tbl.begin()
    tx_b = tbl.begin()
    tx_a.update(
        F.col("o_orderkey") % 5 == 0, {"o_totalprice": F.col("o_totalprice") + 100}
    )
    tx_b.update(
        F.col("o_orderkey") % 10 == 0, {"o_totalprice": F.col("o_totalprice") + 999}
    )
    tx_a.commit()
    conflict_detected = False
    try:
        tx_b.commit()
    except WriteConflictError:
        conflict_detected = True

    def digest() -> list:
        return sorted(
            tbl.read()
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("total"),
            )
            .collect()
        )

    before = digest()
    tbl.compact_minor()
    tbl.compact_major()
    tbl.clean(live_snapshots=[snap])
    after = digest()

    pinned_ok = (
        tbl.read(snap).count() == n_base  # delete invisible to S, even post-clean
        and tbl.read().count() == n_base - n_deleted
    )
    cert = spark.createDataFrame(
        [(conflict_detected, pinned_ok, before == after)],
        "conflict_detected boolean, snapshot_isolated boolean, compaction_preserved boolean",
    )
    out = (
        tbl.read()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .crossJoin(F.broadcast(cert))
        .orderBy("o_orderstatus")
    )
    rows = out.collect()  # materialize before the table dir is torn down
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


def q179_acid_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactional MERGE on the MVCC table (HIVE-10924's ACID form —
    completing q160's copy-on-write MERGE with snapshot semantics):
    source = deterministic updates (keys %37, price+1000), inserts
    (keys %101 shifted past max), WHEN MATCHED AND %111 THEN DELETE.
    A reader snapshot pinned BEFORE the merge must still see the
    original table after merge + major compaction + clean
    (snapshot_preserved certificate); the digest oracle replays the
    merge in SQL."""
    root = os.path.join(tempfile.gettempdir(), f"hive_spark_acid_merge_{os.getpid()}")
    base = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 4000)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    n_base = base.count()
    tbl = AcidTable.create(spark, root, base, key_col="o_orderkey")
    snap = tbl.snapshot()

    mk = base.agg(F.max("o_orderkey").alias("mk"))
    src_upd = base.filter(F.col("o_orderkey") % 37 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("o_totalprice") + 1000).alias("o_totalprice"),
    )
    src_ins = (
        base.filter(F.col("o_orderkey") % 101 == 0)
        .crossJoin(F.broadcast(mk))
        .select(
            (F.col("o_orderkey") + F.col("mk") + 1).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            F.lit(100.0).alias("o_totalprice"),
        )
    )
    tx = tbl.begin()
    tx.merge(
        src_upd.unionByName(src_ins),
        when_matched_update={"o_totalprice": F.col("src_o_totalprice")},
        when_matched_delete=F.col("o_orderkey") % 111 == 0,
        insert_unmatched=True,
    )
    tx.commit()
    tbl.compact_major()
    tbl.clean(live_snapshots=[snap])

    snapshot_preserved = tbl.read(snap).count() == n_base
    cert = spark.createDataFrame(
        [(snapshot_preserved,)], "snapshot_preserved boolean"
    )
    out = (
        tbl.read()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .crossJoin(F.broadcast(cert))
        .orderBy("o_orderstatus")
    )
    rows = out.collect()
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


def q180_show_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHOW TRANSACTIONS / SHOW COMPACTIONS surface over the MVCC table
    (DDLTask.showTxns, TxnHandler.getOpenTxnsInfo/showCompact): a
    scripted scenario — committed UPDATE (wid 1), committed insert-only
    append (wid 2), an ABORTED delete (must never appear), one txn left
    open (visible only as the open count), then minor compaction folding
    both deltas to one entry at the high watermark — and the resulting
    txn-log view plus a live_rows row tying the log state to the data.
    Every field is deterministic given the scenario, so the oracle is
    the expected log state in SQL; the aborted txn's absence and the
    fold write_id are what it checks."""
    root = os.path.join(tempfile.gettempdir(), f"hive_spark_acid_show_{os.getpid()}")
    base = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 1000)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    tbl = AcidTable.create(spark, root, base, key_col="o_orderkey")

    tx1 = tbl.begin()
    tx1.update(
        F.col("o_orderkey") % 3 == 0,
        {"o_totalprice": F.col("o_totalprice") + 1.0},
    )
    tx1.commit()

    mk = base.agg(F.max("o_orderkey").alias("mk"))
    tx2 = tbl.begin()
    tx2.insert(
        base.filter(F.col("o_orderkey") % 101 == 0)
        .crossJoin(F.broadcast(mk))
        .select(
            (F.col("o_orderkey") + F.col("mk") + 1).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            F.lit(50.0).alias("o_totalprice"),
        )
    )
    tx2.commit()

    tx3 = tbl.begin()  # aborted: must never appear in the log view
    tx3.delete(F.col("o_orderkey") % 5 == 0)
    tx3.abort()

    tx4 = tbl.begin()  # left open: visible only as open_txns = 1

    tbl.compact_minor()  # folds wid 1+2 into ONE delta at hwm=2

    live_rows = tbl.read().count()
    view = tbl.show_txns().unionByName(
        spark.createDataFrame(
            [("live_rows", None, None, int(live_rows))],
            tbl.show_txns().schema,
        )
    )
    rows = view.orderBy("kind").collect()
    tx4.abort()
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, view.schema)


def q244_abort_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABORT TRANSACTIONS (HiveParser abortTransactionStatement;
    DDLSemanticAnalyzer.analyzeAbortTxns → TxnHandler.abortTxns;
    dbtxnmgr_showlocks/abort .q family): two open writers — one with a
    staged insert, one with a staged delete — are administratively
    killed; neither ever lands, both handles refuse commit(), the table
    is byte-identical to before, and a NEW transaction commits fine
    afterwards.  Every count is deterministic, so the oracle recomputes
    the expected states from orders."""
    root = os.path.join(
        tempfile.gettempdir(), f"hive_spark_acid_abort_{os.getpid()}"
    )
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    base = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 500)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    tbl = AcidTable.create(spark, root, base, key_col="o_orderkey")
    n_base = tbl.read().count()

    t1 = tbl.begin()
    t1.insert(
        base.select(
            (F.col("o_orderkey") + 100000).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            F.lit(1.0).alias("o_totalprice"),
        )
    )
    t2 = tbl.begin()
    t2.delete(F.col("o_orderkey") % 2 == 0)
    n_aborted = tbl.abort_open_transactions()
    commits_refused = 0
    for handle in (t1, t2):
        try:
            handle.commit()
        except RuntimeError:
            commits_refused += 1
    n_after_abort = tbl.read().count()

    t3 = tbl.begin()
    t3.delete(F.col("o_orderkey") % 10 == 0)
    t3.commit()
    n_after_commit = tbl.read().count()
    shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                int(n_base),
                int(n_aborted),
                int(commits_refused),
                int(n_after_abort),
                int(n_after_commit),
            )
        ],
        "n_base bigint, n_aborted int, commits_refused int, "
        "n_after_abort bigint, n_after_commit bigint",
    )


def q186_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel reads over the MVCC write-id chain
    (AcidUtils.getAcidState with an explicit ValidTxnList — query the
    table as of an EARLIER transaction): after UPDATE (wid 1), DELETE
    (wid 2), and INSERT (wid 3), snapshot_at(w) for w = 0..3 must
    reproduce each historical state exactly; the oracle replays the
    four states as plain SQL."""
    root = os.path.join(tempfile.gettempdir(), f"hive_spark_acid_tt_{os.getpid()}")
    base = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 2000)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    tbl = AcidTable.create(spark, root, base, key_col="o_orderkey")

    tx1 = tbl.begin()
    tx1.update(
        F.col("o_orderkey") % 3 == 0,
        {"o_totalprice": F.col("o_totalprice") + 100.0},
    )
    tx1.commit()
    tx2 = tbl.begin()
    tx2.delete(F.col("o_orderkey") % 7 == 0)
    tx2.commit()
    mk = base.agg(F.max("o_orderkey").alias("mk"))
    tx3 = tbl.begin()
    tx3.insert(
        base.filter(F.col("o_orderkey") % 101 == 0)
        .crossJoin(F.broadcast(mk))
        .select(
            (F.col("o_orderkey") + F.col("mk") + 1).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            F.lit(10.0).alias("o_totalprice"),
        )
    )
    tx3.commit()

    rows = []
    for wid in range(4):
        snap = tbl.snapshot_at(wid)
        d = tbl.read(snap).agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        ).first()
        rows.append((wid, d["n"], float(d["total"])))
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows, "as_of_write_id int, n bigint, total double"
    ).orderBy("as_of_write_id")


def q200_show_locks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCK TABLE / SHOW LOCKS surface (DbTxnManager:
    metastore/.../txn/TxnHandler.java lock/checkLock/unlock over the
    HIVE_LOCKS table; DDLTask.showLocks; compatibility jump table —
    SHARED_READ coexists with SHARED_WRITE, EXCLUSIVE with nothing).
    Scripted scenario digested to (item, value) rows: a reader and an
    ACID writer hold locks together; an EXCLUSIVE request times out
    against them (DbLockManager WAITING, fail-fast bounded); after both
    release, EXCLUSIVE acquires and blocks a new reader; SHOW LOCKS is
    checked at each stage."""
    import shutil

    from apache_hive_2_1_1_src_spark.operators.acid import (
        LockConflictError,
        LockManager,
    )

    root = os.path.join(tempfile.gettempdir(), f"hive_spark_acid_locks_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    base = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 100)
        .select("o_orderkey", "o_totalprice")
    )
    tbl = AcidTable.create(spark, root, base, key_col="o_orderkey")
    lm = LockManager(tbl)

    reader = lm.acquire("shared_read", "reader_1")
    writer = lm.acquire("shared_write", "writer_1")
    held = sorted(
        (r.kind, r.owner) for r in lm.show_locks().collect()
    )
    shared_coexist = held == [
        ("shared_read", "reader_1"), ("shared_write", "writer_1")
    ]

    try:
        lm.acquire("exclusive", "ddl_1", timeout_s=0.3)
        excl_blocked = False
    except LockConflictError:
        excl_blocked = True

    lm.release(reader)
    lm.release(writer)
    excl = lm.acquire("exclusive", "ddl_1", timeout_s=0.3)
    try:
        lm.acquire("shared_read", "reader_2", timeout_s=0.3)
        reader_blocked_by_excl = False
    except LockConflictError:
        reader_blocked_by_excl = True
    n_held_final = lm.show_locks().count()
    lm.release(excl)
    empty_after_release = lm.show_locks().count() == 0
    shutil.rmtree(root, ignore_errors=True)

    rows = [
        ("1_shared_coexist", str(shared_coexist).lower()),
        ("2_exclusive_blocked", str(excl_blocked).lower()),
        ("3_reader_blocked_by_exclusive", str(reader_blocked_by_excl).lower()),
        ("4_one_lock_while_exclusive", str(n_held_final == 1).lower()),
        ("5_empty_after_release", str(empty_after_release).lower()),
    ]
    return spark.createDataFrame(rows, "item string, value string").orderBy("item")


def q203_change_data_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed over the ACID delta chain
    (AcidUtils.getAcidState deltas as the change log; OrcRecordUpdater
    INSERT/DELETE event codes): after UPDATE (wid 1), DELETE (wid 2)
    and INSERT (wid 3), read_changes(1, 3) must show the update as its
    delete+insert pair and each txn's exact event counts — all
    recomputable from the base table, so the oracle is full SQL."""
    import shutil

    root = os.path.join(tempfile.gettempdir(), f"hive_spark_acid_cdf_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    base = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 2000)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    tbl = AcidTable.create(spark, root, base, key_col="o_orderkey")
    tx1 = tbl.begin()
    tx1.update(
        F.col("o_orderkey") % 3 == 0,
        {"o_totalprice": F.col("o_totalprice") + 100.0},
    )
    tx1.commit()
    tx2 = tbl.begin()
    tx2.delete(F.col("o_orderkey") % 7 == 0)
    tx2.commit()
    mk = base.agg(F.max("o_orderkey").alias("mk"))
    tx3 = tbl.begin()
    tx3.insert(
        base.filter(F.col("o_orderkey") % 101 == 0)
        .crossJoin(F.broadcast(mk))
        .select(
            (F.col("o_orderkey") + F.col("mk") + 1).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            F.lit(10.0).alias("o_totalprice"),
        )
    )
    tx3.commit()

    feed = tbl.read_changes(1, 3)
    out = (
        feed.groupBy("write_id", "change")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("write_id", "change")
    )
    rows = out.collect()
    shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows, "write_id int, change string, n bigint, min_key long, max_key long"
    ).orderBy("write_id", "change")


def q204_cdf_replica_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental replica maintenance off the change feed — the
    downstream-consumer half of q203 (the pattern Hive users build with
    delta-directory reads; same contract as streaming MERGE q162 but
    driven by the ACID change log): starting from the wid-0 snapshot, a
    plain-parquet replica applies each write id's feed window
    (anti-join deletes, union inserts) and must equal the MVCC
    snapshot_at(wid) after every step.  The per-step row counts are
    recomputable from the base table, so the oracle is full SQL with
    equality certificates."""
    import shutil

    root = os.path.join(tempfile.gettempdir(), f"hive_spark_acid_rep_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    base = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 2000)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    tbl = AcidTable.create(spark, root, base, key_col="o_orderkey")
    tx1 = tbl.begin()
    tx1.update(
        F.col("o_orderkey") % 3 == 0,
        {"o_totalprice": F.col("o_totalprice") + 100.0},
    )
    tx1.commit()
    tx2 = tbl.begin()
    tx2.delete(F.col("o_orderkey") % 7 == 0)
    tx2.commit()
    mk = base.agg(F.max("o_orderkey").alias("mk"))
    tx3 = tbl.begin()
    tx3.insert(
        base.filter(F.col("o_orderkey") % 101 == 0)
        .crossJoin(F.broadcast(mk))
        .select(
            (F.col("o_orderkey") + F.col("mk") + 1).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            F.lit(10.0).alias("o_totalprice"),
        )
    )
    tx3.commit()

    data_cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    replica = tbl.read(tbl.snapshot_at(0)).select(*data_cols)
    results = []
    for wid in (1, 2, 3):
        feed = tbl.read_changes(wid, wid, include_rows=True)
        dels = feed.filter(F.col("change") == "delete").select("o_orderkey")
        ins = feed.filter(F.col("change") == "insert").select(*data_cols)
        replica = replica.join(dels, "o_orderkey", "left_anti").unionByName(ins)
        snap = tbl.read(tbl.snapshot_at(wid)).select(*data_cols)
        n_replica = replica.count()
        # set equality both directions via exceptAll
        diff = (
            replica.exceptAll(snap).count() + snap.exceptAll(replica).count()
        )
        results.append((wid, n_replica, diff == 0))
        # Truncate the iterative plan chain WITHOUT materializing the
        # table on the driver: localCheckpoint keeps the replica's rows
        # on the executors (at 100 TB a collect() here would OOM the
        # driver; a per-write-id-window parquet stage works equally).
        replica = replica.localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        results, "write_id int, n_rows bigint, matches_snapshot boolean"
    ).orderBy("write_id")


def q210_acid_orc_interop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive ACID on-disk interop (operators/acid_interop.py —
    AcidUtils.java:56-146 naming, OrcRecordUpdater.java:162 event
    schema, OrcRawRecordMerger visibility): a three-txn table exports to
    the base_%07d / delta_%07d_%07d / bucket_%05d ORC layout, and
    reading the layout back under the merger rules must reproduce every
    historical snapshot.  Result: per write_id the replayed row count
    plus two certificates — layout names parse with the exact AcidUtils
    regexes, and read_hive_acid(valid_until=w) equals snapshot_at(w).
    Counts are recomputable from the base table, so the oracle is full
    SQL."""
    import re
    import shutil

    from apache_hive_2_1_1_src_spark.operators.acid_interop import (
        export_hive_acid,
        read_hive_acid,
    )

    root = os.path.join(tempfile.gettempdir(), f"hive_spark_acid_io_{os.getpid()}")
    dest = root + "_layout"
    shutil.rmtree(root, ignore_errors=True)
    base = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 2000)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    tbl = AcidTable.create(spark, root, base, key_col="o_orderkey")
    tx1 = tbl.begin()
    tx1.update(
        F.col("o_orderkey") % 3 == 0,
        {"o_totalprice": F.col("o_totalprice") + 100.0},
    )
    tx1.commit()
    tx2 = tbl.begin()
    tx2.delete(F.col("o_orderkey") % 7 == 0)
    tx2.commit()
    export_hive_acid(tbl, dest)
    names = sorted(os.listdir(dest))
    layout_ok = all(
        re.match(r"^(base_\d{7}|delta_\d{7}_\d{7})$", n) for n in names
    ) and all(
        os.listdir(os.path.join(dest, n)) == ["bucket_00000"] for n in names
    )
    results = []
    for wid in (0, 1, 2):
        replay = read_hive_acid(spark, dest, valid_until=wid)
        snap = tbl.read(tbl.snapshot_at(wid))
        n = replay.count()
        diff = replay.exceptAll(snap).count() + snap.exceptAll(replay).count()
        results.append((wid, n, diff == 0, bool(layout_ok)))
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(dest, ignore_errors=True)
    return spark.createDataFrame(
        results,
        "write_id int, n_rows bigint, matches_snapshot boolean, layout_ok boolean",
    ).orderBy("write_id")


def q248_sql_text_update_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text ``UPDATE t SET ... WHERE`` and ``DELETE FROM t WHERE``
    through the engine's primary entry point (HiveParser.g:2554
    updateStatement / :2577 deleteStatement →
    UpdateDeleteSemanticAnalyzer.java's INSERT-OVERWRITE rewrite;
    update_after_multiple_inserts.q is the verbatim golden).  The engine
    compiles both to a copy-on-write projection — CASE WHEN cond THEN
    assignment ELSE col END for UPDATE, an anti-filter for DELETE — then
    a single overwrite of the table; at scale that is one full-width
    scan + write, no shuffle, the same plan Hive's rewrite produced.
    The oracle replays both statements as pure SELECT algebra."""
    from apache_hive_2_1_1_src_spark.session import HiveEngine

    eng = HiveEngine(spark, sf_dir)
    t(spark, sf_dir, "orders").write.mode("overwrite").saveAsTable(
        "sql_dml_orders"
    )
    try:
        eng.sql(
            "UPDATE sql_dml_orders SET o_totalprice = o_totalprice + 100, "
            "o_orderpriority = 'X-UPDATED' "
            "WHERE o_orderstatus = 'O' AND o_orderkey % 5 = 0"
        )
        eng.sql(
            "DELETE FROM sql_dml_orders "
            "WHERE o_orderstatus = 'F' AND o_orderkey % 7 = 0"
        )
        out = (
            spark.table("sql_dml_orders")
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("total"),
                F.sum(
                    F.when(F.col("o_orderpriority") == "X-UPDATED", 1).otherwise(0)
                ).alias("n_updated"),
            )
            .orderBy("o_orderstatus")
        )
        # materialize before the table drops — the caller collects lazily
        return out.localCheckpoint(eager=True)
    finally:
        spark.sql("DROP TABLE IF EXISTS sql_dml_orders")


QUERIES = {
    "q248_sql_text_update_delete": q248_sql_text_update_delete,
    "q244_abort_transactions": q244_abort_transactions,
    "q210_acid_orc_interop": q210_acid_orc_interop,
    "q204_cdf_replica_maintenance": q204_cdf_replica_maintenance,
    "q203_change_data_feed": q203_change_data_feed,
    "q200_show_locks": q200_show_locks,
    "q170_acid_snapshot_isolation": q170_acid_snapshot_isolation,
    "q186_time_travel": q186_time_travel,
    "q179_acid_merge": q179_acid_merge,
    "q180_show_transactions": q180_show_transactions,
}

ORACLES = {
    "q248_sql_text_update_delete": """
        WITH upd AS (
          SELECT o_orderkey, o_orderstatus,
                 CASE WHEN o_orderstatus = 'O' AND o_orderkey % 5 = 0
                      THEN o_totalprice + 100 ELSE o_totalprice
                 END AS o_totalprice,
                 CASE WHEN o_orderstatus = 'O' AND o_orderkey % 5 = 0
                      THEN 'X-UPDATED' ELSE o_orderpriority
                 END AS o_orderpriority
          FROM orders
        ), kept AS (
          SELECT * FROM upd
          WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 7 = 0)
        )
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(o_totalprice), 2) AS total,
               CAST(SUM(CASE WHEN o_orderpriority = 'X-UPDATED' THEN 1
                             ELSE 0 END) AS BIGINT) AS n_updated
        FROM kept GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "q244_abort_transactions": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_base,
               2 AS n_aborted,
               2 AS commits_refused,
               CAST(COUNT(*) AS BIGINT) AS n_after_abort,
               CAST(SUM(CASE WHEN o_orderkey % 10 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_after_commit
        FROM orders WHERE o_orderkey <= 500
    """,
    "q210_acid_orc_interop": """
        WITH base AS (
          SELECT o_orderkey FROM orders WHERE o_orderkey <= 2000
        )
        SELECT 0 AS write_id,
               CAST((SELECT COUNT(*) FROM base) AS BIGINT) AS n_rows,
               TRUE AS matches_snapshot, TRUE AS layout_ok
        UNION ALL
        SELECT 1, CAST((SELECT COUNT(*) FROM base) AS BIGINT), TRUE, TRUE
        UNION ALL
        SELECT 2,
               CAST((SELECT COUNT(*) FROM base WHERE o_orderkey % 7 <> 0)
                    AS BIGINT),
               TRUE, TRUE
        ORDER BY write_id
    """,
    "q204_cdf_replica_maintenance": """
        WITH base AS (
          SELECT o_orderkey FROM orders WHERE o_orderkey <= 2000
        )
        SELECT 1 AS write_id,
               CAST((SELECT COUNT(*) FROM base) AS BIGINT) AS n_rows,
               TRUE AS matches_snapshot
        UNION ALL
        SELECT 2,
               CAST((SELECT COUNT(*) FROM base WHERE o_orderkey % 7 <> 0)
                    AS BIGINT),
               TRUE
        UNION ALL
        SELECT 3,
               CAST((SELECT COUNT(*) FROM base WHERE o_orderkey % 7 <> 0)
                    + (SELECT COUNT(*) FROM base WHERE o_orderkey % 101 = 0)
                    AS BIGINT),
               TRUE
        ORDER BY write_id
    """,
    "q203_change_data_feed": """
        WITH base AS (
          SELECT o_orderkey FROM orders WHERE o_orderkey <= 2000
        ), upd AS (
          SELECT o_orderkey FROM base WHERE o_orderkey % 3 = 0
        ), del AS (
          SELECT o_orderkey FROM base WHERE o_orderkey % 7 = 0
        ), ins AS (
          SELECT o_orderkey + (SELECT MAX(o_orderkey) FROM base) + 1
                   AS o_orderkey
          FROM base WHERE o_orderkey % 101 = 0
        )
        SELECT 1 AS write_id, 'delete' AS change,
               CAST(COUNT(*) AS BIGINT) AS n,
               MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
        FROM upd
        UNION ALL
        SELECT 1, 'insert', CAST(COUNT(*) AS BIGINT),
               MIN(o_orderkey), MAX(o_orderkey) FROM upd
        UNION ALL
        SELECT 2, 'delete', CAST(COUNT(*) AS BIGINT),
               MIN(o_orderkey), MAX(o_orderkey) FROM del
        UNION ALL
        SELECT 3, 'insert', CAST(COUNT(*) AS BIGINT),
               MIN(o_orderkey), MAX(o_orderkey) FROM ins
        ORDER BY write_id, change
    """,
    "q200_show_locks": """
        SELECT * FROM (VALUES
          ('1_shared_coexist', 'true'),
          ('2_exclusive_blocked', 'true'),
          ('3_reader_blocked_by_exclusive', 'true'),
          ('4_one_lock_while_exclusive', 'true'),
          ('5_empty_after_release', 'true')
        ) AS t(item, value) ORDER BY item
    """,
    "q186_time_travel": """
        WITH base AS (
          SELECT o_orderkey, o_totalprice
          FROM orders WHERE o_orderkey <= 2000
        ), s1 AS (  -- after wid 1 UPDATE
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 3 = 0
                      THEN o_totalprice + 100.0 ELSE o_totalprice END AS p
          FROM base
        ), s2 AS (  -- after wid 2 DELETE
          SELECT * FROM s1 WHERE o_orderkey % 7 <> 0
        ), ins AS (  -- wid 3 INSERT
          SELECT COUNT(*) AS n_ins, COUNT(*) * 10.0 AS p_ins
          FROM base WHERE o_orderkey % 101 = 0
        )
        SELECT 0 AS as_of_write_id, CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(o_totalprice), 2) AS total FROM base
        UNION ALL
        SELECT 1, CAST(COUNT(*) AS BIGINT), ROUND(SUM(p), 2) FROM s1
        UNION ALL
        SELECT 2, CAST(COUNT(*) AS BIGINT), ROUND(SUM(p), 2) FROM s2
        UNION ALL
        SELECT 3, CAST(COUNT(*) + (SELECT n_ins FROM ins) AS BIGINT),
               ROUND(SUM(p) + (SELECT p_ins FROM ins), 2) FROM s2
        ORDER BY as_of_write_id
    """,
    "q180_show_transactions": """
        WITH base AS (
          SELECT o_orderkey FROM orders WHERE o_orderkey <= 1000
        )
        SELECT 'base' AS kind, CAST(0 AS BIGINT) AS write_id,
               FALSE AS has_tombstones, CAST(NULL AS BIGINT) AS n
        UNION ALL
        SELECT 'committed_delta', 2, TRUE, NULL
        UNION ALL
        SELECT 'live_rows', NULL, NULL,
               (SELECT COUNT(*) FROM base)
                 + (SELECT COUNT(*) FROM base WHERE o_orderkey % 101 = 0)
        UNION ALL
        SELECT 'next_write_id', 3, NULL, NULL
        UNION ALL
        SELECT 'open_txns', NULL, NULL, 1
        ORDER BY kind
    """,
    "q179_acid_merge": """
        WITH base AS (
          SELECT o_orderkey, o_orderstatus, o_totalprice
          FROM orders WHERE o_orderkey <= 4000
        ), mk AS (
          SELECT MAX(o_orderkey) AS mk FROM base
        ), kept AS (  -- matched+deleted keys (%111 ⊂ %37) vanish
          SELECT o_orderkey, o_orderstatus,
                 CASE WHEN o_orderkey % 37 = 0
                      THEN o_totalprice + 1000 ELSE o_totalprice END AS p
          FROM base WHERE o_orderkey % 111 <> 0
        ), ins AS (
          SELECT b.o_orderkey + mk.mk + 1 AS o_orderkey,
                 'N' AS o_orderstatus, 100.0 AS p
          FROM base b, mk WHERE b.o_orderkey % 101 = 0
        )
        SELECT o_orderstatus, COUNT(*) AS n, ROUND(SUM(p), 2) AS total,
               TRUE AS snapshot_preserved
        FROM (SELECT * FROM kept UNION ALL SELECT * FROM ins)
        GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "q170_acid_snapshot_isolation": """
        WITH base AS (
          SELECT o_orderkey, o_orderstatus, o_totalprice
          FROM orders WHERE o_orderkey <= 2000
        ), t1 AS (  -- txn1 UPDATE
          SELECT o_orderkey, o_orderstatus,
                 CASE WHEN o_orderstatus = 'O' AND o_orderkey % 3 = 0
                      THEN o_totalprice * 1.05 ELSE o_totalprice END AS p
          FROM base
        ), t2 AS (  -- txn2 DELETE
          SELECT * FROM t1 WHERE o_orderkey % 7 <> 0
        ), t3 AS (  -- txnA UPDATE wins; aborted txnB (%10, +999) must not appear
          SELECT o_orderkey, o_orderstatus,
                 CASE WHEN o_orderkey % 5 = 0 THEN p + 100 ELSE p END AS p
          FROM t2
        )
        SELECT o_orderstatus, COUNT(*) AS n, ROUND(SUM(p), 2) AS total,
               TRUE AS conflict_detected, TRUE AS snapshot_isolated,
               TRUE AS compaction_preserved
        FROM t3 GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
}
