"""Writer locking and compare-and-swap commit semantics."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from hudi_utility_spark import concurrency
from hudi_utility_spark.table import KeyedTable, TableType
from hudi_utility_spark.write import upsert

T1, T2 = "20260101000000000", "20260102000000000"


def _table(tmp_path):
    return KeyedTable(
        path=str(tmp_path / "t"),
        record_key=["event_id"],
        precombine="ts",
        partition_fields=["event_type"],
        table_type=TableType.MERGE_ON_READ,
    )


def test_lock_is_exclusive_and_released(spark, events, tmp_path):
    table = _table(tmp_path)
    upsert(spark, events, table, commit_time=T1)
    with concurrency.table_lock(table, owner="a"):
        with pytest.raises(concurrency.LockHeld, match="held by a"):
            with concurrency.table_lock(table, owner="b"):
                pass
    # released on exit: b can now acquire
    with concurrency.table_lock(table, owner="b"):
        pass


def test_stale_lock_is_taken_over(spark, events, tmp_path):
    table = _table(tmp_path)
    upsert(spark, events, table, commit_time=T1)
    with concurrency.table_lock(table, owner="dead"):
        # a second writer with a 0s timeout treats the lease as orphaned
        with concurrency.table_lock(table, owner="b", timeout_s=0.0):
            pass


def test_cas_commit_detects_lost_update(spark, events, tmp_path):
    table = _table(tmp_path)
    upsert(spark, events, table, commit_time=T1)
    assert concurrency.latest_commit(spark, table) == T1

    batch = events.limit(5).withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR"))
    # writer A read at T1 and commits first — fine
    concurrency.write_with_cas(
        spark, table, expected_commit=T1,
        write_fn=lambda: upsert(spark, batch, table, commit_time=T2),
    )
    # writer B also read at T1; its CAS must now fail
    with pytest.raises(concurrency.CommitConflict, match="advanced"):
        concurrency.write_with_cas(
            spark, table, expected_commit=T1,
            write_fn=lambda: upsert(spark, batch, table, commit_time="X"),
        )
    # retry with a fresh read succeeds
    concurrency.write_with_cas(
        spark, table, expected_commit=T2,
        write_fn=lambda: upsert(
            spark, batch.withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR")),
            table, commit_time="20260103000000000",
        ),
    )


def test_concurrent_threads_serialize_under_lock(spark, events, tmp_path):
    table = _table(tmp_path)
    upsert(spark, events, table, commit_time=T1)
    results = []

    def writer(name, commit):
        while True:
            try:
                with concurrency.table_lock(table, owner=name):
                    batch = events.limit(3).withColumn(
                        "ts", F.col("ts") + F.expr("INTERVAL 1 HOUR")
                    )
                    upsert(spark, batch, table, commit_time=commit)
                    results.append(name)
                return
            except concurrency.LockHeld:
                pass  # busy-wait: the other writer holds the lease

    ts = [
        threading.Thread(target=writer, args=(f"w{i}", f"2026010{i + 2}000000000"))
        for i in range(2)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
    assert sorted(results) == ["w0", "w1"]
    assert concurrency.latest_commit(spark, table) == "20260103000000000"
