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


def test_takeover_victim_does_not_release_new_holders_lease(spark, events, tmp_path):
    """A holder whose lease was taken over after out-sleeping timeout_s
    must not delete the new holder's lease on exit (owner-checked
    release): after the victim's context exits, the taker still holds."""
    import os

    table = _table(tmp_path)
    upsert(spark, events, table, commit_time=T1)
    lock_path = concurrency._lock_path(table)
    with concurrency.table_lock(table, owner="victim"):
        # taker treats the lease as orphaned and takes over
        ctx = concurrency.table_lock(table, owner="taker", timeout_s=0.0)
        ctx.__enter__()
        try:
            assert concurrency._read_payload(lock_path)["owner"] == "taker"
        finally:
            pass
    # victim's exit ran: the taker's lease must still be present
    assert os.path.exists(lock_path)
    assert concurrency._read_payload(lock_path)["owner"] == "taker"
    ctx.__exit__(None, None, None)
    assert not os.path.exists(lock_path)


def test_stale_tmp_files_are_swept_on_acquire(spark, events, tmp_path):
    import os
    import time as _time

    table = _table(tmp_path)
    upsert(spark, events, table, commit_time=T1)
    lock_dir = os.path.dirname(concurrency._lock_path(table))
    os.makedirs(lock_dir, exist_ok=True)
    orphan = os.path.join(lock_dir, "writer.lock.999.999.tmp")
    open(orphan, "w").write("{}")
    old = _time.time() - 7200
    os.utime(orphan, (old, old))
    with concurrency.table_lock(table, owner="a", timeout_s=3600):
        pass
    assert not os.path.exists(orphan)


def test_concurrent_stale_takeover_single_winner(spark, events, tmp_path):
    """N threads racing takeover of the same stale lease: exactly one
    acquires; losers get LockHeld, and the winner's lease survives the
    losers' error paths (the race ADVICE.md flagged)."""
    import json
    import os
    import time as _time

    table = _table(tmp_path)
    upsert(spark, events, table, commit_time=T1)
    lock_path = concurrency._lock_path(table)
    # forge a stale lease directly (owner died long ago)
    os.makedirs(os.path.dirname(lock_path), exist_ok=True)
    with open(lock_path, "w") as f:
        f.write(json.dumps({"owner": "dead", "acquired_at": _time.time() - 9999}))

    winners, losers, errors = [], [], []
    hold = threading.Event()

    def contend(name):
        try:
            with concurrency.table_lock(table, owner=name, timeout_s=60):
                winners.append(name)
                hold.wait(2.0)  # hold while losers finish their attempts
        except concurrency.LockHeld:
            losers.append(name)
        except Exception as exc:  # pragma: no cover
            errors.append((name, repr(exc)))

    threads = [threading.Thread(target=contend, args=(f"w{i}",)) for i in range(8)]
    for t in threads:
        t.start()
    # let every loser run to completion while the winner still holds
    deadline = _time.time() + 5
    while len(winners) + len(losers) + len(errors) < 8 and _time.time() < deadline:
        _time.sleep(0.05)
    # the winner's lease must still be in place despite 7 failed takeovers
    assert len(winners) == 1, (winners, losers, errors)
    assert concurrency._read_payload(lock_path)["owner"] == winners[0]
    hold.set()
    for t in threads:
        t.join()
    assert not errors
    assert not os.path.exists(lock_path)


def test_occ_retry_lets_conflicting_writers_both_commit(spark, events, tmp_path):
    """Two concurrent writers: lock contention and CAS conflicts are
    absorbed by occ_retry's re-read-and-re-plan loop — BOTH commits
    land, serialized, with the later precombine winning contested keys."""
    import threading

    from hudi_utility_spark.concurrency import occ_retry
    from hudi_utility_spark.table import KeyedTable, TableType
    from hudi_utility_spark.write import upsert

    table = KeyedTable(
        path=str(tmp_path / "occ"),
        record_key=["event_id"],
        precombine="ts",
        partition_fields=["event_type"],
        table_type=TableType.MERGE_ON_READ,
    )
    upsert(spark, events, table, commit_time="20260101000000000")
    errs = []

    def writer(tag, delta):
        def plan(base_instant):
            batch = events.limit(5).select(
                "event_id", "event_type",
                (F.col("ts") + F.expr(f"INTERVAL {delta} HOURS")).alias("ts"),
                F.lit(float(delta)).alias("value"),
            )
            return upsert(spark, batch, table)

        try:
            # generous retry budget: each plan is a whole MOR upsert
            # (seconds under CI load), and LockHeld retries must outlast
            # the other writer's critical section
            occ_retry(spark, table, plan, retries=30, owner=tag, timeout_s=120)
        except Exception as exc:  # pragma: no cover - failure detail
            errs.append((tag, exc))

    ts = [threading.Thread(target=writer, args=(f"w{i}", i + 1)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(300)
    assert not errs, errs
    # both commits landed: contested keys resolve to the 2-hour writer
    win = (
        table.read(spark)
        .join(events.limit(5).select("event_id"), "event_id", "left_semi")
        .select("value")
        .collect()
    )
    assert {r.value for r in win} == {2.0}
