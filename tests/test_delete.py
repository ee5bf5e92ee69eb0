"""Delete-by-key semantics (Hudi's delete operation, unexposed by the
reference app): tombstones on MOR, partition rewrite on COW, precombine
arbitration between deletes and re-inserts."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hudi_utility_spark.table import KeyedTable, TableType
from hudi_utility_spark.write import delete_keys, upsert


def _table(tmp_path, tt):
    return KeyedTable(
        path=str(tmp_path / "t"),
        record_key=["event_id"],
        precombine="ts",
        partition_fields=["event_type"],
        table_type=tt,
    )


@pytest.mark.parametrize("tt", [TableType.COPY_ON_WRITE, TableType.MERGE_ON_READ])
def test_delete_removes_exactly_the_keys(spark, events, tmp_path, tt):
    table = _table(tmp_path, tt)
    upsert(spark, events, table, commit_time="1")
    victims = events.filter(F.col("event_type") == "click").limit(50).select(
        "event_id", "event_type", (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts")
    )
    victim_ids = {r.event_id for r in victims.collect()}

    snap = delete_keys(spark, victims, table, commit_time="2")
    got_ids = {r.event_id for r in snap.select("event_id").collect()}
    assert got_ids.isdisjoint(victim_ids)
    assert snap.count() == events.count() - len(victim_ids)
    # untouched columns survive the rewrite intact
    assert "value" in snap.columns


@pytest.mark.parametrize("tt", [TableType.COPY_ON_WRITE, TableType.MERGE_ON_READ])
def test_newer_record_survives_older_delete(spark, events, tmp_path, tt):
    """A delete only kills record versions with older precombine: rows
    whose ts is newer than the tombstone's survive (Hudi marker rules)."""
    table = _table(tmp_path, tt)
    upsert(spark, events, table, commit_time="1")
    stale_victims = events.filter(F.col("event_type") == "click").limit(20).select(
        "event_id", "event_type", (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("ts")
    )
    n = events.count()
    snap = delete_keys(spark, stale_victims, table, commit_time="2")
    assert snap.count() == n  # every delete lost the precombine race


@pytest.mark.parametrize("tt", [TableType.COPY_ON_WRITE, TableType.MERGE_ON_READ])
def test_reinsert_after_delete_wins(spark, events, tmp_path, tt):
    table = _table(tmp_path, tt)
    upsert(spark, events, table, commit_time="1")
    victims = events.filter(F.col("event_type") == "click").limit(10).select(
        "event_id", "event_type", (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts")
    )
    delete_keys(spark, victims, table, commit_time="2")

    back = (
        events.join(victims.select("event_id"), "event_id", "left_semi")
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 2 HOURS"))
        .withColumn("value", F.lit(777.0))
    )
    snap = upsert(spark, back, table, commit_time="3")
    assert snap.count() == events.count()
    revived = snap.join(victims.select("event_id"), "event_id", "left_semi")
    assert revived.count() == 10
    assert all(r.value == 777.0 for r in revived.select("value").collect())


def test_delete_entire_partition_drops_directory(spark, events, tmp_path):
    table = _table(tmp_path, TableType.COPY_ON_WRITE)
    upsert(spark, events, table, commit_time="1")
    victims = events.filter(F.col("event_type") == "error").select(
        "event_id", "event_type", (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts")
    )
    snap = delete_keys(spark, victims, table, commit_time="2")
    assert snap.filter(F.col("event_type") == "error").count() == 0
    assert not os.path.isdir(os.path.join(table.base_path, "event_type=error"))


def test_delete_requires_routing_columns(spark, events, tmp_path):
    table = _table(tmp_path, TableType.COPY_ON_WRITE)
    upsert(spark, events, table, commit_time="1")
    with pytest.raises(ValueError, match="missing required columns"):
        delete_keys(spark, events.select("event_id"), table)


def test_compaction_physically_drops_deleted_rows(spark, events, tmp_path):
    table = _table(tmp_path, TableType.MERGE_ON_READ)
    upsert(spark, events, table, commit_time="1")
    victims = events.filter(F.col("event_type") == "click").limit(30).select(
        "event_id", "event_type", (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts")
    )
    delete_keys(spark, victims, table, commit_time="2")
    want = table.read(spark).count()
    table.compact(spark)
    assert not os.path.isdir(table.log_path)
    assert table.read(spark).count() == want


def test_clean_does_not_resurrect_deleted_keys(spark, events, tmp_path):
    """An active tombstone is the winning version of its key: the
    cleaner must keep it, or the deleted row comes back."""
    from hudi_utility_spark import timeline

    table = _table(tmp_path, TableType.MERGE_ON_READ)
    upsert(spark, events, table, commit_time="20260101000000000")
    victims = events.filter(F.col("event_type") == "click").limit(25).select(
        "event_id", "event_type", (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts")
    )
    delete_keys(spark, victims, table, commit_time="20260102000000000")
    want = table.read(spark).count()

    timeline.clean(spark, table, older_than="20260103000000000")
    assert table.read(spark).count() == want

    # time travel respects tombstones: as-of post-delete excludes them
    asof = timeline.read_as_of(spark, table, "20260102000000000")
    assert asof.count() == want


def test_composite_key_full_lifecycle(spark, events, tmp_path):
    """Composite record keys (user_id, event_id) through upsert → delete
    → CDC → point lookup — every path must treat the key as the tuple,
    not its parts."""
    from hudi_utility_spark import index, timeline

    table = KeyedTable(
        path=str(tmp_path / "t"),
        record_key=["user_id", "event_id"],
        precombine="ts",
        partition_fields=["event_type"],
        table_type=TableType.MERGE_ON_READ,
    )
    upsert(spark, events, table, commit_time="20260101000000000")
    index.build_record_index(spark, table)

    victims = events.filter(F.col("event_type") == "click").limit(12).select(
        "user_id", "event_id", "event_type",
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
    )
    delete_keys(spark, victims, table, commit_time="20260102000000000")
    n_victims = victims.count()
    assert table.read(spark).count() == events.count() - n_victims

    cdc = timeline.incremental_cdc(spark, table, since="20260101000000000")
    assert cdc.filter("op = 'delete'").count() == n_victims

    # point lookup: a surviving composite key resolves, a deleted one is gone
    alive = events.join(
        victims.select("user_id", "event_id"), ["user_id", "event_id"], "left_anti"
    ).limit(5).select("user_id", "event_id")
    got = index.point_lookup(spark, table, alive)
    assert got.count() == 5
    assert index.point_lookup(
        spark, table, victims.select("user_id", "event_id")
    ).isEmpty()
