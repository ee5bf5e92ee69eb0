"""Commit timeline: incremental reads and MOR time travel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hudi_utility_spark import timeline
from hudi_utility_spark.table import KeyedTable, TableType
from hudi_utility_spark.tables import load_table
from hudi_utility_spark.write import upsert

T1, T2, T3 = "20260101000000000", "20260102000000000", "20260103000000000"


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _table(tmp_path, table_type):
    return KeyedTable(
        path=str(tmp_path / "t"),
        record_key=["event_id"],
        precombine="ts",
        partition_fields=["event_type"],
        table_type=table_type,
    )


@pytest.mark.parametrize("ttype", [TableType.COPY_ON_WRITE, TableType.MERGE_ON_READ])
def test_incremental_read_returns_exactly_the_delta(spark, sf_dir, tmp_path, ttype):
    table = _table(tmp_path, ttype)
    events = _events(spark, sf_dir)
    upsert(spark, events, table, commit_time=T1)

    changed = (
        events.filter(F.col("event_type") == "error")
        .withColumn("value", F.lit(-5.0))
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR"))
    )
    upsert(spark, changed, table, commit_time=T2)

    delta = timeline.incremental_read(spark, table, since=T1)
    got = delta.select("event_id", "value").collect()
    want_ids = {r.event_id for r in changed.select("event_id").collect()}
    assert {r.event_id for r in got} == want_ids
    assert all(r.value == -5.0 for r in got)

    # window (T2, ...] is empty; (epoch, T1] is the untouched remainder
    assert timeline.incremental_read(spark, table, since=T2).isEmpty()
    first_gen = timeline.incremental_read(spark, table, since="0", until=T1)
    assert first_gen.count() == events.count() - len(want_ids)


def test_incremental_read_requires_timeline(spark, sf_dir, tmp_path):
    from hudi_utility_spark.write import write_partitioned

    table = _table(tmp_path, TableType.COPY_ON_WRITE)
    write_partitioned(
        _events(spark, sf_dir), table.base_path, table.partition_fields
    )
    with pytest.raises(ValueError, match="no commit timeline"):
        timeline.incremental_read(spark, table, since="0")


def test_read_as_of_reconstructs_past_snapshot(spark, sf_dir, tmp_path):
    table = _table(tmp_path, TableType.MERGE_ON_READ)
    events = _events(spark, sf_dir)
    upsert(spark, events, table, commit_time=T1)

    changed = (
        events.filter(F.col("event_type") == "view")
        .withColumn("value", F.lit(99.0))
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR"))
    )
    upsert(spark, changed, table, commit_time=T2)

    # as of T1: original values; as of T2: updated
    at_t1 = timeline.read_as_of(spark, table, T1)
    assert at_t1.count() == events.count()
    assert at_t1.filter((F.col("event_type") == "view") & (F.col("value") == 99.0)).isEmpty()
    at_t2 = timeline.read_as_of(spark, table, T2)
    views = at_t2.filter(F.col("event_type") == "view")
    assert views.count() > 0
    assert all(r.value == 99.0 for r in views.select("value").collect())

    # snapshot read resolves to the latest regardless
    snap = table.read(spark)
    assert snap.count() == events.count()


def test_read_as_of_rejects_cow(spark, tmp_path):
    table = _table(tmp_path, TableType.COPY_ON_WRITE)
    with pytest.raises(ValueError, match="MERGE_ON_READ"):
        timeline.read_as_of(spark, table, T1)


def test_upsert_preserves_untouched_commit_times(spark, sf_dir, tmp_path):
    table = _table(tmp_path, TableType.COPY_ON_WRITE)
    events = _events(spark, sf_dir)
    upsert(spark, events, table, commit_time=T1)
    changed = events.filter(F.col("event_type") == "click").withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 1 HOUR")
    )
    upsert(spark, changed, table, commit_time=T2)

    snap = table.read(spark)
    by_commit = {
        r[timeline.COMMIT_COL]: r["n"]
        for r in snap.groupBy(timeline.COMMIT_COL).agg(F.count("*").alias("n")).collect()
    }
    n_clicks = changed.count()
    assert by_commit[T2] == n_clicks
    assert by_commit[T1] == events.count() - n_clicks


def test_incremental_cdc_labels_insert_update_delete(spark, sf_dir, tmp_path):
    from hudi_utility_spark.write import delete_keys

    table = _table(tmp_path, TableType.MERGE_ON_READ)
    events = _events(spark, sf_dir)
    upsert(spark, events, table, commit_time=T1)

    updates = events.filter(F.col("event_type") == "click").limit(15).select(
        "event_id", "event_type", "user_id", "value",
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
    )
    max_id = events.agg(F.max("event_id")).collect()[0][0]
    inserts = updates.withColumn("event_id", F.col("event_id") + F.lit(max_id + 1))
    deletes = events.filter(F.col("event_type") == "view").limit(7).select(
        "event_id", "event_type", (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts")
    )
    # tombstone for a key that never existed: must be dropped from CDC
    ghost = deletes.limit(1).withColumn(
        "event_id", F.col("event_id") + F.lit(10 * (max_id + 1))
    )
    upsert(spark, updates.unionByName(inserts), table, commit_time=T2)
    delete_keys(spark, deletes.unionByName(ghost), table, commit_time=T2)

    cdc = timeline.incremental_cdc(spark, table, since=T1, until=T2)
    by_op = {r["op"]: r["cnt"] for r in cdc.groupBy("op").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert by_op == {"insert": 15, "update": 15, "delete": 7}
    # delete rows carry the key but a NULL payload
    dels = cdc.filter(F.col("op") == "delete")
    assert all(r.value is None for r in dels.select("value").collect())
    # the pre-window state is untouched: CDC over (T2, inf) is empty
    assert timeline.incremental_cdc(spark, table, since=T2).isEmpty()
