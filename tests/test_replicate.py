"""Incremental table-to-table replication: replica ≡ source snapshot
after every sync step, no-op on quiet upstream, delete/re-insert
round-trips."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hudi_utility_spark.materialize import replicate_incremental
from hudi_utility_spark.table import KeyedTable, TableType
from hudi_utility_spark.timeline import COMMIT_COL
from hudi_utility_spark.write import delete_keys, upsert

T1, T2, T3, T4 = (
    "20260101000000000",
    "20260102000000000",
    "20260103000000000",
    "20260104000000000",
)


def _tables(tmp_path):
    src = KeyedTable(
        path=str(tmp_path / "src"),
        record_key=["id"],
        precombine="ts",
        partition_fields=["p"],
        table_type=TableType.MERGE_ON_READ,
    )
    dst = KeyedTable(
        path=str(tmp_path / "dst"),
        record_key=["id"],
        precombine="ts",
        partition_fields=["p"],
        table_type=TableType.COPY_ON_WRITE,
    )
    return src, dst


def _df(spark, rows):
    data = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h), p, float(v))
        for i, h, p, v in rows
    ]
    return spark.createDataFrame(data, "id long, ts timestamp, p string, value double")


def _snap(spark, table):
    return {
        (r["id"], r["p"], r["value"])
        for r in table.read(spark).drop(COMMIT_COL).collect()
    }


def test_replica_tracks_source_through_churn(spark, tmp_path):
    src, dst = _tables(tmp_path)
    upsert(spark, _df(spark, [(1, 0, "a", 1), (2, 0, "b", 2)]), src, commit_time=T1)

    r1 = replicate_incremental(spark, src, dst)
    assert r1["applied_upserts"] == 2 and r1["applied_deletes"] == 0
    assert _snap(spark, dst) == _snap(spark, src)

    # quiet upstream -> no-op
    r2 = replicate_incremental(spark, src, dst)
    assert (r2["applied_upserts"], r2["applied_deletes"]) == (0, 0)

    # update + insert + delete upstream
    upsert(spark, _df(spark, [(1, 5, "a", 11), (3, 5, "a", 3)]), src, commit_time=T2)
    delete_keys(spark, _df(spark, [(2, 6, "b", 0)]), src, commit_time=T3)
    r3 = replicate_incremental(spark, src, dst)
    assert r3["applied_upserts"] == 2 and r3["applied_deletes"] == 1
    assert _snap(spark, dst) == _snap(spark, src)
    assert _snap(spark, dst) == {(1, "a", 11.0), (3, "a", 3.0)}

    # re-insert the deleted key with a NEWER precombine: replica revives it
    upsert(spark, _df(spark, [(2, 9, "b", 22)]), src, commit_time=T4)
    r4 = replicate_incremental(spark, src, dst)
    assert r4["applied_upserts"] == 1
    assert _snap(spark, dst) == _snap(spark, src)
    assert (2, "b", 22.0) in _snap(spark, dst)

    # watermark marker is written atomically: final file present with
    # the latest instant, no torn .tmp remnant left behind
    import os

    marker = dst.path.rstrip("/") + "._sync_since"
    assert os.path.exists(marker)
    assert open(marker).read().strip() == r4["until"]
    assert not os.path.exists(marker + ".tmp")


def test_replication_steps_compose_to_one_shot(spark, tmp_path):
    """Syncing after every commit and syncing once at the end land on
    the same replica state."""
    src, step_dst = _tables(tmp_path)
    once_dst = KeyedTable(
        path=str(tmp_path / "dst_once"),
        record_key=["id"],
        precombine="ts",
        partition_fields=["p"],
        table_type=TableType.COPY_ON_WRITE,
    )
    upsert(spark, _df(spark, [(1, 0, "a", 1)]), src, commit_time=T1)
    replicate_incremental(spark, src, step_dst)
    upsert(spark, _df(spark, [(1, 2, "a", 5), (2, 2, "b", 2)]), src, commit_time=T2)
    replicate_incremental(spark, src, step_dst)
    delete_keys(spark, _df(spark, [(1, 3, "a", 0)]), src, commit_time=T3)
    replicate_incremental(spark, src, step_dst)

    replicate_incremental(spark, src, once_dst)
    assert _snap(spark, step_dst) == _snap(spark, once_dst) == _snap(spark, src)


def test_stream_replication_drains_log_commits(spark, tmp_path):
    from hudi_utility_spark.streaming.ingest import stream_replication

    src, dst = _tables(tmp_path)
    upsert(spark, _df(spark, [(1, 0, "a", 1), (2, 0, "b", 2)]), src, commit_time=T1)
    # log-side churn so the file stream has log files to trigger on
    upsert(spark, _df(spark, [(1, 4, "a", 10), (3, 4, "a", 3)]), src, commit_time=T2)

    q = stream_replication(
        spark, src, dst, str(tmp_path / "ckpt"), trigger_once=True
    )
    q.awaitTermination(120)
    assert _snap(spark, dst) == _snap(spark, src)

    # another upstream commit, another drain
    upsert(spark, _df(spark, [(2, 8, "b", 22)]), src, commit_time=T3)
    q = stream_replication(
        spark, src, dst, str(tmp_path / "ckpt"), trigger_once=True
    )
    q.awaitTermination(120)
    assert _snap(spark, dst) == _snap(spark, src)
    assert (2, "b", 22.0) in _snap(spark, dst)
