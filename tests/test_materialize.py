"""Incremental rollup maintenance must equal a full recompute after
arbitrary insert/update/delete churn — including group-moving updates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hudi_utility_spark import materialize
from hudi_utility_spark.table import KeyedTable, TableType
from hudi_utility_spark.write import delete_keys, upsert

T1, T2 = "20260101000000000", "20260102000000000"


def _rollup_dict(df):
    return {
        tuple(r[c] for c in ("user_id",)): (r.cnt, round(r.sum_value, 6))
        for r in df.collect()
    }


def test_incremental_maintenance_matches_full_recompute(spark, events, tmp_path):
    table = KeyedTable(
        path=str(tmp_path / "t"),
        record_key=["event_id"],
        precombine="ts",
        partition_fields=["event_type"],
        table_type=TableType.MERGE_ON_READ,
    )
    upsert(spark, events, table, commit_time=T1)
    roll_path = str(tmp_path / "rollup")
    materialize.seed_rollup(
        spark, table, roll_path, ["user_id"], "value", as_of=T1
    )

    # churn: updates that MOVE rows between user_id groups, fresh
    # inserts, and deletes
    updates = events.filter(F.col("event_type") == "click").limit(20).select(
        "event_id",
        "event_type",
        (F.col("user_id") + 1).alias("user_id"),
        (F.col("value") * 2).alias("value"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
    )
    mx = events.agg(F.max("event_id")).collect()[0][0]
    inserts = updates.withColumn("event_id", F.col("event_id") + F.lit(mx + 1))
    deletes = events.filter(F.col("event_type") == "view").limit(9).select(
        "event_id", "event_type", (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts")
    )
    upsert(spark, updates.unionByName(inserts), table, commit_time=T2)
    delete_keys(spark, deletes, table, commit_time=T2)

    got = materialize.maintain_rollup(
        spark, table, roll_path, ["user_id"], "value", since=T1, until=T2
    )
    want = materialize.compute_rollup(table.read(spark), ["user_id"], "value")
    assert _rollup_dict(got) == _rollup_dict(want)


def test_maintenance_is_idempotent_on_empty_window(spark, events, tmp_path):
    table = KeyedTable(
        path=str(tmp_path / "t"),
        record_key=["event_id"],
        precombine="ts",
        partition_fields=["event_type"],
        table_type=TableType.MERGE_ON_READ,
    )
    upsert(spark, events, table, commit_time=T1)
    roll_path = str(tmp_path / "rollup")
    seeded = materialize.seed_rollup(
        spark, table, roll_path, ["user_id"], "value", as_of=T1
    )
    before = _rollup_dict(seeded)
    got = materialize.maintain_rollup(
        spark, table, roll_path, ["user_id"], "value", since=T1
    )
    assert _rollup_dict(got) == before


def test_streaming_rollup_maintenance_tracks_commits(spark, events, tmp_path):
    """File-stream over the delta log drives maintain_rollup per
    micro-batch; after the stream drains, the view equals a recompute."""
    from hudi_utility_spark.streaming.ingest import stream_rollup_maintenance

    table = KeyedTable(
        path=str(tmp_path / "t"),
        record_key=["event_id"],
        precombine="ts",
        partition_fields=["event_type"],
        table_type=TableType.MERGE_ON_READ,
    )
    upsert(spark, events, table, commit_time=T1)
    # MOR first-write lands in the base; put something in the log so the
    # stream has a source, then seed at that instant
    warm = events.limit(1).withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 MINUTE"))
    upsert(spark, warm, table, commit_time="20260101120000000")
    roll_path = str(tmp_path / "rollup")
    materialize.seed_rollup(
        spark, table, roll_path, ["user_id"], "value", as_of="20260101120000000"
    )

    churn = events.filter(F.col("event_type") == "click").limit(30).select(
        "event_id",
        "event_type",
        (F.col("user_id") + 2).alias("user_id"),
        (F.col("value") + 10).alias("value"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
    )
    upsert(spark, churn, table, commit_time=T2)
    deletes = events.filter(F.col("event_type") == "view").limit(4).select(
        "event_id", "event_type", (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts")
    )
    delete_keys(spark, deletes, table, commit_time="20260103000000000")

    q = stream_rollup_maintenance(
        spark, table, roll_path, ["user_id"], "value",
        checkpoint_dir=str(tmp_path / "ckpt"), trigger_once=True,
    )
    q.awaitTermination(120)

    got = _rollup_dict(spark.read.parquet(roll_path))
    want = _rollup_dict(
        materialize.compute_rollup(table.read(spark), ["user_id"], "value")
    )
    assert got == want


def test_clustering_plan_overshoot_bound_and_determinism(spark):
    """Every bin's total may exceed the target by at most its last
    (smallest straddling) file; assignment is a pure function of the
    inventory (re-run yields identical rows); the guard rejects
    row-level-sized inventories."""
    import pytest

    from hudi_utility_spark.write import clustering_plan

    files = spark.createDataFrame(
        [(f"f{i:03d}", (i * 37) % 900 + 100) for i in range(60)],
        ["file_id", "size_bytes"],
    )
    plan = clustering_plan(files, target_bytes=2000)
    rows = sorted(map(tuple, plan.collect()))
    assert rows == sorted(map(tuple, clustering_plan(files, 2000).collect()))
    by_bin: dict[int, list[int]] = {}
    for _f, size, b in rows:
        by_bin.setdefault(b, []).append(size)
    bins = sorted(by_bin)
    assert bins == list(range(len(bins)))  # contiguous ids
    for b in bins:
        total = sum(by_bin[b])
        smallest = min(by_bin[b])
        assert total - smallest < 2000  # overshoot only by the straddler
    assert sum(len(v) for v in by_bin.values()) == 60

    with pytest.raises(ValueError, match="inventory"):
        big = spark.range(0, 100).selectExpr(
            "CAST(id AS STRING) AS file_id", "id + 1 AS size_bytes"
        )
        clustering_plan(big, 1000, max_files=50).collect()


def test_join_view_delta_identity_with_disjoint_and_overlapping_keys(spark):
    """Old view + delta must equal the full join exactly, including
    the cross-delta term (a new left row joining a new right row) and
    keys appearing on only one side's delta."""
    from hudi_utility_spark.materialize import join_view_delta

    a_old = spark.createDataFrame([(1, "a1"), (2, "a2")], ["k", "av"])
    b_old = spark.createDataFrame([(1, "b1"), (3, "b3")], ["k", "bv"])
    a_new = spark.createDataFrame([(3, "a3"), (4, "a4")], ["k", "av"])
    b_new = spark.createDataFrame([(2, "b2"), (4, "b4")], ["k", "bv"])

    full = (
        a_old.unionByName(a_new).join(b_old.unionByName(b_new), "k")
    )
    maintained = a_old.join(b_old, "k").unionByName(
        join_view_delta(a_old, a_new, b_old, b_new, "k")
    )
    assert sorted(map(tuple, maintained.collect())) == sorted(
        map(tuple, full.collect())
    )
    # the delta terms are disjoint (insert-only: no double counting)
    assert maintained.count() == full.count()
