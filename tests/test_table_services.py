"""Table services: rollback and cleaner over MOR delta logs.

Hudi's rollback/restore and cleaner services, absent from the reference
app (a bad load there just leaves a FAILED ledger row — nothing
repairs the table). Semantics pinned here: rollback restores the exact
snapshot at the target instant; clean keeps snapshots and post-horizon
time travel intact while shrinking the log.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hudi_utility_spark import timeline
from hudi_utility_spark.table import KeyedTable, TableType
from hudi_utility_spark.tables import load_table
from hudi_utility_spark.write import upsert

T1, T2, T3 = "20260101000000000", "20260102000000000", "20260103000000000"


def _table(tmp_path, table_type=TableType.MERGE_ON_READ):
    return KeyedTable(
        path=str(tmp_path / "t"),
        record_key=["event_id"],
        precombine="ts",
        partition_fields=["event_type"],
        table_type=table_type,
    )


def _snap_vals(spark, table):
    return {
        (r.event_id, round(r.value, 6))
        for r in table.read(spark).select("event_id", "value").collect()
    }


def _three_commits(spark, sf_dir, table):
    events = load_table(spark, sf_dir, "events")
    upsert(spark, events, table, commit_time=T1)
    c2 = (
        events.filter(F.col("event_type") == "click")
        .withColumn("value", F.lit(-2.0))
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR"))
    )
    upsert(spark, c2, table, commit_time=T2)
    # c3 re-touches the SAME keys as c2 with a later precombine: c2's
    # log rows become superseded versions (cleaner fodder)
    c3 = (
        events.filter(F.col("event_type") == "click")
        .withColumn("value", F.lit(-3.0))
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 2 HOURS"))
    )
    upsert(spark, c3, table, commit_time=T3)
    return events


def test_rollback_restores_snapshot_at_instant(spark, sf_dir, tmp_path):
    table = _table(tmp_path)
    _three_commits(spark, sf_dir, table)
    want = {
        (r.event_id, round(r.value, 6))
        for r in timeline.read_as_of(spark, table, T2)
        .select("event_id", "value")
        .collect()
    }

    res = timeline.rollback(spark, table, T2)
    assert res["log_rows_kept"] > 0
    assert _snap_vals(spark, table) == want
    # the rolled-back commit is gone from the timeline entirely
    assert timeline.incremental_read(spark, table, since=T2).isEmpty()


def test_rollback_is_idempotent_and_to_pre_log_instant(spark, sf_dir, tmp_path):
    table = _table(tmp_path)
    events = _three_commits(spark, sf_dir, table)
    timeline.rollback(spark, table, T2)
    before = _snap_vals(spark, table)
    timeline.rollback(spark, table, T2)
    assert _snap_vals(spark, table) == before

    # roll all the way back to the first commit: log empties out
    timeline.rollback(spark, table, T1)
    assert not os.path.isdir(table.log_path)
    assert table.read(spark).count() == events.count()


def test_rollback_rejects_cow(spark, sf_dir, tmp_path):
    table = _table(tmp_path, TableType.COPY_ON_WRITE)
    upsert(spark, load_table(spark, sf_dir, "events"), table, commit_time=T1)
    with pytest.raises(ValueError, match="MERGE_ON_READ"):
        timeline.rollback(spark, table, T1)


def test_rollback_rejects_compacted_history(spark, sf_dir, tmp_path):
    table = _table(tmp_path)
    _three_commits(spark, sf_dir, table)
    table.compact(spark)
    with pytest.raises(ValueError, match="compacted"):
        timeline.rollback(spark, table, T2)


def test_clean_keeps_snapshot_and_recent_history(spark, sf_dir, tmp_path):
    table = _table(tmp_path)
    _three_commits(spark, sf_dir, table)
    snap_before = _snap_vals(spark, table)
    rows_before = spark.read.parquet(table.log_path).count()

    # horizon T3: c2's rows (superseded by c3, committed ≤ T3) get
    # reclaimed; c3's rows survive as current winners
    res = timeline.clean(spark, table, older_than=T3)
    assert 0 < res["log_rows_kept"] < rows_before
    assert _snap_vals(spark, table) == snap_before
    # post-horizon time travel still exact
    got_t3 = {
        (r.event_id, round(r.value, 6))
        for r in timeline.read_as_of(spark, table, T3)
        .select("event_id", "value")
        .collect()
    }
    assert got_t3 == snap_before


def test_savepoint_pins_time_travel_past_clean_horizon(spark, sf_dir, tmp_path):
    table = _table(tmp_path)
    _three_commits(spark, sf_dir, table)
    asof_t2 = {
        (r.event_id, round(r.value, 6))
        for r in timeline.read_as_of(spark, table, T2)
        .select("event_id", "value")
        .collect()
    }

    timeline.savepoint(table, T2)
    assert timeline.list_savepoints(table) == [T2]
    timeline.clean(spark, table, older_than=T3)
    got = {
        (r.event_id, round(r.value, 6))
        for r in timeline.read_as_of(spark, table, T2)
        .select("event_id", "value")
        .collect()
    }
    assert got == asof_t2  # savepoint kept c2's superseded rows alive

    # dropping the savepoint lets the next clean reclaim them
    rows_with_sp = spark.read.parquet(table.log_path).count()
    timeline.delete_savepoint(table, T2)
    res = timeline.clean(spark, table, older_than=T3)
    assert res["log_rows_kept"] < rows_with_sp


def test_clustering_preserves_content_and_sorts_files(spark, sf_dir, tmp_path):
    """Clustering rewrites the base range-sorted: same snapshot, tighter
    files (ranges disjoint across files within each partition)."""
    import glob

    from hudi_utility_spark import index as idx_mod

    table = _table(tmp_path)
    _three_commits(spark, sf_dir, table)
    before = _snap_vals(spark, table)

    table.cluster(spark, sort_fields=["event_id"], num_files=6)
    assert not os.path.isdir(table.log_path)  # clustering implies compaction
    assert _snap_vals(spark, table) == before

    # rebuilt column stats show non-overlapping event_id ranges within
    # each partition dir
    idx_mod.build_column_stats(spark, table.path, ["event_id"])
    stats = spark.read.parquet(table.path + "/_index/column_stats").collect()
    by_dir = {}
    for r in stats:
        d = os.path.dirname(r.file)
        by_dir.setdefault(d, []).append((r.min_event_id, r.max_event_id))
    multi = [v for v in by_dir.values() if len(v) > 1]
    assert multi  # the layout did split partitions into several files
    for ranges in multi:
        ranges.sort()
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2  # disjoint


def test_compact_if_needed_triggers_on_log_ratio(spark, events, tmp_path):
    from hudi_utility_spark.table import KeyedTable, TableType
    from hudi_utility_spark.write import upsert
    import os

    table = KeyedTable(
        path=str(tmp_path / "cin"),
        record_key=["event_id"],
        precombine="ts",
        partition_fields=["event_type"],
        table_type=TableType.MERGE_ON_READ,
    )
    upsert(spark, events, table, commit_time="1")
    # small log: 5 updated rows against the full base — below a 20% ratio
    import pyspark.sql.functions as F
    small = events.limit(5).select(
        "event_id", "event_type",
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"), "value",
    )
    upsert(spark, small, table, commit_time="2")
    assert os.path.isdir(table.log_path)
    assert table.compact_if_needed(spark, max_log_ratio=0.2) is False
    assert os.path.isdir(table.log_path)  # untouched

    # grow the log past the ratio: rewrite every row twice
    for i, ct in enumerate(["3", "4"]):
        churn = events.select(
            "event_id", "event_type",
            (F.col("ts") + F.expr(f"INTERVAL {i + 2} HOURS")).alias("ts"), "value",
        )
        upsert(spark, churn, table, commit_time=ct)
    before = sorted(map(tuple, table.read(spark).select("event_id", "ts").collect()))
    assert table.compact_if_needed(spark, max_log_ratio=0.2) is True
    assert not os.path.isdir(table.log_path)  # folded into base
    after = sorted(map(tuple, table.read(spark).select("event_id", "ts").collect()))
    assert before == after  # snapshot-invariant

    # COW tables never need it
    cow = KeyedTable(
        path=str(tmp_path / "cow"), record_key=["event_id"], precombine="ts",
    )
    upsert(spark, events, cow, commit_time="1")
    assert cow.compact_if_needed(spark) is False


def _day_table(spark, sf_dir, tmp_path, table_type=TableType.COPY_ON_WRITE):
    t = KeyedTable(
        path=str(tmp_path / "retain"),
        record_key=["event_id"],
        precombine="ts",
        partition_fields=["day"],
        table_type=table_type,
    )
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    upsert(spark, ev, t, commit_time=T1)
    return t, ev


def test_expire_partitions_is_metadata_only_drop(spark, sf_dir, tmp_path):
    t, ev = _day_table(spark, sf_dir, tmp_path)
    days = sorted(r[0] for r in ev.select("day").distinct().collect())
    assert len(days) >= 2, days
    cutoff = days[1]  # drop exactly the first day
    before = t.read(spark).count()
    gone = ev.filter(F.col("day") < cutoff).count()
    res = timeline.expire_partitions(spark, t, cutoff)
    assert res["dropped"] == [days[0]]
    assert res["kept"] == len(days) - 1
    assert not os.path.isdir(os.path.join(t.base_path, f"day={days[0]}"))
    after = t.read(spark)
    assert after.count() == before - gone
    assert after.filter(F.col("day") < cutoff).count() == 0


def test_expire_partitions_sweeps_mor_log_too(spark, sf_dir, tmp_path):
    t, ev = _day_table(spark, sf_dir, tmp_path, TableType.MERGE_ON_READ)
    # a second commit puts rows in the delta log across days
    upsert(
        spark,
        ev.withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR")),
        t,
        commit_time=T2,
    )
    days = sorted(r[0] for r in ev.select("day").distinct().collect())
    cutoff = days[1]
    timeline.expire_partitions(spark, t, cutoff)
    assert not os.path.isdir(os.path.join(t.log_path, f"day={days[0]}"))
    assert t.read(spark).filter(F.col("day") < cutoff).count() == 0


def test_expire_partitions_refuses_to_break_savepoint(spark, sf_dir, tmp_path):
    t, ev = _day_table(spark, sf_dir, tmp_path, TableType.MERGE_ON_READ)
    days = sorted(r[0] for r in ev.select("day").distinct().collect())
    timeline.savepoint(t, T1)
    with pytest.raises(ValueError, match="savepoint"):
        timeline.expire_partitions(spark, t, days[1])
    # un-pin and the sweep proceeds
    timeline.delete_savepoint(t, T1)
    res = timeline.expire_partitions(spark, t, days[1])
    assert res["dropped"] == [days[0]]


def test_compact_preserves_lease_and_savepoints(spark, sf_dir, tmp_path):
    from hudi_utility_spark import concurrency

    t = _table(tmp_path)  # MOR
    _three_commits(spark, sf_dir, t)
    before = _snap_vals(spark, t)
    timeline.savepoint(t, T3)
    with concurrency.table_lock(t, owner="compactor"):
        lease = concurrency._lock_path(t)
        assert os.path.exists(lease)
        t.compact(spark)
        # the rewrite must NOT delete the lease serializing it
        assert os.path.exists(lease), "compact deleted the active writer lease"
    assert timeline.list_savepoints(t) == [T3]
    assert _snap_vals(spark, t) == before  # snapshot-invariant
    assert not os.path.isdir(t.log_path)   # log folded
    # no trash/tmp remnants after a clean swap
    assert not os.path.isdir(t.path.rstrip("/") + ".trash")
    assert not os.path.isdir(t.path.rstrip("/") + ".compact.tmp")


def test_nonpartitioned_upsert_swap_preserves_metadata(spark, sf_dir, tmp_path):
    t = KeyedTable(
        path=str(tmp_path / "flat"),
        record_key=["event_id"],
        precombine="ts",
        partition_fields=[],
        table_type=TableType.COPY_ON_WRITE,
    )
    ev = load_table(spark, sf_dir, "events").limit(100)
    upsert(spark, ev, t, commit_time=T1)
    timeline.savepoint(t, T1)
    upsert(
        spark,
        ev.withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR")),
        t,
        commit_time=T2,
    )
    # the whole-directory rewrite kept the _savepoints metadata dir
    assert timeline.list_savepoints(t) == [T1]
    assert t.read(spark).count() == 100
    assert not os.path.isdir(t.path.rstrip("/") + ".trash")


def test_expire_partitions_cow_savepoint_refuses_conservatively(spark, sf_dir, tmp_path):
    t, ev = _day_table(spark, sf_dir, tmp_path, TableType.COPY_ON_WRITE)
    days = sorted(r[0] for r in ev.select("day").distinct().collect())
    timeline.savepoint(t, T1)
    # COW keeps no version history: any savepoint blocks expiry outright
    with pytest.raises(ValueError, match="COPY_ON_WRITE"):
        timeline.expire_partitions(spark, t, days[1])
    timeline.delete_savepoint(t, T1)
    assert timeline.expire_partitions(spark, t, days[1])["dropped"] == [days[0]]


def test_compact_small_files_targets_only_flagged_partitions(spark, tmp_path):
    import os

    from hudi_utility_spark.table import KeyedTable, TableType

    table = KeyedTable(
        path=str(tmp_path / "opt"),
        record_key=["id"],
        precombine="v",
        partition_fields=["part"],
        table_type=TableType.COPY_ON_WRITE,
    )
    # partition a: fragmented by 6 tiny append batches (the MOR-ingest /
    # frequent-small-upsert layout); partition b: one solid file
    for k in range(6):
        spark.createDataFrame(
            [(k * 400 + i, 1, "a", float(i)) for i in range(400)],
            "id long, v long, part string, value double",
        ).coalesce(1).write.partitionBy("part").mode("append").parquet(
            table.base_path
        )
    spark.createDataFrame(
        [(i + 10_000, 1, "b", float(i)) for i in range(2000)],
        "id long, v long, part string, value double",
    ).coalesce(1).write.partitionBy("part").mode("append").parquet(
        table.base_path
    )

    def files(p):
        d = os.path.join(table.base_path, f"part={p}")
        return sorted(
            f for f in os.listdir(d) if f.endswith(".parquet")
        )

    before_a, before_b = files("a"), files("b")
    assert len(before_a) > 4
    b_mtimes = {
        f: os.path.getmtime(os.path.join(table.base_path, "part=b", f))
        for f in before_b
    }
    before_rows = sorted(
        (r["id"], r["value"]) for r in table.read(spark).collect()
    )

    res = table.compact_small_files(
        spark, small_file_bytes=32 * 1024 * 1024, target_file_bytes=10**9
    )
    assert not res["noop"]
    assert set(res["compacted"]) == {"a"}  # b's single file is not flagged
    after_a, after_b = files("a"), files("b")
    assert len(after_a) < len(before_a)
    assert len(after_a) >= 1
    assert after_b == before_b
    assert b_mtimes == {
        f: os.path.getmtime(os.path.join(table.base_path, "part=b", f))
        for f in after_b
    }  # untouched partition not rewritten
    after_rows = sorted(
        (r["id"], r["value"]) for r in table.read(spark).collect()
    )
    assert after_rows == before_rows

    # second run: nothing left to do
    assert table.compact_small_files(
        spark, small_file_bytes=32 * 1024 * 1024, target_file_bytes=10**9
    )["noop"] or len(files("a")) == len(after_a)


def test_compact_small_files_honors_multi_file_budget(spark, tmp_path):
    """A flagged partition with file budget N>1 is rewritten across N
    parallel tasks into N files — not funneled through one task into
    one file (the 100 TB big-partition rewrite path)."""
    import os

    from hudi_utility_spark.table import KeyedTable, TableType

    table = KeyedTable(
        path=str(tmp_path / "optn"),
        record_key=["id"],
        precombine="v",
        partition_fields=["part"],
        table_type=TableType.COPY_ON_WRITE,
    )
    # partition a: 6 fragments totalling well over target_file_bytes
    for k in range(6):
        spark.createDataFrame(
            [(k * 3000 + i, 1, "a", float(i)) for i in range(3000)],
            "id long, v long, part string, value double",
        ).coalesce(1).write.partitionBy("part").mode("append").parquet(
            table.base_path
        )

    def files(p):
        d = os.path.join(table.base_path, f"part={p}")
        return sorted(f for f in os.listdir(d) if f.endswith(".parquet"))

    a_bytes = sum(
        os.path.getsize(os.path.join(table.base_path, "part=a", f))
        for f in files("a")
    )
    target = a_bytes // 3  # -> budget of 3 or 4 files
    before_rows = sorted(
        (r["id"], r["value"]) for r in table.read(spark).collect()
    )
    res = table.compact_small_files(
        spark, small_file_bytes=32 * 1024 * 1024, target_file_bytes=target
    )
    budget = res["compacted"]["a"]
    assert budget > 1
    assert len(files("a")) == budget
    after_rows = sorted(
        (r["id"], r["value"]) for r in table.read(spark).collect()
    )
    assert after_rows == before_rows


def test_repartition_layout_evolves_scheme_content_invariant(spark, tmp_path):
    import os

    from hudi_utility_spark.table import KeyedTable, TableType
    from hudi_utility_spark.write import upsert

    table = KeyedTable(
        path=str(tmp_path / "rl"),
        record_key=["id"],
        precombine="v",
        partition_fields=["p"],
        table_type=TableType.MERGE_ON_READ,
    )
    upsert(
        spark,
        spark.createDataFrame(
            [(1, 1, "a", "x", 1.0), (2, 1, "b", "y", 2.0), (3, 1, "a", "y", 3.0)],
            "id long, v long, p string, q string, value double",
        ),
        table,
    )
    # log churn: new version of id 1 routed to a different q
    upsert(
        spark,
        spark.createDataFrame(
            [(1, 2, "a", "y", 11.0)], "id long, v long, p string, q string, value double"
        ),
        table,
    )
    before = {
        (r["id"], r["q"], r["value"]) for r in table.read(spark).collect()
    }

    evolved = table.repartition_layout(spark, ["q"])
    assert evolved.partition_fields == ["q"]
    dirs = {d for d in os.listdir(evolved.base_path) if d.startswith("q=")}
    # every winner routes to q=y (id 1's q=x version is superseded)
    assert dirs == {"q=" + q for _, q, _ in before} == {"q=y"}
    after = {
        (r["id"], r["q"], r["value"]) for r in evolved.read(spark).collect()
    }
    assert after == before  # snapshot invariant (log folded in first)
    # old-layout dirs are gone; the log folded away
    assert not any(d.startswith("p=") for d in os.listdir(evolved.base_path))
    assert not os.path.isdir(evolved.log_path) or not os.listdir(evolved.log_path)

    with pytest.raises(ValueError, match="not in schema"):
        evolved.repartition_layout(spark, ["nope"])


def test_export_restore_snapshot_round_trip(spark, tmp_path):
    from hudi_utility_spark.table import KeyedTable, TableType
    from hudi_utility_spark.write import upsert
    import pyspark.sql.functions as F

    table = KeyedTable(
        path=str(tmp_path / "bk"),
        record_key=["id"],
        precombine="v",
        partition_fields=["p"],
        table_type=TableType.MERGE_ON_READ,
    )
    upsert(
        spark,
        spark.createDataFrame(
            [(1, 1, "a", 1.0), (2, 1, "b", 2.0)], "id long, v long, p string, x double"
        ),
        table,
        commit_time="20260101000000000",
    )
    # log churn before export: backup must hold the RESOLVED snapshot
    upsert(
        spark,
        spark.createDataFrame(
            [(1, 2, "a", 11.0)], "id long, v long, p string, x double"
        ),
        table,
        commit_time="20260102000000000",
    )
    want = {(r["id"], r["x"]) for r in table.read(spark).collect()}

    backup = str(tmp_path / "backup")
    meta = timeline.export_snapshot(spark, table, backup)
    assert meta["rows"] == 2 and meta["instant"] == "20260102000000000"
    # backup is plain parquet: readable standalone
    assert spark.read.parquet(backup).count() == 2

    # diverge the live table, then restore
    upsert(
        spark,
        spark.createDataFrame(
            [(3, 3, "a", 99.0)], "id long, v long, p string, x double"
        ),
        table,
    )
    timeline.savepoint(table, "20260101000000000")
    timeline.restore_snapshot(spark, table, backup)
    got = {(r["id"], r["x"]) for r in table.read(spark).collect()}
    assert got == want
    assert timeline.list_savepoints(table) == ["20260101000000000"]  # meta survived

    # spec mismatch refused
    import pytest as _pytest

    other = KeyedTable(
        path=str(tmp_path / "other"),
        record_key=["other_id"],
        precombine="v",
        partition_fields=["p"],
    )
    with _pytest.raises(ValueError, match="does not match"):
        timeline.restore_snapshot(spark, other, backup)


def test_compact_is_partition_scoped(spark, tmp_path):
    """MOR compaction folds ONLY log-touched partitions: untouched base
    partitions are neither read nor rewritten (mtime-stable), log dirs
    for folded partitions disappear, snapshot content is invariant."""
    import os

    from hudi_utility_spark.table import KeyedTable, TableType
    from hudi_utility_spark.write import upsert

    table = KeyedTable(
        path=str(tmp_path / "pc"),
        record_key=["id"],
        precombine="v",
        partition_fields=["part"],
        table_type=TableType.MERGE_ON_READ,
    )
    upsert(
        spark,
        spark.createDataFrame(
            [(1, 0, "a", 1.0), (2, 0, "b", 2.0), (3, 0, "c", 3.0)],
            "id long, v long, part string, value double",
        ),
        table,
    )
    # log churn in partition a only
    upsert(
        spark,
        spark.createDataFrame(
            [(1, 5, "a", 11.0), (9, 5, "a", 9.0)],
            "id long, v long, part string, value double",
        ),
        table,
    )
    before = {
        r["id"]: (r["part"], r["value"]) for r in table.read(spark).collect()
    }

    def mtimes(p):
        d = os.path.join(table.base_path, f"part={p}")
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    b_before, c_before = mtimes("b"), mtimes("c")
    table.compact(spark)
    assert not os.path.isdir(table.log_path)  # log fully folded
    assert mtimes("b") == b_before  # untouched partitions not rewritten
    assert mtimes("c") == c_before
    after = {
        r["id"]: (r["part"], r["value"]) for r in table.read(spark).collect()
    }
    assert after == before  # snapshot invariant
    assert after[1] == ("a", 11.0) and after[9] == ("a", 9.0)


def test_compact_explicit_partition_subset(spark, tmp_path):
    import os

    from hudi_utility_spark.table import KeyedTable, TableType
    from hudi_utility_spark.write import delete_keys, upsert

    table = KeyedTable(
        path=str(tmp_path / "pcs"),
        record_key=["id"],
        precombine="v",
        partition_fields=["part"],
        table_type=TableType.MERGE_ON_READ,
    )
    upsert(
        spark,
        spark.createDataFrame(
            [(1, 0, "a", 1.0), (2, 0, "b", 2.0)],
            "id long, v long, part string, value double",
        ),
        table,
    )
    upsert(
        spark,
        spark.createDataFrame(
            [(1, 5, "a", 11.0), (2, 5, "b", 22.0)],
            "id long, v long, part string, value double",
        ),
        table,
    )
    table.compact(spark, partitions=["a"])
    # a folded, b still pending in the log
    assert not os.path.isdir(os.path.join(table.log_path, "part=a"))
    assert os.path.isdir(os.path.join(table.log_path, "part=b"))
    got = {r["id"]: r["value"] for r in table.read(spark).collect()}
    assert got == {1: 11.0, 2: 22.0}  # snapshot unchanged either way

    # all-deleted partition vanishes entirely on fold
    delete_keys(
        spark,
        spark.createDataFrame(
            [(1, 9, "a", 0.0)], "id long, v long, part string, value double"
        ),
        table,
    )
    table.compact(spark)
    assert not os.path.isdir(os.path.join(table.base_path, "part=a"))
    assert not os.path.isdir(table.log_path)
    got = {r["id"]: r["value"] for r in table.read(spark).collect()}
    assert got == {2: 22.0}
