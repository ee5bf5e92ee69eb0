"""Column-stats file-skipping: pruned reads must equal full-scan
filters while touching strictly fewer files on a sorted layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hudi_utility_spark import index
from hudi_utility_spark.write import write_sorted_partitioned


@pytest.fixture(scope="module")
def sorted_table(spark, lineitem, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx") / "li")
    # sort within partitions on orderkey → tight, mostly-disjoint
    # per-file ranges (the layout the index is designed for)
    write_sorted_partitioned(
        lineitem.repartition(8),
        root,
        ["l_returnflag"],
        ["l_orderkey"],
        num_files=12,
    )
    index.build_column_stats(spark, root, ["l_orderkey", "l_quantity"])
    return root


def test_pruned_read_matches_full_filter(spark, lineitem, sorted_table):
    lo, hi = 100, 500
    got = index.read_with_skipping(spark, sorted_table, "l_orderkey", lo, hi)
    want = lineitem.filter(
        (F.col("l_orderkey") >= lo) & (F.col("l_orderkey") <= hi)
    )
    assert got.count() == want.count()
    assert got.agg(F.sum("l_quantity")).collect()[0][0] == pytest.approx(
        want.agg(F.sum("l_quantity")).collect()[0][0]
    )


def test_pruning_skips_files_on_sorted_layout(spark, sorted_table):
    mx = spark.read.parquet(sorted_table).agg(F.max("l_orderkey")).collect()[0][0]
    kept, total = index.prune_files(
        spark, sorted_table, "l_orderkey", mx - 5, mx
    )
    assert total > 1
    assert 0 < len(kept) < total


def test_empty_range_reads_nothing(spark, sorted_table):
    mx = spark.read.parquet(sorted_table).agg(F.max("l_orderkey")).collect()[0][0]
    got = index.read_with_skipping(
        spark, sorted_table, "l_orderkey", mx + 10, mx + 20
    )
    assert got.isEmpty()


def test_record_index_point_lookup(spark, events, tmp_path):
    from hudi_utility_spark.table import KeyedTable, TableType
    from hudi_utility_spark.write import delete_keys, upsert

    table = KeyedTable(
        path=str(tmp_path / "t"),
        record_key=["event_id"],
        precombine="ts",
        partition_fields=["event_type"],
        table_type=TableType.MERGE_ON_READ,
    )
    upsert(spark, events, table, commit_time="1")
    # log churn AFTER the index is built: updates and a delete the
    # lookup must still see (index covers base; log is unioned live)
    index.build_record_index(spark, table)
    upd = events.limit(10).select(
        "event_id", "event_type",
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
        F.lit(123.0).alias("value"),
    )
    upsert(spark, upd, table, commit_time="2")
    dead = events.limit(3).select(
        "event_id", "event_type", (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("ts")
    )
    delete_keys(spark, dead, table, commit_time="3")

    wanted = events.limit(10).select("event_id")
    got = index.point_lookup(spark, table, wanted)
    rows = {r.event_id: r.value for r in got.select("event_id", "value").collect()}
    dead_ids = {r.event_id for r in dead.collect()}
    want_ids = {r.event_id for r in wanted.collect()} - dead_ids
    assert set(rows) == want_ids
    assert all(v == 123.0 for v in rows.values())

    # missing keys resolve to nothing
    mx = events.agg(F.max("event_id")).collect()[0][0]
    ghost = spark.range(mx + 100, mx + 103).selectExpr("id AS event_id")
    assert index.point_lookup(spark, table, ghost).isEmpty()


def test_zorder_plan_has_no_global_window_or_single_partition(lineitem):
    """The r2 scale-killer: percent_rank's empty-partition window put the
    whole table in ONE task. The quantile-boundary rewrite must keep the
    write plan free of Window operators and single-partition Exchanges —
    only the repartitionByRange data shuffle remains."""
    from hudi_utility_spark.write import zorder_buckets, zorder_value

    cols = ["l_orderkey", "l_partkey"]
    zval = zorder_value(zorder_buckets(lineitem, cols, bits=8), bits=8)
    ranged = (
        lineitem.withColumn("__z", zval)
        .repartitionByRange(16, F.col("__z"))
        .sortWithinPartitions("__z")
    )
    plan = ranged._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "SinglePartition" not in plan


def test_zorder_prunes_on_both_dimensions(spark, lineitem, tmp_path):
    from hudi_utility_spark.write import write_zordered

    root = str(tmp_path / "zo")
    write_zordered(lineitem, root, ["l_orderkey", "l_partkey"], num_files=16)
    index.build_column_stats(spark, root, ["l_orderkey", "l_partkey"])

    assert spark.read.parquet(root).count() == lineitem.count()
    for c in ("l_orderkey", "l_partkey"):
        mx = lineitem.agg(F.max(c)).collect()[0][0]
        kept, total = index.prune_files(spark, root, c, 0, mx // 10)
        assert 0 < len(kept) < total, c
        # pruned read still returns exactly the filtered rows
        got = index.read_with_skipping(spark, root, c, 0, mx // 10).count()
        want = lineitem.filter(F.col(c) <= mx // 10).count()
        assert got == want


def test_bloom_index_lookup_matches_exact_filter(spark, events, tmp_path):
    from hudi_utility_spark.table import KeyedTable, TableType
    from hudi_utility_spark.write import delete_keys, upsert

    table = KeyedTable(
        path=str(tmp_path / "bl"),
        record_key=["event_id"],
        precombine="ts",
        partition_fields=["event_type"],
        table_type=TableType.MERGE_ON_READ,
    )
    upsert(spark, events, table, commit_time="1")
    index.build_bloom_index(spark, table, m_bits=2048, k=3)

    # log churn AFTER the index is built: the lookup must still see it
    upd = events.limit(10).select(
        "event_id", "event_type",
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
        F.lit(77.0).alias("value"),
    )
    upsert(spark, upd, table, commit_time="2")
    dead = events.limit(3).select(
        "event_id", "event_type", (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("ts")
    )
    delete_keys(spark, dead, table, commit_time="3")

    wanted = events.limit(10).select("event_id")
    got = index.bloom_lookup(spark, table, wanted, m_bits=2048, k=3)
    rows = {r.event_id: r.value for r in got.select("event_id", "value").collect()}
    dead_ids = {r.event_id for r in dead.collect()}
    want_ids = {r.event_id for r in wanted.collect()} - dead_ids
    assert set(rows) == want_ids
    assert all(v == 77.0 for v in rows.values())


def test_bloom_index_prunes_files_and_never_misses(spark, events, tmp_path):
    from hudi_utility_spark.table import KeyedTable, TableType
    from hudi_utility_spark.write import upsert

    table = KeyedTable(
        path=str(tmp_path / "bl2"),
        record_key=["event_id"],
        precombine="ts",
        partition_fields=["event_type"],
        table_type=TableType.COPY_ON_WRITE,
    )
    # many files: repartition before bootstrap so each partition dir
    # holds several base files with distinct key sets
    upsert(spark, events.repartition(8), table, commit_time="1")
    idx = index.build_bloom_index(spark, table, m_bits=4096, k=3)
    total = idx.count()
    assert total > 4

    # single-key probe: candidates must include the key's true file and
    # (at this m/k on distinct keys) strictly prune the file set
    one = events.limit(1).select("event_id")
    files = index.bloom_candidate_files(spark, table, one, m_bits=4096, k=3)
    assert 0 < len(files) < total
    got = index.bloom_lookup(spark, table, one, m_bits=4096, k=3)
    assert got.count() == 1

    # absent key: exact residual filter discards bloom false positives
    mx = events.agg(F.max("event_id")).collect()[0][0]
    ghost = spark.range(mx + 500, mx + 501).selectExpr("id AS event_id")
    assert index.bloom_lookup(spark, table, ghost, m_bits=4096, k=3).isEmpty()


def test_secondary_index_lookup_with_log_churn(spark, events, tmp_path):
    from hudi_utility_spark.table import KeyedTable, TableType
    from hudi_utility_spark.write import upsert

    table = KeyedTable(
        path=str(tmp_path / "sec"),
        record_key=["event_id"],
        precombine="ts",
        partition_fields=["event_type"],
        table_type=TableType.MERGE_ON_READ,
    )
    upsert(spark, events.repartition(6), table, commit_time="1")
    idx = index.build_secondary_index(spark, table, "user_id")
    n_files = spark.read.parquet(str(tmp_path / "sec" / "_index/secondary/user_id")) \
        .select("file").distinct().count()
    assert n_files > 1

    uid = events.select("user_id").first()[0]
    probe = spark.createDataFrame([(uid,)], "user_id LONG")

    # baseline: lookup == plain filter on the snapshot
    want = {r.event_id for r in table.read(spark).filter(F.col("user_id") == uid).collect()}
    got = {r.event_id for r in index.secondary_lookup(spark, table, "user_id", probe).collect()}
    assert got == want and got

    # log churn AFTER the index: move one of uid's events to another user
    # (must vanish from results) and move a foreign event TO uid (must
    # appear — the log is always unioned, no index entry needed)
    moved_away = events.filter(F.col("user_id") == uid).limit(1).select(
        "event_id", "event_type",
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
        (F.col("user_id") + 1).alias("user_id"), "value",
    )
    foreign = events.filter(F.col("user_id") != uid).limit(1).select(
        "event_id", "event_type",
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
        F.lit(uid).alias("user_id"), "value",
    )
    upsert(spark, moved_away.unionByName(foreign), table, commit_time="2")

    want2 = {r.event_id for r in table.read(spark).filter(F.col("user_id") == uid).collect()}
    got2 = {r.event_id for r in index.secondary_lookup(spark, table, "user_id", probe).collect()}
    assert got2 == want2
    assert moved_away.first().event_id not in got2
    assert foreign.first().event_id in got2


def test_footer_built_index_matches_scan_built(spark, lineitem, sorted_table):
    """The footer-metadata build must agree file-by-file with the
    data-scan build (the documented production upgrade path) and drive
    identical pruned reads."""
    scan_idx = {
        r.file: (r.num_rows, r.min_l_orderkey, r.max_l_orderkey)
        for r in spark.read.parquet(sorted_table + "/_index/column_stats").collect()
    }
    footer = index.build_column_stats_from_footers(
        spark, sorted_table, ["l_orderkey", "l_quantity"]
    )
    foot_idx = {
        r.file: (r.num_rows, r.min_l_orderkey, r.max_l_orderkey)
        for r in footer.collect()
    }
    assert foot_idx == scan_idx

    lo, hi = 100, 500
    got = index.read_with_skipping(spark, sorted_table, "l_orderkey", lo, hi)
    want = lineitem.filter(
        (F.col("l_orderkey") >= lo) & (F.col("l_orderkey") <= hi)
    )
    assert got.count() == want.count()
    # restore the scan-built index for any later module-scoped test
    index.build_column_stats(spark, sorted_table, ["l_orderkey", "l_quantity"])


def test_refresh_indexes_after_cow_rewrite(spark, events, tmp_path):
    from hudi_utility_spark.table import KeyedTable, TableType
    from hudi_utility_spark.write import upsert

    table = KeyedTable(
        path=str(tmp_path / "rfr"),
        record_key=["event_id"],
        precombine="ts",
        partition_fields=["event_type"],
        table_type=TableType.COPY_ON_WRITE,
    )
    upsert(spark, events.repartition(4), table, commit_time="1")
    index.build_record_index(spark, table)
    index.build_bloom_index(spark, table, m_bits=2048, k=3)
    index.build_secondary_index(spark, table, "user_id")

    # COW upsert rewrites touched partitions → every file-granular index
    # is stale; refresh discovers and rebuilds all of them
    churn = events.limit(20).select(
        "event_id", "event_type",
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
        F.lit(55.0).alias("value"), "user_id",
    )
    upsert(spark, churn, table, commit_time="2")
    refreshed = index.refresh_indexes(spark, table)
    assert refreshed == ["bloom", "record_index", "secondary/user_id"]

    # post-refresh lookups are exact against the new file layout
    wanted = events.limit(20).select("event_id")
    got = index.point_lookup(spark, table, wanted)
    assert got.count() == 20
    assert {r.value for r in got.select("value").collect()} == {55.0}
    got_b = index.bloom_lookup(spark, table, wanted, m_bits=2048, k=3)
    assert got_b.count() == 20

    uid = events.select("user_id").first()[0]
    probe = spark.createDataFrame([(uid,)], "user_id LONG")
    want_ids = {
        r.event_id
        for r in table.read(spark).filter(F.col("user_id") == uid).collect()
    }
    got_ids = {
        r.event_id
        for r in index.secondary_lookup(spark, table, "user_id", probe).collect()
    }
    assert got_ids == want_ids
