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
