"""File-level column-stats index: Hudi's ``column_stats`` metadata
partition re-expressed as a Spark-managed index table.

The reference's tables rely on Hudi for data skipping; the app itself
never exposes it. Here: one pass over the table computes per-file
min/max/null-count for chosen columns; point/range reads then consult
the index and hand Spark an explicit pruned file list, so the scan
touches only files whose [min, max] can satisfy the predicate.

This composes with `write.write_sorted_partitioned`: sorting within
partitions makes per-file ranges tight and disjoint, turning the index
into an effective coarse B-tree. At 100 TB: the index is O(files ×
cols) rows (a ~100k-file table indexes into ~MBs), building it is one
map-side-partial aggregation keyed on file name, and consulting it is
a driver-side filter of the small index relation — the same economics
as Hudi's metadata-table lookup. (A footer-only build that reads
parquet statistics instead of data is the production upgrade; the
full-scan build here keeps the semantics identical and testable.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

INDEX_DIR = "_index/column_stats"


def _index_path(table_path: str) -> str:
    return os.path.join(table_path, INDEX_DIR)


def build_column_stats(
    spark: SparkSession, table_path: str, cols: list[str]
) -> DataFrame:
    """Index per-file min/max/null_count for *cols* over every parquet
    file under ``table_path``. One aggregation keyed on
    ``input_file_name()`` (map-side partials make the shuffle O(files ×
    cols)); the result is persisted under ``_index/column_stats`` and
    returned."""
    df = spark.read.option("mergeSchema", "true").parquet(table_path)
    aggs = []
    for c in cols:
        # min/max keep the column's native type — comparisons at prune
        # time must use the column's own ordering (a string cast would
        # order "9" after "10" and wrongly skip files)
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"),
        ]
    stats = (
        df.withColumn("file", F.input_file_name())
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("num_rows"), *aggs)
    )
    out = _index_path(table_path)
    stats.write.mode("overwrite").parquet(out)
    spark.catalog.refreshByPath(out)
    return spark.read.parquet(out)


def prune_files(
    spark: SparkSession,
    table_path: str,
    col: str,
    lo,
    hi,
) -> tuple[list[str], int]:
    """Files whose [min_col, max_col] intersects [lo, hi], compared in
    the column's native type ordering. Returns (kept_files,
    total_files). Driver-side over the small index relation only."""
    idx = spark.read.parquet(_index_path(table_path))
    total = idx.count()
    kept = (
        idx.filter(
            (F.col(f"max_{col}") >= F.lit(lo)) & (F.col(f"min_{col}") <= F.lit(hi))
        )
        .select("file")
        .collect()
    )
    return [r.file for r in kept], total


def read_with_skipping(
    spark: SparkSession,
    table_path: str,
    col: str,
    lo,
    hi,
) -> DataFrame:
    """Range read through the index: scan only files that can contain
    ``col ∈ [lo, hi]``, then re-apply the exact predicate (stats prune
    at file granularity; the residual filter restores row precision —
    same contract as parquet row-group skipping, one level up)."""
    files, _ = prune_files(spark, table_path, col, lo, hi)
    if not files:
        base = spark.read.option("mergeSchema", "true").parquet(table_path)
        return base.filter(F.lit(False))
    df = (
        spark.read.option("mergeSchema", "true")
        # basePath keeps Hive partition columns recoverable when the
        # scan is handed explicit file paths instead of the table root
        .option("basePath", table_path)
        .parquet(*files)
    )
    return df.filter((F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi)))
