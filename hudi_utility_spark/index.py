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
as Hudi's metadata-table lookup. Both builds exist: the full-scan
build (`build_column_stats`, semantics-transparent and testable) and
the production footer-metadata build
(`build_column_stats_from_footers`, zero data IO) — proven
interchangeable in tests. `refresh_indexes` rebuilds whatever indexes
a table carries after a base rewrite.
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


def build_column_stats_from_footers(
    spark: SparkSession, table_path: str, cols: list[str]
) -> DataFrame:
    """The production build of the column-stats index: read per-file
    min/max/null-count from **parquet footer metadata** (pyarrow)
    instead of scanning data — O(files) footer reads, zero data IO,
    exactly how Hudi/Delta populate their stats indexes. Produces the
    same index schema as :func:`build_column_stats` (row-group stats
    folded to file granularity), interchangeable with it for
    `prune_files` / `read_with_skipping`.

    Footer reads run distributed: the file list is parallelized and
    each task opens only footers (a few KB per file), so a 100k-file
    table indexes in one short metadata-only job. Files lacking stats
    for a column get NULL min/max — `prune_files`' comparisons then
    never eliminate them (NULL-safe: a file without stats must always
    be read)."""
    import glob as _glob

    files = sorted(
        _glob.glob(os.path.join(table_path, "**", "*.parquet"), recursive=True)
    )
    files = [f for f in files if f"{os.sep}_" not in f[len(table_path):]]

    def _stats(batch):
        import pyarrow.parquet as pq

        for path in batch:
            md = pq.ParquetFile(path).metadata
            names = {md.schema.column(i).path: i for i in range(md.num_columns)}
            row = ["file://" + path, md.num_rows]
            for c in cols:
                mn = mx = None
                nulls = 0
                idx = names.get(c)
                if idx is not None:
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx).statistics
                        if st is None or not st.has_min_max:
                            mn = mx = None
                            break
                        mn = st.min if mn is None else min(mn, st.min)
                        mx = st.max if mx is None else max(mx, st.max)
                        nulls += st.null_count or 0
                row += [mn, mx, nulls]
            yield tuple(row)

    # schema must match the scan-built index: borrow column types from a
    # zero-row projection of the table itself
    probe = spark.read.option("mergeSchema", "true").parquet(table_path)
    fields = ["CAST(NULL AS STRING) AS file", "CAST(0 AS LONG) AS num_rows"]
    for c in cols:
        t = probe.schema[c].dataType.simpleString()
        fields += [
            f"CAST(NULL AS {t}) AS min_{c}",
            f"CAST(NULL AS {t}) AS max_{c}",
            "CAST(0 AS LONG) AS nulls_" + c,
        ]
    schema = probe.limit(0).selectExpr(*fields).schema
    rows = spark.sparkContext.parallelize(files, max(1, min(len(files), 64)))
    stats = spark.createDataFrame(
        rows.mapPartitions(lambda b: _stats(list(b))), schema
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


RECORD_INDEX_DIR = "_index/record_index"


def build_record_index(spark: SparkSession, table) -> DataFrame:
    """Hudi's ``record_index`` metadata partition: record key → base
    file. One projection+distinct pass over key columns and
    ``input_file_name()``; the index is O(records) rows but only
    key-plus-string wide, so it is orders of magnitude smaller than the
    table (and at 100 TB it would be written bucketed by key so the
    lookup join is shuffle-free). Enables point lookups and upsert
    routing without scanning every file of a partition."""
    df = table.read_base(spark)
    idx = df.select(
        *table.record_key, F.input_file_name().alias("file")
    ).distinct()
    out = os.path.join(table.path, RECORD_INDEX_DIR)
    idx.write.mode("overwrite").parquet(out)
    spark.catalog.refreshByPath(out)
    return spark.read.parquet(out)


SECONDARY_INDEX_DIR = "_index/secondary"


def build_secondary_index(spark: SparkSession, table, col: str) -> DataFrame:
    """Hudi 1.0's **secondary index**: value-of-a-non-key-column → base
    file, enabling point lookups on predicates the record key cannot
    serve. One projection + distinct over (col, file) — the index is
    O(distinct (value, file) pairs), tiny next to the table whenever the
    column clusters at all (and at 100 TB it would be written bucketed
    on the value so probes are shuffle-free). Updates that MOVE a row's
    value only ever add log rows — the log is unioned at lookup and the
    post-resolution residual filter keeps results exact, so a stale
    index entry costs an extra file read, never a wrong answer."""
    df = table.read_base(spark)
    idx = df.select(
        F.col(col).alias("value"), F.input_file_name().alias("file")
    ).distinct()
    out = os.path.join(table.path, SECONDARY_INDEX_DIR, col)
    idx.write.mode("overwrite").parquet(out)
    spark.catalog.refreshByPath(out)
    return spark.read.parquet(out)


def secondary_lookup(
    spark: SparkSession, table, col: str, values_df: DataFrame
) -> DataFrame:
    """Point lookup by a non-key column through the secondary index:
    read only base files the index maps the probe values to, union the
    MOR delta log, resolve precombine, then re-apply the exact predicate
    (rows whose LATEST version left the probed value set drop out here —
    same residual-filter contract as every index in this module)."""
    from hudi_utility_spark.table import DELETED_COL, TableType
    from hudi_utility_spark.write import latest_by_key

    probe = F.broadcast(values_df.select(F.col(col).alias("value")).distinct())
    idx = spark.read.parquet(os.path.join(table.path, SECONDARY_INDEX_DIR, col))
    files = [
        r.file
        for r in idx.join(probe, "value").select("file").distinct().collect()
    ]
    if files:
        base = (
            spark.read.option("mergeSchema", "true")
            .option("basePath", table.base_path)
            .parquet(*files)
        )
    else:
        base = table.read_base(spark).filter(F.lit(False))
    if table.table_type is TableType.MERGE_ON_READ and os.path.isdir(table.log_path):
        log = spark.read.option("mergeSchema", "true").parquet(table.log_path)
        base = base.unionByName(log, allowMissingColumns=True)
    resolved = latest_by_key(base, table.record_key, table.precombine)
    if DELETED_COL in resolved.columns:
        resolved = resolved.filter(
            ~F.coalesce(F.col(DELETED_COL), F.lit(False))
        ).drop(DELETED_COL)
    return resolved.join(
        probe.select(F.col("value").alias(col)), col, "left_semi"
    )


BLOOM_INDEX_DIR = "_index/bloom"


def _bloom_key(key_cols: list[str]):
    """Composite record key as one string (the reference's comma-joined
    key, ``pyspark_script.py:127``, normalized to a separator that can't
    appear in values)."""
    return F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])


def bloom_bit_positions(key, m_bits: int, k: int):
    """The k bloom bit positions of one key value, derived from the
    portable md5 family (`ops/phash.py`) so index contents are
    reproducible in any engine — no JVM-specific hash."""
    from hudi_utility_spark.ops import phash

    hi, lo = phash.parts(key)
    return F.array_distinct(
        F.array(*[phash.family_hash(hi, lo, i) % F.lit(m_bits) for i in range(k)])
    )


def build_bloom_index(
    spark: SparkSession, table, m_bits: int = 4096, k: int = 3
) -> DataFrame:
    """Hudi's default **BLOOM index** re-expressed as a Spark-managed
    index table: per base file, the sorted set of bloom bit positions of
    every record key in it (reference tables get this from
    ``hoodie.index.type=BLOOM`` file footers; the app never surfaces it).

    Build cost: one explode of k positions per row + one aggregation
    keyed on file name — map-side partial `collect_set` bounds the
    shuffle at O(files × m_bits) values regardless of row count. The
    index is O(files × m_bits/64) storage — for a 100k-file table at the
    default sizing, single-digit MBs, same economics as Hudi's metadata
    table bloom partition. Point/upsert lookups then consult the index
    (`bloom_candidate_files`) and touch only files whose filter *might*
    contain the key: no false negatives ever (every key's bits are set
    in its file's filter), false positives only cost an extra file read
    that the exact residual filter discards."""
    df = table.read_base(spark)
    bits = bloom_bit_positions(_bloom_key(table.record_key), m_bits, k)
    idx = (
        df.select(F.input_file_name().alias("file"), F.explode(bits).alias("bit"))
        .groupBy("file")
        .agg(F.sort_array(F.collect_set("bit")).alias("bits"))
    )
    out = os.path.join(table.path, BLOOM_INDEX_DIR)
    idx.write.mode("overwrite").parquet(out)
    import json

    with open(os.path.join(table.path, BLOOM_INDEX_DIR + "._meta"), "w") as f:
        json.dump({"m_bits": m_bits, "k": k}, f)
    spark.catalog.refreshByPath(out)
    return spark.read.parquet(out)


def bloom_candidate_files(
    spark: SparkSession, table, keys_df: DataFrame, m_bits: int = 4096, k: int = 3
) -> list[str]:
    """Base files that may contain any of the probe keys: file f is a
    candidate for key x iff ALL of x's bit positions are set in f's
    filter. The probe side is a point-lookup batch — small by definition
    — so it broadcasts into a nested-loop against the (files-sized)
    index relation; the table's data is never touched."""
    probes = (
        keys_df.select(*table.record_key)
        .distinct()
        .select(
            F.array_distinct(
                bloom_bit_positions(_bloom_key(table.record_key), m_bits, k)
            ).alias("pbits")
        )
        .distinct()
        .select(F.col("pbits"), F.size("pbits").alias("need"))
    )
    # equijoin on BIT POSITION, not a nested loop: the old
    # forall(pbits, array_contains(bits, ·)) BNLJ cost
    # files × keys × k × O(m_bits) linear scans (the r8 +12% headline
    # regression lived here). Exploding both sides turns the membership
    # test into a broadcast hash join on `bit` plus one (file, probe)
    # count — a file is a candidate for a probe iff ALL `need` of its
    # distinct bits matched. Map-only explode on the index side, 6k-row
    # probe broadcast, partial agg: every stage distributed.
    pe = probes.select(
        F.col("pbits"), F.col("need"), F.explode("pbits").alias("bit")
    )
    idx = spark.read.parquet(os.path.join(table.path, BLOOM_INDEX_DIR))
    ie = idx.select("file", F.explode("bits").alias("bit"))
    cand = (
        ie.join(F.broadcast(pe), "bit")
        .groupBy("file", "pbits", "need")
        .agg(F.count(F.lit(1)).alias("hit"))
        .filter(F.col("hit") == F.col("need"))
        .select("file")
        .distinct()
        .collect()
    )
    return [r.file for r in cand]


def bloom_lookup(
    spark: SparkSession,
    table,
    keys_df: DataFrame,
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Point lookup routed through the bloom index: read only candidate
    base files, exact-filter by key (discarding bloom false positives),
    union the MOR delta log, resolve precombine. Same contract as
    `point_lookup` but with O(m_bits)-per-file index storage instead of
    O(records) — the trade Hudi makes between its BLOOM and
    record-level indexes."""
    from hudi_utility_spark.table import DELETED_COL, TableType
    from hudi_utility_spark.write import latest_by_key

    keys = table.record_key
    # materialized once: feeds the bloom candidate probe plus two
    # semi-joins (see point_lookup — same triple-scan hazard)
    kd = keys_df.select(*keys).distinct().localCheckpoint()
    probe = F.broadcast(kd)
    files = bloom_candidate_files(spark, table, kd, m_bits=m_bits, k=k)
    if files:
        base = (
            spark.read.option("mergeSchema", "true")
            .option("basePath", table.base_path)
            .parquet(*files)
        )
        matched = base.join(probe, on=keys, how="left_semi")
    else:
        matched = table.read_base(spark).filter(F.lit(False))
    if table.table_type is TableType.MERGE_ON_READ and os.path.isdir(table.log_path):
        log = spark.read.option("mergeSchema", "true").parquet(table.log_path)
        matched = matched.unionByName(
            log.join(probe, on=keys, how="left_semi"), allowMissingColumns=True
        )
    resolved = latest_by_key(matched, keys, table.precombine)
    if DELETED_COL in resolved.columns:
        resolved = resolved.filter(
            ~F.coalesce(F.col(DELETED_COL), F.lit(False))
        ).drop(DELETED_COL)
    return resolved


def point_lookup(spark: SparkSession, table, keys_df: DataFrame) -> DataFrame:
    """Read exactly the base files containing the requested keys (via
    the record index), union the delta log for MOR, resolve precombine,
    and return the live rows for those keys.

    Scale: the index join is broadcast (keys_df is a point-lookup batch,
    small by definition); the base scan is the matched files only —
    ~one file per requested key on a clustered layout instead of a full
    partition scan. The MOR log is unioned unpruned because it is the
    small side by design (compaction keeps it so)."""
    from hudi_utility_spark.table import DELETED_COL, TableType
    from hudi_utility_spark.write import latest_by_key

    keys = table.record_key
    idx = spark.read.parquet(os.path.join(table.path, RECORD_INDEX_DIR))
    # materialize the point batch ONCE: it feeds three broadcast joins
    # (index probe, base semi-join, log semi-join), and an unmaterialized
    # keys_df would re-run its source scan + distinct shuffle per use —
    # measured ~2.4s -> ~1.5s probe at sf0.1 on the registered query
    kd = keys_df.select(*keys).distinct().localCheckpoint()
    files = [
        r.file
        for r in idx.join(F.broadcast(kd), on=keys)
        .select("file")
        .distinct()
        .collect()
    ]
    if files:
        base = (
            spark.read.option("mergeSchema", "true")
            .option("basePath", table.base_path)
            .parquet(*files)
        )
        matched = base.join(F.broadcast(kd), on=keys, how="left_semi")
    else:
        matched = table.read_base(spark).filter(F.lit(False))
    if table.table_type is TableType.MERGE_ON_READ and os.path.isdir(table.log_path):
        log = spark.read.option("mergeSchema", "true").parquet(table.log_path)
        log_matched = log.join(F.broadcast(kd), on=keys, how="left_semi")
        matched = matched.unionByName(log_matched, allowMissingColumns=True)
    resolved = latest_by_key(matched, keys, table.precombine)
    if DELETED_COL in resolved.columns:
        resolved = resolved.filter(
            ~F.coalesce(F.col(DELETED_COL), F.lit(False))
        ).drop(DELETED_COL)
    return resolved


def refresh_indexes(spark: SparkSession, table) -> list[str]:
    """Rebuild every index present under ``<table>/_index`` — the
    maintenance hook to run after any base rewrite (COW upsert,
    compaction, clustering), since file-granular indexes go stale when
    base files are replaced. Discovers what exists and how it was
    parameterized from the stored artifacts themselves:

    - ``column_stats``: indexed columns recovered from the ``min_*``
      schema fields; rebuilt via the footer-metadata path (no data scan).
    - ``record_index`` / ``secondary/<col>``: rebuilt as stored.
    - ``bloom``: (m_bits, k) recovered from the ``._meta`` sidecar.

    Returns the list of refreshed index names. Cost: one metadata job
    (column stats) + one projection pass per structural index — all
    bounded by the same economics as their original builds."""
    import json

    root = os.path.join(table.path, "_index")
    if not os.path.isdir(root):
        return []
    refreshed = []
    for entry in sorted(os.listdir(root)):
        p = os.path.join(root, entry)
        if entry == "column_stats":
            cols = sorted(
                f.name[len("min_"):]
                for f in spark.read.parquet(p).schema.fields
                if f.name.startswith("min_")
            )
            build_column_stats_from_footers(spark, table.path, cols)
            refreshed.append("column_stats")
        elif entry == "record_index":
            build_record_index(spark, table)
            refreshed.append("record_index")
        elif entry == "bloom":
            meta_path = p + "._meta"
            meta = (
                json.load(open(meta_path))
                if os.path.exists(meta_path)
                else {"m_bits": 4096, "k": 3}
            )
            build_bloom_index(spark, table, m_bits=meta["m_bits"], k=meta["k"])
            refreshed.append("bloom")
        elif entry == "secondary" and os.path.isdir(p):
            for col in sorted(os.listdir(p)):
                build_secondary_index(spark, table, col)
                refreshed.append(f"secondary/{col}")
    return refreshed
