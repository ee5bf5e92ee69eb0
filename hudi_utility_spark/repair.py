"""Partition diff, completeness audit, resume (SURVEY §2.3 J1/J2, §2.9 St3).

The reference's distinguishing feature: resuming a partially-written
bootstrap by re-writing only *missing* and *incomplete* partitions
(``fastapi-backend/pyspark_script.py:199-253,392-401``). Its implementation
is the repo's biggest perf bug — an O(P) loop issuing a filter+count Spark
job per partition value per side (``pyspark_script.py:237-247``). Here both
diffs are single-shuffle DataFrame plans:

* missing  = broadcast **left-anti join** of distinct source partition
  values against destination partition values (J1);
* incomplete = ``groupBy(partition).count()`` on each side + **inner join**
  + count-inequality filter (J2) — two partial-aggregated scans and one
  broadcast join, total work independent of partition count.

At 100 TB the aggregates are map-side partial (Catalyst), the joined
per-partition count tables are tiny (one row per partition value), and the
join broadcasts — no full shuffle of the data ever happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hudi_utility_spark.table import KeyedTable


def partition_counts(df: DataFrame, partition_field: str) -> DataFrame:
    """Per-partition row counts in one hash aggregate (replaces the
    reference's per-value filter+count loop, A2)."""
    return df.groupBy(F.col(partition_field).cast("string").alias(partition_field)).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def missing_partitions(
    source: DataFrame, dest: DataFrame, partition_field: str
) -> DataFrame:
    """Partition values present in source but absent from dest (J1).

    Broadcast left-anti join over distinct partition values; result column
    is the partition field cast to string (the reference compares string
    forms, ``pyspark_script.py:234``).
    """
    s = source.select(F.col(partition_field).cast("string").alias(partition_field)).distinct()
    d = dest.select(F.col(partition_field).cast("string").alias(partition_field)).distinct()
    return s.join(F.broadcast(d), partition_field, "left_anti")


def incomplete_partitions(
    source: DataFrame, dest: DataFrame, partition_field: str
) -> DataFrame:
    """Partitions present on both sides whose row counts disagree (J2).

    Returns (partition, src_cnt, dst_cnt) for mismatches — the
    reference's "incomplete partition" audit as one joined aggregate.
    """
    s = partition_counts(source, partition_field).withColumnRenamed("cnt", "src_cnt")
    d = partition_counts(dest, partition_field).withColumnRenamed("cnt", "dst_cnt")
    return (
        s.join(F.broadcast(d), partition_field, "inner")
        .filter(F.col("src_cnt") != F.col("dst_cnt"))
        .select(partition_field, "src_cnt", "dst_cnt")
    )


def partitions_to_repair(
    source: DataFrame, dest: DataFrame, partition_field: str
) -> list[str]:
    """missing ∪ incomplete partition values (the reference's
    ``set(missing + incomplete)`` union-distinct, ``pyspark_script.py:257``).
    Collect is safe: one row per partition *value*, never data rows."""
    miss = missing_partitions(source, dest, partition_field)
    inc = incomplete_partitions(source, dest, partition_field).select(partition_field)
    union = miss.union(inc).distinct()
    return sorted(r[0] for r in union.collect())


def resume_bootstrap(
    spark: SparkSession,
    source_df: DataFrame,
    table: KeyedTable,
    dry_run: bool = False,
) -> dict:
    """Idempotent incremental repair (St3, ``pyspark_script.py:392-401``).

    Computes missing+incomplete partitions and rewrites exactly those via
    dynamic partition overwrite. Running it twice writes nothing the
    second time. Returns {"repaired_partitions": [...], "noop": bool}.
    """
    if not table.partition_fields:
        raise ValueError("resume requires a partitioned table")
    pfield = table.partition_fields[0]
    if not table.exists():
        to_write = [
            str(r[0]) for r in source_df.select(pfield).distinct().collect()
        ]
    else:
        dest = table.read_base(spark)
        to_write = partitions_to_repair(source_df, dest, pfield)
    if not to_write:
        return {"repaired_partitions": [], "noop": True, "dry_run": dry_run}
    if not dry_run:
        # partition values were compared as strings; filter source by the
        # string form so typed columns (dates, ints) still match. Dynamic
        # partition overwrite replaces exactly these partitions.
        from hudi_utility_spark.write import align_timestamp_types, write_partitioned

        src = source_df.filter(F.col(pfield).cast("string").isin(to_write))
        if table.exists():
            # rewritten partitions must carry the destination's timestamp
            # flavor (NTZ vs LTZ) or the next mergeSchema read dies —
            # no-op under the engine session, protects vanilla sessions
            src = align_timestamp_types(src, table.read_base(spark).schema)
        write_partitioned(src, table.base_path, table.partition_fields, mode="overwrite")
    return {"repaired_partitions": sorted(to_write), "noop": False, "dry_run": dry_run}


# Modulus for the order-independent partition fingerprint: row hashes are
# folded to [0, P) before summing so a partition of up to ~9 billion rows
# sums within int64 (9e9 × 1e9 < 2^63) on every engine — DuckDB's
# SUM(BIGINT) promotes to HUGEINT and would otherwise disagree with
# Spark's wrapping long sum.
FINGERPRINT_MOD = 1_000_000_007


def row_fingerprint(hash_cols: list[str]):
    """Portable per-row content hash: null-safe \\x1f-joined string
    encoding → md5 → first 48 bits as a long, folded mod
    :data:`FINGERPRINT_MOD`. The exact same value is computable in any
    engine with md5 + string concat (ANSI-SQL twin:
    ``CAST(concat('0x', substr(md5(enc), 1, 12)) AS BIGINT) % P``), so
    fingerprints can be compared ACROSS engines — the cross-system
    anti-entropy use-case (verify a warehouse copy against the lake).

    Caller picks ``hash_cols``; stick to ints/strings/dates for
    cross-engine runs (float→string formatting is engine-specific).
    """
    enc = F.concat_ws(
        "\x1f",
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in hash_cols],
    )
    h48 = F.conv(F.substring(F.md5(enc), 1, 12), 16, 10).cast("long")
    return h48 % F.lit(FINGERPRINT_MOD)


def partition_fingerprints(
    df: DataFrame, partition_field: str, hash_cols: list[str]
) -> DataFrame:
    """Order-independent per-partition content fingerprint:
    ``(partition, fp, row_cnt)`` where ``fp = SUM(row_hash) % P``.

    This is the content-level strengthening of :func:`partition_counts`
    (J2 audits row COUNTS — a replica with the right cardinality but
    corrupted values passes it; the fingerprint catches value-level
    divergence). Sum is commutative, so the aggregate is map-side
    partial with no ordering requirement — one hash aggregate over the
    scan, shuffle O(partitions), identical shape to `partition_counts`.
    At 100 TB this is the cheapest possible full-content verify: one
    pass, no join, no sort; the Merkle-tree refinement (split a
    divergent partition by key range to localize the bad files) reuses
    the same row hash keyed by range bucket.
    """
    return (
        df.groupBy(
            F.col(partition_field).cast("string").alias(partition_field)
        )
        .agg(
            (F.sum(row_fingerprint(hash_cols)) % FINGERPRINT_MOD).alias("fp"),
            F.count(F.lit(1)).alias("row_cnt"),
        )
    )


def content_diff(
    source: DataFrame,
    dest: DataFrame,
    partition_field: str,
    hash_cols: list[str],
) -> DataFrame:
    """Anti-entropy partition diff: full-outer join of both sides'
    fingerprints → ``(partition, status, src_cnt, dst_cnt)`` with
    status ∈ {match, divergent, missing, extra}.

    * ``missing``  — partition in source, absent from dest (J1's case);
    * ``extra``    — partition in dest only (replica drift J1 can't see);
    * ``divergent``— both present, fingerprint or count differs
      (catches same-count corruption J2 can't see);
    * ``match``    — content-identical.

    Both inputs collapse to one row per partition value before the
    join, so the join is a broadcast over O(partitions) rows no matter
    the data volume.
    """
    s = partition_fingerprints(source, partition_field, hash_cols).select(
        partition_field,
        F.col("fp").alias("src_fp"),
        F.col("row_cnt").alias("src_cnt"),
    )
    d = partition_fingerprints(dest, partition_field, hash_cols).select(
        partition_field,
        F.col("fp").alias("dst_fp"),
        F.col("row_cnt").alias("dst_cnt"),
    )
    return (
        s.join(F.broadcast(d), partition_field, "full_outer")
        .select(
            partition_field,
            F.when(F.col("src_fp").isNull(), "extra")
            .when(F.col("dst_fp").isNull(), "missing")
            .when(
                (F.col("src_fp") != F.col("dst_fp"))
                | (F.col("src_cnt") != F.col("dst_cnt")),
                "divergent",
            )
            .otherwise("match")
            .alias("status"),
            F.coalesce("src_cnt", F.lit(0)).alias("src_cnt"),
            F.coalesce("dst_cnt", F.lit(0)).alias("dst_cnt"),
        )
    )


def anti_entropy_repair(
    spark: SparkSession,
    source_df: DataFrame,
    table: KeyedTable,
    hash_cols: list[str],
    drop_extra: bool = True,
    dry_run: bool = False,
) -> dict:
    """Content-verified repair: diff ``table`` against ``source_df`` by
    partition fingerprint, rewrite exactly the missing/divergent
    partitions (dynamic partition overwrite), optionally remove extra
    partitions the source no longer has. Idempotent: a second run
    reports all-match and writes nothing.

    This is :func:`resume_bootstrap` upgraded from count-equality to
    content-equality — the lakehouse anti-entropy sweep (Dynamo-style
    replica sync, applied to table replication): a replica whose
    partitions were corrupted in place (same row count, wrong bytes)
    is invisible to the count audit but caught and healed here.

    Cost: one scan of each side for the fingerprints (map-side partial
    aggregate, no data shuffle), then a rewrite of ONLY the unhealthy
    partitions. Returns ``{"rewritten": [...], "dropped": [...],
    "noop": bool, "dry_run": bool}``.
    """
    if not table.partition_fields:
        raise ValueError("anti_entropy_repair requires a partitioned table")
    pfield = table.partition_fields[0]
    diff = content_diff(
        source_df, table.read_base(spark), pfield, hash_cols
    ).filter(F.col("status") != "match")
    # one row per partition VALUE — safe scalar collect
    rows = diff.collect()
    to_rewrite = sorted(
        r[pfield] for r in rows if r["status"] in ("missing", "divergent")
    )
    extras = sorted(r[pfield] for r in rows if r["status"] == "extra")
    if not rows:
        return {"rewritten": [], "dropped": [], "noop": True, "dry_run": dry_run}
    if not dry_run:
        from hudi_utility_spark.write import (
            align_timestamp_types,
            write_partitioned,
        )

        if to_rewrite:
            src = source_df.filter(
                F.col(pfield).cast("string").isin(to_rewrite)
            )
            src = align_timestamp_types(src, table.read_base(spark).schema)
            write_partitioned(
                src, table.base_path, table.partition_fields, mode="overwrite"
            )
        if drop_extra and extras:
            from hudi_utility_spark.partition_paths import (
                remove_partition_leaves,
            )

            # Spark-escaped dir names — an extra partition whose value
            # contains '/', ':', '=' … must still resolve to its real dir
            remove_partition_leaves(
                table.base_path, [pfield], [(val,) for val in extras]
            )
            spark.catalog.refreshByPath(table.base_path)
    return {
        "rewritten": to_rewrite,
        "dropped": extras if drop_extra else [],
        "noop": False,
        "dry_run": dry_run,
    }


def file_layout_report(
    spark: SparkSession,
    table: KeyedTable,
    small_file_bytes: int = 32 * 1024 * 1024,
) -> DataFrame:
    """Physical-layout health per partition: file count, bytes, average
    file size, and a small-files flag — the diagnostic that decides
    which partitions need `KeyedTable.cluster` (and what
    `compact_if_needed`'s ratio is made of).

    Zero data IO at any scale: the scan is the `binaryFile` datasource
    over the parquet files, whose `length` column comes from FILE
    LISTING metadata — no parquet footer, let alone pages, is read. One
    aggregate over O(files) rows. The default threshold is the classic
    small-file bound (32 MB) — files far below the 128 MB scan-split
    size waste task scheduling and defeat row-group pruning.
    """
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "false")
        .load(table.base_path)
        .select("path", "length")
    )
    if table.partition_fields:
        pfield = table.partition_fields[0]
        part = F.regexp_extract(F.col("path"), f"{pfield}=([^/]+)/", 1)
    else:
        pfield, part = "partition", F.lit("<unpartitioned>")
    return (
        files.groupBy(part.alias(pfield))
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("length").alias("bytes"),
            (F.sum("length") / F.count(F.lit(1))).cast("long").alias("avg_bytes"),
        )
        .withColumn("small_files", F.col("avg_bytes") < small_file_bytes)
    )
