"""Large-scale data-pipeline operators (SURVEY §7 step 7 / north star):
deduplication, similarity search, text analysis, multimodal plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_for_compute(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Ensure CPU-heavy per-row kernels (tokenization, shingling,
    hashing) get at least cluster-width parallelism.

    Scan parallelism follows INPUT BYTES (``files.maxPartitionBytes``),
    which is right for IO-bound plans but starves compute-bound ones: a
    50 MB corpus of 5 M documents scans as one task, and a
    tokenize-explode over it runs single-threaded while 31 cores idle.
    When the incoming partition count is below ``defaultParallelism``
    (or *min_parts*), round-robin repartition first — the shuffle moves
    only the small raw input, and the expensive flatMap downstream then
    runs cluster-wide. At 100 TB inputs the scan is already wider than
    the cluster and this is a no-op; the guard exists precisely so the
    same code is right at both extremes.
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def localize(df: DataFrame, max_rows: int = 100_000) -> DataFrame:
    """Materialize a SMALL DataFrame into a driver-local relation so a
    returned plan that reuses it several times has no persisted blocks
    to leak (cache-scope discipline: a library caller materializing
    many query results in one session must not accumulate storage
    blocks it can never unpersist — round-6 advice).

    ``persist()`` is the right tool while YOU control the lifetime
    (materialize → use → unpersist); it is the wrong tool for a plan
    handed to a caller, because nobody can safely unpersist it before
    the caller collects. For inputs bounded by *profiles* (signatures,
    centroids, codebooks, group thresholds — never data rows),
    collecting once and re-emitting as a LocalRelation gives the same
    scan-once semantics with zero retained executor state, and Catalyst
    broadcast-plans the local side automatically when it is joined.

    Guard: raises if the input exceeds ``max_rows`` — the signal that
    the value is data-shaped, where the persist-with-managed-lifetime
    form (or a real table) is the correct fallback.
    """
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"localize(): input exceeds {max_rows} rows; use "
            "persist() with a managed lifetime instead"
        )
    return df.sparkSession.createDataFrame(rows, df.schema)
