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
