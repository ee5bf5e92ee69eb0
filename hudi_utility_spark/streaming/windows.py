"""Windowed / watermarked streaming aggregations over event streams.

Each builder takes a DataFrame that may be a batch frame (for oracle
checks — ``F.window`` works identically in batch) or a ``readStream``
frame (watermarks engage, state cleanup bounds memory). Streaming state
size at 100 TB/day ingest is governed by watermark delay × key
cardinality; all aggs here are incremental (sum/count), never
collect-like.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hudi_utility_spark.tsutil import as_ltz, us


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "5 minutes",
    watermark: str | None = None,
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling-window counts/sums. In streaming mode, pass a watermark so
    late rows beyond the delay are dropped and state is reclaimed."""
    if watermark:
        df = as_ltz(df, ts_col).withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, width).alias("win"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            us(F.col("win.start")).alias("window_start_us"),
            *group_cols,
            "cnt",
            "total_value",
        )
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding-window counts (each row lands in width/slide windows)."""
    if watermark:
        df = as_ltz(df, ts_col).withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, width, slide).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            us(F.col("win.start")).alias("window_start_us"),
            us(F.col("win.end")).alias("window_end_us"),
            "event_type",
            "cnt",
        )
    )


def session_windows_batch(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Sessionization (batch form): gap > threshold starts a new session;
    session id = cumulative count of gap-breaks per key.

    lag + cumsum windows — the classic batch sessionization; the
    streaming twin is ``F.session_window`` (see session_windows_stream).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, "event_id")
    # compare in integer microseconds — exact, and matches an epoch_us()
    # oracle bit-for-bit (second-granularity casts truncate differently
    # across engines near the gap threshold)
    gap_break = (
        F.when(
            us(F.col(ts_col)) - F.lag(us(F.col(ts_col))).over(w)
            > gap_minutes * 60 * 1_000_000,
            1,
        )
        .otherwise(0)
    )
    with_sess = df.withColumn("session_seq", F.sum(gap_break).over(w))
    return (
        with_sess.groupBy(key_col, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            us(F.min(ts_col)).alias("session_start_us"),
            us(F.max(ts_col)).alias("session_end_us"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
    )


def session_windows_stream(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization via the native session_window (state-store
    backed, watermark-bounded)."""
    return (
        as_ltz(df, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("win"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            us(F.col("win.start")).alias("session_start_us"),
            us(F.col("win.end")).alias("session_end_us"),
            "n_events",
        )
    )


def windowed_key_counts(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "15 minutes",
    key_col: str = "event_type",
    watermark: str | None = None,
) -> DataFrame:
    """Per-(tumbling window, key) event counts — the incremental half of
    trending top-k, safe to run as a streaming aggregation."""
    if watermark:
        df = as_ltz(df, ts_col).withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, width).alias("win"), key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(us(F.col("win.start")).alias("window_start_us"), key_col, "cnt")
    )


def rank_trending(
    counts: DataFrame, k: int = 3, key_col: str = "event_type"
) -> DataFrame:
    """Keep each window's k hottest keys (deterministic ties: count desc,
    key asc). Ranking is NOT incremental, so in streaming this runs over
    the aggregation's output — per micro-batch in foreachBatch, or on
    the complete-mode sink — never inside the stateful stage. The window
    partitions on window_start, so state per task is one window's keys."""
    from pyspark.sql import Window

    w = Window.partitionBy("window_start_us").orderBy(
        F.desc("cnt"), F.asc(key_col)
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def trending_topk(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "15 minutes",
    key_col: str = "event_type",
    k: int = 3,
    watermark: str | None = None,
) -> DataFrame:
    """Trending readout: per tumbling window, the k keys with the most
    events — windowed incremental counts + a bounded per-window ranking.
    In batch this is one plan; streaming splits it at the aggregation
    boundary (see rank_trending)."""
    return rank_trending(
        windowed_key_counts(df, ts_col, width, key_col, watermark), k, key_col
    )


def dedup_within_watermark(
    df: DataFrame, keys: list[str], ts_col: str = "ts", watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming exact dedup with bounded state
    (dropDuplicatesWithinWatermark); the streaming twin of
    ops.dedup.dedup_exact."""
    return as_ltz(df, ts_col).withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def run_stream_to_memory(
    spark,
    source_df_schema,
    source_path: str,
    builder,
    query_name: str,
    output_mode: str = "complete",
):
    """Drive a parquet-backed stream through `builder` into an in-memory
    sink synchronously (test/smoke harness; real deployments swap the
    source for Kafka and the sink for a keyed table). Aggregations use
    "complete"; watermark-append pipelines pass "append"."""
    stream = (
        spark.readStream.schema(source_df_schema).format("parquet").load(source_path)
    )
    out = builder(stream)
    q = (
        out.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
