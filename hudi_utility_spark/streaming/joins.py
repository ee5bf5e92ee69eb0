"""Stream-stream interval joins (event-time bounded).

The reference has no data-plane joins at all (SURVEY §2.3); this is the
streaming member of our join family: match each left event to the right
events that *follow it within a bounded gap* on the same key — the
click→purchase funnel shape.

Works identically on batch frames (oracle-checkable — the condition is a
plain equi-key + time-range join) and on ``readStream`` frames, where
Structured Streaming requires exactly what we pass: watermarks on both
sides plus a two-sided event-time bound in the join condition, which is
what lets the state store evict rows older than ``watermark + gap``.

Scale: the join shuffles both streams once on the key; per-key state is
bounded by (watermark + gap) × per-key event rate, independent of total
stream length. Skewed keys fall under AQE skew-join in batch; in
streaming, the fix is salting the key into the bucket column upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hudi_utility_spark.tsutil import as_ltz, us


def enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    dim_key: str,
    dim_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment: join a (possibly streaming) fact against
    a small dimension with an explicit broadcast hint — the standard
    "attach the slowly-changing dimension" stage in front of windowed
    aggregation.

    Works identically on batch frames (the oracle twin) and on
    ``readStream`` frames: stream-static equi-joins are supported in
    append mode with NO watermark and NO state store — the stream side
    never shuffles (broadcast hash join per micro-batch), and because the
    static side is re-planned at every micro-batch, a file-backed
    dimension picks up updates between batches. At 100 TB of stream the
    per-batch cost stays map-only; if the dimension outgrows broadcast,
    drop the hint and pre-bucket both sides instead.
    """
    d = dim.select(F.col(dim_key).alias(key), *dim_cols)
    return stream.join(F.broadcast(d), key, how)


def followed_within(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    id_col: str = "event_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """(lead, follow) pairs with the same *key* where the follow event
    lands in ``(lead_ts, lead_ts + gap_seconds]``.

    ``how="inner"`` is the conversion funnel; ``how="left_outer"`` is
    the ABANDONMENT readout — leads with no follow inside the gap
    survive with NULL follow columns. In streaming, outer rows emit
    once the watermark passes ``lead_ts + gap`` (the state store then
    KNOWS no match can still arrive — this is why outer stream-stream
    joins require both the watermark and the two-sided time bound; the
    runtime schedules no-data batches to flush evicted state).

    Pass ``watermark`` when both inputs are streaming — it is applied to
    both sides, and with the two-sided time bound below makes the join
    runnable in append mode with bounded state.
    """
    lead = left.select(
        F.col(key).alias(key),
        F.col(id_col).alias("lead_id"),
        F.col(ts_col).alias("lead_ts"),
    )
    follow = right.select(
        F.col(key).alias("__follow_key"),
        F.col(id_col).alias("follow_id"),
        F.col(ts_col).alias("follow_ts"),
    )
    if watermark is not None:
        # event time must be LTZ TIMESTAMP (NTZ is rejected); the UTC
        # cast preserves epochs, so batch/stream parity holds
        lead = as_ltz(lead, "lead_ts").withWatermark("lead_ts", watermark)
        follow = as_ltz(follow, "follow_ts").withWatermark("follow_ts", watermark)
    cond = (
        (F.col(key) == F.col("__follow_key"))
        & (F.col("follow_ts") > F.col("lead_ts"))
        & (
            F.col("follow_ts")
            <= F.col("lead_ts") + F.expr(f"INTERVAL {int(gap_seconds)} SECONDS")
        )
    )
    return (
        lead.join(follow, cond, how)
        .select(
            key,
            "lead_id",
            "follow_id",
            F.when(
                F.col("follow_id").isNotNull(),
                us("follow_ts") - us("lead_ts"),
            ).alias("gap_us"),
        )
    )
