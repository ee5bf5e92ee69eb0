"""Continuous data-quality monitoring: the constraint suite of
``ops/quality.py`` evaluated per micro-batch and appended to a metrics
table — alerting-ready drift detection on an ingest stream (the
streaming face of the reference's validation posture, as
``stream_upsert`` is of its ingest).

Scale: each micro-batch pays the suite's one aggregate pass (plus any
unique/referential extras) over that batch only; the metrics sink grows
by k rows per batch. State is carried by the checkpoint, not the
operator — the monitor is stateless by design (per-batch expectations;
cross-batch trends are a batch query over the metrics table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hudi_utility_spark.ops.quality import constraint_report


def stream_quality_monitor(
    spark: SparkSession,
    stream: DataFrame,
    constraints: list,
    metrics_path: str,
    checkpoint: str,
    trigger_once: bool = False,
):
    """Attach the constraint suite to *stream*; per micro-batch, append
    (epoch, constraint, violations, passed) to the parquet metrics table
    at *metrics_path*. Returns the started StreamingQuery."""

    def _audit(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            constraint_report(batch_df, constraints)
            .withColumn("epoch", F.lit(epoch_id).cast("long"))
            .write.mode("append")
            .parquet(metrics_path)
        )

    writer = (
        stream.writeStream.foreachBatch(_audit)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
