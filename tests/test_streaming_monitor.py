"""Per-micro-batch constraint monitoring appends an auditable metrics
log; violations in a later batch are attributed to that batch's epoch."""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_utility_spark.ops import quality as Q
from hudi_utility_spark.streaming.monitor import stream_quality_monitor

SCHEMA = "event_id long, status string, value double"


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(path)


def test_monitor_flags_bad_batch_by_epoch(spark, tmp_path):
    src, metrics = str(tmp_path / "src"), str(tmp_path / "metrics")
    constraints = [
        Q.not_null("event_id"),
        Q.in_range("value", lo=0.0),
        Q.accepted_values("status", ["ok", "warn"]),
    ]

    _write(spark, src, [(1, "ok", 1.0), (2, "warn", 2.0)])
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = stream_quality_monitor(
        spark, stream, constraints, metrics, str(tmp_path / "c1"), trigger_once=True
    )
    q.awaitTermination(120)

    # second batch carries two violations
    _write(spark, src, [(None, "ok", 3.0), (3, "BAD", -1.0)])
    q = stream_quality_monitor(
        spark, stream, constraints, metrics, str(tmp_path / "c1"), trigger_once=True
    )
    q.awaitTermination(120)

    m = spark.read.parquet(metrics)
    assert m.count() == 6  # 3 constraints × 2 epochs
    first, second = [r[0] for r in m.select("epoch").distinct().orderBy("epoch").collect()]
    clean = {r["constraint"]: r for r in m.filter(F.col("epoch") == first).collect()}
    dirty = {r["constraint"]: r for r in m.filter(F.col("epoch") == second).collect()}
    assert all(r["passed"] for r in clean.values())
    assert dirty["not_null(event_id)"]["violations"] == 1
    assert dirty["in_range(value)"]["violations"] == 1
    assert dirty["accepted_values(status)"]["violations"] == 1
    assert not any(r["passed"] for r in dirty.values())
