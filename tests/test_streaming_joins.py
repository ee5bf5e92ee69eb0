"""Stream-stream interval join: true-streaming execution must match the
batch twin (same parquet replayed through readStream, append mode)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hudi_utility_spark.streaming.joins import followed_within
from hudi_utility_spark.tables import load_table


@pytest.fixture(scope="module")
def events_path(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("join_src") / "events")
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(out)
    return out


def _pairs(df):
    clicks = df.filter(F.col("event_type") == "click")
    purchases = df.filter(F.col("event_type") == "purchase")
    return followed_within(clicks, purchases, gap_seconds=1800)


def test_interval_join_stream_matches_batch(spark, events_path):
    batch_df = spark.read.parquet(events_path)
    expected = sorted(map(tuple, _pairs(batch_df).collect()))
    assert expected  # fixture data must actually produce funnel pairs

    stream = (
        spark.readStream.schema(batch_df.schema).format("parquet").load(events_path)
    )
    out = followed_within(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
        gap_seconds=1800,
        watermark="2 hours",
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_interval_join")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(map(tuple, spark.sql("SELECT * FROM t_interval_join").collect()))
    assert got == expected


def test_interval_join_gap_bounds(spark):
    rows = [
        (1, 100, "2024-01-01 00:00:00"),
        (2, 100, "2024-01-01 00:10:00"),  # inside gap
        (3, 100, "2024-01-01 00:30:00"),  # exactly at gap bound (inclusive)
        (4, 100, "2024-01-01 01:30:00"),  # outside gap
        (5, 200, "2024-01-01 00:05:00"),  # other key
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts_s"]).withColumn(
        "ts", F.to_timestamp("ts_s")
    )
    lead = df.filter(F.col("event_id") == 1)
    out = followed_within(lead, df, gap_seconds=1800)
    got = {r.follow_id for r in out.collect()}
    assert got == {2, 3}  # strict lower bound, inclusive upper, key-scoped


def test_stream_static_enrich_matches_batch_and_stays_mapside(spark, events_path, sf_dir):
    from hudi_utility_spark.streaming.joins import enrich_with_dim

    batch_df = spark.read.parquet(events_path)
    cust = load_table(spark, sf_dir, "customer")

    def build(ev):
        return enrich_with_dim(
            ev.select("event_id", "user_id", "event_type"),
            cust,
            key="user_id",
            dim_key="c_custkey",
            dim_cols=["c_mktsegment"],
        )

    enriched = build(batch_df)
    expected = sorted(map(tuple, enriched.collect()))
    # broadcast hint honored: the fact side never hash-shuffles
    plan = enriched._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan

    stream = (
        spark.readStream.schema(batch_df.schema).format("parquet").load(events_path)
    )
    q = (
        build(stream)
        .writeStream.outputMode("append")  # stream-static: no state store
        .format("memory")
        .queryName("t_static_enrich")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(map(tuple, spark.sql("SELECT * FROM t_static_enrich").collect()))
    assert got == expected
