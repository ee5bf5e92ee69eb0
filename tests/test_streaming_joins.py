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


def test_outer_interval_join_stream_matches_batch(spark, events_path, tmp_path):
    """TRUE streaming left-outer interval join: NULL-follow rows may
    only emit once the watermark proves no match can still arrive, so a
    far-future sentinel file advances the watermark past every lead's
    horizon; the flushed result must equal the batch left join over the
    original events (sentinel leads excluded)."""
    import datetime as dt
    import os
    import shutil
    import time as _time

    batch_df = spark.read.parquet(events_path)
    expected = sorted(
        map(tuple, _pairs_outer(batch_df).collect()),
        key=lambda t: (t[0], t[1], t[2] is None, t[2]),
    )
    assert any(t[2] is None for t in expected)  # abandoners exist

    root = str(tmp_path / "outer_src")
    shutil.rmtree(root, ignore_errors=True)
    batch_df.coalesce(1).write.parquet(root)
    q = None
    stream = (
        spark.readStream.schema(batch_df.schema).format("parquet").load(root)
    )
    out = followed_within(
        stream.filter(F.col("event_type") == "click"),
        stream.filter(F.col("event_type") == "purchase"),
        gap_seconds=1800,
        watermark="0 seconds",
        how="left_outer",
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_outer_join")
        .option("checkpointLocation", os.path.join(root, "_ckpt"))
        .start()
    )
    q.processAllAvailable()
    # Sentinel batches must carry BOTH event types: the click and
    # purchase sides are separate watermark operators, and under the
    # default multipleWatermarkPolicy=min the GLOBAL watermark (which
    # gates outer-state eviction) is the minimum of the two — a
    # purchase-only sentinel leaves the click side's watermark at the
    # original max click ts and the last abandoner never flushes.
    # Sentinel users are distinct (they must never join each other).
    sent_click_u, sent_purch_u = 10**9, 10**9 + 1
    far = batch_df.agg(F.max("ts")).first()[0] + dt.timedelta(days=30)
    _time.sleep(1.05)
    spark.createDataFrame(
        [
            (2 * 10**9, far, sent_click_u, "click", 0.0, "{}"),
            (2 * 10**9 + 1, far, sent_purch_u, "purchase", 0.0, "{}"),
        ],
        batch_df.schema,
    ).coalesce(1).write.mode("append").parquet(root)
    q.processAllAvailable()
    # outer-state eviction happens in the batch AFTER the watermark
    # advances; a second sentinel guarantees that batch runs even if
    # the no-data batch was not scheduled
    _time.sleep(1.05)
    spark.createDataFrame(
        [
            (2 * 10**9 + 2, far + dt.timedelta(days=1), sent_click_u, "click", 0.0, "{}"),
            (2 * 10**9 + 3, far + dt.timedelta(days=1), sent_purch_u, "purchase", 0.0, "{}"),
        ],
        batch_df.schema,
    ).coalesce(1).write.mode("append").parquet(root)
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (
            (r.user_id, r.lead_id, r.follow_id, r.gap_us)
            for r in spark.sql("SELECT * FROM t_outer_join").collect()
            if r.user_id < sent_click_u  # sentinel leads may flush as NULL rows
        ),
        key=lambda t: (t[0], t[1], t[2] is None, t[2]),
    )
    assert got == expected


def _pairs_outer(df):
    clicks = df.filter(F.col("event_type") == "click")
    purchases = df.filter(F.col("event_type") == "purchase")
    return followed_within(clicks, purchases, gap_seconds=1800, how="left_outer")
