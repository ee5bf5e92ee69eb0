"""Custom stateful operator: per-key EWMA, batch/stream parity and
cross-micro-batch state carry-over."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from hudi_utility_spark.streaming.stateful import (
    running_ewma_batch,
    running_ewma_stream,
)
from hudi_utility_spark.tables import load_table


@pytest.fixture(scope="module")
def events_us(spark, sf_dir, tmp_path_factory):
    """events with µs timestamps in a fresh dir (readStream can't apply
    the ns→µs conversion load_table does)."""
    path = str(tmp_path_factory.mktemp("ewma") / "events")
    df = load_table(spark, sf_dir, "events")
    df.coalesce(1).write.parquet(path)
    return path, df.schema


def _python_ewma(rows, alpha=0.3):
    """Reference fold in plain Python."""
    state: dict = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        e, n = state.get(r["user_id"], (None, 0))
        v = float(r["value"])
        e = v if n == 0 else alpha * v + (1 - alpha) * e
        state[r["user_id"]] = (e, n + 1)
    return state


def test_batch_ewma_matches_python_reference(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    want = _python_ewma([r.asDict() for r in ev.collect()])
    got = {
        r.user_id: (r.ewma, r.n_events)
        for r in running_ewma_batch(ev).collect()
    }
    assert set(got) == set(want)
    for uid, (e, n) in want.items():
        assert got[uid][1] == n
        assert got[uid][0] == pytest.approx(e, rel=1e-9)


def test_stream_matches_batch_single_batch(spark, events_us):
    path, schema = events_us
    stream = spark.readStream.schema(schema).format("parquet").load(path)
    q = (
        running_ewma_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("ewma_stream")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.user_id: (r.ewma, r.n_events)
        for r in spark.sql(
            # latest emission per key
            """SELECT user_id, ewma, n_events FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                          ORDER BY n_events DESC) rn FROM ewma_stream)
               WHERE rn = 1"""
        ).collect()
    }
    batch = {
        r.user_id: (r.ewma, r.n_events)
        for r in running_ewma_batch(
            spark.read.schema(schema).parquet(path)
        ).collect()
    }
    assert set(got) == set(batch)
    for uid, (e, n) in batch.items():
        assert got[uid][1] == n
        assert got[uid][0] == pytest.approx(e, rel=1e-9)


def test_state_carries_across_micro_batches(spark, sf_dir, tmp_path):
    """Feed two files sequentially through one query: the second batch's
    emissions must continue the fold, not restart it."""
    src = str(tmp_path / "src")
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 20)
        .orderBy("ts", "event_id")
        .cache()
    )
    half = ev.count() // 2
    first = ev.limit(half)
    second = ev.subtract(first)
    shutil.rmtree(src, ignore_errors=True)
    first.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(ev.schema).format("parquet").load(src)
    q = (
        running_ewma_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("ewma_carry")
        .start()
    )
    q.processAllAvailable()
    second.coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    got = {
        r.user_id: (r.ewma, r.n_events)
        for r in spark.sql(
            """SELECT user_id, ewma, n_events FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                          ORDER BY n_events DESC) rn FROM ewma_carry)
               WHERE rn = 1"""
        ).collect()
    }
    # every key's final n_events equals its total row count — the second
    # batch continued from stored state
    want_counts = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert {u: n for u, (_, n) in got.items()} == want_counts


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas needs google.protobuf in the "
    "Python worker (state-server RPC); not installed in this sandbox",
)
def test_tws_matches_batch_single_batch(spark, events_us):
    """transformWithStateInPandas twin ≡ the batch HOF fold. Needs the
    RocksDB state store provider (a transformWithState requirement);
    conf is restored afterwards so the applyInPandasWithState tests
    keep their default provider."""
    from hudi_utility_spark.streaming.stateful import running_ewma_tws

    path, schema = events_us
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(schema).format("parquet").load(path)
        q = (
            running_ewma_tws(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("ewma_tws")
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    got = {
        r.user_id: (r.ewma, r.n_events)
        for r in spark.sql(
            """SELECT user_id, ewma, n_events FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                          ORDER BY n_events DESC) rn FROM ewma_tws)
               WHERE rn = 1"""
        ).collect()
    }
    batch = {
        r.user_id: (r.ewma, r.n_events)
        for r in running_ewma_batch(
            spark.read.schema(schema).parquet(path)
        ).collect()
    }
    assert set(got) == set(batch)
    for uid, (e, n) in batch.items():
        assert got[uid][1] == n
        assert got[uid][0] == pytest.approx(e, rel=1e-9)


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas needs google.protobuf",
)
def test_tws_sessionizer_timers_close_idle_sessions(spark, tmp_path):
    """Event-time timers: sessions that stop receiving events close when
    the watermark passes last_event+gap — emitted sessions must equal
    the batch session_window twin over the same events."""
    import datetime as dt

    from hudi_utility_spark.streaming.stateful import (
        sessionize_batch,
        sessionize_tws,
    )

    t0 = dt.datetime(2024, 1, 1)
    sec = dt.timedelta(seconds=1)
    data = [
        (1, t0),                 # user 1, session A
        (1, t0 + 10 * sec),      # extends A
        (1, t0 + 2000 * sec),    # gap > 1800s -> closes A inline, opens B
        (2, t0 + 5 * sec),       # user 2, one session
    ]
    sentinel = [(999, t0 + dt.timedelta(days=2))]
    # LTZ explicitly: the session default is TIMESTAMP_NTZ (session.py),
    # but withWatermark requires the zoned TIMESTAMP type
    schema = "user_id long, ts timestamp_ltz"
    src = str(tmp_path / "sess_src")
    spark.createDataFrame(data, schema).coalesce(1).write.parquet(src)

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(schema)
            .format("parquet")
            .load(src)
            .withWatermark("ts", "0 seconds")
        )
        q = (
            sessionize_tws(stream, gap_seconds=1800)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("sess_tws")
            .start()
        )
        q.processAllAvailable()
        # second file: far-future sentinel advances the watermark past
        # every open session's horizon -> timers fire, sessions close
        spark.createDataFrame(sentinel, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        q.stop()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

    got = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in spark.sql("SELECT * FROM sess_tws").collect()
    }
    want = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in sessionize_batch(
            spark.createDataFrame(data, schema), gap_seconds=1800
        ).collect()
    }
    assert got == want  # includes user 1's idle session B and user 2's —
    # closed by TIMERS, no further events for those keys ever arrived


def test_fold_session_events_pure():
    from hudi_utility_spark.streaming.stateful import fold_session_events

    gap = 1800_000_000
    # fresh key: one open session
    closed, cur = fold_session_events(None, [0, 10_000_000], gap)
    assert closed == [] and cur == (0, 10_000_000, 2)
    # big gap closes inline, opens new
    closed, cur = fold_session_events(cur, [2_000_000_000], gap)
    assert closed == [(0, 10_000_000, 2)] and cur == (2_000_000_000,) * 2 + (1,)
    # boundary: exactly the gap still extends
    closed, cur = fold_session_events(cur, [2_000_000_000 + gap], gap)
    assert closed == [] and cur[2] == 2
    # no events: state unchanged
    closed, cur2 = fold_session_events(cur, [], gap)
    assert closed == [] and cur2 == cur


def test_sessionize_batch_twin_matches_hand_model(spark):
    import datetime as dt

    from hudi_utility_spark.streaming.stateful import sessionize_batch

    t0 = dt.datetime(2024, 1, 1)
    sec = dt.timedelta(seconds=1)
    df = spark.createDataFrame(
        [(1, t0), (1, t0 + 10 * sec), (1, t0 + 2000 * sec), (2, t0 + 5 * sec)],
        "user_id long, ts timestamp",
    )
    got = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in sessionize_batch(df, gap_seconds=1800).collect()
    }
    # session tz is UTC, so the NTZ wall time is the instant
    us = lambda d: int(
        d.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    )
    assert got == {
        (1, us(t0), us(t0 + 10 * sec), 2),
        (1, us(t0 + 2000 * sec), us(t0 + 2000 * sec), 1),
        (2, us(t0 + 5 * sec), us(t0 + 5 * sec), 1),
    }
