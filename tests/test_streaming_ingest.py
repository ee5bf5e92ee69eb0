"""Streaming upsert ingest: micro-batches land with batch-upsert
semantics (latest precombine wins), replay is idempotent."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hudi_utility_spark.streaming.ingest import stream_upsert
from hudi_utility_spark.table import KeyedTable, TableType


def _table(tmp_path, table_type=TableType.COPY_ON_WRITE):
    return KeyedTable(
        name="stream_events",
        path=str(tmp_path / "stream_events"),
        record_key=["event_id"],
        precombine="ts",
        partition_fields=["event_type"],
        table_type=table_type,
    )


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    ).write.mode("append").parquet(path)


@pytest.mark.parametrize("ttype", [TableType.COPY_ON_WRITE, TableType.MERGE_ON_READ])
def test_stream_upsert_latest_wins_and_replay_idempotent(spark, tmp_path, ttype):
    src = str(tmp_path / "src")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    # batch 1: two keys; batch 2 (same file dir, later file): key 1 updated
    _write_batch(
        spark,
        src,
        [(1, t0, "click", 1.0), (2, t0, "view", 2.0)],
    )
    table = _table(tmp_path, ttype)
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value double"
        )
        .parquet(src)
    )
    q = stream_upsert(
        spark, stream, table, str(tmp_path / "ckpt"), trigger_once=True
    )
    q.awaitTermination(120)

    _write_batch(
        spark,
        src,
        [
            (1, t0 + dt.timedelta(minutes=5), "click", 10.0),
            (1, t0 + dt.timedelta(minutes=1), "click", 5.0),  # older dup in batch
            (3, t0, "purchase", 3.0),
        ],
    )
    q = stream_upsert(
        spark, stream, table, str(tmp_path / "ckpt"), trigger_once=True
    )
    q.awaitTermination(120)

    snap = {r.event_id: r.value for r in table.read(spark).collect()}
    assert snap == {1: 10.0, 2: 2.0, 3: 3.0}

    # replay with a fresh checkpoint (worst-case duplicate delivery):
    # same rows re-upserted, snapshot unchanged
    q = stream_upsert(
        spark, stream, table, str(tmp_path / "ckpt2"), trigger_once=True
    )
    q.awaitTermination(120)
    snap2 = {r.event_id: r.value for r in table.read(spark).collect()}
    assert snap2 == snap


def test_stream_dedup_ingest_rejects_cross_batch_duplicates(spark, tmp_path):
    from hudi_utility_spark.streaming.ingest import stream_dedup_ingest

    src = str(tmp_path / "docs_src")
    store = str(tmp_path / "fp_store")
    schema = "doc_id long, batch long, text string"
    table = KeyedTable(
        name="stream_docs",
        path=str(tmp_path / "stream_docs"),
        record_key=["doc_id"],
        precombine="batch",
        partition_fields=[],
        table_type=TableType.COPY_ON_WRITE,
    )

    def run_once(ckpt):
        stream = spark.readStream.schema(schema).parquet(src)
        q = stream_dedup_ingest(
            spark, stream, table, store, str(tmp_path / ckpt), trigger_once=True
        )
        q.awaitTermination(120)

    # batch 1: two docs, one internal duplicate pair (11 dups 10)
    spark.createDataFrame(
        [(10, 1, "alpha beta"), (11, 1, "alpha  BETA!"), (12, 1, "gamma delta")],
        schema,
    ).write.mode("append").parquet(src)
    run_once("ck1")
    got1 = {r.doc_id for r in table.read(spark).collect()}
    assert got1 == {10, 12}

    # batch 2: duplicate of an already-ingested doc + one new doc
    spark.createDataFrame(
        [(20, 2, "gamma   delta"), (21, 2, "epsilon zeta")], schema
    ).write.mode("append").parquet(src)
    run_once("ck1")
    got2 = {r.doc_id for r in table.read(spark).collect()}
    assert got2 == {10, 12, 21}

    # replay from a fresh checkpoint: everything already in the store —
    # the table must not change
    run_once("ck_replay")
    got3 = {r.doc_id for r in table.read(spark).collect()}
    assert got3 == got2


def test_stream_neardedup_ingest_rejects_near_copies_across_batches(spark, tmp_path):
    from hudi_utility_spark.streaming.ingest import stream_neardedup_ingest

    src = str(tmp_path / "near_src")
    store = str(tmp_path / "band_store")
    schema = "doc_id long, batch long, text string"
    table = KeyedTable(
        name="stream_near_docs",
        path=str(tmp_path / "stream_near_docs"),
        record_key=["doc_id"],
        precombine="batch",
        partition_fields=[],
        table_type=TableType.COPY_ON_WRITE,
    )
    base = ("the quick brown fox jumps over the lazy dog and then "
            "wanders far across the wide open field before resting")
    other = ("completely different content about distributed query "
             "engines shuffling partitioned columnar data at scale")

    def run_once(ckpt):
        stream = spark.readStream.schema(schema).parquet(src)
        q = stream_neardedup_ingest(
            spark, stream, table, store, str(tmp_path / ckpt), trigger_once=True
        )
        q.awaitTermination(120)

    spark.createDataFrame([(1, 1, base), (2, 1, other)], schema).write.mode(
        "append"
    ).parquet(src)
    run_once("ck1")
    assert {r.doc_id for r in table.read(spark).collect()} == {1, 2}

    # batch 2: a NEAR copy of doc 1 (one word changed — exact
    # fingerprints would admit it) plus a genuinely new doc
    near = base.replace("lazy", "sleepy")
    fresh = ("novel text with entirely unrelated vocabulary discussing "
             "oceanic currents and atmospheric pressure gradients")
    spark.createDataFrame([(3, 2, near), (4, 2, fresh)], schema).write.mode(
        "append"
    ).parquet(src)
    run_once("ck1")
    assert {r.doc_id for r in table.read(spark).collect()} == {1, 2, 4}

    # replay everything from a fresh checkpoint: store already carries
    # all admitted bands — the table must not change
    run_once("ck_replay")
    assert {r.doc_id for r in table.read(spark).collect()} == {1, 2, 4}


def test_stream_scd2_maintenance_matches_batch_and_replays_as_noop(
    spark, tmp_path
):
    from hudi_utility_spark.scd import scd2_from_history
    from hudi_utility_spark.streaming.ingest import stream_scd2_maintenance

    src = str(tmp_path / "scd_src")
    dim_path = str(tmp_path / "scd_dim")
    t0 = dt.datetime(2024, 1, 1)

    def run(ckpt):
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value double"
        ).parquet(src)
        q = stream_scd2_maintenance(
            spark,
            stream,
            dim_path,
            keys=["event_id"],
            ts_col="ts",
            tracked=["event_type"],
            checkpoint_dir=str(tmp_path / ckpt),
            trigger_once=True,
        )
        q.awaitTermination(120)

    # batch 1 seeds; batch 2 carries a run-extension, a change, and a
    # multi-version key (two changes in one batch)
    _write_batch(spark, src, [(1, t0, "click", 0.0), (2, t0, "view", 0.0)])
    run("ck1")
    _write_batch(
        spark,
        src,
        [
            (1, t0 + dt.timedelta(hours=1), "click", 0.0),  # same attr: extends
            (2, t0 + dt.timedelta(hours=1), "purchase", 0.0),  # closes+opens
            (2, t0 + dt.timedelta(hours=2), "view", 0.0),  # second change
            (3, t0 + dt.timedelta(hours=1), "signup", 0.0),  # new key
        ],
    )
    run("ck1")

    history = spark.read.schema(
        "event_id long, ts timestamp, event_type string, value double"
    ).parquet(src)
    expected = scd2_from_history(history, ["event_id"], "ts", ["event_type"])
    got = spark.read.parquet(dim_path)
    assert got.exceptAll(expected).isEmpty() and expected.exceptAll(got).isEmpty()

    # fresh checkpoint replays every file: the newer-than-current filter
    # must make the whole replay a no-op
    run("ck2")
    again = spark.read.parquet(dim_path)
    assert again.exceptAll(expected).isEmpty() and expected.exceptAll(again).isEmpty()
