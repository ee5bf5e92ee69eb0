"""Python Data Source connector (sources.py): planning, pushdown
pruning, Arrow read path, determinism, and cross-engine formula parity."""

from __future__ import annotations

import pytest
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    In,
    LessThan,
)

from hudi_utility_spark.sources import (
    SYNTH_LANGS,
    SynthDocsReader,
    register_sources,
    synth_row,
)


@pytest.fixture(scope="module")
def synth(spark):
    register_sources(spark)
    return (
        spark.read.format("synth_docs")
        .option("rows", 600)
        .option("rowsPerShard", 100)
        .load()
    )


def test_full_scan_count_and_schema(synth):
    assert synth.count() == 600
    assert [f.name for f in synth.schema.fields] == [
        "doc_id", "shard", "lang", "n_chars", "quality", "text",
    ]


def test_rows_match_formula(synth):
    got = {r.doc_id: r for r in synth.collect()}
    assert len(got) == 600
    for i in (0, 17, 599):
        _, _, lang, n_chars, quality, text = synth_row(i)
        r = got[i]
        assert (r.lang, r.n_chars, r.quality, r.text) == (
            lang, n_chars, quality, text,
        )
        assert r.shard == i // 100


def test_deterministic_across_reads(synth):
    a = sorted(map(tuple, synth.collect()))
    b = sorted(map(tuple, synth.collect()))
    assert a == b


def test_filtered_read_correct(synth):
    assert synth.filter("doc_id >= 550").count() == 50
    assert synth.filter("shard = 2").count() == 100
    langs = {r.lang for r in synth.select("lang").distinct().collect()}
    assert langs <= set(SYNTH_LANGS)


def test_pushdown_prunes_partitions_unit():
    """pushFilters narrows partitions() — planning-level pruning,
    independent of Spark."""
    r = SynthDocsReader({"rows": "600", "rowsPerShard": "100"})
    leftover = list(r.pushFilters([GreaterThanOrEqual(("doc_id",), 550)]))
    assert len(leftover) == 1  # every filter is returned for re-eval
    parts = r.partitions()
    assert len(parts) == 1 and parts[0].start == 550 and parts[0].end == 600

    r2 = SynthDocsReader({"rows": "600", "rowsPerShard": "100"})
    list(r2.pushFilters([In(("shard",), (1, 3))]))
    assert [p.shard for p in r2.partitions()] == [1, 3]

    r3 = SynthDocsReader({"rows": "600", "rowsPerShard": "100"})
    list(r3.pushFilters([EqualTo(("shard",), 2), LessThan(("doc_id",), 150)]))
    # shard 2 spans [200, 300) but doc_id < 150 — nothing left to plan;
    # reader must still return the mandatory stub partition
    parts = r3.partitions()
    assert len(parts) == 1 and parts[0].start == parts[0].end


def test_pushdown_empty_plan_returns_zero_rows(synth):
    assert synth.filter("shard = 2 AND doc_id < 150").count() == 0


# ---------------------------------------------------------------------------
# streaming source


def test_synth_events_stream_reaches_cap_exactly_once(spark, tmp_path):
    from hudi_utility_spark.sources import synth_event

    register_sources(spark)
    stream = (
        spark.readStream.format("synth_events")
        .option("rowsPerBatch", 70)
        .option("maxRows", 300)
        .load()
    )
    # Fresh-checkpoint retry (same policy as the src_synth_stream gate
    # query): on a saturated box the streaming-source worker can miss
    # its connect-back deadline and the stream dies in INITIALIZING —
    # a host-load artifact, not a source defect. Each attempt uses its
    # own checkpoint + sink name so a retry never resumes a dead run.
    last_exc: Exception | None = None
    for attempt in range(3):
        sink = f"synth_ev_{attempt}"
        q = (
            stream.writeStream.format("memory")
            .queryName(sink)
            .option("checkpointLocation", str(tmp_path / f"ckpt{attempt}"))
            .start()
        )
        try:
            q.processAllAvailable()
            last_exc = None
            break
        except Exception as exc:  # noqa: BLE001 — retried, re-raised below
            last_exc = exc
        finally:
            q.stop()
    if last_exc is not None:
        raise last_exc
    rows = spark.sql(f"SELECT * FROM {sink}").collect()
    assert len(rows) == 300  # cap respected, nothing duplicated
    got = {r.event_id: (r.user_id, r.event_type, r.value) for r in rows}
    for i in (0, 123, 299):
        eid, uid, etype, val = synth_event(i)
        assert got[i] == (uid, etype, val)


def test_synth_events_replay_is_deterministic():
    from hudi_utility_spark.sources import SynthEventsStreamReader

    r = SynthEventsStreamReader({"rowsPerBatch": "50", "maxRows": "200"})
    assert r.initialOffset() == {"i": 0}
    batch, nxt = r.read({"i": 0})
    first = list(batch)
    assert nxt == {"i": 50} and len(first) == 50
    # failure replay: re-reading the committed range is byte-identical
    assert list(r.readBetweenOffsets({"i": 0}, {"i": 50})) == first


# ---------------------------------------------------------------------------
# transactional JSONL export writer


def test_jsonl_export_commit_protocol(spark, tmp_path, synth):
    import json
    import os

    out = str(tmp_path / "export")
    os.makedirs(out)
    synth.limit(0)  # no-op, keep fixture warm
    df = synth.select("doc_id", "lang", "n_chars").filter("doc_id < 150")
    df.write.format("jsonl_export").mode("append").save(out)

    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    files = manifest["files"]
    assert sum(f["rows"] for f in files) == 150
    rows = []
    for f in files:
        with open(os.path.join(out, f["file"])) as fh:
            rows += [json.loads(line) for line in fh]
    assert len(rows) == 150
    assert {r["doc_id"] for r in rows} == set(range(150))
    # staging dir removed entirely after commit
    assert not os.path.exists(os.path.join(out, "_staging"))


def test_jsonl_export_overwrite_replaces_prior_parts(spark, tmp_path, synth):
    """mode('overwrite') must NOT behave as append: prior part files and
    the prior manifest are cleared before the new files land, and the
    fresh manifest lists only the new write."""
    import json
    import os

    out = str(tmp_path / "ow_export")
    os.makedirs(out)
    synth.select("doc_id").filter("doc_id < 100").write.format(
        "jsonl_export"
    ).mode("append").save(out)
    first_files = {
        f for f in os.listdir(out) if f.endswith(".jsonl")
    }
    assert first_files

    synth.select("doc_id").filter(
        "doc_id >= 100 AND doc_id < 130"
    ).write.format("jsonl_export").mode("overwrite").save(out)

    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert sum(f["rows"] for f in manifest["files"]) == 30
    on_disk = {f for f in os.listdir(out) if f.endswith(".jsonl")}
    # no stale parts survive, manifest matches the directory exactly
    assert on_disk == {f["file"] for f in manifest["files"]}
    assert on_disk.isdisjoint(first_files)
    rows = []
    for f in manifest["files"]:
        with open(os.path.join(out, f["file"])) as fh:
            rows += [json.loads(line) for line in fh]
    assert {r["doc_id"] for r in rows} == set(range(100, 130))
    assert not os.path.exists(os.path.join(out, "_staging"))


def test_jsonl_export_append_merges_manifest(spark, tmp_path, synth):
    """Two appends: the second commit's manifest carries BOTH writes'
    files, so manifest readers see the full committed set."""
    import json
    import os

    out = str(tmp_path / "ap_export")
    os.makedirs(out)
    synth.select("doc_id").filter("doc_id < 40").write.format(
        "jsonl_export"
    ).mode("append").save(out)
    synth.select("doc_id").filter(
        "doc_id >= 40 AND doc_id < 70"
    ).write.format("jsonl_export").mode("append").save(out)

    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert sum(f["rows"] for f in manifest["files"]) == 70
    rows = []
    for f in manifest["files"]:
        with open(os.path.join(out, f["file"])) as fh:
            rows += [json.loads(line) for line in fh]
    assert {r["doc_id"] for r in rows} == set(range(70))


def test_jsonl_export_abort_leaves_no_final_files(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    register_sources(spark)
    out = str(tmp_path / "abort_export")
    os.makedirs(out)
    df = spark.range(10).select(
        F.col("id"),
        F.when(F.col("id") < 5, F.lit(1)).otherwise(
            F.expr("CAST(raise_error('boom') AS INT)")
        ).alias("x"),
    )
    with pytest.raises(Exception):
        df.write.format("jsonl_export").mode("append").save(out)
    # abort ran: no _SUCCESS, no committed jsonl files
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))
    assert [f for f in os.listdir(out) if f.endswith(".jsonl")] == []
