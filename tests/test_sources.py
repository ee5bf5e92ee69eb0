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
