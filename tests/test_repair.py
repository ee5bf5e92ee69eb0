from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from hudi_utility_spark.repair import (
    incomplete_partitions,
    missing_partitions,
    partition_counts,
    partitions_to_repair,
    resume_bootstrap,
)
from hudi_utility_spark.table import KeyedTable
from hudi_utility_spark.write import full_bootstrap


@pytest.fixture
def bootstrapped(spark, events, tmp_path):
    t = KeyedTable(
        path=str(tmp_path / "events_table"),
        record_key=["event_id"],
        precombine="ts",
        partition_fields=["event_type"],
    )
    full_bootstrap(spark, events, t)
    return t


def _drop_partition(table: KeyedTable, value: str) -> None:
    shutil.rmtree(f"{table.path}/event_type={value}")


def _truncate_partition(spark, table: KeyedTable, value: str) -> None:
    """Corrupt a partition: keep only 1 row (simulates a partial write)."""
    part = spark.read.parquet(f"{table.path}/event_type={value}").limit(1)
    pdf = part.toPandas()
    shutil.rmtree(f"{table.path}/event_type={value}")
    spark.createDataFrame(pdf).write.parquet(f"{table.path}/event_type={value}")


def test_partition_counts_matches_filter_count(spark, events):
    counts = {r[0]: r[1] for r in partition_counts(events, "event_type").collect()}
    for etype, cnt in counts.items():
        assert events.filter(F.col("event_type") == etype).count() == cnt


def test_missing_partitions(spark, events, bootstrapped):
    _drop_partition(bootstrapped, "click")
    dest = bootstrapped.read_base(spark)
    miss = [r[0] for r in missing_partitions(events, dest, "event_type").collect()]
    assert miss == ["click"]


def test_incomplete_partitions(spark, events, bootstrapped):
    _truncate_partition(spark, bootstrapped, "view")
    dest = bootstrapped.read_base(spark)
    rows = incomplete_partitions(events, dest, "event_type").collect()
    assert [r.event_type for r in rows] == ["view"]
    assert rows[0].src_cnt > rows[0].dst_cnt == 1


def test_resume_repairs_exactly_the_damage(spark, events, bootstrapped):
    _drop_partition(bootstrapped, "click")
    _truncate_partition(spark, bootstrapped, "view")
    result = resume_bootstrap(spark, events, bootstrapped)
    assert sorted(result["repaired_partitions"]) == ["click", "view"]
    # table fully healed
    assert bootstrapped.read(spark).count() == events.count()
    counts = {
        r[0]: r[1]
        for r in partition_counts(bootstrapped.read(spark), "event_type").collect()
    }
    src = {r[0]: r[1] for r in partition_counts(events, "event_type").collect()}
    assert counts == src


def test_resume_is_idempotent(spark, events, bootstrapped):
    _drop_partition(bootstrapped, "click")
    resume_bootstrap(spark, events, bootstrapped)
    second = resume_bootstrap(spark, events, bootstrapped)
    assert second["noop"] and second["repaired_partitions"] == []


def test_resume_on_intact_table_is_noop(spark, events, bootstrapped):
    result = resume_bootstrap(spark, events, bootstrapped)
    assert result["noop"]


def test_partitions_to_repair_union(spark, events, bootstrapped):
    _drop_partition(bootstrapped, "click")
    _truncate_partition(spark, bootstrapped, "purchase")
    dest = bootstrapped.read_base(spark)
    assert partitions_to_repair(events, dest, "event_type") == ["click", "purchase"]


def test_resume_on_timestamp_partitioned_ntz_table(spark, events, tmp_path):
    """The reference's signature scenario (pyspark_script.py:392-401) on
    timestamp-partitioned NTZ data: bootstrap events partitioned by the
    event *date* (derived from the TIMESTAMP_NTZ ts), drop one date
    partition, corrupt another, resume, and verify the engine-rewritten
    partitions merge cleanly with the original NTZ files (the r1
    NTZ-vs-LTZ CANNOT_MERGE_INCOMPATIBLE_DATA_TYPE regression)."""
    dated = events.withColumn("event_date", F.to_date("ts").cast("string"))
    t = KeyedTable(
        path=str(tmp_path / "events_by_date"),
        record_key=["event_id"],
        precombine="ts",
        partition_fields=["event_date"],
    )
    full_bootstrap(spark, dated, t)
    dates = sorted(
        r[0] for r in dated.select("event_date").distinct().collect()
    )
    assert len(dates) >= 2, "need at least two date partitions"
    dropped, truncated = dates[0], dates[-1]

    shutil.rmtree(f"{t.path}/event_date={dropped}")
    # corrupt: rewrite one partition through a round-trip (pandas →
    # createDataFrame) — the exact path that used to come back LTZ and
    # explode on the mergeSchema re-read
    part = spark.read.parquet(f"{t.path}/event_date={truncated}").limit(1)
    pdf = part.toPandas()
    shutil.rmtree(f"{t.path}/event_date={truncated}")
    spark.createDataFrame(pdf).write.parquet(f"{t.path}/event_date={truncated}")

    # the re-read (mergeSchema over original + rewritten files) must not
    # raise, and ts must still be NTZ end-to-end
    merged = t.read_base(spark)
    assert merged.schema["ts"].dataType.typeName() == "timestamp_ntz"

    result = resume_bootstrap(spark, dated, t)
    assert sorted(result["repaired_partitions"]) == sorted([dropped, truncated])
    healed = t.read(spark)
    assert healed.count() == events.count()
    assert healed.schema["ts"].dataType.typeName() == "timestamp_ntz"


def test_resume_from_ltz_default_session_aligns_timestamps(spark, events, tmp_path):
    """A caller driving the engine with a vanilla LTZ-default session
    must still be able to repair an NTZ table: the repair write aligns
    rewritten partitions to the destination's timestamp flavor, so the
    mergeSchema re-read never sees NTZ-vs-LTZ. Simulated by flipping the
    session default to TIMESTAMP (LTZ) around the resume."""
    t = KeyedTable(
        path=str(tmp_path / "events_ltz_repair"),
        record_key=["event_id"],
        precombine="ts",
        partition_fields=["event_type"],
    )
    full_bootstrap(spark, events, t)
    assert t.read_base(spark).schema["ts"].dataType.typeName() == "timestamp_ntz"
    _drop_partition(t, "click")

    prev = spark.conf.get("spark.sql.timestampType")
    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_LTZ")
    try:
        # under an LTZ-default session the source frame still reads NTZ
        # from parquet, but any session-created timestamps would be LTZ;
        # force the worst case by round-tripping ts through an LTZ cast
        from pyspark.sql.types import TimestampType

        ltz_source = events.withColumn("ts", F.col("ts").cast(TimestampType()))
        assert ltz_source.schema["ts"].dataType.typeName() == "timestamp"
        result = resume_bootstrap(spark, ltz_source, t)
        assert result["repaired_partitions"] == ["click"]
    finally:
        spark.conf.set("spark.sql.timestampType", prev)

    healed = t.read_base(spark)  # mergeSchema read across old + new files
    assert healed.count() == events.count()
    assert healed.schema["ts"].dataType.typeName() == "timestamp_ntz"


def test_file_layout_report_matches_filesystem(spark, events, tmp_path):
    import os

    from hudi_utility_spark.repair import file_layout_report
    from hudi_utility_spark.table import KeyedTable
    from hudi_utility_spark.write import full_bootstrap

    t = KeyedTable(
        path=str(tmp_path / "layout"),
        record_key=["event_id"],
        precombine="ts",
        partition_fields=["event_type"],
    )
    full_bootstrap(spark, events, t)
    got = {
        r["event_type"]: (r["n_files"], r["bytes"], r["small_files"])
        for r in file_layout_report(spark, t).collect()
    }
    want = {}
    for d in os.listdir(t.base_path):
        if not d.startswith("event_type="):
            continue
        files = [
            os.path.join(t.base_path, d, f)
            for f in os.listdir(os.path.join(t.base_path, d))
            if f.endswith(".parquet")
        ]
        want[d.split("=", 1)[1]] = (len(files), sum(os.path.getsize(f) for f in files))
    assert {k: v[:2] for k, v in got.items()} == want
    # sf0.001 parquet partitions are tiny -> all flagged small
    assert all(v[2] for v in got.values())


# ---------------------------------------------------------------------------
# anti-entropy: content fingerprints + fingerprint-verified repair


def test_content_diff_catches_same_count_corruption(spark, events, bootstrapped):
    """In-place corruption with identical row counts is invisible to the
    J2 count audit but must show as 'divergent' in the fingerprint diff."""
    from hudi_utility_spark.repair import content_diff

    t = bootstrapped
    # rewrite 'click' with shifted user_ids — same cardinality
    part = spark.read.parquet(f"{t.path}/event_type=click")
    pdf = part.toPandas()
    pdf["user_id"] = pdf["user_id"] + 1
    shutil.rmtree(f"{t.path}/event_type=click")
    spark.createDataFrame(pdf).write.parquet(f"{t.path}/event_type=click")
    spark.catalog.refreshByPath(t.path)

    dest = t.read_base(spark)
    # count audit: blind to it
    assert incomplete_partitions(events, dest, "event_type").count() == 0
    st = {
        r["event_type"]: r["status"]
        for r in content_diff(
            events, dest, "event_type", ["event_id", "user_id"]
        ).collect()
    }
    assert st["click"] == "divergent"
    assert all(v == "match" for k, v in st.items() if k != "click")


def test_anti_entropy_repair_heals_all_drift_modes(spark, events, bootstrapped):
    from hudi_utility_spark.repair import anti_entropy_repair, content_diff

    t = bootstrapped
    # divergent: same-count corruption of 'click'
    part = spark.read.parquet(f"{t.path}/event_type=click")
    pdf = part.toPandas()
    pdf["value"] = pdf["value"] + 1.0
    shutil.rmtree(f"{t.path}/event_type=click")
    spark.createDataFrame(pdf).write.parquet(f"{t.path}/event_type=click")
    # missing: drop 'signup'
    _drop_partition(t, "signup")
    # extra: fabricate a partition the source never had
    spark.read.parquet(f"{t.path}/event_type=view").write.parquet(
        f"{t.path}/event_type=zombie"
    )
    spark.catalog.refreshByPath(t.path)

    hash_cols = ["event_id", "user_id", "value"]
    rep = anti_entropy_repair(spark, events, t, hash_cols)
    assert rep["rewritten"] == ["click", "signup"]
    assert rep["dropped"] == ["zombie"]

    st = content_diff(
        events, t.read_base(spark), "event_type", hash_cols
    ).collect()
    assert {r["status"] for r in st} == {"match"}

    # idempotent: second run is a no-op
    rep2 = anti_entropy_repair(spark, events, t, hash_cols)
    assert rep2["noop"] is True


def test_anti_entropy_repair_dry_run_writes_nothing(spark, events, bootstrapped):
    from hudi_utility_spark.repair import anti_entropy_repair, content_diff

    t = bootstrapped
    _drop_partition(t, "error")
    spark.catalog.refreshByPath(t.path)
    rep = anti_entropy_repair(
        spark, events, t, ["event_id", "user_id"], dry_run=True
    )
    assert rep["rewritten"] == ["error"] and rep["dry_run"] is True
    st = {
        r["event_type"]: r["status"]
        for r in content_diff(
            events, t.read_base(spark), "event_type", ["event_id", "user_id"]
        ).collect()
    }
    assert st["error"] == "missing"
