from __future__ import annotations

import pytest

from hudi_utility_spark.table import KeyedTable
from hudi_utility_spark.validate import (
    BootstrapRequest,
    ValidationError,
    ensure_valid,
    reconcile,
    schema_diff,
    validate_fields_in_schema,
    validate_request,
)
from hudi_utility_spark.write import full_bootstrap


def _req(sf_dir, tmp_path, **over):
    base = dict(
        data_file_path=f"{sf_dir}/events.parquet",
        table_name="events",
        record_key=["event_id"],
        precombine="ts",
        output_path=str(tmp_path / "out"),
        partition_fields=["event_type"],
    )
    base.update(over)
    return BootstrapRequest(**base)


def test_valid_request_passes(sf_dir, tmp_path):
    assert validate_request(_req(sf_dir, tmp_path)) == []


def test_errors_accumulate(sf_dir, tmp_path):
    req = _req(
        sf_dir,
        tmp_path,
        data_file_path="/no/such/path",
        table_name="",
        record_key=[],
        table_type="BOGUS",
        bootstrap_type="NOPE",
    )
    errors = validate_request(req)
    assert len(errors) == 5
    with pytest.raises(ValidationError) as exc:
        ensure_valid(req)
    assert "Configuration Error:" in str(exc.value)


def test_partition_regex_requires_partitions(sf_dir, tmp_path):
    req = _req(sf_dir, tmp_path, partition_fields=[], partition_regex="x.*")
    assert any("partition_regex" in e for e in validate_request(req))


def test_fields_in_schema(spark, events, tmp_path):
    t = KeyedTable(
        path=str(tmp_path / "t"),
        record_key=["event_id", "nope"],
        precombine="missing_ts",
        partition_fields=["event_type", "ghost"],
    )
    errors = validate_fields_in_schema(events, t)
    assert len(errors) == 3
    assert any("nope" in e for e in errors)
    assert any("missing_ts" in e for e in errors)
    assert any("ghost" in e for e in errors)


def test_schema_diff_ignores_meta_columns(spark):
    from pyspark.sql import functions as F

    a = spark.createDataFrame([(1, "x")], "id long, v string")
    b = a.withColumn("_hoodie_like_meta", F.lit("m"))
    assert schema_diff(a, b) == []


def test_schema_diff_detects_mismatch(spark):
    a = spark.createDataFrame([(1, "x")], "id long, v string")
    b = spark.createDataFrame([(1, 2.0)], "id long, v double")
    c = spark.createDataFrame([(1,)], "id long")
    assert any("type mismatch" in e for e in schema_diff(a, b))
    assert any("missing in destination" in e for e in schema_diff(a, c))


def test_reconcile_pass_and_fail(spark, events, tmp_path):
    t = KeyedTable(
        path=str(tmp_path / "rt"),
        record_key=["event_id"],
        precombine="ts",
        partition_fields=["event_type"],
    )
    full_bootstrap(spark, events, t)
    out = reconcile(spark, events, t)
    assert out["source_count"] == out["dest_count"] == events.count()
    # now claim a bigger source → count mismatch must raise
    bigger = events.union(events.limit(1))
    with pytest.raises(ValidationError, match="count mismatch"):
        reconcile(spark, bigger, t)


def test_table_diff_classifies_and_drops_matches(spark):
    from hudi_utility_spark.validate import table_diff

    left = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, None, 4.0)],
        "id long, s string, v double",
    )
    right = spark.createDataFrame(
        [
            (1, "a", 1.0),      # identical -> dropped
            (2, "b", None),     # identical incl. NULL -> dropped (null-safe)
            (3, "c", 99.0),     # changed
            (5, "e", 5.0),      # added
        ],
        "id long, s string, v double",
    )
    got = {
        r["id"]: r["change_type"] for r in table_diff(left, right, ["id"]).collect()
    }
    assert got == {3: "changed", 4: "removed", 5: "added"}


def test_table_diff_restricts_to_compare_cols(spark):
    from hudi_utility_spark.validate import table_diff

    left = spark.createDataFrame([(1, "a", 1.0)], "id long, s string, v double")
    right = spark.createDataFrame([(1, "a", 9.0)], "id long, s string, v double")
    # v excluded -> rows agree
    assert table_diff(left, right, ["id"], compare_cols=["s"]).isEmpty()
