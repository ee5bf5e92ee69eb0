"""VARIANT edge semantics: explicit JSON null vs absent path, and the
typed-extraction contract `queries/variant_q.py` relies on."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_variant_null_vs_missing_path(spark):
    df = spark.createDataFrame(
        [('{"a": null, "b": 7}',), ('{"b": 8}',)], "j string"
    ).select(F.parse_json("j").alias("v"))
    out = df.select(
        F.is_variant_null(F.try_variant_get("v", "$.a", "variant")).alias(
            "a_is_json_null"
        ),
        F.try_variant_get("v", "$.a", "bigint").alias("a_val"),
        F.try_variant_get("v", "$.missing", "bigint").alias("miss_val"),
        F.variant_get("v", "$.b", "bigint").alias("b_val"),
    ).collect()
    # row 1: "a" present as JSON null — is_variant_null true, value NULL
    assert out[0]["a_is_json_null"] is True
    assert out[0]["a_val"] is None
    # row 2: "a" absent — try_variant_get yields SQL NULL (no error);
    # is_variant_null maps that SQL NULL to False (only an explicit
    # JSON null is "variant null"), so False distinguishes absent/non-null
    assert out[1]["a_is_json_null"] is False
    assert out[1]["a_val"] is None
    # missing paths never error under try_variant_get
    assert [r["miss_val"] for r in out] == [None, None]
    assert [r["b_val"] for r in out] == [7, 8]


def test_variant_typed_cast_failure_is_null_under_try(spark):
    df = spark.createDataFrame([('{"x": "notanumber"}',)], "j string").select(
        F.parse_json("j").alias("v")
    )
    row = df.select(
        F.try_variant_get("v", "$.x", "bigint").alias("as_int"),
        F.try_variant_get("v", "$.x", "string").alias("as_str"),
    ).collect()[0]
    assert row["as_int"] is None
    assert row["as_str"] == "notanumber"
