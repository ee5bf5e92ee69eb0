"""NTZ/LTZ timestamp helpers: tsutil.us must produce identical epochs
for NTZ and LTZ columns under the UTC session, and survive the engine's
NTZ-default session (where a string cast to "timestamp" resolves NTZ)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import (
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from hudi_utility_spark.tsutil import as_ltz, us

ROWS = [(datetime(2024, 3, 1, 12, 30, 45, 123456),), (datetime(1999, 12, 31, 23, 59, 59),)]
EXPECT = [1709296245123456, 946684799000000]


def test_us_on_ntz(spark):
    df = spark.createDataFrame(ROWS, StructType([StructField("ts", TimestampNTZType())]))
    got = [r[0] for r in df.select(us("ts").alias("e")).collect()]
    assert got == EXPECT


def test_us_on_ltz(spark):
    df = spark.createDataFrame(ROWS, StructType([StructField("ts", TimestampType())]))
    got = [r[0] for r in df.select(us("ts").alias("e")).collect()]
    assert got == EXPECT


def test_session_defaults_new_timestamps_to_ntz(spark):
    # inference (createDataFrame) and SQL timestamp literals both follow
    # spark.sql.timestampType — the property that makes engine rewrites
    # schema-compatible with the corpus' NTZ files
    assert spark.conf.get("spark.sql.timestampType") == "TIMESTAMP_NTZ"
    inferred = spark.createDataFrame(ROWS, "ts timestamp")
    assert inferred.schema["ts"].dataType.typeName() == "timestamp_ntz"
    lit = spark.sql("SELECT TIMESTAMP '2024-03-01 12:30:45' AS ts")
    assert lit.schema["ts"].dataType.typeName() == "timestamp_ntz"


def test_as_ltz_reinterprets_not_shifts(spark):
    df = spark.createDataFrame(ROWS, StructType([StructField("ts", TimestampNTZType())]))
    ltz = as_ltz(df, "ts")
    assert ltz.schema["ts"].dataType.typeName() == "timestamp"
    # UTC session: epoch identical before and after the cast
    got = [r[0] for r in ltz.select(F.unix_micros("ts").alias("e")).collect()]
    assert got == EXPECT


def test_rz_pins_negative_zero_sign(spark):
    """rz = round + 0.0 must turn a -0.0-rounding value into +0.0
    (IEEE -0.0 + 0.0 = +0.0) while leaving nonzero values alone — the
    r9 text_heaps_law flake class: a ~-1e-17 slope rounds to -0.0,
    which hash normalizers format as '-0' != '0'."""
    import math

    from hudi_utility_spark.tsutil import rz

    df = spark.createDataFrame(
        [(-1e-17,), (1e-17,), (-0.25,), (0.25,)], "x double"
    )
    got = [r[0] for r in df.select(rz("x", 6).alias("r")).collect()]
    assert got == [0.0, 0.0, -0.25, 0.25]
    # the zero results must be POSITIVE zero (copysign distinguishes)
    assert all(math.copysign(1.0, v) == 1.0 for v in got[:2])
    # contrast: DuckDB's bare ROUND preserves the negative zero (the
    # r9 driver FAIL showed duck-side '-0' vs spark-side '0'), so the
    # oracle SQL needs the same + 0.0 pin
    import duckdb

    bare = duckdb.sql("SELECT ROUND(-1e-17, 6)").fetchone()[0]
    assert math.copysign(1.0, bare) == -1.0
    pinned = duckdb.sql("SELECT ROUND(-1e-17, 6) + 0.0").fetchone()[0]
    assert math.copysign(1.0, pinned) == 1.0
