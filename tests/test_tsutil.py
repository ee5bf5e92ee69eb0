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
