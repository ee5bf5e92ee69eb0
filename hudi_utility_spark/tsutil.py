"""Timestamp helpers that are safe for both TIMESTAMP and TIMESTAMP_NTZ.

The corpus parquet stores µs timestamps without a timezone flag, which
Spark 4 reads as ``TIMESTAMP_NTZ``; ``F.unix_micros`` only accepts
``TIMESTAMP`` (LTZ). With the session timezone pinned to UTC (session.py)
the NTZ→LTZ cast is a pure reinterpretation — the resulting epoch equals
DuckDB's ``epoch_us()`` of the same naive timestamp bit-for-bit.

The cast target is the ``TimestampType()`` *object*, not the string
``"timestamp"``: the string form is resolved through the SQL parser, which
honors ``spark.sql.timestampType`` and would resolve back to NTZ under the
engine's NTZ-default session, re-breaking ``unix_micros``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType


def us(col: Column | str) -> Column:
    """Epoch microseconds of a timestamp column (NTZ- or LTZ-typed)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast(TimestampType()))


def as_ltz(df, *cols: str):
    """Cast the named timestamp columns to LTZ ``TimestampType``.

    Structured Streaming event time (``withWatermark``) only accepts
    TIMESTAMP, not TIMESTAMP_NTZ (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE);
    under the engine's UTC session the cast is a pure reinterpretation,
    so downstream ``us()`` epochs are unchanged.
    """
    for c in cols:
        df = df.withColumn(c, F.col(c).cast(TimestampType()))
    return df


def rz(col: Column | str, scale: int) -> Column:
    """Round with a pinned zero sign: ``round(col, scale) + 0.0``.

    A regression slope / correlation / difference statistic that is
    ~±1e-17 on a given corpus has a SIGN that depends on float
    partial-sum order, which varies with partitioning and parallelism;
    ``F.round`` preserves ``-0.0`` and hash normalizers format ``-0``
    ≠ ``0``. IEEE ``-0.0 + 0.0 = +0.0`` pins the sign without changing
    any nonzero value. Oracle SQL must mirror with ``ROUND(...) + 0.0``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, scale) + F.lit(0.0)
