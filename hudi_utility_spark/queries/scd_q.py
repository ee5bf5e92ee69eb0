"""Oracle-checked SCD Type 2 queries: dimension build from a change
history, incremental apply (pinned equal to the batch rebuild), and the
as-of dimension enrichment join — the versioned-table counterpart of the
reference's latest-wins upsert semantics (`pyspark_script.py:360-370`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hudi_utility_spark import tsutil
from hudi_utility_spark.queries import query
from hudi_utility_spark.scd import (
    EFF_FROM,
    EFF_TO,
    IS_CURRENT,
    asof_dimension_join,
    scd2_apply,
    scd2_from_history,
)
from hudi_utility_spark.tables import load_table

# forward-only split boundary inside the events table's fixed Jan-2024
# span (TESTDATA.md): everything before is "history", after is "changes"
_BOUNDARY = "2024-01-16 00:00:00"

_DIM_SQL = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
), pts AS (
  SELECT user_id, event_type, ts, event_id FROM ordered
  WHERE prev_type IS DISTINCT FROM event_type
), spans AS (
  SELECT user_id, event_type,
         epoch_us(ts) AS eff_from_us,
         epoch_us(LEAD(ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)) AS eff_to_us
  FROM pts
)
SELECT user_id, event_type, eff_from_us, eff_to_us,
       (eff_to_us IS NULL) AS is_current
FROM spans
"""


def _with_epochs(dim: DataFrame) -> DataFrame:
    return dim.select(
        "user_id",
        "event_type",
        tsutil.us(EFF_FROM).alias("eff_from_us"),
        tsutil.us(EFF_TO).alias("eff_to_us"),
        F.col(IS_CURRENT).alias("is_current"),
    )


@query("scd2_user_dimension", _DIM_SQL)
def scd2_user_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 build over the full events history: per user, runs of equal
    ``event_type`` compress to one version row with an effective span.
    One key shuffle; the lag filter and lead window share the exchange."""
    events = load_table(spark, sf_dir, "events")
    dim = scd2_from_history(
        events, ["user_id"], "ts", ["event_type"], tiebreak=["event_id"]
    )
    return _with_epochs(dim)


@query("scd2_incremental_apply", _DIM_SQL)
def scd2_incremental_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 maintenance: build the dimension from the first
    half-month, then ``scd2_apply`` the second half. The oracle is the
    BATCH rebuild over the full history — the incremental path must be
    indistinguishable from recomputing from scratch (closed versions
    untouched, current versions extended or closed at the first
    differing change). Cost of the apply is O(current + changes),
    independent of closed-history size."""
    events = load_table(spark, sf_dir, "events")
    boundary = F.to_timestamp(F.lit(_BOUNDARY))
    hist = events.filter(F.col("ts") < boundary)
    changes = events.filter(F.col("ts") >= boundary)
    dim = scd2_from_history(
        hist, ["user_id"], "ts", ["event_type"], tiebreak=["event_id"]
    )
    merged = scd2_apply(
        dim, changes, ["user_id"], "ts", ["event_type"], tiebreak=["event_id"]
    )
    return _with_epochs(merged)


@query(
    "scd2_asof_enrich",
    f"""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events WHERE ts < TIMESTAMP '{_BOUNDARY}'
    ), pts AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev_type IS DISTINCT FROM event_type
    ), dim AS (
      SELECT user_id, event_type,
             ts AS eff_from,
             LEAD(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS eff_to
      FROM pts
    ), facts AS (
      SELECT event_id, user_id, ts FROM events
      WHERE ts >= TIMESTAMP '{_BOUNDARY}'
    )
    SELECT f.event_id, f.user_id, epoch_us(f.ts) AS ts_us,
           d.event_type AS asof_type,
           epoch_us(d.eff_from) AS eff_from_us
    FROM facts f LEFT JOIN dim d
      ON f.user_id = d.user_id AND f.ts >= d.eff_from
         AND (d.eff_to IS NULL OR f.ts < d.eff_to)
    """,
)
def scd2_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of dimension join: each second-half event picks up the
    dimension version effective at its timestamp (here: the version
    current at the boundary, since the dim is frozen at the split). The
    span predicate rides the key equi-join as a residual condition —
    one shuffle, broadcastable dimension."""
    events = load_table(spark, sf_dir, "events")
    boundary = F.to_timestamp(F.lit(_BOUNDARY))
    dim = scd2_from_history(
        events.filter(F.col("ts") < boundary),
        ["user_id"],
        "ts",
        ["event_type"],
        tiebreak=["event_id"],
    )
    facts = events.filter(F.col("ts") >= boundary).select(
        "event_id", "user_id", "ts"
    )
    joined = asof_dimension_join(facts, dim, ["user_id"], "ts")
    return joined.select(
        "event_id",
        "user_id",
        tsutil.us("ts").alias("ts_us"),
        F.col("event_type").alias("asof_type"),
        tsutil.us(EFF_FROM).alias("eff_from_us"),
    )
