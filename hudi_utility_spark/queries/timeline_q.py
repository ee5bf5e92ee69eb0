"""Oracle-checked incremental-read query over the commit timeline.

Builds a real keyed table in a scratch dir from the events source, runs
two upserts at known instants, and reads the delta — the full
write→stamp→incremental lifecycle under the driver's hash check.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hudi_utility_spark import timeline
from hudi_utility_spark.queries import query
from hudi_utility_spark.table import KeyedTable, TableType
from hudi_utility_spark.tables import load_table
from hudi_utility_spark.write import upsert

T1, T2 = "20260101000000001", "20260102000000001"


@query(
    "timeline_incremental_read",
    oracle="""
    SELECT event_id, event_type, ROUND(value + 1000, 2) AS value
    FROM events WHERE event_type = 'click'
    """,
)
def timeline_incremental_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental read: bootstrap-upsert all events at T1, upsert a
    modified click slice at T2, read the (T1, T2] window — exactly the
    modified records come back, which is what lets a downstream consumer
    of a 100 TB table process deltas instead of snapshots."""
    root = os.path.join(
        tempfile.gettempdir(),
        "hudi_utility_spark_q",
        f"timeline_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(root, ignore_errors=True)
    table = KeyedTable(
        path=root,
        record_key=["event_id"],
        precombine="ts",
        partition_fields=["event_type"],
        table_type=TableType.MERGE_ON_READ,
    )
    events = load_table(spark, sf_dir, "events")
    upsert(spark, events, table, commit_time=T1)
    clicks = events.filter(F.col("event_type") == "click").withColumn(
        "value", F.col("value") + 1000
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR"))
    upsert(spark, clicks, table, commit_time=T2)
    delta = timeline.incremental_read(spark, table, since=T1, until=T2)
    return delta.select(
        "event_id", "event_type", F.round("value", 2).alias("value")
    )
