"""Dynamic partition pruning over the engine's partitioned layout.

At 100 TB the fact table is partition-laid-out (``write_partitioned``)
and dimension filters arrive at runtime — DPP is what turns a
dim-side predicate into a partition skip on the fact scan instead of a
full read. These tests pin that the engine's partitioned writes produce
scans Catalyst can dynamically prune, and that the pruned read returns
exactly the rows of the surviving partitions.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from hudi_utility_spark.write import write_partitioned


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _dim(spark):
    rows = [
        ("click", 1.0),
        ("purchase", 2.0),
        ("error", 0.5),
        ("view", 1.0),
        ("signup", 3.0),
    ]
    return spark.createDataFrame(rows, "etype string, wt double")


def test_partitioned_fact_join_gets_dpp(spark, events, tmp_path):
    path = str(tmp_path / "events_part")
    write_partitioned(events, path, ["event_type"])

    fact = spark.read.parquet(path)
    dim = _dim(spark).filter(F.col("wt") > 1.5)
    j = (
        fact.join(F.broadcast(dim), fact.event_type == dim.etype)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    plan = _plan(j)
    assert "dynamicpruningexpression" in plan, plan

    # the pruned result equals the unpruned semantic result
    expected = (
        events.filter(F.col("event_type").isin("purchase", "signup"))
        .groupBy("event_type")
        .count()
        .collect()
    )
    got = {r["event_type"]: r["cnt"] for r in j.collect()}
    assert got == {r["event_type"]: r["count"] for r in expected}


def test_static_partition_filter_prunes_at_plan_time(spark, events, tmp_path):
    """Literal partition predicates must land in PartitionFilters (plan-time
    pruning), not as post-scan filters."""
    path = str(tmp_path / "events_part2")
    write_partitioned(events, path, ["event_type"])
    df = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = _plan(df)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "event_type" in pf[0], plan
    assert df.count() == events.filter(F.col("event_type") == "click").count()
