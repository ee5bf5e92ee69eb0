"""SCD Type 2 semantics: run compression, null-safe change detection,
incremental-apply ≡ batch-rebuild invariant, as-of join, plan shape."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from hudi_utility_spark.scd import (
    EFF_FROM,
    EFF_TO,
    IS_CURRENT,
    asof_dimension_join,
    scd2_apply,
    scd2_from_history,
)


def _ts(day: int, hour: int = 0):
    return datetime(2024, 1, day, hour)


def _history(spark):
    rows = [
        # key 1: A A B B A  -> versions A@1, B@3, A@5
        (1, _ts(1), "A"),
        (1, _ts(2), "A"),
        (1, _ts(3), "B"),
        (1, _ts(4), "B"),
        (1, _ts(5), "A"),
        # key 2: NULL NULL X -> versions NULL@1, X@3 (null-safe compress)
        (2, _ts(1), None),
        (2, _ts(2), None),
        (2, _ts(3), "X"),
        # key 3: single row -> one open version
        (3, _ts(2), "Z"),
    ]
    return spark.createDataFrame(rows, "k int, ts timestamp, attr string")


def test_build_compresses_runs_and_spans(spark):
    dim = scd2_from_history(_history(spark), ["k"], "ts", ["attr"])
    got = {
        (r["k"], r["attr"], r[EFF_FROM], r[EFF_TO], r[IS_CURRENT])
        for r in dim.collect()
    }
    assert got == {
        (1, "A", _ts(1), _ts(3), False),
        (1, "B", _ts(3), _ts(5), False),
        (1, "A", _ts(5), None, True),
        (2, None, _ts(1), _ts(3), False),
        (2, "X", _ts(3), None, True),
        (3, "Z", _ts(2), None, True),
    }


def test_build_multi_tracked_columns(spark):
    rows = [
        (1, _ts(1), "A", 10),
        (1, _ts(2), "A", 20),  # second attr changes -> new version
        (1, _ts(3), "A", 20),  # no change -> compressed
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, a string, b int")
    dim = scd2_from_history(df, ["k"], "ts", ["a", "b"])
    assert dim.count() == 2
    cur = dim.filter(F.col(IS_CURRENT)).collect()[0]
    assert (cur["a"], cur["b"], cur[EFF_FROM]) == ("A", 20, _ts(2))


def test_apply_equals_batch_rebuild(spark, events):
    """The round-trip invariant the oracle also checks at sf0.01: apply
    of the second half onto the first-half dim == full batch rebuild."""
    boundary = F.to_timestamp(F.lit("2024-01-16 00:00:00"))
    hist = events.filter(F.col("ts") < boundary)
    changes = events.filter(F.col("ts") >= boundary)
    args = (["user_id"], "ts", ["event_type"])
    dim = scd2_from_history(hist, *args, tiebreak=["event_id"])
    merged = scd2_apply(dim, changes, *args, tiebreak=["event_id"])
    batch = scd2_from_history(events, *args, tiebreak=["event_id"])
    assert merged.exceptAll(batch).isEmpty()
    assert batch.exceptAll(merged).isEmpty()


def test_apply_same_value_extends_run(spark):
    """A change equal to the current version must NOT open a new
    version; a differing change closes the current one at its ts."""
    hist = spark.createDataFrame(
        [(1, _ts(1), "A"), (2, _ts(1), "B")], "k int, ts timestamp, attr string"
    )
    dim = scd2_from_history(hist, ["k"], "ts", ["attr"])
    changes = spark.createDataFrame(
        [(1, _ts(10), "A"), (2, _ts(10), "C")],
        "k int, ts timestamp, attr string",
    )
    merged = scd2_apply(dim, changes, ["k"], "ts", ["attr"])
    got = {
        (r["k"], r["attr"], r[EFF_FROM], r[EFF_TO], r[IS_CURRENT])
        for r in merged.collect()
    }
    assert got == {
        (1, "A", _ts(1), None, True),  # extended, not re-opened
        (2, "B", _ts(1), _ts(10), False),
        (2, "C", _ts(10), None, True),
    }


def test_asof_join_picks_effective_version_and_keeps_unmatched(spark):
    hist = _history(spark)
    dim = scd2_from_history(hist, ["k"], "ts", ["attr"])
    facts = spark.createDataFrame(
        [
            (1, _ts(4, 12)),  # inside B span
            (1, _ts(30)),  # current A span
            (2, _ts(2)),  # inside NULL-attr span
            (9, _ts(2)),  # no dimension history at all
        ],
        "k int, ts timestamp",
    )
    out = asof_dimension_join(facts, dim, ["k"], "ts")
    assert out.count() == 4  # unmatched fact survives
    got = {(r["k"], r["ts"], r["attr"], r[EFF_FROM]) for r in out.collect()}
    assert (1, _ts(4, 12), "B", _ts(3)) in got
    assert (1, _ts(30), "A", _ts(5)) in got
    assert (2, _ts(2), None, _ts(1)) in got
    assert (9, _ts(2), None, None) in got


def test_build_is_single_shuffle(spark, events):
    """The lag filter and the lead window must share one key exchange —
    a second shuffle would double the cost of every 100 TB rebuild."""
    dim = scd2_from_history(
        events, ["user_id"], "ts", ["event_type"], tiebreak=["event_id"]
    )
    plan = dim._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_scd2_composite_key(spark):
    from datetime import datetime

    from hudi_utility_spark.scd import EFF_FROM, IS_CURRENT, scd2_from_history

    rows = [
        (1, "eu", datetime(2024, 1, 1), "A"),
        (1, "eu", datetime(2024, 1, 2), "B"),
        (1, "us", datetime(2024, 1, 1), "A"),  # different composite key
    ]
    df = spark.createDataFrame(rows, "k int, region string, ts timestamp, attr string")
    dim = scd2_from_history(df, ["k", "region"], "ts", ["attr"])
    cur = {
        (r["k"], r["region"]): (r["attr"], r[EFF_FROM])
        for r in dim.filter(F.col(IS_CURRENT)).collect()
    }
    assert cur == {
        (1, "eu"): ("B", datetime(2024, 1, 2)),
        (1, "us"): ("A", datetime(2024, 1, 1)),
    }
