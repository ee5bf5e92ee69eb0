"""As-of and range join semantics on hand-built frames."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hudi_utility_spark.ops.joins import asof_join, range_self_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01 10:00:10")),
            (2, 100, _ts("2024-01-01 10:00:20")),
            (3, 200, _ts("2024-01-01 10:00:05")),
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (11, 100, _ts("2024-01-01 10:00:05"), 1.0),
            (12, 100, _ts("2024-01-01 10:00:15"), 2.0),
            (13, 100, _ts("2024-01-01 10:00:20"), 3.0),
            (14, 200, _ts("2024-01-01 10:00:06"), 4.0),
        ],
        ["rid", "user_id", "ts", "val"],
    )
    return left, right


def test_asof_backward_matches(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["user_id"], right_cols=["rid", "val"])
    rows = {r.event_id: (r.rid_right, r.val_right) for r in out.collect()}
    # event 1 @10 → rid 11 @05 ; event 2 @20 → rid 13 @20 (ties visible)
    assert rows[1] == (11, 1.0)
    assert rows[2] == (13, 3.0)
    # event 3 @05, user 200: right row is @06 (later) → no match
    assert rows[3] == (None, None)


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["user_id"], right_cols=["rid"], tolerance_seconds=3
    )
    rows = {r.event_id: r.rid_right for r in out.collect()}
    # event 1 @10: nearest prior rid 11 @05 is 5s old > 3s tolerance
    assert rows[1] is None
    assert rows[2] == 13


def test_asof_row_count_preserved(spark, events):
    purchases = events.filter(F.col("event_type") == "purchase")
    clicks = events.filter(F.col("event_type") == "click")
    out = asof_join(purchases, clicks, on=["user_id"], right_cols=["event_id"])
    assert out.count() == purchases.count()


def test_range_self_join_pairs_and_boundary(spark):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [
            (1, 7, base),
            (2, 7, base + dt.timedelta(seconds=60)),   # exactly max gap
            (3, 7, base + dt.timedelta(seconds=121)),  # 61s after id 2
            (4, 8, base),                              # other key
        ],
        ["event_id", "user_id", "ts"],
    )
    out = range_self_join(df, on=["user_id"], max_gap_seconds=60)
    got = {(r.id_a, r.id_b): r.gap_us for r in out.collect()}
    assert got == {(1, 2): 60_000_000}


def test_range_self_join_no_dupes_across_buckets(spark):
    # two rows 1s apart straddling a bucket boundary must appear once
    df = spark.createDataFrame(
        [
            (1, 7, dt.datetime(2024, 1, 1, 0, 0, 59)),
            (2, 7, dt.datetime(2024, 1, 1, 0, 1, 0)),
        ],
        ["event_id", "user_id", "ts"],
    )
    out = range_self_join(df, on=["user_id"], max_gap_seconds=60).collect()
    assert len(out) == 1 and out[0].gap_us == 1_000_000
