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


def test_bloom_reduce_join_equals_plain_join_and_filters(spark):
    from hudi_utility_spark.ops.joins import bloom_reduce_join

    fact = spark.createDataFrame(
        [(i % 500, float(i)) for i in range(5000)], "fk long, v double"
    )
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(0, 500, 10)], "dk long, name string"
    )
    got = bloom_reduce_join(fact, dim, "fk", "dk")
    plain = fact.join(dim, fact.fk == dim.dk)
    assert got.exceptAll(plain).isEmpty() and plain.exceptAll(got).isEmpty()
    # the membership test must actually reduce the fact side: count rows
    # entering the join by re-deriving the filter stage (k=4, m=2^16 on
    # 50 keys -> fp ~ 0); a useless filter would pass all 5000
    assert got.count() == 500  # 50 matching keys x 10 fact rows each


def test_bloom_reduce_join_no_false_negatives_small_m(spark):
    # saturate a tiny filter: false positives abound but the join result
    # still equals the plain join (no false negatives by construction)
    from hudi_utility_spark.ops.joins import bloom_reduce_join

    fact = spark.createDataFrame([(i,) for i in range(2000)], "fk long")
    dim = spark.createDataFrame([(i,) for i in range(0, 2000, 3)], "dk long")
    got = bloom_reduce_join(fact, dim, "fk", "dk", m_bits=256, k=2)
    plain = fact.join(dim, fact.fk == dim.dk)
    assert got.count() == plain.count() == 667


def test_bloom_reduce_join_rejects_fact_preserving_modes(spark):
    # the Bloom pre-filter drops unmatched fact rows, so left/full/anti
    # would silently lose rows the join mode promises to keep
    import pytest as _pytest

    from hudi_utility_spark.ops.joins import bloom_reduce_join

    fact = spark.createDataFrame([(1,)], "fk long")
    dim = spark.createDataFrame([(1,)], "dk long")
    for how in ("left", "leftouter", "left_outer", "full", "outer", "anti", "left_anti"):
        with _pytest.raises(ValueError, match="not equivalence-preserving"):
            bloom_reduce_join(fact, dim, "fk", "dk", how=how)
    # semi and right remain accepted
    assert bloom_reduce_join(fact, dim, "fk", "dk", how="semi").count() == 1
    assert bloom_reduce_join(fact, dim, "fk", "dk", how="right").count() == 1


def test_asof_join_forward_next_event(spark):
    import datetime as dt

    from hudi_utility_spark.ops.joins import asof_join

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    left = spark.createDataFrame(
        [(1, ts(10), "p1"), (1, ts(50), "p2"), (2, ts(10), "p3")],
        "k long, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [(1, ts(10), "c0"), (1, ts(30), "c1"), (1, ts(5), "cX")],
        "k long, ts timestamp, cid string",
    )
    out = {
        r["pid"]: (r["cid_right"], r["ts_right"])
        for r in asof_join(
            left, right, ["k"], direction="forward"
        ).collect()
    }
    assert out["p1"] == ("c0", ts(10))  # equal-ts right IS visible
    assert out["p2"] == (None, None)  # nothing at-or-after 50
    assert out["p3"] == (None, None)  # key 2 has no right rows

    # tolerance: next event must be within 15 min
    tol = {
        r["pid"]: r["cid_right"]
        for r in asof_join(
            left.filter("pid = 'p1'"),
            right.filter("cid = 'c1'"),
            ["k"],
            direction="forward",
            tolerance_seconds=900,
        ).collect()
    }
    assert tol["p1"] is None  # c1 is 20 min after p1: outside tolerance


def test_multi_touch_attribution_hand_computed(spark):
    """One purchase (value 10) with two prior clicks at 100s and 700s
    before it: last-touch credits the nearer click's channel fully,
    linear splits 5/5, time-decay weights exp(-100/600) vs
    exp(-700/600) normalized."""
    import datetime as dt
    import math

    from hudi_utility_spark.ops.joins import multi_touch_attribution

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(sec):
        return t0 + dt.timedelta(seconds=sec)

    clicks = spark.createDataFrame(
        [(1, 101, ts(0), "A"), (1, 102, ts(600), "B")],
        ["user_id", "event_id", "ts", "channel"],
    )
    purchases = spark.createDataFrame(
        [(1, 201, ts(700), 10.0)],
        ["user_id", "event_id", "ts", "value"],
    )
    out = {
        r.channel: r
        for r in multi_touch_attribution(
            clicks, purchases, gap_seconds=1800, half_life_seconds=600.0
        ).collect()
    }
    wa, wb = math.exp(-700 / 600), math.exp(-100 / 600)
    assert out["A"].last_touch == 0.0 and out["B"].last_touch == 10.0
    assert out["A"].linear == 5.0 and out["B"].linear == 5.0
    assert abs(out["A"].time_decay - round(10 * wa / (wa + wb), 6)) < 1e-9
    assert abs(out["B"].time_decay - round(10 * wb / (wa + wb), 6)) < 1e-9
    # every model conserves the conversion's value
    for model in ("last_touch", "linear", "time_decay"):
        assert abs(sum(getattr(r, model) for r in out.values()) - 10.0) < 1e-5


def test_multi_touch_attribution_gap_and_direction(spark):
    """Touches outside the gap or AFTER the conversion earn nothing;
    a conversion with no in-gap touch simply yields no credit rows."""
    import datetime as dt

    from hudi_utility_spark.ops.joins import multi_touch_attribution

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(sec):
        return t0 + dt.timedelta(seconds=sec)

    clicks = spark.createDataFrame(
        [(1, 1, ts(-5000), "old"), (1, 2, ts(100), "late"),
         (2, 3, ts(10), "other_user")],
        ["user_id", "event_id", "ts", "channel"],
    )
    purchases = spark.createDataFrame(
        [(1, 9, ts(0), 7.0)], ["user_id", "event_id", "ts", "value"]
    )
    assert (
        multi_touch_attribution(clicks, purchases, gap_seconds=1800).count()
        == 0
    )


def test_asof_nearest_composition_ties_and_no_match(spark):
    """The nearest-direction composition (backward pass, then forward
    pass over its output): exact-tie gaps choose backward; keys with
    only one side match that side; keys with no right rows keep NULLs."""
    import datetime as dt

    from hudi_utility_spark.ops.joins import asof_join
    from hudi_utility_spark.tsutil import us
    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    left = spark.createDataFrame(
        [
            (1, 100, t0 + 10 * s),   # clicks at 5 and 15 -> tie, backward
            (2, 200, t0 + 10 * s),   # click at 30 only -> forward
            (3, 300, t0 + 10 * s),   # no clicks -> null
        ],
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 900, t0 + 5 * s),
            (1, 901, t0 + 15 * s),
            (2, 902, t0 + 30 * s),
        ],
        "user_id long, event_id long, ts timestamp",
    )
    b = asof_join(left, right, on=["user_id"], right_cols=["event_id"],
                  suffix="_b")
    bf = asof_join(b, right, on=["user_id"], right_cols=["event_id"],
                   direction="forward", suffix="_f")
    gap_b = us(F.col("ts")) - us(F.col("ts_b"))
    gap_f = us(F.col("ts_f")) - us(F.col("ts"))
    chosen = bf.select(
        "user_id",
        F.when(F.col("ts_b").isNull() & F.col("ts_f").isNull(), F.lit(None))
        .when(F.col("ts_f").isNull(), F.lit("backward"))
        .when(F.col("ts_b").isNull(), F.lit("forward"))
        .when(gap_b <= gap_f, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
    )
    got = {r["user_id"]: r["direction"] for r in chosen.collect()}
    assert got[1] == "backward"   # 5s tie both ways -> backward wins
    assert got[2] == "forward"    # nothing at-or-before
    assert got[3] is None         # no right rows at all
