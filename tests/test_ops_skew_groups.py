"""Salted-join equivalence and near-dup group resolution."""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_utility_spark.ops.dedup import dedup_survivors, near_dup_groups
from hudi_utility_spark.ops.skew import key_histogram, salted_join


def test_salted_join_matches_plain_inner(spark, events):
    dim = events.select("user_id").distinct().withColumn(
        "user_flag", F.col("user_id") % 2 == 0
    )
    plain = events.join(dim, "user_id").select("event_id", "user_flag")
    salted = salted_join(events, dim, on=["user_id"], salt_buckets=8).select(
        "event_id", "user_flag"
    )
    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).isEmpty() and salted.exceptAll(plain).isEmpty()


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], ["k", "v"])
    small = spark.createDataFrame([(1, 10.0)], ["k", "w"])
    out = salted_join(big, small, on=["k"], how="left", salt_buckets=4)
    rows = {r.k: r.w for r in out.collect()}
    assert rows == {1: 10.0, 2: None, 3: None}


def test_key_histogram_orders_heaviest_first(spark):
    df = spark.createDataFrame([(1,)] * 5 + [(2,)] * 2 + [(3,)], ["k"])
    got = [(r.k, r.rows) for r in key_histogram(df, ["k"]).collect()]
    assert got == [(1, 5), (2, 2), (3, 1)]


def test_near_dup_groups_chain_and_island(spark):
    # chain 1-2-3 plus pair 10-11: two components, min-id labels
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    got = {r.id: r.group_id for r in near_dup_groups(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_dedup_survivors_keeps_unpaired_and_representatives(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 10, 11, 99)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"])
    kept = sorted(r.doc_id for r in dedup_survivors(df, pairs).collect())
    assert kept == [1, 10, 99]


def test_cms_estimates_are_one_sided_and_tight_for_heavy_keys(spark, events):
    from hudi_utility_spark.ops.skew import cms_estimate, cms_sketch

    sketch = cms_sketch(events, "user_id", depth=4, width=1024)
    # sketch size is bounded by depth*width, independent of key count
    assert sketch.count() <= 4 * 1024

    exact = {
        r.user_id: r["rows"]
        for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("rows")).collect()
    }
    probe = spark.createDataFrame([(k,) for k in list(exact)[:50]], "user_id LONG")
    est = {
        r.user_id: r.est_rows
        for r in cms_estimate(sketch, probe, "user_id", depth=4, width=1024).collect()
    }
    for k, e in est.items():
        assert e >= exact[k]                     # never undercounts
        assert e <= exact[k] + len(events.columns) * 0 + sum(exact.values()) // 100 + 4
        # ^ loose εN bound: width=1024 ≫ distinct users at test SF, so
        # collisions are rare and estimates stay within ~1% of N

    # an unseen key estimates (near) zero
    mx = max(exact)
    ghost = spark.createDataFrame([(mx + 10_000,)], "user_id LONG")
    g = cms_estimate(sketch, ghost, "user_id", depth=4, width=1024).collect()[0]
    assert g.est_rows <= sum(exact.values()) // 100 + 4


def test_join_cardinality_estimate_close_to_actual(spark):
    from hudi_utility_spark.ops.skew import join_cardinality_estimate

    left = spark.createDataFrame(
        [(i % 50, i) for i in range(1000)], ["k", "v"]
    )
    right = spark.createDataFrame([(i, -i) for i in range(50)], ["k2", "w"])
    r = join_cardinality_estimate(left, right, "k", "k2").collect()[0]
    assert (r.n_left, r.n_right, r.actual_rows) == (1000, 50, 1000)
    # est = 1000*50 / max(ndv_l, ndv_r); both ndv ~= 50 -> est ~ 1000
    assert abs(r.est_rows - r.actual_rows) / r.actual_rows < 0.25
