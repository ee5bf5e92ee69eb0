"""Pytest coverage for engine queries that are deliberately NOT in the
oracle-checked registry (engine-private sketches with no portable SQL
equivalent)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_utility_spark.queries.engine_queries import approx_distinct_profile


def test_approx_distinct_profile_native_hll(spark, sf_dir, lineitem):
    """Native HLL++ estimates stay within the sketch's error bound of
    the exact distinct counts (rsd defaults to 0.05; allow 3 sigma)."""
    got = {
        r["l_returnflag"]: r
        for r in approx_distinct_profile(spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in lineitem.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.countDistinct("l_partkey").alias("parts"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .collect()
    }
    assert set(got) == set(exact) and len(got) > 0
    for flag, e in exact.items():
        g = got[flag]
        assert g["cnt"] == e["cnt"]
        for approx_col, exact_col in (
            ("approx_orders", "orders"),
            ("approx_parts", "parts"),
        ):
            rel_err = abs(g[approx_col] - e[exact_col]) / max(e[exact_col], 1)
            assert rel_err < 0.15, (flag, approx_col, g[approx_col], e[exact_col])


def test_approx_distinct_profile_not_registered():
    """The native sketch must not be driver-registered — its portable,
    value-hash-checked twin `approx_distinct_portable` is."""
    from hudi_utility_spark.queries import QUERIES, ORACLES, load_all

    load_all()
    assert "approx_distinct_profile" not in QUERIES
    assert "approx_distinct_portable" in QUERIES
    assert "approx_distinct_portable" in ORACLES
