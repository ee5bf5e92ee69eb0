"""Invariant tests for the late round-9 registered queries (wave B):
closed-form identities the oracle compare can't express — MASE of the
naive model is 1 by construction, RSI is bounded, JB of a symmetric
two-point distribution collapses to its kurtosis term."""

from __future__ import annotations

from hudi_utility_spark.queries import QUERIES, load_all

load_all()


def test_forecast_accuracy_naive_mase_is_one(spark, sf_dir):
    rows = {r["model"]: r for r in QUERIES["ts_forecast_accuracy"](spark, sf_dir).collect()}
    assert set(rows) == {"naive_lag1", "seasonal_naive_lag7"}
    assert abs(rows["naive_lag1"]["mase"] - 1.0) < 1e-9
    for r in rows.values():
        assert r["n_points"] > 0
        assert r["rmse"] >= r["mae"] >= 0
        assert 0 <= r["smape"] <= 2.0


def test_technical_indicators_bounds(spark, sf_dir):
    rows = QUERIES["ts_technical_indicators"](spark, sf_dir).collect()
    assert rows, "expected at least one full 20-day frame"
    for r in rows:
        assert 0.0 <= r["rsi"] <= 100.0
        assert r["bb_lower"] <= r["bb_mid"] <= r["bb_upper"]
        # %B is (y-lower)/(upper-lower): inside the band iff 0..1, and
        # y must sit where pct_b says it does
        width = r["bb_upper"] - r["bb_lower"]
        if width > 0:
            assert abs((r["y"] - r["bb_lower"]) / width - r["pct_b"]) < 1e-4


def test_jarque_bera_symmetric_two_point(spark):
    # v in {-1, +1} equally: skew 0, kurtosis m4/m2^2 = 1, JB = n/6 * (4/4) = n/6
    from hudi_utility_spark.queries.analytics_ext import stat_jarque_bera
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        ev = spark.createDataFrame(
            [(i, "a", float(1 if i % 2 else -1)) for i in range(100)],
            "event_id long, event_type string, value double",
        )
        ev.write.parquet(os.path.join(d, "events.parquet"))
        r = stat_jarque_bera(spark, d).collect()[0]
        assert r["n"] == 100
        assert abs(r["skewness"]) < 1e-9
        assert abs(r["kurtosis"] - 1.0) < 1e-9
        assert abs(r["jb_stat"] - 100 / 6.0 * ((1 - 3) ** 2 / 4.0)) < 1e-3
