"""RANGE-frame rolling features: boundary inclusivity and per-key
isolation (semantics also hash-pinned by the ts_rolling_features
oracle at sf0.01)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_trailing_range_frame_includes_exact_boundary(spark):
    rows = [
        (1, 0, 1.0),
        (1, 3_600_000_000, 10.0),  # exactly 1h after the first
        (1, 7_200_000_001, 100.0),  # 1h + 1µs after the second
        (2, 3_600_000_000, 7.0),  # other key: isolated frame
    ]
    df = spark.createDataFrame(rows, "k int, ts_us long, v double")
    w = Window.partitionBy("k").orderBy("ts_us").rangeBetween(-3_600_000_000, 0)
    got = {
        (r["k"], r["ts_us"]): (r["n"], r["s"])
        for r in df.select(
            "k", "ts_us", F.count("*").over(w).alias("n"), F.sum("v").over(w).alias("s")
        ).collect()
    }
    assert got[(1, 0)] == (1, 1.0)
    assert got[(1, 3_600_000_000)] == (2, 11.0)  # boundary row included
    assert got[(1, 7_200_000_001)] == (1, 100.0)  # 1h+1µs: previous excluded
    assert got[(2, 3_600_000_000)] == (1, 7.0)
