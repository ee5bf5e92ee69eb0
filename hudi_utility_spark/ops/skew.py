"""Skew-aware join utility: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
the shuffle layer; salting is the explicit fallback for the pathological
case AQE can't fix — a broadcast-ineligible build side where a handful of
keys dominate (e.g. joining an events fact to a per-user dim when a few
bot users hold 1% of all rows each).

Mechanics: replicate the small side R times; scatter the big side's rows
uniformly across the R replicas with a random-ish salt derived from a
stable row hash (deterministic → retries/speculative tasks agree). Each
hot key's rows then spread over R tasks instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 16,
    salt_source: list[str] | None = None,
) -> DataFrame:
    """Equi-join `big ⋈ small` on `on`, salting `big` across
    ``salt_buckets`` replicas of `small`.

    ``salt_source``: columns whose hash scatters the big side (defaults
    to all of big's columns — any stable per-row identity works).
    Supported ``how``: inner / left (the salted side must be the
    preserved side; for right/full flip the arguments).
    """
    if how not in {"inner", "left"}:
        raise ValueError(f"salted_join supports inner/left, got {how}")
    src = salt_source or big.columns
    salted_big = big.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in src]), F.lit(salt_buckets)).cast(
            "int"
        ),
    )
    replicated_small = small.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    return salted_big.join(replicated_small, [*on, SALT_COL], how).drop(SALT_COL)


def key_histogram(df: DataFrame, on: list[str], top: int = 20) -> DataFrame:
    """Per-key row counts, heaviest first — the profiling step that
    decides whether salting (or just AQE) is warranted. Key columns break
    count ties so the top-N cut is deterministic (rerun- and
    oracle-stable)."""
    return (
        df.groupBy(*on)
        .agg(F.count(F.lit(1)).alias("rows"))
        .orderBy(F.desc("rows"), *[F.asc(c) for c in on])
        .limit(top)
    )
