"""Cross-engine parity of the portable hash primitives (ops/phash.py) —
the invariant every r3 oracle upgrade (MinHash, SimHash, hyperplane
sketch) rests on."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from hudi_utility_spark.ops import phash
from hudi_utility_spark.ops.similarity import plane_component

WORDS = ["hello", "world", "", "a b c", "ümlaut", "0", "the quick brown fox"]


def test_three_way_parity(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "s string")
    hi, lo = phash.parts(F.col("s"))
    got = {
        r["s"]: (r["h64"], r["f0"], r["f31"])
        for r in df.select(
            "s",
            phash.hash64(F.col("s")).alias("h64"),
            phash.family_hash(hi, lo, 0).alias("f0"),
            phash.family_hash(hi, lo, 31).alias("f31"),
        ).collect()
    }
    con = duckdb.connect()
    for w in WORDS:
        lit = "'" + w.replace("'", "''") + "'"
        hi_s, lo_s = phash.sql_parts(lit)
        duck = con.execute(
            f"SELECT {phash.sql_hash64(lit)}, "
            f"{phash.sql_family(hi_s, lo_s, 0)}, "
            f"{phash.sql_family(hi_s, lo_s, 31)}"
        ).fetchone()
        py = (phash.py_hash64(w), phash.py_family(w, 0), phash.py_family(w, 31))
        assert got[w] == tuple(duck) == py, w


def test_hash64_spans_sign_and_family_stays_bounded(spark):
    # h64 must exercise both signs (hi below/above 2^31) and the family
    # must stay inside [0, 2^31-1) — the no-overflow contract
    df = spark.range(0, 2000).select(F.col("id").cast("string").alias("s"))
    hi, lo = phash.parts(F.col("s"))
    row = df.select(
        F.min(phash.hash64(F.col("s"))).alias("mn"),
        F.max(phash.hash64(F.col("s"))).alias("mx"),
        F.min(phash.family_hash(hi, lo, 3)).alias("fmn"),
        F.max(phash.family_hash(hi, lo, 3)).alias("fmx"),
    ).collect()[0]
    assert row["mn"] < 0 < row["mx"]
    assert 0 <= row["fmn"] and row["fmx"] < phash.P31


@pytest.mark.parametrize("p,d", [(0, 0), (3, 17), (15, 63)])
def test_plane_components_are_signs(p, d):
    assert plane_component(p, d) in (-1.0, 1.0)


def test_family_constants_distinct():
    seen = {phash.family_constants(i) for i in range(32)}
    assert len(seen) == 32
