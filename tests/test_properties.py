"""Property-based tests (SURVEY §5.4): algebraic laws the engine's core
semantics must satisfy, driven by hypothesis over small generated frames.

Spark's per-action overhead dominates at this scale, so examples are few
but each is adversarially shrunk by hypothesis on failure.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hudi_utility_spark.ops.dedup import jaccard_pairs
from hudi_utility_spark.write import latest_by_key

KEYS = st.integers(min_value=0, max_value=3)
PRECOMBINE = st.integers(min_value=0, max_value=100)
ROWS = st.lists(st.tuples(KEYS, PRECOMBINE), min_size=1, max_size=12)

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _latest_map(spark, rows):
    df = spark.createDataFrame(
        [(k, p, f"v{k}-{p}") for k, p in rows], ["k", "ts", "payload"]
    )
    out = latest_by_key(df, ["k"], "ts")
    return {r.k: r.ts for r in out.collect()}


@given(rows=ROWS)
@_SETTINGS
def test_latest_by_key_keeps_max_precombine(spark, rows):
    got = _latest_map(spark, rows)
    expected = {}
    for k, p in rows:
        expected[k] = max(expected.get(k, p), p)
    assert got == expected


@given(a=ROWS, b=ROWS)
@_SETTINGS
def test_upsert_order_independent_when_precombine_decides(spark, a, b):
    """upsert(a)∘upsert(b) ≡ upsert(b)∘upsert(a) for the surviving
    (key → max precombine) map — union order must not matter."""
    ab = _latest_map(spark, a + b)
    ba = _latest_map(spark, b + a)
    assert ab == ba


@given(rows=ROWS)
@_SETTINGS
def test_latest_by_key_idempotent(spark, rows):
    df = spark.createDataFrame(
        [(k, p, f"v{k}-{p}") for k, p in rows], ["k", "ts", "payload"]
    )
    once = latest_by_key(df, ["k"], "ts")
    twice = latest_by_key(once, ["k"], "ts")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


WORDS = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
    min_size=1,
    max_size=6,
)


@given(docs=st.lists(WORDS, min_size=2, max_size=5))
@_SETTINGS
def test_jaccard_matches_python_model(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], ["doc_id", "text"]
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(df, n=1, threshold=0.0).collect()
    }
    sets = [set(ws) for ws in docs]
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            if inter == 0:
                # pairs sharing nothing are never candidates
                assert (i, j) not in got
                continue
            expected = round(inter / len(sets[i] | sets[j]), 6)
            assert got.get((i, j)) == pytest.approx(expected)
