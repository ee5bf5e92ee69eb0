"""Unit tests for the round-9 statistics / allocation / text ops:
closed-form hand-checked cases, not oracle replays."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_kruskal_wallis_hand_case(spark):
    # two groups, no ties: ranks 1..6; H = 12/(6*7) * (6^2/3 + 15^2/3) - 3*7
    from hudi_utility_spark.ops.mlfit import kruskal_wallis

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0), ("b", 5.0), ("b", 6.0)],
        ["group", "value"],
    )
    r = kruskal_wallis(df, value_col="value", group_col="group").collect()[0]
    assert r["n"] == 6 and r["k_groups"] == 2
    expect = 12.0 / (6 * 7) * (36 / 3 + 225 / 3) - 21
    assert abs(r["h_stat"] - round(expect, 6)) < 1e-9
    # no ties -> tie correction is a no-op
    assert r["h_stat"] == r["h_tie_corrected"]


def test_kruskal_wallis_identical_groups_is_zero(spark):
    from hudi_utility_spark.ops.mlfit import kruskal_wallis

    rows = [("a", float(v)) for v in (1, 2, 3)] + [("b", float(v)) for v in (1, 2, 3)]
    r = kruskal_wallis(
        spark.createDataFrame(rows, ["group", "value"]),
        value_col="value",
        group_col="group",
    ).collect()[0]
    assert abs(r["h_tie_corrected"]) < 1e-9


def test_brown_forsythe_null_and_spread(spark):
    from hudi_utility_spark.ops.mlfit import brown_forsythe

    # group b is 10x more spread than a; F must be large, nulls dropped
    rows = (
        [("a", float(v)) for v in (9, 10, 11, 10, 9, 11)]
        + [("b", float(v)) for v in (0, 20, -10, 30, 0, 20)]
        + [("a", None), ("b", None)]
    )
    df = spark.createDataFrame(rows, ["group", "value"])
    r = brown_forsythe(df, value_col="value", group_col="group").collect()[0]
    assert r["n"] == 12  # nulls excluded from counts too
    assert r["df1"] == 1 and r["df2"] == 10
    assert r["f_stat"] > 10


def test_g_test_independent_table_is_zero(spark):
    from hudi_utility_spark.ops.mlfit import g_test

    # perfectly independent 2x2: counts proportional to margins
    rows = (
        [("x", "u")] * 20 + [("x", "v")] * 10 + [("y", "u")] * 40 + [("y", "v")] * 20
    )
    r = g_test(spark.createDataFrame(rows, ["r", "c"])).collect()[0]
    assert r["n"] == 90 and r["dof"] == 1
    assert abs(r["g_stat"]) < 1e-9


def test_unimax_allocation_regimes(spark):
    from hudi_utility_spark.ops.pack import unimax_allocation

    df = spark.createDataFrame(
        [("en", 1000), ("de", 100), ("fr", 100)], ["lang", "n_tok"]
    )
    # huge budget: every language capped at max_epochs of its own data
    full = {
        r["lang"]: r
        for r in unimax_allocation(
            df, "n_tok", "lang", budget_fraction=10.0, max_epochs=2.0
        ).collect()
    }
    for lang, n in (("en", 1000), ("de", 100), ("fr", 100)):
        assert full[lang]["alloc"] == 2.0 * n
        assert abs(full[lang]["epochs"] - 2.0) < 1e-9
    # tight budget below every cap: pure uniform water level B/k
    tight = {
        r["lang"]: r
        for r in unimax_allocation(
            df, "n_tok", "lang", budget_fraction=0.1, max_epochs=2.0
        ).collect()
    }
    assert all(abs(r["alloc"] - 40.0) < 1e-6 for r in tight.values())
    # allocation never exceeds the budget and never exceeds a cap
    mid = unimax_allocation(
        df, "n_tok", "lang", budget_fraction=0.5, max_epochs=2.0
    ).collect()
    assert sum(r["alloc"] for r in mid) <= 600.0 + 1e-6
    assert all(r["alloc"] <= r["cap"] + 1e-6 for r in mid)


def test_rake_keywords_hand_case(spark):
    from hudi_utility_spark.ops.text import rake_keywords

    # "deep learning" appears twice as a stopword-delimited phrase;
    # its score (sum of member degree/freq) must beat the singletons
    df = spark.createDataFrame(
        [
            (1, "deep learning is the study of deep learning"),
            (2, "a model and a dataset"),
        ],
        ["doc_id", "text"],
    )
    rows = rake_keywords(df, k=10).collect()
    by_phrase = {r["phrase"]: r for r in rows}
    assert by_phrase["deep learning"]["n_occurrences"] == 2
    assert rows[0]["phrase"] == "deep learning"
    # deep: freq 2, degree 4; learning: freq 2, degree 4 -> score 4.0
    assert abs(by_phrase["deep learning"]["score"] - 4.0) < 1e-9


def test_phonetic_key_classic_pairs(spark):
    from hudi_utility_spark.ops.er import phonetic_key

    df = spark.createDataFrame(
        [("robert",), ("rupert",), ("smith",), ("smyth",), ("ashcraft",)],
        ["w"],
    )
    keys = {
        r["w"]: r["k"]
        for r in df.select("w", phonetic_key(F.col("w")).alias("k")).collect()
    }
    assert keys["robert"] == keys["rupert"] == "R163"
    assert keys["smith"] == keys["smyth"] == "S530"
    # documented divergence from library soundex is fine; key is 4 chars
    assert all(len(k) == 4 for k in keys.values())


def test_phonetic_key_sql_twin_matches(spark):
    import duckdb

    from hudi_utility_spark.ops.er import phonetic_key, phonetic_key_sql

    words = ["robert", "widget", "bolt", "ring", "anchor", "casing"]
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    skeys = {
        r["w"]: r["k"]
        for r in df.select("w", phonetic_key(F.col("w")).alias("k")).collect()
    }
    con = duckdb.connect()
    for w in words:
        lit = "'" + w + "'"
        dk = con.execute(f"SELECT {phonetic_key_sql(lit)}").fetchone()[0]
        assert dk == skeys[w], w


def test_compression_ratio_matches_zlib_and_flags_repetition(spark):
    import zlib

    from hudi_utility_spark.ops.text import compression_ratio

    natural = "the quick brown fox jumps over the lazy dog near the river bank"
    spammy = "buy now " * 50
    df = spark.createDataFrame(
        [(1, natural), (2, spammy), (3, ""), (4, None)], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["ratio"] for r in compression_ratio(df).collect()}
    for doc_id, t in ((1, natural), (2, spammy)):
        raw = t.encode()
        expect = round(len(zlib.compress(raw, 6)) / len(raw), 6)
        assert got[doc_id] == expect
    assert got[2] < got[1]  # repetition compresses far better
    assert got[3] is None and got[4] is None


def test_t_closeness_flags_skewed_class(spark):
    from hudi_utility_spark.ops.quality import t_closeness_audit

    # class A mirrors the global mix; class B is all-bucket-3
    rows = [("A", b) for b in (0, 1, 2, 3) * 10] + [("B", 3)] * 8
    df = spark.createDataFrame(rows, ["qi", "sb"])
    out = {
        r["qi"]: r
        for r in t_closeness_audit(df, ["qi"], "sb", m=4, t=0.2).collect()
    }
    assert not out["A"]["violates_t"] and out["A"]["emd"] < 0.1
    assert out["B"]["violates_t"]
    # all-mass-at-top EMD vs this global: each cum step gap known
    assert out["B"]["emd"] > 0.3
    # missing buckets in B materialized as zeros (CDF total)
    assert out["B"]["class_size"] == 8


def test_holm_bonferroni_stepdown(spark):
    from hudi_utility_spark.ops.mlfit import holm_bonferroni

    # classic Holm example: m=4; smallest must be scaled by 4, the
    # running max enforces monotone adjusted p's
    df = spark.createDataFrame(
        [("a", 0.01), ("b", 0.04), ("c", 0.03), ("d", 0.005)],
        ["group", "p_value"],
    )
    out = {r["group"]: r for r in holm_bonferroni(df).collect()}
    assert out["d"]["p_adjusted"] == 0.02     # 4 * 0.005
    assert out["a"]["p_adjusted"] == 0.03     # max(0.02, 3*0.01)
    assert out["c"]["p_adjusted"] == 0.06     # max(0.03, 2*0.03)
    assert out["b"]["p_adjusted"] == 0.06     # max(0.06, 1*0.04) = 0.06
    assert out["d"]["reject"] and out["a"]["reject"]
    assert not out["c"]["reject"] and not out["b"]["reject"]
    # adjusted p's capped at 1
    big = spark.createDataFrame([("x", 0.9), ("y", 0.95)], ["group", "p_value"])
    assert all(r["p_adjusted"] <= 1.0 for r in holm_bonferroni(big).collect())


def test_benjamini_hochberg_stepup(spark):
    from hudi_utility_spark.ops.mlfit import benjamini_hochberg

    # textbook BH: m=4, q_i = min over j>=i of m*p_j/j
    df = spark.createDataFrame(
        [("a", 0.01), ("b", 0.04), ("c", 0.03), ("d", 0.005)],
        ["group", "p_value"],
    )
    out = {r["group"]: r for r in benjamini_hochberg(df).collect()}
    # sorted: d(.005) a(.01) c(.03) b(.04); raw steps: .02 .02 .04 .04
    assert out["d"]["q_value"] == 0.02
    assert out["a"]["q_value"] == 0.02
    assert out["c"]["q_value"] == 0.04
    assert out["b"]["q_value"] == 0.04
    assert all(r["discovery"] for r in out.values())
    # BH is uniformly less conservative than Holm on the same inputs
    from hudi_utility_spark.ops.mlfit import holm_bonferroni

    holm = {r["group"]: r["p_adjusted"] for r in holm_bonferroni(df).collect()}
    assert all(out[g]["q_value"] <= holm[g] for g in out)


def test_kruskal_wallis_monotone_invariance(spark):
    """Rank statistics must be invariant under strictly increasing
    transforms of the values — the defining property that separates
    them from the parametric tests. H(x) == H(exp(x/100)) exactly."""
    from hudi_utility_spark.ops.mlfit import kruskal_wallis

    rows = [("a", float(v)) for v in (3, 1, 4, 1, 5)] + [
        ("b", float(v)) for v in (9, 2, 6, 5, 3)
    ] + [("c", float(v)) for v in (5, 8, 9, 7)]
    df = spark.createDataFrame(rows, ["group", "value"])
    base = kruskal_wallis(df, "value", "group").collect()[0]
    from pyspark.sql import functions as F

    warped = df.select("group", F.exp(F.col("value") / 100).alias("value"))
    after = kruskal_wallis(warped, "value", "group").collect()[0]
    assert base["h_tie_corrected"] == after["h_tie_corrected"]
    assert base["h_stat"] == after["h_stat"]


def test_holm_and_bh_agree_at_m_equals_1(spark):
    """With a single test both corrections must be the identity."""
    from hudi_utility_spark.ops.mlfit import benjamini_hochberg, holm_bonferroni

    df = spark.createDataFrame([("only", 0.037)], ["group", "p_value"])
    h = holm_bonferroni(df).collect()[0]
    b = benjamini_hochberg(df).collect()[0]
    assert h["p_adjusted"] == 0.037 and b["q_value"] == 0.037


def test_wilcoxon_signed_rank_hand_case(spark):
    from hudi_utility_spark.ops.mlfit import wilcoxon_signed_rank

    # diffs: +1, +2, -3, +4 (no ties, no zeros): |d| ranks 1,2,3,4;
    # W+ = 1 + 2 + 4 = 7; mean = 4*5/4 = 5; var = 4*5*9/24 = 7.5
    df = spark.createDataFrame([(1.0,), (2.0,), (-3.0,), (4.0,)], ["d"])
    r = wilcoxon_signed_rank(df).collect()[0]
    assert r["n_pairs"] == 4 and r["w_plus"] == 7.0
    import math

    assert abs(r["z_stat"] - round((7 - 5) / math.sqrt(7.5), 6)) < 1e-9
    # zeros drop (Wilcoxon convention)
    dz = spark.createDataFrame([(0.0,), (1.0,), (-2.0,)], ["d"])
    assert wilcoxon_signed_rank(dz).collect()[0]["n_pairs"] == 2
