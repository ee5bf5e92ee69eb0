"""logistic_fit: NumPy GD parity and learning sanity."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from hudi_utility_spark.ops.mlfit import logistic_fit


def _numpy_gd(X, y, iters, lr, q):
    w = np.zeros(X.shape[1] + 1)
    n = len(y)
    for _ in range(iters):
        z = w[0] + X @ w[1:]
        p = 1.0 / (1.0 + np.exp(-z))
        err = p - y
        g = np.concatenate([[err.sum()], err @ X])
        w = np.round(w - lr * g / n, q)
    return w


def test_logistic_fit_matches_numpy(spark):
    rng = np.random.default_rng(7)
    X = rng.normal(size=(200, 2))
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(int)
    rows = [(float(a), float(b), int(t)) for (a, b), t in zip(X, y)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y int")

    got = logistic_fit(df, ["x1", "x2"], "y", iters=4, lr=0.3, round_to=6)
    want = _numpy_gd(X, y, iters=4, lr=0.3, q=6)
    assert np.allclose(got, want, atol=1e-9), (got, want)


def test_logistic_fit_learns_the_signal(spark):
    """On linearly separable data the signal feature's weight grows
    positive and the loss decreases vs the zero model."""
    rng = np.random.default_rng(11)
    X = rng.normal(size=(300, 1))
    y = (X[:, 0] > 0).astype(int)
    df = spark.createDataFrame(
        [(float(a), int(t)) for (a,), t in zip(X, y)], "x1 double, y int"
    )
    w = logistic_fit(df, ["x1"], "y", iters=10, lr=1.0)
    assert w[1] > 0.5  # signal direction learned

    p = 1.0 / (1.0 + np.exp(-(w[0] + X[:, 0] * w[1])))
    eps = 1e-12
    loss = -np.mean(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))
    base = -np.log(0.5)  # zero-weights model
    assert loss < base


def test_tie_aware_auc_cardinality_guard_and_quantize(spark):
    """A continuous double score must either fail LOUDLY (distinct
    count over budget -> ValueError) or pass via explicit quantize_bins
    — never silently serialize the ranking window (VERDICT r7 #4)."""
    import pytest

    from hudi_utility_spark.ops.mlfit import tie_aware_auc

    # 500 unique continuous scores, label correlated with score
    rows = [(i * 0.618033 % 1.0 + i, 1 if i >= 250 else 0) for i in range(500)]
    df = spark.createDataFrame(rows, "score double, label int")
    with pytest.raises(ValueError, match="quantize_bins"):
        tie_aware_auc(df, max_distinct=100).collect()

    # quantized path: equals the Python reference AUC on binned scores
    out = tie_aware_auc(df, max_distinct=100, quantize_bins=50).collect()[0]
    scores = sorted(set(r[0] for r in rows))
    lo, hi = min(s for s, _ in rows), max(s for s, _ in rows)
    width = (hi - lo) / 50
    binned = [(min(int((s - lo) / width), 49), y) for s, y in rows]
    import itertools

    pos = [s for s, y in binned if y == 1]
    neg = [s for s, y in binned if y == 0]
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p, n in itertools.product(pos, neg)
    )
    ref = wins / (len(pos) * len(neg))
    assert out.n_pos == 250 and out.n_neg == 250
    assert abs(out.auc - round(ref, 6)) < 1e-6

    # exact path still exact on a discrete score
    disc = spark.createDataFrame(
        [(float(i % 7), 1 if i % 3 == 0 else 0) for i in range(200)],
        "score double, label int",
    )
    got = tie_aware_auc(disc).collect()[0]
    drows = [(float(i % 7), 1 if i % 3 == 0 else 0) for i in range(200)]
    dpos = [s for s, y in drows if y == 1]
    dneg = [s for s, y in drows if y == 0]
    dwins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p, n in itertools.product(dpos, dneg)
    )
    assert abs(got.auc - round(dwins / (len(dpos) * len(dneg)), 6)) < 1e-6


def test_require_bounded_distinct_passthrough(spark):
    from hudi_utility_spark.ops.mlfit import require_bounded_distinct

    df = spark.range(10)
    assert require_bounded_distinct(df, 10, "ctx", "hint") is df


def test_pr_curve_hand_computed(spark):
    """scores 3,2,2,1 with labels 1,1,0,0: thresholds desc 3,2,1 give
    tp/fp (1,0),(2,1),(2,2) -> known precision/recall/F1."""
    from hudi_utility_spark.ops.mlfit import pr_curve

    df = spark.createDataFrame(
        [(3.0, 1), (2.0, 1), (2.0, 0), (1.0, 0)], ["score", "label"]
    )
    rows = {r.threshold: r for r in pr_curve(df).collect()}
    assert rows[3.0].tp == 1 and rows[3.0].fp == 0
    assert rows[3.0].precision == 1.0 and rows[3.0].recall == 0.5
    assert abs(rows[3.0].f1 - 2 * 1.0 * 0.5 / 1.5) < 1e-6
    assert rows[2.0].tp == 2 and rows[2.0].fp == 1
    assert abs(rows[2.0].precision - 2 / 3) < 1e-6 and rows[2.0].recall == 1.0
    assert rows[1.0].tp == 2 and rows[1.0].fp == 2
    assert rows[1.0].precision == 0.5 and rows[1.0].recall == 1.0


def test_pr_curve_all_negative_top_bin_zero_filled(spark):
    """Top threshold admitting only negatives must yield 0.0 (not
    NULL/NaN) precision and f1 — the cross-engine degenerate-bin
    convention."""
    from hudi_utility_spark.ops.mlfit import pr_curve

    df = spark.createDataFrame(
        [(9.0, 0), (1.0, 1), (0.0, 0)], ["score", "label"]
    )
    top = {r.threshold: r for r in pr_curve(df).collect()}[9.0]
    assert top.tp == 0 and top.fp == 1
    assert top.precision == 0.0 and top.recall == 0.0 and top.f1 == 0.0


def test_mann_whitney_matches_closed_form(spark):
    """Textbook no-ties case: group1={5,6,7}, group0={1,2,3} -> U1=9
    (max), mu=4.5, sigma=sqrt(9*7/12); plus a tied case cross-checked
    against the tie-corrected formula computed by hand."""
    import math

    from hudi_utility_spark.ops.mlfit import mann_whitney_u

    df = spark.createDataFrame(
        [(5.0, 1), (6.0, 1), (7.0, 1), (1.0, 0), (2.0, 0), (3.0, 0)],
        ["score", "label"],
    )
    r = mann_whitney_u(df).collect()[0]
    assert (r.n_pos, r.n_neg, r.u_stat) == (3, 3, 9.0)
    assert abs(r.z_score - (9.0 - 4.5) / math.sqrt(9 * 7 / 12.0)) < 1e-6

    # tied case: scores [1,1,2] labels [1,0,0]
    # ranks: two 1s share avg rank 1.5; rank_sum(pos)=1.5, U=1.5-1=0.5
    # n=3, tie_term=(2^3-2)=6, sigma^2=(2*1/12)*((4)-6/(3*2))=(1/6)*3=0.5
    df2 = spark.createDataFrame(
        [(1.0, 1), (1.0, 0), (2.0, 0)], ["score", "label"]
    )
    r2 = mann_whitney_u(df2).collect()[0]
    assert r2.u_stat == 0.5
    assert abs(r2.z_score - (0.5 - 1.0) / math.sqrt(0.5)) < 1e-6


def test_mann_whitney_cardinality_guard(spark):
    import pytest

    from hudi_utility_spark.ops.mlfit import mann_whitney_u

    df = spark.range(0, 500).selectExpr(
        "CAST(id AS DOUBLE) + 0.5/(id+1) AS score",
        "CAST(id % 2 AS INT) AS label",
    )
    with pytest.raises(ValueError, match="quantize_bins"):
        mann_whitney_u(df, max_distinct=100).collect()
    out = mann_whitney_u(df, max_distinct=100, quantize_bins=50).collect()
    assert len(out) == 1


def test_woe_iv_hand_computed(spark):
    """Two bins, known counts: bin A (pos=4,neg=1), bin B (pos=1,neg=4)
    with 0.5 smoothing -> symmetric WOE, IV matches the closed form."""
    import math

    from hudi_utility_spark.ops.mlfit import woe_iv

    rows = (
        [("A", 1)] * 4 + [("A", 0)] + [("B", 1)] + [("B", 0)] * 4
    )
    df = spark.createDataFrame(rows, ["bin", "label"])
    out = {r.bin: r for r in woe_iv(df).collect()}
    POS = NEG = 4.5 + 1.5
    woe_a = math.log((4.5 / POS) / (1.5 / NEG))
    iv = 2 * ((4.5 / POS - 1.5 / NEG) * woe_a)  # symmetric bins
    assert abs(out["A"].woe - round(woe_a, 6)) < 1e-9
    assert abs(out["B"].woe + round(woe_a, 6)) < 1e-9
    assert abs(out["A"].iv - round(iv, 6)) < 1e-6
    assert out["A"].iv == out["B"].iv  # feature-level scalar on every row


def test_woe_iv_empty_bin_stays_finite(spark):
    from hudi_utility_spark.ops.mlfit import woe_iv

    df = spark.createDataFrame(
        [("A", 1), ("A", 1), ("B", 0)], ["bin", "label"]
    )
    out = {r.bin: r for r in woe_iv(df).collect()}
    import math

    for r in out.values():
        assert math.isfinite(r.woe) and math.isfinite(r.iv)


def test_target_encode_loo_is_leakage_free(spark):
    """A row's own label must not influence its encoding: flipping one
    row's label changes every OTHER same-category row's code but not
    the flipped row's own code is too strong (prior shifts); instead
    pin the closed form (sum-y)/(n-1) and the singleton->prior rule."""
    from hudi_utility_spark.ops.mlfit import target_encode_loo

    df = spark.createDataFrame(
        [(1, "x", 1.0), (2, "x", 0.0), (3, "x", 1.0), (4, "solo", 1.0)],
        ["id", "cat", "label"],
    )
    out = {r.id: r.te for r in target_encode_loo(df, "cat").collect()}
    assert out[1] == 0.5     # (2-1)/2
    assert out[2] == 1.0     # (2-0)/2
    assert out[3] == 0.5
    assert out[4] == 0.75    # singleton -> global prior 3/4


def test_welch_ttest_closed_form(spark):
    """Textbook case: group1={1,2,3,4}, group0={2,4,6,8,10} — means
    2.5 vs 6, var 5/3 vs 10; t and Welch-Satterthwaite df checked
    against the hand-evaluated formulas."""
    from hudi_utility_spark.ops.mlfit import welch_ttest

    rows = [(float(v), 1) for v in (1, 2, 3, 4)] + [
        (float(v), 0) for v in (2, 4, 6, 8, 10)
    ]
    df = spark.createDataFrame(rows, ["score", "label"])
    r = welch_ttest(df).collect()[0]
    se1, se2 = (5 / 3) / 4, 10.0 / 5
    t = (2.5 - 6.0) / (se1 + se2) ** 0.5
    dof = (se1 + se2) ** 2 / (se1**2 / 3 + se2**2 / 4)
    assert (r.n_pos, r.n_neg) == (4, 5)
    assert abs(r.mean_diff - (-3.5)) < 1e-9
    assert abs(r.t_stat - round(t, 6)) < 1e-9
    assert abs(r.df - round(dof, 6)) < 1e-9


def test_welch_ttest_ignores_nulls(spark):
    """NULL scores must not count toward n (r9 verdict #7): the same
    textbook samples plus one NULL per group must give the identical
    statistic — n, Σv and Σv² all cover the same observations."""
    from hudi_utility_spark.ops.mlfit import welch_ttest

    rows = [(float(v), 1) for v in (1, 2, 3, 4)] + [
        (float(v), 0) for v in (2, 4, 6, 8, 10)
    ] + [(None, 1), (None, 0)]
    df = spark.createDataFrame(rows, "score double, label int")
    r = welch_ttest(df).collect()[0]
    se1, se2 = (5 / 3) / 4, 10.0 / 5
    t = (2.5 - 6.0) / (se1 + se2) ** 0.5
    dof = (se1 + se2) ** 2 / (se1**2 / 3 + se2**2 / 4)
    assert (r.n_pos, r.n_neg) == (4, 5)
    assert abs(r.mean_diff - (-3.5)) < 1e-9
    assert abs(r.t_stat - round(t, 6)) < 1e-9
    assert abs(r.df - round(dof, 6)) < 1e-9


def test_isotonic_calibrate_matches_pav_and_is_monotone(spark):
    """Violating bin rates [0.2, 0.8, 0.4] with equal weights: PAV
    pools bins 2,3 -> [0.2, 0.6, 0.6]; the minimax closed form must
    reproduce the pooled solution and the output must be monotone."""
    from hudi_utility_spark.ops.mlfit import isotonic_calibrate

    rows = []
    for b, pos in ((0, 2), (1, 8), (2, 4)):
        rows += [(b, 1)] * pos + [(b, 0)] * (10 - pos)
    df = spark.createDataFrame(rows, ["bin", "label"])
    out = sorted(isotonic_calibrate(df).collect(), key=lambda r: r.bin)
    assert [r.raw_rate for r in out] == [0.2, 0.8, 0.4]
    assert [r.iso_rate for r in out] == [0.2, 0.6, 0.6]
    assert all(a.iso_rate <= b.iso_rate for a, b in zip(out, out[1:]))


def test_isotonic_calibrate_already_monotone_is_identity(spark):
    from hudi_utility_spark.ops.mlfit import isotonic_calibrate

    rows = []
    for b, pos in ((0, 1), (1, 5), (2, 9)):
        rows += [(b, 1)] * pos + [(b, 0)] * (10 - pos)
    df = spark.createDataFrame(rows, ["bin", "label"])
    out = sorted(isotonic_calibrate(df).collect(), key=lambda r: r.bin)
    assert [r.iso_rate for r in out] == [r.raw_rate for r in out]


def test_permutation_test_detects_and_ignores_effects(spark):
    """A huge planted arm effect must be more extreme than every
    hash permutation (p = 1/(B+1)); a label carrying no effect must
    not reject (p well above 0.05). Also pins the one-aggregate
    shape: n equals the row count."""
    from hudi_utility_spark.ops.mlfit import permutation_test

    rows = [(i, 100.0 + (i % 7), 1) for i in range(200)]
    rows += [(1000 + i, float(i % 7), 0) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "v", "label"])
    r = permutation_test(df, "id", "v", "label", n_perm=49).collect()[0]
    assert r.n == 400
    assert abs(r.obs_diff - 100.0) < 1e-6
    assert r.n_extreme == 0 and r.p_value == round(1 / 50, 6)

    null = df.selectExpr("id", "v", "CAST(id % 2 AS INT) AS label")
    r2 = permutation_test(null, "id", "v", "label", n_perm=49).collect()[0]
    assert r2.p_value > 0.05
