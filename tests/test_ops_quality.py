"""Constraint-suite semantics on seeded-violation frames."""

from __future__ import annotations

from hudi_utility_spark.ops import quality as Q


def test_constraint_report_counts_each_violation_kind(spark):
    rows = [
        # (id, status, price, fk)
        (1, "A", 10.0, 1),
        (2, "B", -5.0, 1),     # range violation
        (2, "A", 3.0, 2),      # duplicate id
        (3, None, 7.0, 99),    # null status is NOT a violation of accepted_values; fk orphan
        (4, "Z", None, None),  # accepted_values violation; null price/fk not violations
        (None, "A", 1.0, 2),   # not_null(id) violation
    ]
    df = spark.createDataFrame(rows, "id bigint, status string, price double, fk bigint")
    ref = spark.createDataFrame([(1,), (2,)], "k bigint")
    rep = {
        r["constraint"]: (r["violations"], r["passed"])
        for r in Q.constraint_report(
            df,
            [
                Q.not_null("id"),
                Q.in_range("price", lo=0.0, hi=9.0),
                Q.accepted_values("status", ["A", "B"]),
                Q.unique("id"),
                Q.references("fk", ref, "k"),
            ],
        ).collect()
    }
    assert rep["not_null(id)"] == (1, False)
    # -5 below lo, 10 above hi; NULL price ignored
    assert rep["in_range(price)"] == (2, False)
    assert rep["accepted_values(status)"] == (1, False)  # only 'Z'; NULL ignored
    # ids: [1,2,2,3,4,None] -> 6 rows over 5 groups (null its own group)
    assert rep["unique(id)"] == (1, False)
    assert rep["references(fk->k)"] == (1, False)  # only fk=99; NULL ignored


def test_constraint_report_all_green(spark):
    df = spark.createDataFrame([(1, "A"), (2, "B")], "id bigint, status string")
    rep = Q.constraint_report(
        df, [Q.not_null("id"), Q.accepted_values("status", ["A", "B"]), Q.unique("id")]
    ).collect()
    assert all(r["passed"] and r["violations"] == 0 for r in rep)
    assert len(rep) == 3


def test_single_aggregate_pass_for_row_local_constraints(spark, orders):
    rep = Q.constraint_report(
        orders,
        [Q.not_null("o_custkey"), Q.in_range("o_totalprice", lo=0)],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # both row-local checks fold into one scan + one aggregate
    assert plan.count("Scan parquet") <= 1


def test_profile_columns_counts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (None, "b")], "id bigint, s string"
    )
    rep = {r["column"]: r for r in Q.profile_columns(df, ["id", "s"]).collect()}
    assert rep["id"]["n_rows"] == 4
    assert rep["id"]["n_nulls"] == 1
    assert rep["id"]["n_distinct"] == 3
    assert rep["s"]["n_nulls"] == 1
    assert rep["s"]["n_distinct"] == 2


def test_hll_distinct_accuracy_and_null_handling(spark, events):
    from hudi_utility_spark.ops.quality import hll_distinct

    est = {
        r["column"]: r.est_distinct
        for r in hll_distinct(events, ["user_id", "event_type"], p=9).collect()
    }
    exact = {
        "user_id": events.select("user_id").distinct().count(),
        "event_type": events.select("event_type").distinct().count(),
    }
    # 1.04/sqrt(512) ≈ 4.6% standard error; allow 3 sigma (and the
    # linear-counting regime for tiny cardinalities is near-exact)
    for c, e in exact.items():
        assert abs(est[c] - e) <= max(3 * 0.046 * e, 2.0), (c, est[c], e)

    # NULLs are not counted
    import pyspark.sql.functions as F
    with_nulls = events.withColumn(
        "maybe", F.when(F.col("event_id") % 2 == 0, F.col("user_id"))
    )
    est_n = {
        r["column"]: r.est_distinct
        for r in hll_distinct(with_nulls, ["maybe"], p=9).collect()
    }
    exact_n = with_nulls.filter("maybe IS NOT NULL").select("maybe").distinct().count()
    assert abs(est_n["maybe"] - exact_n) <= max(3 * 0.046 * exact_n, 2.0)


def test_equi_width_histogram_counts_and_edges(spark, events):
    from hudi_utility_spark.ops.quality import equi_width_histogram

    hist = equi_width_histogram(events, "value", n_buckets=10)
    rows = sorted(hist.collect(), key=lambda r: r["bucket"])
    vals = [r["value"] for r in events.select("value").collect() if r["value"] is not None]
    lo, hi = min(vals), max(vals)
    # lossless: bucket counts partition the non-null rows
    assert sum(r["n"] for r in rows) == len(vals)
    # python reference per bucket
    import collections

    want = collections.Counter(
        min(int((v - lo) * 10 / (hi - lo)), 9) for v in vals
    )
    got = {r["bucket"]: r["n"] for r in rows}
    assert got == dict(want)
    # edges tile [lo, hi] without gaps
    for r in rows:
        assert r["bucket_lo"] < r["bucket_hi"]


def test_equi_width_histogram_degenerate_single_value(spark):
    from hudi_utility_spark.ops.quality import equi_width_histogram

    df = spark.createDataFrame([(1.5,)] * 7 + [(None,)], ["x"])
    hist = equi_width_histogram(df, "x", n_buckets=8)
    rows = hist.collect()
    assert len(rows) == 1 and rows[0]["n"] == 7 and rows[0]["bucket"] == 0


def test_equi_width_histogram_clamps_caller_bounds_and_empty(spark):
    from hudi_utility_spark.ops.quality import equi_width_histogram

    df = spark.createDataFrame([(-0.5,), (0.25,), (0.75,), (1.5,)], ["x"])
    hist = equi_width_histogram(df, "x", n_buckets=4, lo=0.0, hi=1.0)
    got = {r["bucket"]: r["n"] for r in hist.collect()}
    # out-of-range values land in the edge buckets, never negative bins
    # (-0.5 clamps to 0; 1.5 clamps to 3; 0.75 sits on the bucket-3 edge)
    assert got == {0: 1, 1: 1, 3: 2}
    assert all(0 <= b <= 3 for b in got)
    empty = spark.createDataFrame([(None,)], "x double")
    assert equi_width_histogram(empty, "x", n_buckets=4).count() == 0


def test_quarantine_split_partitions_rows_and_names_failures(spark):
    from hudi_utility_spark.ops import quality as Q

    df = spark.createDataFrame(
        [
            (1, 10.0, "ok"),
            (2, None, "ok"),       # null value
            (3, 999.0, "bad"),     # range + accepted_values
            (4, 5.0, "bad"),       # accepted_values only
        ],
        "id long, v double, status string",
    )
    suite = [
        Q.not_null("v"),
        Q.in_range("v", 0, 100),
        Q.accepted_values("status", ["ok"]),
    ]
    good, bad = Q.quarantine_split(df, suite)
    assert [r["id"] for r in good.orderBy("id").collect()] == [1]
    got = {r["id"]: r["violations"] for r in bad.collect()}
    assert got[2] == ["not_null(v)"]
    assert got[3] == ["in_range(v)", "accepted_values(status)"]  # suite order
    assert got[4] == ["accepted_values(status)"]
    # good ∪ bad is a partition of the input
    assert good.count() + bad.count() == df.count()


def test_quarantine_split_requires_row_local_constraint(spark):
    import pytest

    from hudi_utility_spark.ops import quality as Q

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="row-local"):
        Q.quarantine_split(df, [Q.unique("id")])


def test_pseudonymize_links_across_tables_and_rotates(spark):
    from hudi_utility_spark.ops import quality as Q

    a = spark.createDataFrame([(1, "x"), (2, "y"), (None, "z")], "uid long, p string")
    b = spark.createDataFrame([(1, "seg1"), (2, "seg2")], "uid long, seg string")
    ta = Q.pseudonymize(a, ["uid"], salt="s1")
    tb = Q.pseudonymize(b, ["uid"], salt="s1")
    joined = ta.join(tb, "uid")
    assert joined.count() == 2  # same salt -> tokens link exactly
    assert {r["p"] for r in joined.collect()} == {"x", "y"}
    # raw ids never survive
    toks = {r["uid"] for r in ta.collect()}
    assert None in toks and all(t is None or len(t) == 32 for t in toks)
    # rotated salt severs linkage
    tb2 = Q.pseudonymize(b, ["uid"], salt="s2")
    assert ta.join(tb2, "uid").isEmpty()


def test_k_anonymity_audit_and_suppression(spark):
    from hudi_utility_spark.ops.quality import k_anonymity_audit, k_suppress

    rows = (
        [("en", "wiki", i) for i in range(6)]       # safe class (6 >= 5)
        + [("de", "web", 10 + i) for i in range(2)]  # violating (2 < 5)
        + [(None, "web", 99)]                        # NULL class, size 1
    )
    df = spark.createDataFrame(rows, ["lang", "source", "id"])
    audit = {
        (r["lang"], r["source"]): (r["class_size"], r["violates_k"])
        for r in k_anonymity_audit(df, ["lang", "source"], k=5).collect()
    }
    assert audit[("en", "wiki")] == (6, False)
    assert audit[("de", "web")] == (2, True)
    assert audit[(None, "web")] == (1, True)

    out = k_suppress(df, ["lang", "source"], k=5)
    got = {r["id"]: (r["lang"], r["source"]) for r in out.collect()}
    assert len(got) == 9  # no row dropped or duplicated
    for i in range(6):
        assert got[i] == ("en", "wiki")          # safe class untouched
    # violating classes fully suppressed (including the NULL class row)
    for i in (10, 11, 99):
        assert got[i] == (None, None)
    # post-suppression: every surviving non-NULL class has >= k members
    resurvey = k_anonymity_audit(out, ["lang", "source"], k=5).collect()
    for r in resurvey:
        if r["lang"] is not None:
            assert not r["violates_k"]


def test_dp_noisy_counts_deterministic_and_epsilon_scaled(spark):
    from hudi_utility_spark.ops.quality import dp_noisy_counts

    df = spark.createDataFrame(
        [(i, f"g{i % 4}") for i in range(400)], ["id", "grp"]
    )
    r1 = {r.grp: r.noisy_count for r in dp_noisy_counts(df, ["grp"], 1.0, seed="dp").collect()}
    r2 = {r.grp: r.noisy_count for r in dp_noisy_counts(df, ["grp"], 1.0, seed="dp").collect()}
    assert r1 == r2  # same seed -> identical release
    other = {r.grp: r.noisy_count for r in dp_noisy_counts(df, ["grp"], 1.0, seed="s2").collect()}
    assert r1 != other  # rotated seed -> fresh draws
    # true count is 100 per group; eps=1 noise is Lap(1): |noise| < 40 w.p. ~1
    assert all(abs(v - 100) < 40 for v in r1.values())
    assert any(abs(v - 100) > 1e-9 for v in r1.values())  # noise actually applied
    # smaller epsilon -> strictly larger noise magnitude (same u, scaled 10x)
    loose = {r.grp: r.noisy_count for r in dp_noisy_counts(df, ["grp"], 0.1, seed="dp").collect()}
    for g in r1:
        assert abs(loose[g] - 100) > abs(r1[g] - 100)


def test_l_diversity_flags_homogeneous_classes(spark):
    from hudi_utility_spark.ops.quality import l_diversity_audit

    rows = (
        [(i, "A", "flu") for i in range(5)]            # k-anonymous but homogeneous
        + [(10 + i, "B", ["flu", "cold", "ok"][i]) for i in range(3)]  # diverse
        + [(20, "C", None), (21, "C", "flu")]          # NULL counts as a value
    )
    df = spark.createDataFrame(rows, ["id", "zip", "diagnosis"])
    out = {r.zip: r for r in l_diversity_audit(df, ["zip"], "diagnosis", l=3).collect()}
    assert out["A"].violates_l and out["A"].n_sensitive_values == 1
    assert not out["B"].violates_l and out["B"].n_sensitive_values == 3
    # C: {NULL, flu} -> 2 values, violates l=3
    assert out["C"].n_sensitive_values == 2 and out["C"].violates_l


def test_bootstrap_ci_brackets_mean_and_shrinks_with_n(spark):
    from hudi_utility_spark.ops.quality import bootstrap_ci

    rows = [(i, "big", float(10 + (i * 17) % 21 - 10)) for i in range(400)]
    rows += [(1000 + i, "small", float(10 + (i * 17) % 21 - 10)) for i in range(20)]
    df = spark.createDataFrame(rows, ["id", "grp", "x"])
    out = {r.grp: r for r in bootstrap_ci(df, "grp", "x", "id").collect()}
    for g in ("big", "small"):
        assert out[g].ci_lo <= out[g].mean <= out[g].ci_hi
    # same distribution, 20x the sample -> visibly tighter interval
    assert (out["big"].ci_hi - out["big"].ci_lo) < (
        out["small"].ci_hi - out["small"].ci_lo
    )
    # deterministic across runs
    again = {r.grp: r for r in bootstrap_ci(df, "grp", "x", "id").collect()}
    assert {g: (r.ci_lo, r.ci_hi) for g, r in out.items()} == {
        g: (r.ci_lo, r.ci_hi) for g, r in again.items()
    }


def test_hll_sketch_merge_equals_sketch_of_union(spark):
    from hudi_utility_spark.ops.quality import hll_sketch, hll_union_estimate

    a = spark.createDataFrame([(f"u{i}",) for i in range(300)], ["k"])
    b = spark.createDataFrame([(f"u{i}",) for i in range(150, 450)], ["k"])
    merged_est = hll_union_estimate(
        [hll_sketch(a, "k"), hll_sketch(b, "k")]
    ).collect()[0].est_union_distinct
    direct_est = hll_union_estimate(
        [hll_sketch(a.unionByName(b), "k")]
    ).collect()[0].est_union_distinct
    assert merged_est == direct_est  # merge is LOSSLESS, not approximate
    assert abs(merged_est - 450) / 450 < 0.15  # ~4.6% expected at p=9


def test_luhn_valid_and_check_digit(spark):
    from pyspark.sql import functions as F

    from hudi_utility_spark.ops.quality import luhn_check_digit, luhn_valid

    cases = spark.createDataFrame(
        [
            ("4539578763621486", True),   # known-valid Visa test PAN
            ("4539578763621487", False),  # off-by-one check digit
            ("79927398713", False),       # Luhn-valid but < 13 digits
            ("4539-5787-6362-1486", False),  # separators -> not digits
            (None, False),
        ],
        "pan string, want boolean",
    )
    rows = cases.select("want", luhn_valid(F.col("pan")).alias("got")).collect()
    assert all(r.want == r.got for r in rows)

    # check-digit issue <-> full-sum validation agree over 200 bases
    base = F.concat(
        F.lit("5"),
        F.lpad((F.col("id") * 48271 % 10**14).cast("string"), 14, "0"),
    )
    pan = F.concat(base, luhn_check_digit(base).cast("string"))
    n_ok = (
        spark.range(200)
        .select(luhn_valid(pan).cast("int").alias("ok"))
        .agg(F.sum("ok"))
        .collect()[0][0]
    )
    assert n_ok == 200


def test_cohen_kappa_known_value(spark):
    """Classic worked example: confusion [[20,5],[10,15]] over n=50
    -> po=0.70, pe=(30*25 + 20*25)/2500 = 0.50, kappa = 0.40."""
    from hudi_utility_spark.ops.quality import cohen_kappa

    rows = (
        [("y", "y")] * 20
        + [("y", "n")] * 5
        + [("n", "y")] * 10
        + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    r = cohen_kappa(df, "a", "b").collect()[0]
    assert r.n == 50
    assert abs(r.po - 0.70) < 1e-9
    assert abs(r.pe - 0.50) < 1e-9
    assert abs(r.kappa - 0.40) < 1e-9


def test_cohen_kappa_perfect_and_chance(spark):
    from hudi_utility_spark.ops.quality import cohen_kappa

    same = spark.createDataFrame(
        [("a", "a")] * 3 + [("b", "b")] * 7, ["a", "b"]
    )
    assert cohen_kappa(same, "a", "b").collect()[0].kappa == 1.0
    # independent raters with 50/50 marginals -> po == pe -> kappa 0
    indep = spark.createDataFrame(
        [("x", "x"), ("x", "y"), ("y", "x"), ("y", "y")], ["a", "b"]
    )
    assert cohen_kappa(indep, "a", "b").collect()[0].kappa == 0.0


def test_cohen_kappa_category_guard(spark):
    import pytest

    from hudi_utility_spark.ops.quality import cohen_kappa

    df = spark.range(0, 200).selectExpr("id AS a", "id AS b")
    with pytest.raises(ValueError, match="categorical"):
        cohen_kappa(df, "a", "b", max_categories=50).collect()


def test_benford_profile_known_digits_and_spine(spark):
    """Hand-planted magnitudes spanning scales; digits absent from the
    data must still appear with n=0 (their chi2 evidence counts)."""
    from hudi_utility_spark.ops.quality import benford_profile

    vals = [1.0, 12.0, 150.0, 0.19, 2.5, 29.0, 3.7, 9000.0]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    out = {r.digit: r for r in benford_profile(df, "v").collect()}
    assert set(out) == set(range(1, 10))
    assert out[1].n == 4 and out[2].n == 2 and out[3].n == 1 and out[9].n == 1
    assert out[4].n == 0 and out[4].share == 0.0
    chi2 = {r.chi2 for r in out.values()}
    assert len(chi2) == 1  # feature-level scalar repeated per row
    # non-positive values are excluded, not crashed on
    with_zero = spark.createDataFrame(
        [(0.0,), (-5.0,), (7.0,)], ["v"]
    )
    out2 = {r.digit: r.n for r in benford_profile(with_zero, "v").collect()}
    assert out2[7] == 1 and sum(out2.values()) == 1
