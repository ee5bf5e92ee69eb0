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


def test_bfs_hops_hand_graph(spark):
    # path graph 1-2-3-4-5-6 seeded at 1: dist = node-1, capped at 4 hops
    from hudi_utility_spark.ops.graph import bfs_hops, symmetrize

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    got = {
        r["node"]: r["dist"]
        for r in bfs_hops(symmetrize(edges), seeds, max_hops=4).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}  # node 6 is 5 hops: cut


def test_bfs_hops_takes_min_over_branches(spark):
    # cycle 1-2-3-4-1: node 3 reachable both ways at dist 2
    from hudi_utility_spark.ops.graph import bfs_hops, symmetrize

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    got = {
        r["node"]: r["dist"]
        for r in bfs_hops(symmetrize(edges), seeds, max_hops=4).collect()
    }
    assert got == {1: 0, 2: 1, 4: 1, 3: 2}


def test_clustering_coefficient_triangle_plus_tail(spark, tmp_path):
    # K3 {1,2,3} plus tail 3-4: cc(1)=cc(2)=1, cc(3)=2*1/(3*2)=1/3,
    # node 4 has degree 1 -> excluded
    import pandas as pd

    orders = [(1, 1), (1, 2), (2, 2), (2, 3), (3, 1), (3, 3), (4, 3), (4, 4)]
    pd.DataFrame(orders, columns=["l_orderkey", "l_partkey"]).to_parquet(
        tmp_path / "lineitem.parquet"
    )
    from hudi_utility_spark.queries import QUERIES

    rows = {
        r["node"]: r
        for r in QUERIES["graph_clustering_coefficient"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(rows) == {1, 2, 3}
    assert rows[1]["clustering_coef"] == 1.0
    assert rows[2]["clustering_coef"] == 1.0
    assert abs(rows[3]["clustering_coef"] - round(1 / 3, 6)) < 1e-9


def test_referential_integrity_clean_corpus(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    rows = QUERIES["dq_referential_integrity"](spark, sf_dir).collect()
    assert len(rows) == 7
    # the driver-generated corpus is referentially clean
    assert all(r["ok"] for r in rows)
    assert all(r["child_rows"] > 0 for r in rows)


def test_referential_integrity_flags_injected_orphan(spark, tmp_path):
    # minimal 7-table scratch corpus: one lineitem points at order 999
    # (orphan), one customer at nation 42 (orphan); NULL FK is NOT an
    # orphan but still counts as a child row
    import pandas as pd

    t = {
        "region": pd.DataFrame({"r_regionkey": [0], "r_name": ["r"]}),
        "nation": pd.DataFrame(
            {"n_nationkey": [0], "n_name": ["n"], "n_regionkey": [0]}
        ),
        "customer": pd.DataFrame(
            {"c_custkey": [1, 2], "c_nationkey": [0, 42]}
        ),
        "supplier": pd.DataFrame({"s_suppkey": [1], "s_nationkey": [0]}),
        "part": pd.DataFrame({"p_partkey": [1]}),
        "orders": pd.DataFrame({"o_orderkey": [1], "o_custkey": [1]}),
        "lineitem": pd.DataFrame(
            {
                "l_orderkey": pd.array([1, 999, None], dtype="Int64"),
                "l_partkey": [1, 1, 1],
                "l_suppkey": [1, 1, 1],
            }
        ),
    }
    for name, df in t.items():
        df.to_parquet(tmp_path / f"{name}.parquet")
    from hudi_utility_spark.queries import QUERIES

    rows = {
        r["fk_edge"]: r
        for r in QUERIES["dq_referential_integrity"](
            spark, str(tmp_path)
        ).collect()
    }
    lo = rows["lineitem.l_orderkey->orders.o_orderkey"]
    assert lo["child_rows"] == 2 and lo["orphan_rows"] == 1 and not lo["ok"]
    cn = rows["customer.c_nationkey->nation.n_nationkey"]
    assert cn["orphan_rows"] == 1 and not cn["ok"]
    assert rows["lineitem.l_partkey->part.p_partkey"]["ok"]


def test_kendall_tau_perfect_and_reversed(spark, tmp_path):
    # x and y strictly increasing together across days -> tau_b = 1
    import pandas as pd

    days = pd.to_datetime([f"2024-01-{d:02d}" for d in range(1, 11)])
    rows = []
    for i, d in enumerate(days):
        for j in range(i + 1):  # day i has i+1 orders
            rows.append((len(rows), d, 10.0 * (i + 1) + j * 0.0))
    pd.DataFrame(rows, columns=["o_orderkey", "o_orderdate", "o_totalprice"]).to_parquet(
        tmp_path / "orders.parquet"
    )
    from hudi_utility_spark.queries import QUERIES

    r = QUERIES["stat_kendall_tau"](spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 10
    assert r["discordant"] == 0
    assert abs(r["tau_b"] - 1.0) < 1e-9


def test_classification_report_macro_consistent(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    rows = QUERIES["ml_classification_report"](spark, sf_dir).collect()
    per = [r for r in rows if r["label"] != "__macro__"]
    macro = [r for r in rows if r["label"] == "__macro__"][0]
    assert macro["support"] == sum(r["support"] for r in per)
    assert macro["tp"] == sum(r["tp"] for r in per)
    for r in per:
        assert 0 <= r["precision"] <= 1 and 0 <= r["recall"] <= 1
        assert r["support"] == r["tp"] + r["fn"]
    assert abs(macro["f1"] - round(sum(r["f1"] for r in per) / len(per), 6)) < 1e-4


def test_good_turing_identities(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    rows = {r["r"]: r for r in QUERIES["text_good_turing"](spark, sf_dir).collect()}
    assert rows, "expected sparse trigram counts"
    # MLE mass at r is r*N_r/N: positive, and sums to <= 1 over r<=10
    assert sum(r["mle_mass"] for r in rows.values()) <= 1.0 + 1e-6
    for r, row in rows.items():
        assert row["n_types"] > 0
        if r + 1 in rows:
            expect = (r + 1) * rows[r + 1]["n_types"] / row["n_types"]
            assert abs(row["gt_count"] - round(expect, 6)) < 1e-6


def test_ngram_novelty_bounds(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    rows = QUERIES["text_ngram_novelty"](spark, sf_dir).collect()
    assert rows, "holdout split must be non-empty"
    for r in rows:
        assert r["doc_id"] % 10 == 7
        assert 0 <= r["novel_grams"] <= r["n_grams"]
        assert abs(r["novelty_rate"] - round(r["novel_grams"] / r["n_grams"], 6)) < 1e-9


def test_qini_uplift_last_decile_covers_everyone(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    rows = sorted(
        QUERIES["ev_qini_uplift"](spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert len(rows) == 10
    # cumulative counts are monotone as deciles descend (decile 1 row
    # accumulates everything)
    full = rows[0]
    for r in rows[1:]:
        assert r["cum_treated"] <= full["cum_treated"]
        assert r["cum_control"] <= full["cum_control"]


def test_tost_symmetry(spark, sf_dir):
    # t_lower + t_upper == 2*margin/se by construction
    from hudi_utility_spark.queries import QUERIES

    r = QUERIES["ev_tost_equivalence"](spark, sf_dir).collect()[0]
    assert abs((r["t_lower"] + r["t_upper"]) - round(2 * r["margin"] / r["se"], 4) ) < 1e-2
    assert r["n_treated"] > 0 and r["n_control"] > 0


def test_fleiss_kappa_perfect_agreement_is_one(spark, tmp_path):
    # all three raters say "good" for every doc -> p_bar = 1, kappa = 1
    import pandas as pd

    good = " ".join(["wordword"] * 60)  # 60 words > 55, 8 chars/word > 5.45
    bad = " ".join(["ab"] * 10)  # 10 words, 2 chars/word, short
    texts = [good if i % 2 else bad for i in range(20)]
    pd.DataFrame(
        {
            "doc_id": range(20),
            "text": texts,
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    from hudi_utility_spark.queries import QUERIES

    r = QUERIES["stat_fleiss_kappa"](spark, str(tmp_path)).collect()[0]
    assert r["p_bar"] == 1.0
    assert r["fleiss_kappa"] == 1.0


def test_burstiness_at_least_one(spark, sf_dir):
    # burstiness = cf/df >= 1 always; VMR >= 0
    from hudi_utility_spark.queries import QUERIES

    rows = QUERIES["text_term_burstiness"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["burstiness"] >= 1.0
        assert r["vmr"] >= -1e-9
        assert r["doc_freq"] >= 5


def test_cohort_ltv_monotone_cumulative(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES
    import collections

    rows = QUERIES["ev_cohort_ltv"](spark, sf_dir).collect()
    assert rows
    by_cohort = collections.defaultdict(list)
    for r in rows:
        by_cohort[r["cohort_week"]].append(r)
    for week, rs in by_cohort.items():
        rs.sort(key=lambda r: r["week_offset"])
        lts = [r["cum_ltv_per_user"] for r in rs]
        assert lts == sorted(lts), f"LTV must be cumulative for {week}"


def test_knn_accuracy_separable_clusters(spark, tmp_path):
    # two far-apart clusters: 3-NN recovers the label perfectly
    import pandas as pd
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for i in range(40):
        label = i % 2
        base = np.zeros(8, dtype=np.float32)
        base[label] = 10.0
        rows.append(
            (i, (base + rng.normal(0, 0.01, 8)).astype(np.float32), label)
        )
    pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]).to_parquet(
        tmp_path / "embeddings.parquet"
    )
    from hudi_utility_spark.queries import QUERIES

    got = {
        r["label"]: r
        for r in QUERIES["ml_knn_accuracy"](spark, str(tmp_path)).collect()
    }
    assert set(got) == {0, 1}
    for r in got.values():
        assert r["accuracy"] == 1.0


def test_outlier_iqr_hand_case(spark, tmp_path):
    import pandas as pd

    vals = [10.0] * 20 + [1000.0]  # one far-high point
    pd.DataFrame(
        {
            "event_id": range(21),
            "event_type": ["a"] * 21,
            "value": vals,
        }
    ).to_parquet(tmp_path / "events.parquet")
    from hudi_utility_spark.queries import QUERIES

    r = QUERIES["dq_outlier_iqr"](spark, str(tmp_path)).collect()[0]
    assert r["high_outliers"] == 1 and r["low_outliers"] == 0
    assert abs(r["outlier_rate"] - round(1 / 21, 6)) < 1e-9


def test_stickiness_bounds(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    rows = QUERIES["ev_dau_mau_stickiness"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["stickiness"] <= 1.0
        assert r["avg_dau"] <= r["mau"]


def test_kmv_jaccard_within_sketch_error(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    r = QUERIES["approx_kmv_jaccard"](spark, sf_dir).collect()[0]
    assert 0 <= r["jaccard_kmv"] <= 1 and 0 <= r["jaccard_exact"] <= 1
    # k=256 sketch: generous 3-sigma-ish bound on absolute error
    assert abs(r["jaccard_kmv"] - r["jaccard_exact"]) < 0.15
    assert r["rho"] <= r["k"]


def test_assortativity_star_graph_is_negative(spark, tmp_path):
    # star: hub 1 in every basket with a distinct leaf -> perfectly
    # disassortative (r = -1 in the 2-degree-class limit)
    import pandas as pd

    rows = [(o, 1) for o in range(2, 8)] + [(o, o) for o in range(2, 8)]
    pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"]).to_parquet(
        tmp_path / "lineitem.parquet"
    )
    from hudi_utility_spark.queries import QUERIES

    r = QUERIES["graph_assortativity"](spark, str(tmp_path)).collect()[0]
    assert r["n_directed_edges"] == 12
    assert r["assortativity"] == -1.0


def test_seasonal_strength_bounds(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    r = QUERIES["ts_seasonal_strength"](spark, sf_dir).collect()[0]
    assert r["n_hours"] > 0
    assert 0.0 <= r["trend_strength"] <= 1.0
    assert 0.0 <= r["seasonal_strength"] <= 1.0


def test_time_to_convert_quantiles_ordered(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    r = QUERIES["ev_time_to_convert"](spark, sf_dir).collect()[0]
    assert r["n_converted"] > 0
    assert r["p25_hours"] <= r["p50_hours"] <= r["p75_hours"] <= r["p90_hours"]
    assert r["p25_hours"] >= 0


def test_candidate_keys_orders_pk(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    rows = {r["candidate"]: r for r in QUERIES["dq_candidate_keys"](spark, sf_dir).collect()}
    assert rows["o_orderkey"]["is_key"]
    assert rows["o_orderkey"]["uniqueness"] == 1.0
    assert not rows["o_orderstatus"]["is_key"]
    assert rows["o_custkey"]["n_distinct"] <= rows["o_custkey+o_orderdate"]["n_distinct"]


def test_gaps_islands_detects_injected_gap(spark, tmp_path):
    import pandas as pd

    # hours 0..5 and 10..12: two islands, gap of 4 before the second
    hours = list(range(6)) + list(range(10, 13))
    pd.DataFrame(
        {
            "event_id": range(len(hours)),
            "ts": pd.to_datetime([h * 3600 * 10**9 for h in hours]),
        }
    ).to_parquet(tmp_path / "events.parquet")
    from hudi_utility_spark.queries import QUERIES

    rows = sorted(
        QUERIES["ts_gaps_islands"](spark, str(tmp_path)).collect(),
        key=lambda r: r["start_hidx"],
    )
    assert len(rows) == 2
    assert (rows[0]["start_hidx"], rows[0]["end_hidx"], rows[0]["n_hours"]) == (0, 5, 6)
    assert (rows[1]["start_hidx"], rows[1]["end_hidx"], rows[1]["n_hours"]) == (10, 12, 3)
    assert rows[0]["gap_before"] == 0 and rows[1]["gap_before"] == 4


def test_cross_field_rules_clean_and_complete(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    rows = {r["rule"]: r for r in QUERIES["dq_cross_field_rules"](spark, sf_dir).collect()}
    assert len(rows) == 4
    assert rows["discount in [0,1]"]["violations"] == 0
    assert rows["quantity positive"]["violations"] == 0
    for r in rows.values():
        assert 0 <= r["violation_rate"] <= 1


def test_kfold_balance_partitions_everything(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES
    from hudi_utility_spark.tables import load_table

    rows = QUERIES["pipeline_kfold_balance"](spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n"] for r in rows) == n_docs
    assert {r["fold"] for r in rows} <= set(range(5))
    # shares per lang sum to 1
    import collections

    by_lang = collections.defaultdict(float)
    for r in rows:
        by_lang[r["lang"]] += r["lang_share"]
    for lang, s in by_lang.items():
        assert abs(s - 1.0) < 1e-4, (lang, s)


def test_platt_scaling_shapes(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    rows = {r["metric"]: r["value"] for r in QUERIES["ml_platt_scaling"](spark, sf_dir).collect()}
    assert set(rows) == {"bias", "slope", "mean_calibrated", "base_rate"}
    assert 0 <= rows["mean_calibrated"] <= 1
    assert 0 <= rows["base_rate"] <= 1


def test_kaplan_meier_monotone_and_bounded(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    rows = sorted(
        QUERIES["ev_survival_kaplan_meier"](spark, sf_dir).collect(),
        key=lambda r: r["duration_days"],
    )
    assert rows
    prev = 1.0
    for r in rows:
        assert 0.0 <= r["survival"] <= prev + 1e-9  # non-increasing
        prev = r["survival"]
        assert r["n_at_risk"] >= r["d_events"] >= 0


def test_kaplan_meier_censoring_keeps_survival_up(spark, tmp_path):
    # 4 users end at day 1; 2 of them are censored (active within 7d of
    # corpus end) -> S(1) = 1 - 2/4 = 0.5, not 0
    import pandas as pd

    base = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    for u in range(4):
        rows.append((eid, base, u)); eid += 1
        rows.append((eid, base + pd.Timedelta(days=1), u)); eid += 1
    # two extra users whose last event defines corpus end (censored at 30d)
    for u in (10, 11):
        rows.append((eid, base, u)); eid += 1
        rows.append((eid, base + pd.Timedelta(days=30), u)); eid += 1
    pd.DataFrame(rows, columns=["event_id", "ts", "user_id"]).to_parquet(
        tmp_path / "events.parquet"
    )
    from hudi_utility_spark.queries import QUERIES

    got = {
        r["duration_days"]: r
        for r in QUERIES["ev_survival_kaplan_meier"](spark, str(tmp_path)).collect()
    }
    # the 4 day-1 users churned (29 days before end); S drops to 1-4/6
    assert abs(got[1]["survival"] - round(1 - 4 / 6, 6)) < 1e-9
    # the 30-day users are censored -> survival stays put, never 0
    assert got[30]["survival"] == got[1]["survival"]


def test_modularity_perfect_communities(spark, tmp_path):
    # two disjoint triangles with brand = component -> strong positive Q
    import pandas as pd

    li = [(1, 1), (1, 2), (2, 2), (2, 3), (3, 1), (3, 3),
          (4, 4), (4, 5), (5, 5), (5, 6), (6, 4), (6, 6)]
    pd.DataFrame(li, columns=["l_orderkey", "l_partkey"]).to_parquet(
        tmp_path / "lineitem.parquet"
    )
    pd.DataFrame(
        {"p_partkey": [1, 2, 3, 4, 5, 6],
         "p_brand": ["A", "A", "A", "B", "B", "B"]}
    ).to_parquet(tmp_path / "part.parquet")
    from hudi_utility_spark.queries import QUERIES

    r = QUERIES["graph_modularity"](spark, str(tmp_path)).collect()[0]
    assert r["n_communities"] == 2 and r["n_edges"] == 6
    assert abs(r["modularity"] - 0.5) < 1e-9  # 2*(3/6 - (6/12)^2/...) = 0.5


def test_image_entropy_flat_vs_ramp(spark):
    # a ramp image has near-uniform bytes -> entropy much larger than 0
    from hudi_utility_spark.queries import QUERIES

    rows = QUERIES["mm_image_entropy"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 40
    for r in rows:
        assert 0.0 <= r["entropy_bits"] <= 8.0
        assert r["entropy_bits"] > 6.0  # ramp fills most of the 256 bins
        assert r["n_distinct"] <= 256


def test_its_change_row_is_post_minus_pre(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    rows = {r["segment"]: r for r in QUERIES["ev_its_segmented"](spark, sf_dir).collect()}
    assert set(rows) == {"pre", "post", "change"}
    # change rounds AFTER differencing the unrounded slopes; comparing
    # against the difference of rounded ones allows 1 ulp at 6dp
    assert abs(
        rows["change"]["slope"] - (rows["post"]["slope"] - rows["pre"]["slope"])
    ) < 2e-6
    assert rows["change"]["n_days"] == rows["pre"]["n_days"] + rows["post"]["n_days"]


def test_cochran_q_nonnegative(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    r = QUERIES["stat_cochran_q"](spark, sf_dir).collect()[0]
    assert r["q_stat"] >= 0
    assert r["df"] == 2


def test_partition_sizing_sane(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    rows = {r["tbl"]: r for r in QUERIES["plan_partition_sizing"](spark, sf_dir).collect()}
    assert set(rows) == {"lineitem", "orders", "events", "documents"}
    for r in rows.values():
        assert r["est_bytes"] >= r["n_rows"]
        assert r["shuffle_partitions"] >= 1
        assert r["target_files"] <= r["shuffle_partitions"] or r["est_bytes"] < 134217728


def test_map_precision_bounds(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    r = QUERIES["rtr_map_precision"](spark, sf_dir).collect()[0]
    assert 0 <= r["ap"] <= 1
    assert 0 <= r["p_at_5"] <= 1 and 0 <= r["p_at_10"] <= 1


def test_two_proportion_z_nondegenerate(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    r = QUERIES["ev_two_proportion_z"](spark, sf_dir).collect()[0]
    assert 0 < r["rate_treated"] < 1 or 0 < r["rate_control"] < 1
    assert abs(r["rate_diff"] - (r["rate_treated"] - r["rate_control"])) < 2e-6


def test_bartlett_zero_for_identical_groups(spark, tmp_path):
    import pandas as pd

    vals = [1.0, 2.0, 3.0, 4.0, 5.0] * 4
    pd.DataFrame(
        {
            "event_id": range(40),
            "event_type": ["a"] * 20 + ["b"] * 20,
            "value": vals + vals,
        }
    ).to_parquet(tmp_path / "events.parquet")
    from hudi_utility_spark.queries import QUERIES

    r = QUERIES["stat_bartlett"](spark, str(tmp_path)).collect()[0]
    assert r["k_groups"] == 2 and r["n"] == 40
    assert abs(r["bartlett_stat"]) < 1e-9


def test_f1_threshold_beats_trivial(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES
    from hudi_utility_spark.tables import load_table
    from pyspark.sql import functions as F

    r = QUERIES["ml_f1_threshold"](spark, sf_dir).collect()[0]
    assert 0 < r["f1"] <= 1
    # F1 at the chosen threshold must be >= F1 of predict-all-positive
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    n = ev.count()
    npos = ev.filter(F.col("event_type") == "purchase").count()
    f1_all = 2 * npos / (n + npos)
    assert r["f1"] >= round(f1_all, 6) - 1e-9


def test_regression_report_reasonable(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    r = QUERIES["ml_regression_report"](spark, sf_dir).collect()[0]
    assert r["n_test"] > 0
    assert r["rmse"] >= r["mae"] >= 0
    assert r["r2_test"] <= 1.0
    # price ~ quantity is a strong relationship in TPC-H-ish data
    assert r["r2_test"] > 0.5


def test_mad_outliers_flags_far_point(spark, tmp_path):
    import pandas as pd

    vals = [10.0, 11.0, 9.0, 10.0, 12.0, 8.0, 10.0, 11.0, 9.0, 500.0]
    pd.DataFrame(
        {"event_id": range(10), "event_type": ["a"] * 10, "value": vals}
    ).to_parquet(tmp_path / "events.parquet")
    from hudi_utility_spark.queries import QUERIES

    r = QUERIES["dq_outlier_mad"](spark, str(tmp_path)).collect()[0]
    assert r["outliers"] == 1
    assert r["median"] == 10.0


def test_corrupt_json_audit_counts(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES
    from hudi_utility_spark.tables import load_table
    from pyspark.sql import functions as F

    rows = {r["lang"]: r for r in QUERIES["fmt_corrupt_json_audit"](spark, sf_dir).collect()}
    d = load_table(spark, sf_dir, "documents")
    expect_bad = d.filter(F.col("doc_id") % 7 == 3).count()
    assert rows["__corrupt__"]["n_good"] == expect_bad
    good_total = sum(r["n_good"] for k, r in rows.items() if k != "__corrupt__")
    assert good_total == d.count() - expect_bad


def test_absorbing_markov_two_state_closed_form(spark, tmp_path):
    # deterministic chain: click -> purchase every time => E(click) = 1
    import pandas as pd

    base = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    for u in range(5):
        for i in range(4):
            et = "click" if i % 2 == 0 else "purchase"
            rows.append((eid, base + pd.Timedelta(minutes=eid), u, et))
            eid += 1
    pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"]).to_parquet(
        tmp_path / "events.parquet"
    )
    from hudi_utility_spark.queries import QUERIES

    got = {
        r["state"]: r["expected_steps"]
        for r in QUERIES["ev_markov_absorbing"](spark, str(tmp_path)).collect()
    }
    assert got == {"click": 1.0}


def test_durbin_watson_range(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    r = QUERIES["stat_durbin_watson"](spark, sf_dir).collect()[0]
    assert 0.0 <= r["dw_stat"] <= 4.0
    assert r["n_days"] > 2


def test_approx_quantile_within_tol_everywhere(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    rows = QUERIES["approx_quantile_check"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["p50_within_tol"] and r["p90_within_tol"]
        assert r["p50_exact"] <= r["p90_exact"]


def test_new_vs_returning_partition(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    rows = QUERIES["ev_new_vs_returning"](spark, sf_dir).collect()
    assert rows
    total_new = sum(r["new_users"] for r in rows)
    from hudi_utility_spark.tables import load_table

    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert total_new == n_users  # every user is new exactly once
    for r in rows:
        assert r["dau"] == r["new_users"] + r["returning_users"]


def test_batch_topk_matches_single_query(spark, sf_dir):
    # query 0's batch rows must equal the single-query brute-force top-3
    # (after excluding the self-match the single-query arm includes)
    from hudi_utility_spark.queries import QUERIES

    batch = {
        (r["query_id"], r["vec_id"]): r["score"]
        for r in QUERIES["sim_batch_query_topk"](spark, sf_dir).collect()
    }
    single = [
        (r["vec_id"], r["score"])
        for r in QUERIES["sim_bruteforce_topk"](spark, sf_dir).collect()
        if r["vec_id"] != 0
    ][:3]
    got0 = sorted(
        [(v, s) for (q, v), s in batch.items() if q == 0],
        key=lambda t: (-t[1], t[0]),
    )
    assert got0 == single


def test_cart_abandonment_bounds(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    rows = QUERIES["ev_cart_abandonment"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["abandoned"] <= r["n_clicks"]
        assert 0.0 <= r["abandonment_rate"] <= 1.0


def test_chi2_gof_uniform_is_zero(spark, tmp_path):
    import pandas as pd

    # exactly equal counts per hour -> chi2 = 0
    ts = []
    for h in range(24):
        for i in range(5):
            ts.append(pd.Timestamp(2024, 1, 1 + i, h))
    pd.DataFrame({"event_id": range(len(ts)), "ts": ts}).to_parquet(
        tmp_path / "events.parquet"
    )
    from hudi_utility_spark.queries import QUERIES

    r = QUERIES["stat_chi2_gof_hour"](spark, str(tmp_path)).collect()[0]
    assert r["k_cells"] == 24 and r["chi2_stat"] == 0.0


def test_interarrival_profile_positive(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    rows = QUERIES["ev_interarrival_profile"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["mean_gap_s"] >= 0 and r["p50_gap_s"] <= r["p90_gap_s"]
        assert r["cov"] >= 0


def test_weekday_profile_shares_sum_to_one(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    rows = QUERIES["ts_weekday_profile"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= 7
    assert abs(sum(r["revenue_share"] for r in rows) - 1.0) < 1e-4
    assert {r["dow"] for r in rows} <= set(range(7))


def test_permutation_importance_ranks_word_count_first(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    rows = {r["variant"]: r["r2"] for r in QUERIES["ml_permutation_importance"](spark, sf_dir).collect()}
    assert set(rows) == {"baseline", "permute_x1", "permute_x2"}
    # permuting the dominant feature (word count) must hurt R2 far more
    assert rows["baseline"] > rows["permute_x1"]
    assert rows["permute_x1"] < rows["permute_x2"]


def test_completeness_trend_clean(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    rows = QUERIES["dq_completeness_trend"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["null_custkey_rate"] == 0.0
        assert r["n_rows"] > 0


def test_recursive_spine_contiguous(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    rows = sorted(
        QUERIES["sql_api_recursive_spine"](spark, sf_dir).collect(),
        key=lambda r: r["month"],
    )
    assert rows
    # spine is contiguous month-by-month
    for a, b in zip(rows, rows[1:]):
        assert (b["month"].year, b["month"].month) == (
            (a["month"].year + 1, 1)
            if a["month"].month == 12
            else (a["month"].year, a["month"].month + 1)
        )
    # gap rows carry zero counts
    for r in rows:
        if r["is_gap"]:
            assert r["n_orders"] == 0 and r["revenue"] == 0.0
        else:
            assert r["n_orders"] > 0


def test_var_backtest_sane(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    r = QUERIES["stat_var_backtest"](spark, sf_dir).collect()[0]
    assert r["n_test_days"] > 0
    assert 0 <= r["exceedances"] <= r["n_test_days"]
    assert r["kupiec_lr"] >= -1e-6  # LR is nonnegative
    assert r["var_95"] < 0 or r["exceed_rate"] == 0


def test_holt_eval_consistent(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    rows = QUERIES["ts_holt_eval"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["holt_mae"] >= 0 and r["naive_mae"] > 0
        assert abs(r["mase"] - r["holt_mae"] / r["naive_mae"]) < 1e-3


def test_diameter_double_sweep_path_graph(spark, tmp_path):
    # path 1-2-3-4-5: seed=1, farthest=5, second sweep ecc(5)=4
    import pandas as pd

    li = [(o, o) for o in range(1, 6)] + [(o, o + 1) for o in range(1, 5)]
    pd.DataFrame(li, columns=["l_orderkey", "l_partkey"]).to_parquet(
        tmp_path / "lineitem.parquet"
    )
    from hudi_utility_spark.queries import QUERIES

    r = QUERIES["graph_diameter_double_sweep"](spark, str(tmp_path)).collect()[0]
    assert r["seed"] == 1 and r["far_node"] == 5
    assert r["diameter_lb"] == 4 and r["n_reached"] == 5


def test_retention_halflife_closed_form(spark, tmp_path):
    # retention exactly halves each week: 8,4,2,1 actives at offsets
    # 0..3 -> decay = -ln 2, half-life = 1 week
    import pandas as pd

    base = pd.Timestamp("2024-01-01")  # a Monday
    rows = []
    eid = 0
    for u in range(8):
        weeks_active = 4 if u == 0 else (3 if u == 1 else (2 if u < 4 else 1))
        for wk in range(weeks_active):
            rows.append((eid, base + pd.Timedelta(weeks=wk), u))
            eid += 1
    pd.DataFrame(rows, columns=["event_id", "ts", "user_id"]).to_parquet(
        tmp_path / "events.parquet"
    )
    from hudi_utility_spark.queries import QUERIES

    r = QUERIES["ev_retention_halflife"](spark, str(tmp_path)).collect()[0]
    assert r["n_points"] == 3
    assert abs(r["decay_rate"] + 0.693147) < 1e-5
    assert abs(r["half_life_weeks"] - 1.0) < 1e-3


def test_wilson_ci_contains_rate(spark, sf_dir):
    from hudi_utility_spark.queries import QUERIES

    rows = QUERIES["ev_wilson_ci"](spark, sf_dir).collect()
    assert len(rows) == 2
    for r in rows:
        assert 0.0 <= r["wilson_lo"] <= r["rate"] <= r["wilson_hi"] <= 1.0


def test_embedding_drift_bounds_on_corpus(spark, sf_dir):
    # corpus labels are noise clusters: drift cosine is only bounded
    from hudi_utility_spark.queries import QUERIES

    rows = QUERIES["sim_embedding_drift"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_half0"] > 0 and r["n_half1"] > 0
        assert -1.0 - 1e-9 <= r["centroid_cosine"] <= 1.0 + 1e-9


def test_embedding_drift_detects_aligned_vs_flipped(spark, tmp_path):
    # label 0: both halves share direction e0 -> cosine ~1
    # label 1: odd half flipped -> cosine ~-1
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(3)
    rows = []
    for i in range(80):
        label = i // 40  # first 40 ids label 0, rest label 1
        base = np.zeros(8)
        base[0] = 1.0
        # label 1's odd-id half points the OPPOSITE way
        sign = -1.0 if (label == 1 and i % 2 == 1) else 1.0
        v = sign * base + rng.normal(0, 0.05, 8)
        rows.append((i, v.astype(np.float32), label))
    pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]).to_parquet(
        tmp_path / "embeddings.parquet"
    )
    from hudi_utility_spark.queries import QUERIES

    got = {
        r["label"]: r["centroid_cosine"]
        for r in QUERIES["sim_embedding_drift"](spark, str(tmp_path)).collect()
    }
    assert got[0] > 0.9
    assert got[1] < -0.9


def test_no_duplicate_query_registrations():
    """A duplicate @query name silently shadows the earlier operator —
    it drops out of the oracle gate with no signal (caught live in
    round 10: a second dq_column_entropy hid the original). Count every
    registration attempt against the registry size in a fresh load."""
    import collections
    import sys

    import hudi_utility_spark.queries as Q

    orig = Q.query
    seen = collections.Counter()

    def spy(name, oracle=None, sequential=False):
        seen[name] += 1
        return orig(name, oracle, sequential)

    saved = (dict(Q.QUERIES), dict(Q.ORACLES), set(Q.SEQUENTIAL))
    mods = [m for m in sys.modules if m.startswith("hudi_utility_spark.queries.")]
    try:
        Q.query = spy
        for m in mods:
            del sys.modules[m]
        Q.QUERIES.clear(); Q.ORACLES.clear(); Q.SEQUENTIAL.clear()
        Q.load_all()
        dups = {n: c for n, c in seen.items() if c > 1}
        assert not dups, f"shadowed query registrations: {dups}"
        assert len(Q.QUERIES) == sum(seen.values())
    finally:
        Q.query = orig
        Q.QUERIES.clear(); Q.QUERIES.update(saved[0])
        Q.ORACLES.clear(); Q.ORACLES.update(saved[1])
        Q.SEQUENTIAL.clear(); Q.SEQUENTIAL.update(saved[2])
        for m in mods:
            sys.modules.pop(m, None)
