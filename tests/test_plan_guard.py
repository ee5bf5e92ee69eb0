"""Plan-quality regression guard over the bench headline: no
CartesianProduct anywhere, BroadcastNestedLoopJoin only where it is a
deliberate scalar/1-row broadcast, and scan queries keep their filters
pushed. Plans are built (not executed) at the test SF — a regression
that sneaks a cartesian or an unbounded BNLJ into a headline operator
fails here before it ever reaches a cluster."""

from __future__ import annotations

import contextlib
import io

import pytest

# deliberate BNLJ: broadcasting a 1-row/scalar relation (corpus totals,
# IVF probe thresholds) into a map-side comparison — bounded by design
BNLJ_OK = {
    "dedup_jaccard_pairs",      # prefix self-join condition set
    "rtr_bm25_topk",            # corpus-stats scalar broadcast
    "rtr_tfidf_keywords",       # same
    "text_vocab_topk",          # total-token scalar broadcast
    "pack_temperature_sample",  # corpus-total + normalizer 1-row broadcasts
    "plan_join_cardinality",    # five 1-row diagnostic scalars cross-joined
}

# queries that materialize scratch tables as a side effect of plan
# construction — exercised by their own tests/oracles; skipping keeps
# this guard fast and read-only
SCRATCH = {
    "index_bloom_lookup",
    "index_secondary_lookup",
    "s7_partial_update",
    "merge_multi_action",
    "stream_true_tumbling",  # runs a real readStream replay to a memory sink
    "cluster_kmeans_parallel_init",  # driver-iterative: rounds run at plan build
    "dedup_pq_code_groups",          # pq_fit collects codebooks at plan build
    "sim_sq8_topk",                  # sq8_stats collects min/max at plan build
    "text_bpe_encode",               # merge table trains at plan build
}


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def headline_plans(spark, sf_dir):
    """Every (non-scratch) headline query's formatted plan, built ONCE
    per module: three tests iterate the same ~100 queries, and building
    a query's DataFrame also runs its eager fit collects — sharing the
    dict cuts this module's wall roughly in half (r12 VERDICT #3: keep
    the suite inside the driver's verify budget)."""
    import __spark_entry__ as entrymod
    from bench import HEADLINE

    qs = entrymod.queries()
    return {
        name: _plan(qs[name](spark, sf_dir))
        for name in HEADLINE
        if name not in SCRATCH
    }


def test_headline_plans_no_cartesian_bounded_bnlj(headline_plans):
    offenders = []
    for name, plan in headline_plans.items():
        if "CartesianProduct" in plan:
            offenders.append((name, "cartesian"))
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
            offenders.append((name, "bnlj"))
    assert not offenders, offenders


# queries whose kernels are DECLARED Arrow/Python (the five-entry UDF
# matrix); everything else must stay entirely JVM-side
ARROW_OK = {
    "mm_feature_extraction",
    "ml_group_linfit",
    "stat_trimmed_mean",
    "sim_bruteforce_topk_arrow",
    "mm_wav_decode",  # declared codec kernel pair (wave encode / RIFF parse)
    "mm_image_neardup_pairs",  # declared P6 codec kernel (encode + dHash)
}


def test_headline_plans_stay_jvm_side(headline_plans):
    """SURVEY §2.10 policy, enforced: no Python evaluation nodes in any
    headline plan outside the declared Arrow kernels — a built-in
    expression silently degrading to a Python UDF (easy to do via
    api changes or accidental closures) fails here, not on a cluster."""
    import re

    offenders = []
    for name, plan in headline_plans.items():
        if name in ARROW_OK:
            continue
        if re.search(r"ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas", plan):
            offenders.append(name)
    assert not offenders, offenders


# max SHUFFLE-exchange budgets for the round-7 headline additions,
# measured at the test SF (VERDICT r7 #8): a refactor that silently
# adds an exchange to one of these fails here before it ships. Budgets
# are the measured counts — not aspirational — so any increase is a
# deliberate, reviewed change to this table. (Broadcast exchanges are
# excluded: the dedup family's measured broadcast dispatch legitimately
# varies with data size.)
EXCHANGE_BUDGETS = {
    "cluster_kmeans_parallel_init": 0,  # returns driver-built diag rows;
    # rounds collect scalars + expected-l candidates only
    # r13: the df-ranked relation is persisted and feeds BOTH candidate
    # sides (PPJoin+ positional filter needs rn on the index side), so
    # the STATIC plan prints its 3-exchange lineage once per consumer —
    # the executed plan computes it once into the cache (it was already
    # computed once before; the second consumer previously read raw sh).
    # Text count 26 -> 36 is the reprint, not a new executed shuffle.
    "dedup_containment_pairs": 36,
    "text_bigram_backoff": 20,
    "text_bpe_encode": 2,
    "stream_dedup_watermark": 2,
}


def test_r7_headline_exchange_budgets(spark, sf_dir, headline_plans):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    over = []
    for name, budget in EXCHANGE_BUDGETS.items():
        plan = headline_plans.get(name) or _plan(qs[name](spark, sf_dir))
        shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
        if shuffles > budget:
            over.append((name, shuffles, budget))
    assert not over, f"shuffle-exchange budget exceeded: {over}"


# round-8 additions: measured max shuffle-exchange budgets (same
# contract as the r7 table above) plus the deliberate bounded-BNLJ
# set — k-centroid cross-scores and the isotonic bin grid are
# broadcast nested loops over RELATIONS BOUNDED BY CONSTRUCTION
# (centroid count, bin count), not data-sized.
EXCHANGE_BUDGETS_R8 = {
    "text_kneser_ney": 16,
    "dedup_semdedup": 24,
    "rtr_rrf_fusion": 4,
    "ev_attribution_channels": 4,
    "ml_isotonic_calibration": 10,
    "rollup_join_view_maintenance": 2,
    "ml_pr_curve": 8,
    "stat_mann_whitney": 4,
    "text_ccnet_buckets": 18,
    "graph_link_prediction": 12,
}


def test_r8_exchange_budgets_and_no_cartesian(spark, sf_dir):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    over = []
    for name, budget in EXCHANGE_BUDGETS_R8.items():
        plan = _plan(qs[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
        if shuffles > budget:
            over.append((name, shuffles, budget))
    assert not over, f"shuffle-exchange budget exceeded: {over}"


def test_pack_length_buckets_no_single_partition_window(spark, sf_dir):
    """r8 verdict #1: the length-quartile assignment must NOT funnel the
    corpus through one task. The distributed prefix-sum rank keeps every
    window partitioned by range id; a refactor that reintroduces
    ntile().over(Window.orderBy(...)) surfaces as a Sort/Window node
    sitting on a SinglePartition exchange. The final global SCALAR
    aggregate (4 bucket rows → 1) legitimately collapses to one
    partition, so the ban targets the Sort/Window-over-SinglePartition
    shape, not SinglePartition per se."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["pack_length_buckets"](spark, sf_dir)
    # simple tree string: parent nodes precede their SinglePartition
    # exchange child; a global window shows as Window/Sort directly above
    tree = df._jdf.queryExecution().executedPlan().toString()
    lines = tree.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            above = "\n".join(lines[max(0, i - 3) : i])
            assert "Window" not in above and "Sort" not in above, tree


def test_sim_hard_negatives_blocked_plan(spark, sf_dir):
    """r8 verdict #2: the registered hard-negative miner must candidate
    via a cell-EQUALITY equijoin (Σ|cell|² pairs), never the label-
    inequality all-pairs join (n² pairs). An all-pairs arm has no
    equijoin keys, so it plans as BroadcastNestedLoopJoin/Cartesian —
    both banned here — and the blocked arm's shuffle count is pinned."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    plan = _plan(qs["sim_hard_negatives"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles <= 8, f"shuffle-exchange budget exceeded: {shuffles}"


# round-9 additions: measured budgets for the r8 experiment-stack
# queries (r8 verdict #7 — cheap insurance that a refactor can't
# re-introduce a row-level window into the collapsed-relation stats)
# plus the two de-quadratified queries' final shapes.
EXCHANGE_BUDGETS_R9 = {
    "stat_permutation_test": 2,
    "ml_conformal_interval": 10,
    "ev_sprt_monitor": 4,
    "ev_did_estimator": 4,
    "sim_hard_negatives": 2,
    "pack_length_buckets": 16,
    "ml_pr_curve": 4,
    "ml_auc_score": 2,
}


def test_r9_exchange_budgets_and_no_cartesian(spark, sf_dir):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    over = []
    for name, budget in EXCHANGE_BUDGETS_R9.items():
        plan = _plan(qs[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
        if shuffles > budget:
            over.append((name, shuffles, budget))
    assert not over, f"shuffle-exchange budget exceeded: {over}"


# every round-9 registry addition: no cartesian anywhere; BNLJ only for
# the queries whose plans deliberately broadcast a BOUNDED relation
# (1-row query vectors / scalar stats, the 10-row centroid table, the
# 5-row language-stats table, 4-row sensitive-bucket grids).
R9_NEW_QUERIES = [
    "stat_kruskal_wallis", "stat_brown_forsythe", "stat_g_test",
    "stat_cramer_von_mises", "stat_spearman_trend", "ts_acf_profile",
    "ts_theil_sen_trend", "graph_kcore_parts", "graph_hits_authorities",
    "pack_unimax_allocation", "rtr_jm_smoothing_topk", "text_rake_keywords",
    "er_phonetic_blocking", "sim_knn_graph", "ev_bayes_beta_binomial",
    "skew_ams_f2", "approx_kmv_distinct", "sim_binary_quant_topk",
    "ml_naive_bayes_langid", "ml_ridge_normal_eq", "dq_t_closeness",
    "cluster_silhouette_simplified", "text_compression_ratio",
    "rtr_rocchio_feedback", "ev_quantile_treatment_effect",
    "stat_holm_bonferroni", "stat_bh_fdr", "asof_nearest_join",
    "ev_rfm_segments", "dedup_minhash_calibration",
    "graph_degree_distribution", "ts_holt_linear",
    "pipeline_dedup_ablation", "w_percent_rank_cume",
    "sim_pca_top_component", "ts_holt_winters",
    "stat_wilcoxon_signed_rank", "text_js_divergence", "stat_cohens_d",
    "ml_lift_gains_curve", "stat_mcnemar", "ml_brier_murphy",
    "stat_runs_test", "text_hapax_profile", "text_heaps_law",
]
R9_BNLJ_OK = {
    "stat_g_test",                  # r-marginal x c-marginal grid (bounded)
    "rtr_jm_smoothing_topk",        # 1-row corpus-stats scalar (bm25 idiom)
    "graph_hits_authorities",       # 1-row L1-normalizer scalar per step
    "rtr_rocchio_feedback",         # 1-row corpus-stats scalar broadcast
    "ev_quantile_treatment_effect", # 1-row decile-array pair explode
    "ev_rfm_segments",              # 1-row boundary-array broadcast
    "graph_degree_distribution",    # 1-row loglog-fit scalar broadcast
    "pipeline_dedup_ablation",      # 1-row vocab scalar per corpus side
    "ml_lift_gains_curve",          # 1-row decile-boundary broadcast
    "ml_brier_murphy",              # 1-row totals + raw-score scalars
    "stat_runs_test",               # 1-row exact-median scalar broadcast
    "text_heaps_law",               # 10-row checkpoint-boundary join + fit scalars
    "pack_unimax_allocation",       # 1-row budget scalar
    "ev_bayes_beta_binomial",       # scalar posterior terms
    "sim_binary_quant_topk",        # 1-row query signature broadcast
    "ml_naive_bayes_langid",        # 5-row language-stats broadcast
    "dq_t_closeness",               # 4-bucket grid explode
    "cluster_silhouette_simplified",  # 10-row centroid cross-score
    "skew_ams_f2",                  # 1-row exact-F2 scalar
    "approx_kmv_distinct",          # 1-row exact-distinct scalar
    "stat_kruskal_wallis",          # 1-row tie-term scalar
    "stat_cramer_von_mises",        # 1-row totals scalar
    "stat_spearman_trend",          # 1-row sufficient-stats scalar
    "ts_acf_profile",               # 1-row mean/denominator scalars
    "ts_theil_sen_trend",           # 1-row slope/intercept scalars
    "dq_benford_profile",
}


def test_r9_new_queries_no_cartesian_bounded_bnlj(spark, sf_dir):
    import __spark_entry__ as entrymod

    from hudi_utility_spark.queries.text import text_compression_ratio

    qs = entrymod.queries()
    # deregistered (no SQL oracle exists) but still plan-audited here
    qs = {**qs, "text_compression_ratio": text_compression_ratio}
    offenders = []
    for name in R9_NEW_QUERIES:
        if name in ("stream_session_tws",):  # real streaming run, own tests
            continue
        plan = _plan(qs[name](spark, sf_dir))
        if "CartesianProduct" in plan:
            offenders.append((name, "cartesian"))
        if "BroadcastNestedLoopJoin" in plan and name not in R9_BNLJ_OK:
            offenders.append((name, "bnlj"))
    assert not offenders, offenders


# wave-B round-9 additions (this session): no cartesian anywhere; BNLJ
# allow-listed only for bounded broadcasts (1-row scalar/boundary
# relations, the 2-row lag literal, the calendar-bounded daily series
# in Kendall's pairwise pass).
R9B_NEW_QUERIES = [
    "stat_jarque_bera", "ts_forecast_accuracy", "ts_technical_indicators",
    "graph_clustering_coefficient", "graph_shortest_paths",
    "dq_referential_integrity", "stat_kendall_tau", "stat_ljung_box",
    "stat_grubbs_outlier", "ml_classification_report", "text_good_turing",
    "text_ngram_novelty", "ev_cohort_ltv", "ev_qini_uplift",
    "ev_tost_equivalence", "stat_fleiss_kappa", "text_term_burstiness",
    "ml_knn_accuracy", "dq_outlier_iqr", "ev_dau_mau_stickiness",
    "approx_kmv_jaccard", "graph_assortativity", "ts_seasonal_strength",
    "ev_time_to_convert", "dq_candidate_keys", "dq_cross_field_rules",
    "ts_gaps_islands", "pipeline_kfold_balance",
]
R9B_BNLJ_OK = {
    "ts_forecast_accuracy",     # 2-row lag literal + 1-row naive-MAE scalar
    "dq_referential_integrity", # 1-row orphan/child count scalars per edge
    "stat_kendall_tau",         # calendar-bounded daily series pairwise pass
    "stat_ljung_box",           # 1-row mean/denominator scalars
    "stat_grubbs_outlier",      # 1-row stats broadcast
    "text_good_turing",         # 1-row corpus-total scalar
    "ev_qini_uplift",           # 1-row decile-boundary broadcast
    "text_term_burstiness",     # 1-row doc-count scalar
    "approx_kmv_jaccard",       # 1-row sketch-threshold/exact scalars
    "stat_jarque_bera",         # 1-row-per-group mean broadcast join
    "dq_outlier_iqr",           # |event_type|-row quantile broadcast
    "ts_seasonal_strength",     # 24-row hour-of-day means broadcast
}


def test_r9b_new_queries_no_cartesian_bounded_bnlj(spark, sf_dir):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    offenders = []
    for name in R9B_NEW_QUERIES:
        plan = _plan(qs[name](spark, sf_dir))
        if "CartesianProduct" in plan:
            offenders.append((name, "cartesian"))
        if "BroadcastNestedLoopJoin" in plan and name not in R9B_BNLJ_OK:
            offenders.append((name, "bnlj"))
    assert not offenders, offenders


# wave-C round-9 additions: same contract as wave B.
R9C_NEW_QUERIES = [
    "ev_survival_kaplan_meier", "graph_modularity", "mm_image_entropy",
    "ev_its_segmented", "stat_cochran_q", "plan_partition_sizing",
    "rtr_map_precision", "ev_two_proportion_z", "stat_bartlett",
    "ml_f1_threshold", "ml_regression_report", "dq_outlier_mad",
    "ev_markov_absorbing", "stat_durbin_watson", "ml_platt_scaling",
]
R9C_BNLJ_OK = {
    "ev_survival_kaplan_meier",  # 1-row corpus-end bound + user-total scalar
    "graph_modularity",          # 1-row edge-count scalar
    "ev_its_segmented",          # 1-row cutpoint scalar
    "rtr_map_precision",         # 1-row relevant-total scalar (bm25 idiom)
    "ml_f1_threshold",           # 1-row totals broadcast
    "ml_regression_report",      # 1-row weight vector broadcast
    "stat_durbin_watson",        # 1-row slope/intercept scalars
}


def test_r9c_new_queries_no_cartesian_bounded_bnlj(spark, sf_dir):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    offenders = []
    for name in R9C_NEW_QUERIES:
        plan = _plan(qs[name](spark, sf_dir))
        if "CartesianProduct" in plan:
            offenders.append((name, "cartesian"))
        if "BroadcastNestedLoopJoin" in plan and name not in R9C_BNLJ_OK:
            offenders.append((name, "bnlj"))
    assert not offenders, offenders


R9D_NEW_QUERIES = [
    "approx_quantile_check", "ev_new_vs_returning", "sim_batch_query_topk",
    "ev_cart_abandonment", "stat_chi2_gof_hour", "ev_interarrival_profile",
    "ts_weekday_profile", "ml_permutation_importance",
    "dq_completeness_trend",
]
R9D_BNLJ_OK = {
    "sim_batch_query_topk",      # 5-row query-vector broadcast (<> join)
    "stat_chi2_gof_hour",        # 1-row totals scalar
    "ts_weekday_profile",        # 1-row revenue-total scalar
    "ml_permutation_importance", # 1-row weight vector broadcast
}


def test_r9d_new_queries_no_cartesian_bounded_bnlj(spark, sf_dir):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    offenders = []
    for name in R9D_NEW_QUERIES:
        plan = _plan(qs[name](spark, sf_dir))
        if "CartesianProduct" in plan:
            offenders.append((name, "cartesian"))
        if "BroadcastNestedLoopJoin" in plan and name not in R9D_BNLJ_OK:
            offenders.append((name, "bnlj"))
    assert not offenders, offenders


R9E_NEW_QUERIES = [
    "sql_api_recursive_spine", "stat_var_backtest", "ts_holt_eval",
]
R9E_BNLJ_OK = {
    "sql_api_recursive_spine",  # 1-row bounds into the recursion seed
    "stat_var_backtest",        # 1-row cut + VaR scalars
}


def test_r9e_new_queries_no_cartesian_bounded_bnlj(spark, sf_dir):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    offenders = []
    for name in R9E_NEW_QUERIES:
        plan = _plan(qs[name](spark, sf_dir))
        if "CartesianProduct" in plan:
            offenders.append((name, "cartesian"))
        if "BroadcastNestedLoopJoin" in plan and name not in R9E_BNLJ_OK:
            offenders.append((name, "bnlj"))
    assert not offenders, offenders


R9F_NEW_QUERIES = ["ev_wilson_ci", "sim_embedding_drift",
                   "ev_retention_halflife", "graph_diameter_double_sweep"]
R9F_BNLJ_OK = {
    "ev_retention_halflife",       # 1-row cohort-base + fit scalars
    "graph_diameter_double_sweep", # 1-row seed / re-root scalars
}


def test_r9f_new_queries_no_cartesian_bounded_bnlj(spark, sf_dir):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    offenders = []
    for name in R9F_NEW_QUERIES:
        plan = _plan(qs[name](spark, sf_dir))
        if "CartesianProduct" in plan:
            offenders.append((name, "cartesian"))
        if "BroadcastNestedLoopJoin" in plan and name not in R9F_BNLJ_OK:
            offenders.append((name, "bnlj"))
    assert not offenders, offenders


def test_r10_knn_join_by_cell_equijoin_plan(spark, sf_dir):
    """r9 verdict #6: the IVF k-NN JOIN must candidate via an exploded
    cell EQUI-join (SortMergeJoin/ShuffledHashJoin on the cell id),
    never the old `array_contains(probe_cells, cell)` theta form that
    plans as a nested-loop. The only BNLJ allowed is the bounded
    centroid-table broadcast (n_cells rows) used to rank probe cells."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    plan = _plan(qs["sim_knn_join_by_cell"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    # the corpus-side candidate join must be an equi-join: at least one
    # hash/sort-merge join node keyed on the cell id must exist
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan), plan
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles <= 8, f"shuffle-exchange budget exceeded: {shuffles}"


def test_r10_new_queries_plan_shapes(spark, sf_dir):
    """pack_feistel_shuffle must stay MAP-ONLY (zero shuffle exchanges —
    the whole point of a permutation-based shuffle is no exchange at
    assignment time); approx_moments_quantile is one hash-aggregate
    shuffle; sim_knn_join_by_cell has its own equi-join guard above."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    plan = _plan(qs["pack_feistel_shuffle"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles == 0, f"feistel shuffle must be map-only: {shuffles}"

    plan = _plan(qs["approx_moments_quantile"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles <= 2, f"moments sketch budget exceeded: {shuffles}"
