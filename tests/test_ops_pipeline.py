"""Composed corpus-cleaning pipeline tests (ops.pipeline)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_utility_spark.ops import pipeline as P

GOOD = (
    "the quick brown fox jumps over the lazy dog and runs to the river "
    "in the morning light where it is seen by a farmer and his son"
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, GOOD),  # survives everything
            (2, GOOD + "!!"),  # same fingerprint as 1 after normalization
            (3, "too short"),  # quality 0.0 (n_words < 5)
            (4, "!!! ??? ;;; ### $$$ %%% @@@ ^^^ &&& ***"),  # punct gate → 0.2
            (5, "el la de que y los " * 10),  # spanish markers, decent length
        ],
        ["doc_id", "text"],
    )


def test_dedup_stage_keeps_min_id(spark):
    out = P.dedup_stage(_docs(spark))
    ids = {r.doc_id for r in out.collect()}
    assert 1 in ids and 2 not in ids  # doc 2 normalizes to doc 1's text
    assert ids == {1, 3, 4, 5}


def test_quality_stage_gates_and_keeps_score(spark):
    gated = P.quality_stage(P.dedup_stage(_docs(spark)))
    rows = {r.doc_id: r.quality for r in gated.collect()}
    assert 3 not in rows and 4 not in rows
    assert all(q >= 0.5 for q in rows.values())
    # no stats-column leakage beyond the contract columns
    assert set(gated.columns) == {"doc_id", "text", "fingerprint", "quality"}


def test_clean_corpus_end_to_end(spark):
    cleaned = P.clean_corpus(_docs(spark))
    rows = {r.doc_id: r.lang_pred for r in cleaned.collect()}
    assert rows[1] == "en"
    assert rows[5] == "es"
    assert set(rows) == {1, 5}


def test_funnel_counts_are_monotone(spark):
    funnel = {r.stage: r.n_docs for r in P.corpus_funnel(_docs(spark)).collect()}
    assert funnel["00_raw"] == 5
    assert funnel["10_dedup"] == 4
    assert funnel["20_quality"] == 2
    assert funnel["00_raw"] >= funnel["10_dedup"] >= funnel["20_quality"]


def test_pipeline_is_rerun_stable(spark):
    docs = _docs(spark)
    a = P.clean_corpus(docs).select("doc_id", "lang_pred", "quality")
    b = P.clean_corpus(docs).select("doc_id", "lang_pred", "quality")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_group_safe_split_keeps_near_dups_together(spark, sf_dir):
    """Every near-dup pair must land in the SAME split — the leakage
    property the per-doc hash split cannot provide."""
    from hudi_utility_spark.ops import dedup as D
    from hudi_utility_spark.queries.pipeline_q import pipeline_group_safe_split
    from hudi_utility_spark.tables import load_table

    split_of = {
        r["doc_id"]: r["split"]
        for r in pipeline_group_safe_split(spark, sf_dir).collect()
    }
    d = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(d, n=1, threshold=0.9).collect()
    assert pairs, "fixture corpus must contain near-dup pairs"
    for r in pairs:
        assert split_of[r["id_a"]] == split_of[r["id_b"]], (r["id_a"], r["id_b"])
    # all three splits exist and every doc is assigned
    assert set(split_of.values()) == {"train", "val", "test"}
    assert len(split_of) == d.count()
    spark.catalog.clearCache()


def test_walkforward_folds_purges_embargo_and_never_leaks(spark):
    """For every fold: max train ts < embargo start < test span start;
    purged rows fill exactly the embargo buffer; no train row is ever
    at-or-after its fold's test span."""
    import datetime as dt

    from pyspark.sql import functions as F

    from hudi_utility_spark.ops.pipeline import walkforward_folds
    from hudi_utility_spark.tsutil import us

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0 + dt.timedelta(minutes=i)) for i in range(400)]
    df = spark.createDataFrame(rows, ["id", "ts"])
    lo, hi = df.agg(F.min(us(F.col("ts"))), F.max(us(F.col("ts")))).collect()[0]
    out = walkforward_folds(
        df, "ts", n_folds=4, embargo_seconds=1200, t_min_us=lo, t_max_us=hi
    )
    span = (hi - lo + 1) // 4 + 1
    got = out.select("id", "fold", "role", us(F.col("ts")).alias("e")).collect()
    for r in got:
        start = lo + r.fold * span
        if r.role == "train":
            assert r.e < start - 1200 * 1_000_000
        elif r.role == "purged":
            assert start - 1200 * 1_000_000 <= r.e < start
        elif r.role == "test":
            assert start <= r.e < start + span
        else:
            assert r.e >= start + span
    # every row appears exactly once per fold
    assert len(got) == 400 * 4
