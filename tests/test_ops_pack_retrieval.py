"""Sequence packing, stratified sampling, BM25, TF-IDF keywords."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hudi_utility_spark.ops import pack as PK
from hudi_utility_spark.ops import retrieval as R


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pack_sequences_layout_invariants(spark, documents):
    packed = PK.pack_sequences(documents, budget=256, n_shards=8)
    rows = packed.collect()
    # lossless: every document placed exactly once
    assert len(rows) == documents.count()
    # within each shard, offsets are the running total in doc_id order
    # and every doc's sequence is where its start offset lands
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) > 1  # sharding actually spreads
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["doc_id"])
        run = 0
        for r in shard_rows:
            assert r["start_offset"] == run
            assert r["seq_idx"] == run // 256
            run += r["n_tokens"]


def test_pack_profile_fill_and_determinism(spark, documents):
    prof = PK.pack_profile(documents, budget=256, n_shards=8)
    a = sorted(map(tuple, prof.collect()))
    b = sorted(map(tuple, PK.pack_profile(documents, budget=256, n_shards=8).collect()))
    assert a == b  # content-stable: identical across runs
    total_docs = sum(r[2] for r in a)
    assert total_docs == documents.count()
    # no global window in the plan — parallelism is the shard count
    assert "SinglePartition" not in _plan(prof)


def test_stratified_sample_fractions_and_purity(spark, documents):
    frac = {"en": 1.0, "de": 0.5, "fr": 0.25}
    sampled = PK.stratified_sample(documents, frac, strata_col="lang")
    got = dict(
        sampled.groupBy("lang").count().rdd.map(lambda r: (r[0], r[1])).collect()
    )
    want = dict(
        documents.groupBy("lang").count().rdd.map(lambda r: (r[0], r[1])).collect()
    )
    assert got["en"] == want["en"]  # frac 1.0 keeps everything
    assert "es" not in got and "zh" not in got  # unlisted strata drop
    for lang, f in (("de", 0.5), ("fr", 0.25)):
        assert abs(got[lang] / want[lang] - f) < 0.2, (lang, got[lang], want[lang])
    # deterministic membership, not a random sample
    again = PK.stratified_sample(documents, frac, strata_col="lang")
    assert sorted(r[0] for r in sampled.select("doc_id").collect()) == sorted(
        r[0] for r in again.select("doc_id").collect()
    )


def _py_bm25(rows, terms, k1=1.2, b=0.75):
    import re

    docs = {}
    for doc_id, text in rows:
        norm = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", " ", text.lower())).strip()
        docs[doc_id] = [t for t in norm.split(" ") if t]
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    out = {}
    for doc_id, toks in docs.items():
        s = 0.0
        for term in terms:
            tf = toks.count(term)
            df = sum(1 for t in docs.values() if term in t)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        if s > 0:
            out[doc_id] = round(s, 6)
    return out


def test_bm25_matches_reference_and_plan_shape(spark, documents):
    terms = ["hash", "vector", "spark"]
    sample = documents.filter(F.col("doc_id") < 100).select("doc_id", "text")
    got = {r["doc_id"]: r["score"] for r in R.bm25_topk(sample, terms, k=5).collect()}
    ref = _py_bm25([(r[0], r[1]) for r in sample.collect()], terms)
    top5 = dict(sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:5])
    assert got.keys() == top5.keys()
    for d in got:
        assert abs(got[d] - top5[d]) < 1e-5, (d, got[d], top5[d])
    # corpus side never shuffles: stats come back via broadcast, ranking
    # is TakeOrdered — no hash-partitioning exchange anywhere
    assert "Exchange hashpartitioning" not in _plan(R.bm25_topk(sample, terms, k=5))


def test_tfidf_top_terms_reference(spark, documents):
    sample = documents.filter(F.col("doc_id") < 50).select("doc_id", "text")
    out = R.tfidf_top_terms(sample, top_n=3).collect()
    per_doc: dict[int, list] = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert all(len(v) <= 3 for v in per_doc.values())
    # spot-check one document against a hand computation
    import re

    rows = [(r[0], r[1]) for r in sample.collect()]
    docs = {
        d: [
            t
            for t in re.sub(
                r"\s+", " ", re.sub(r"[^a-z0-9\s]", " ", txt.lower())
            ).strip().split(" ")
            if t
        ]
        for d, txt in rows
    }
    n = len(docs)
    d0 = rows[0][0]
    tf = {t: docs[d0].count(t) for t in set(docs[d0])}
    df = {t: sum(1 for v in docs.values() if t in v) for t in tf}
    scores = sorted(
        ((round(tf[t] * math.log(n / df[t]), 6), t) for t in tf),
        key=lambda st: (-st[0], st[1]),
    )[:3]
    got0 = sorted(
        ((r["tfidf"], r["term"]) for r in per_doc[d0]), key=lambda st: (-st[0], st[1])
    )
    assert [t for _, t in got0] == [t for _, t in scores]
    for (gs, _), (ws, _) in zip(got0, scores):
        assert abs(gs - ws) < 1e-5


def test_mix_corpus_targets_and_determinism(spark, documents):
    weights = {"en": 0.5, "de": 0.3, "fr": 0.2}
    mixed = PK.mix_corpus(documents, weights)
    got = {r[0]: r[1] for r in mixed.groupBy("lang").count().collect()}
    avail = {
        r[0]: r[1]
        for r in documents.filter(F.col("lang").isin(*weights))
        .groupBy("lang").count().collect()
    }
    assert set(got) <= set(weights)  # unlisted strata never survive
    # the binding stratum (max n/weight pressure) is kept ~whole
    binding = min(avail, key=lambda s: avail[s] / weights[s])
    assert got[binding] >= avail[binding] * 0.99
    # achieved mix is binomially close to the target proportions
    total = sum(got.values())
    for s, w in weights.items():
        assert abs(got[s] / total - w) < 0.12, (s, got[s] / total, w)
    # deterministic membership
    a = sorted(r[0] for r in mixed.select("doc_id").collect())
    b = sorted(r[0] for r in PK.mix_corpus(documents, weights).select("doc_id").collect())
    assert a == b


def test_select_until_budget_matches_global_cumsum(spark, documents):
    budget = 20_000
    got = PK.select_until_budget(
        documents, token_budget=budget, score_col="n_chars", n_ranges=8
    )
    rows = {r["doc_id"]: r for r in got.collect()}

    # Python reference: exact global-order cumulative sum
    ref = [
        (r["doc_id"], r["n_chars"], len(r["text"].strip().split()))
        for r in documents.select("doc_id", "n_chars", "text").collect()
    ]
    ref.sort(key=lambda t: (-t[1], t[0]))
    run, want = 0, {}
    for doc_id, score, n_tokens in ref:
        if run < budget:
            want[doc_id] = (run, n_tokens)
        run += n_tokens

    assert set(rows) == set(want)
    for doc_id, (start, n_tokens) in want.items():
        assert rows[doc_id]["start_offset"] == start
        assert rows[doc_id]["n_tokens"] == n_tokens
    # a strict subset was cut (the budget actually binds at this sf)
    assert 0 < len(rows) < documents.count()
    # distributed prefix sum: no single-partition stage in the plan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_sample_n_per_group_exact_and_stable(spark, documents):
    out = PK.sample_n_per_group(documents, 7, "lang")
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    avail = {r["lang"]: r["n"] for r in documents.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in counts.items():
        assert n == min(7, avail[lang])
    assert set(counts) == set(avail)  # every group represented
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in PK.sample_n_per_group(documents, 7, "lang").collect())
    assert a == b  # frozen: identical membership across runs
    # schema passthrough: all source columns survive
    assert set(out.columns) == set(documents.columns)


def test_weighted_sample_exact_k_deterministic_and_plan(spark, documents):
    a = PK.weighted_sample(documents, 50, "n_chars")
    b = PK.weighted_sample(documents, 50, "n_chars")
    assert a.count() == 50
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_weighted_sample_prefers_heavy_weights(spark):
    # one row with an astronomically heavy weight must win a k=1 draw;
    # null / non-positive weights never win at any k
    rows = [(i, 1e-9) for i in range(100)] + [(999, 1e9), (998, None), (997, -5.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [r["doc_id"] for r in PK.weighted_sample(df, 1, "w").collect()]
    assert got == [999]
    all_ids = {r["doc_id"] for r in PK.weighted_sample(df, 200, "w").collect()}
    assert 998 not in all_ids and 997 not in all_ids
    assert len(all_ids) == 101  # 100 light + 1 heavy, nothing else


def test_temperature_sample_flattens_and_is_deterministic(spark, documents):
    from pyspark.sql import functions as F

    from hudi_utility_spark.ops.pack import temperature_sample

    natural = {
        r["lang"]: r["count"]
        for r in documents.groupBy("lang").count().collect()
    }
    out = temperature_sample(documents, alpha=0.5, budget_fraction=0.5)
    sampled = {
        r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()
    }
    # alpha<1 flattens: every low-resource language keeps a HIGHER rate
    # than every higher-resource one (monotone in 1/sqrt(n))
    rates = {
        g: sampled.get(g, 0) / n for g, n in natural.items() if n >= 20
    }
    ordered = sorted(rates, key=lambda g: natural[g])
    for small, big in zip(ordered, ordered[1:]):
        assert rates[small] >= rates[big] - 0.12, (small, big, rates)
    # budget is approximately honored (binomial noise only)
    total = sum(natural.values())
    assert abs(sum(sampled.values()) - total / 2) < 0.15 * total
    # pure function of doc_id + corpus stats: re-run is identical
    again = temperature_sample(documents, alpha=0.5, budget_fraction=0.5)
    assert out.select("doc_id").exceptAll(again.select("doc_id")).isEmpty()
    assert again.select("doc_id").exceptAll(out.select("doc_id")).isEmpty()


def test_temperature_sample_upweights_rare_group(spark):
    from hudi_utility_spark.ops.pack import temperature_sample

    rows = [(i, "big") for i in range(900)] + [
        (i + 10_000, "rare") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_sample(df, alpha=0.5, budget_fraction=0.5)
    got = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    # natural share of 'rare' is 10%; sqrt-flattened target share is
    # sqrt(.1)/(sqrt(.9)+sqrt(.1)) ~ 25% -> of a 500-row budget ~ 125,
    # i.e. MORE than a proportional 50
    assert got.get("rare", 0) > 70
    assert got["big"] < 450


def test_phrase_match_overlaps_and_missing_terms(spark):
    from hudi_utility_spark.ops.retrieval import phrase_match, positional_postings

    df = spark.createDataFrame(
        [
            (1, "a a a b"),      # "a a" overlaps at pos 1 and 2
            (2, "x a b y a b"),  # "a b" twice, non-adjacent
            (3, "a c b"),        # has both terms but never adjacent
            (4, "b b b"),        # missing term "a" entirely
            (5, "A, b!"),        # normalization: punctuation stripped
        ],
        ["doc_id", "text"],
    )
    idx = positional_postings(df)
    out = {r.doc_id: r for r in phrase_match(idx, "a b").collect()}
    assert set(out) == {1, 2, 5}
    assert (out[1].n_matches, out[1].first_pos) == (1, 3)
    assert (out[2].n_matches, out[2].first_pos) == (2, 2)
    assert (out[5].n_matches, out[5].first_pos) == (1, 1)

    rep = {r.doc_id: r for r in phrase_match(idx, "a a").collect()}
    assert (rep[1].n_matches, rep[1].first_pos) == (2, 1)  # overlapping

    tri = {r.doc_id: r for r in phrase_match(idx, "a a a").collect()}
    assert (tri[1].n_matches, tri[1].first_pos) == (1, 1)


def test_hedge_mix_weights_upweights_high_loss_domains(spark):
    from pyspark.sql import functions as F

    from hudi_utility_spark.ops.pack import hedge_mix_weights

    # domain 'hard' has strictly higher per-doc loss than 'easy'
    rows = [(i, "hard" if i < 40 else "easy", 0.9 if i < 40 else 0.1)
            for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, source string, l double")
    out = {r.domain: r for r in hedge_mix_weights(
        df, F.col("l"), rounds=3, eta=0.5, base_rate=0.9
    ).collect()}
    assert out["hard"].weight > 1.0 > out["easy"].weight
    assert out["hard"].p_mix > 0.5 > out["easy"].p_mix
    assert abs(out["hard"].p_mix + out["easy"].p_mix - 1.0) < 1e-5
    # determinism: the full schedule replays identically
    again = {r.domain: r.weight for r in hedge_mix_weights(
        df, F.col("l"), rounds=3, eta=0.5, base_rate=0.9
    ).collect()}
    assert again == {d: r.weight for d, r in out.items()}


def test_query_likelihood_closed_form_and_ordering(spark):
    """Tiny corpus checked against the hand-evaluated Dirichlet
    formula; a doc with more query-term mass must outrank one with
    less at equal length."""
    import math

    from hudi_utility_spark.ops.retrieval import query_likelihood_topk

    df = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "cat bird bird"), (3, "fish fish fish")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.score for r in
           query_likelihood_topk(df, ["cat"], k=10, mu=2.0).collect()}
    # corpus: 9 tokens, cf(cat)=3; doc1: tf=2 dl=3; doc2: tf=1 dl=3
    s1 = math.log((2 + 2.0 * 3 / 9.0) / (3 + 2.0))
    s2 = math.log((1 + 2.0 * 3 / 9.0) / (3 + 2.0))
    assert abs(out[1] - round(s1, 6)) < 1e-9
    assert abs(out[2] - round(s2, 6)) < 1e-9
    assert 3 not in out  # no query term -> excluded
    assert out[1] > out[2]


def test_rrf_fuse_hand_computed(spark):
    """Doc in both lists at ranks (2,1) must beat single-list rank-1
    docs: 1/62+1/61 > 1/61; absent contributes exactly nothing."""
    from hudi_utility_spark.ops.retrieval import rrf_fuse

    r0 = spark.createDataFrame([(10, 1), (20, 2)], ["doc_id", "rank"])
    r1 = spark.createDataFrame([(20, 1), (30, 2)], ["doc_id", "rank"])
    out = {r.doc_id: r for r in rrf_fuse([r0, r1], top_k=10).collect()}
    assert abs(out[20].rrf_score - round(1 / 62 + 1 / 61, 6)) < 1e-9
    assert abs(out[10].rrf_score - round(1 / 61, 6)) < 1e-9
    assert abs(out[30].rrf_score - round(1 / 62, 6)) < 1e-9
    assert out[20].rrf_score > out[10].rrf_score > out[30].rrf_score
    assert (out[10].in_sys0, out[10].in_sys1) == (1, 0)
    assert (out[20].in_sys0, out[20].in_sys1) == (1, 1)


def test_ranking_metrics_perfect_and_degraded(spark):
    """Ranking the relevant docs first -> ndcg 1.0, mrr 1.0; burying
    the only relevant doc at rank 3 -> ndcg < 1, mrr 1/3; no relevant
    in list -> mrr 0."""
    from hudi_utility_spark.ops.retrieval import ranking_metrics

    labels = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 0), (4, 0)], ["doc_id", "rel"]
    )
    perfect = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], ["doc_id", "rank"]
    )
    r = ranking_metrics(perfect, labels, k=3).collect()[0]
    assert r.ndcg == 1.0 and r.mrr == 1.0

    buried = spark.createDataFrame(
        [(3, 1), (4, 2), (2, 3)], ["doc_id", "rank"]
    )
    r2 = ranking_metrics(buried, labels, k=3).collect()[0]
    assert r2.ndcg < 1.0
    assert abs(r2.mrr - round(1 / 3, 6)) < 1e-9

    misses = spark.createDataFrame([(3, 1), (4, 2)], ["doc_id", "rank"])
    r3 = ranking_metrics(misses, labels, k=3).collect()[0]
    assert r3.mrr == 0.0 and r3.dcg == 0.0


def test_feistel_shuffle_is_a_bijection_and_deterministic(spark):
    """Full 2^8 domain at half_bits=4: the permutation must hit every
    position exactly once (bijectivity = the property that makes it a
    shuffle, not a hash), stay inside the domain, and reproduce
    identically across runs (the determinism orderBy(rand()) lacks)."""
    from hudi_utility_spark.ops.pack import feistel_shuffle

    df = spark.range(256).withColumnRenamed("id", "doc_id")
    out = feistel_shuffle(df, id_col="doc_id", half_bits=4)
    pos = sorted(r.shuffle_pos for r in out.collect())
    assert pos == list(range(256))  # bijection onto the full domain
    again = sorted(
        (r.doc_id, r.shuffle_pos)
        for r in feistel_shuffle(df, id_col="doc_id", half_bits=4).collect()
    )
    first = sorted((r.doc_id, r.shuffle_pos) for r in out.collect())
    assert again == first
    # and it actually permutes (identity would be a useless shuffle)
    moved = sum(1 for d, p in first if d != p)
    assert moved > 200
