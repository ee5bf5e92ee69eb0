"""ops/er.py + ops/web.py + MMR rerank unit tests (sf0.001)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_utility_spark.ops import er, web
from hudi_utility_spark.ops.similarity import mmr_rerank
from hudi_utility_spark.tables import load_table


def _dirty(cust):
    return cust.select(
        F.concat(F.lit("D-"), F.col("c_custkey")).alias("dirty_id"),
        F.regexp_replace("c_name", "#", "").alias("d_name"),
    )


def test_er_blocking_bounds_candidates(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    dirty = _dirty(cust)
    n_clean = cust.count()
    cands = er.blocked_candidates(cust, dirty, "c_name", "d_name", n=3)
    n_cands = cands.count()
    # blocking must not be all-pairs, and every record keeps its twin
    assert n_cands < n_clean * n_clean
    assert n_cands >= n_clean


def test_er_verify_links_every_dirty_to_its_master(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    dirty = _dirty(cust)
    cands = er.blocked_candidates(cust, dirty, "c_name", "d_name", n=3)
    m = er.verify_matches(cands, "c_name", "d_name", max_edit=4)
    rows = m.select("c_custkey", "dirty_id", "edit_dist").collect()
    n_clean = cust.count()
    assert len(rows) == n_clean  # exactly one match per dirty record
    for r in rows:
        assert r.dirty_id == f"D-{r.c_custkey}"  # the RIGHT master
        assert r.edit_dist == 1  # dropped '#'


def test_er_golden_records_aggregates_per_entity(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    dirty = _dirty(cust)
    cands = er.blocked_candidates(cust, dirty, "c_name", "d_name", n=3)
    m = er.verify_matches(cands, "c_name", "d_name", max_edit=4)
    g = er.golden_records(
        m, "c_custkey", [F.count(F.lit(1)).alias("dups")]
    ).collect()
    assert all(r.dups == 1 for r in g)
    assert len(g) == cust.count()


def test_url_canonicalization_rules(spark):
    cases = [
        # (raw, canonical)
        (
            "https://WWW.Site.OrG:443/en/a/1/?utm_source=x&ref=y&page=2#f",
            "https://site.org/en/a/1?page=2",
        ),
        ("https://cdn.site.org/en/a/2", "https://cdn.site.org/en/a/2"),
        ("https://site.org/x/?b=2&a=1", "https://site.org/x?a=1&b=2"),
        ("https://site.org/x?utm_a=1", "https://site.org/x"),
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "url string")
    got = [
        r[0]
        for r in df.select(web.canonical_url(F.col("url"))).collect()
    ]
    assert got == [c for _, c in cases]


def test_registered_domain_strips_subdomains(spark):
    df = spark.createDataFrame(
        [("a.b.example.com",), ("example.com",), ("cdn.x.org",)],
        "host string",
    )
    got = [r[0] for r in df.select(web.registered_domain(F.col("host"))).collect()]
    assert got == ["example.com", "example.com", "x.org"]


def test_mmr_rerank_diversifies_and_ranks(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    qv = list(e.filter(F.col("vec_id") == 0).select("embedding").first()[0])
    out = mmr_rerank(e, qv, k=4, pool=10).collect()
    assert [r.rnk for r in out] == [1, 2, 3, 4]
    ids = [r.vec_id for r in out]
    assert len(set(ids)) == 4  # no repeats
    assert out[0].vec_id == 0  # the query vector itself is most relevant
    # first pick's mmr is lam*rel; later picks pay a redundancy penalty
    assert abs(out[0].mmr - 0.7 * out[0].rel) < 1e-9
    assert all(r.mmr <= 0.7 * r.rel + 1e-9 for r in out[1:])


def test_jl_projection_shape_and_determinism(spark, sf_dir):
    from hudi_utility_spark.ops.similarity import jl_project, jl_sign_matrix

    R = jl_sign_matrix(8, 4)
    assert len(R) == 4 and all(len(r) == 8 for r in R)
    assert all(s in (-1, 1) for r in R for s in r)
    assert R == jl_sign_matrix(8, 4)  # deterministic
    # signs are balanced enough to be a projection, not a constant row
    assert any(-1 in r and 1 in r for r in R)

    e = load_table(spark, sf_dir, "embeddings")
    p = jl_project(e, d_in=64, d_out=16)
    row = p.select("proj").first()
    assert len(row[0]) == 16


def test_bpe_train_merges_learns_composed_rules(spark):
    from hudi_utility_spark.ops.text import bpe_train_merges

    df = spark.createDataFrame(
        [("hello hell help hello hull",)], "text string"
    )
    out = bpe_train_merges(df, "text", n_merges=3, vocab_cap=50).collect()
    assert [(r.merge_rank, r.pair, r.pcnt) for r in out] == [
        (1, "e+l", 4),
        (2, "h+el", 4),
        (3, "hel+l", 3),
    ]


def test_sorted_neighborhood_pairs_window_semantics(spark):
    rows = [("b1", "r1", "aa"), ("b1", "r2", "ab"), ("b1", "r3", "zz"),
            ("b2", "r4", "mm")]
    df = spark.createDataFrame(rows, "blk string, rid string, key string")
    out = er.sorted_neighborhood_pairs(df, "blk", "key", "rid", window=2)
    got = {(r.l_id, r.r_id) for r in out.collect()}
    # within b1 sorted by key: aa,ab,zz -> pairs (1,2),(1,3),(2,3); b2 alone
    assert got == {("r1", "r2"), ("r1", "r3"), ("r2", "r3")}
    # candidate count is linear in block size x window, never quadratic
    assert out.count() == 3


def test_bpe_encode_applies_merges_in_rank_order(spark):
    from hudi_utility_spark.ops.text import bpe_encode

    df = spark.createDataFrame(
        [(1, "abab ab cd"), (2, ""), (3, "zzz")], ["doc_id", "text"]
    )
    # rank order matters: 'a b' first makes 'ab', then 'ab ab' -> 'abab'
    out = {r.doc_id: r for r in bpe_encode(df, [("a", "b"), ("ab", "ab")]).collect()}
    # 'abab' -> a b a b -> ab ab -> abab (1 token); 'ab' -> 1; 'cd' -> 2
    assert (out[1].n_words, out[1].n_bpe_tokens) == (3, 4)
    assert (out[2].n_words, out[2].n_bpe_tokens) == (0, 0)  # empty doc kept
    assert (out[3].n_words, out[3].n_bpe_tokens) == (1, 3)  # untouched word


def test_host_suffixes_bounds_and_subdomain_matching(spark):
    from pyspark.sql import functions as F

    from hudi_utility_spark.ops.web import host_suffixes

    df = spark.createDataFrame(
        [("static.cdn.src5.org",), ("src5.org",), ("localhost",)], ["h"]
    )
    got = {r.h: r.s for r in df.select("h", host_suffixes(F.col("h")).alias("s")).collect()}
    assert got["static.cdn.src5.org"] == [
        "static.cdn.src5.org", "cdn.src5.org", "src5.org",
    ]
    assert got["src5.org"] == ["src5.org"]
    assert got["localhost"] == ["localhost"]  # single label: no descend
    # blocklist semantics: an entry blocks itself and subdomains only
    blocked = {"cdn.src5.org"}
    assert any(s in blocked for s in got["static.cdn.src5.org"])
    assert not any(s in blocked for s in got["src5.org"])


def test_fellegi_sunter_weights_and_decisions(spark):
    """All-agree pair scores sum(ln(m/u)) -> match; all-disagree pair
    scores sum(ln((1-m)/(1-u))) -> non_match; the m<u guard rejects a
    useless field."""
    import math

    import pytest
    from pyspark.sql import functions as F

    from hudi_utility_spark.ops.er import fellegi_sunter_score

    df = spark.createDataFrame(
        [("a", "a", 1), ("a", "zzz", 2)], ["x", "y", "pid"]
    )
    comps = [
        ("eq", F.col("x") == F.col("y"), 0.9, 0.01),
        ("len", F.length("x") == F.length("y"), 0.8, 0.1),
    ]
    out = {
        r.pid: r
        for r in fellegi_sunter_score(df, comps, upper=4.0, lower=0.0).collect()
    }
    agree = math.log(0.9 / 0.01) + math.log(0.8 / 0.1)
    disagree = math.log(0.1 / 0.99) + math.log(0.2 / 0.9)
    assert abs(out[1].fs_score - round(agree, 6)) < 1e-9
    assert out[1].decision == "match"
    assert abs(out[2].fs_score - round(disagree, 6)) < 1e-9
    assert out[2].decision == "non_match"

    with pytest.raises(ValueError, match="0 < u < m < 1"):
        fellegi_sunter_score(
            df, [("bad", F.col("x") == F.col("y"), 0.1, 0.5)], 1, 0
        ).collect()
