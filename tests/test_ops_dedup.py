"""Dedup operator tests: exactness of Jaccard on known sets (both
physical paths), MinHash/SimHash cross-validation against exact Jaccard,
survivor determinism (SURVEY §5 strategy: property + oracle checks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_utility_spark.ops import dedup as D


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_jaccard_known_sets_dense_path(spark):
    # J(1,2) = |{a,b,c}| / |{a,b,c,d,e}| = 3/5 = 0.6 ; J with doc 3 = 0
    df = _docs(
        spark,
        [(1, "a b c d"), (2, "a b c e"), (3, "x y z w")],
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.jaccard_pairs(df, n=1, threshold=0.5).collect()
    }
    assert got == {(1, 2): 0.6}


def test_jaccard_known_sets_sparse_path(spark):
    # force the array_intersect path regardless of vocabulary size
    df = _docs(
        spark,
        [(1, "a b c d"), (2, "a b c e"), (3, "x y z w")],
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.jaccard_pairs(df, n=1, threshold=0.5, max_dense_vocab=0).collect()
    }
    assert got == {(1, 2): 0.6}


def test_jaccard_positional_filter_keeps_exact_boundary_pair(spark):
    """PPJoin+ positional filter (r13): a pair sitting EXACTLY at the
    threshold (J = 3/5 at t = 0.6 → required overlap t/(1+t)·(|A|+|B|)
    = 3 exactly) must survive the collision-row pruning on the
    open-vocab path — the float-slack guard, pinned."""
    df = _docs(
        spark,
        [(1, "a b c d"), (2, "a b c e"), (3, "p q r s t u v w")],
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.jaccard_pairs(
            df, n=1, threshold=0.6, max_dense_vocab=0
        ).collect()
    }
    assert got == {(1, 2): 0.6}


def test_containment_positional_filter_keeps_exact_boundary_pair(spark):
    """Asymmetric positional filter: C(A→B) = 4/5 exactly at t = 0.8
    (required overlap ⌈t·|A|⌉ = 4) must survive the pruning."""
    from hudi_utility_spark.ops.dedup import containment_pairs

    df = _docs(
        spark,
        [(1, "a b c d e"), (2, "a b c d x y z w q"), (3, "m n o")],
    )
    got = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(df, n=1, threshold=0.8).collect()
    }
    assert got == {(1, 2): 0.8}


def test_jaccard_paths_agree_on_corpus(spark, documents):
    dense = D.jaccard_pairs(documents, n=1, threshold=0.8)
    sparse = D.jaccard_pairs(documents, n=1, threshold=0.8, max_dense_vocab=0)
    d = {(r.id_a, r.id_b): r.jaccard for r in dense.collect()}
    s = {(r.id_a, r.id_b): r.jaccard for r in sparse.collect()}
    assert d == s and len(d) > 0


def test_jaccard_shuffle_verification_matches_broadcast(spark, documents):
    """The corpus-scale path (adaptive dispatch decides the doc-set
    relation is too big to broadcast → shuffle join on id) must produce
    exactly the broadcast path's pairs. max_broadcast_entries=0 forces
    the shuffle path on the test corpus."""
    bcast = D.jaccard_pairs(documents, n=1, threshold=0.8, max_dense_vocab=0)
    shuffled = D.jaccard_pairs(
        documents, n=1, threshold=0.8, max_dense_vocab=0, max_broadcast_entries=0
    )
    b = {(r.id_a, r.id_b): r.jaccard for r in bcast.collect()}
    s = {(r.id_a, r.id_b): r.jaccard for r in shuffled.collect()}
    assert b == s and len(b) > 0


def test_exact_dedup_survivors_deterministic(spark):
    df = _docs(
        spark,
        [(5, "Hello, World!"), (2, "hello world"), (9, "unique text")],
    )
    # 5 and 2 normalize identically; min-id 2 survives
    survivors = sorted(r.doc_id for r in D.dedup_exact(df).collect())
    assert survivors == [2, 9]
    groups = D.exact_duplicates(df).collect()
    assert len(groups) == 1 and groups[0].group_size == 2 and groups[0].keep_id == 2


def test_minhash_identical_docs_certain_pair(spark):
    df = _docs(
        spark,
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "completely different words entirely here now")],
    )
    pairs = D.minhash_lsh_pairs(df, num_hashes=32, bands=8, threshold=0.9).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}
    assert pairs[0].est_jaccard == 1.0


def test_minhash_candidates_are_truly_similar(spark, documents):
    """Precision cross-check: every high-estimate MinHash pair must have
    substantial true bigram Jaccard (the S-curve keeps false positives
    at high estimates rare; threshold chosen loose for determinism)."""
    cand = D.minhash_lsh_pairs(
        documents, num_hashes=32, bands=8, shingle_n=2, threshold=0.8
    )
    exact = D.jaccard_pairs(documents, n=2, threshold=0.3)
    joined = cand.join(exact, ["id_a", "id_b"], "left")
    rows = joined.collect()
    assert rows, "expected at least one high-estimate candidate pair"
    misses = [r for r in rows if r.jaccard is None]
    assert len(misses) <= max(1, len(rows) // 10)


def test_simhash_identical_and_disjoint(spark):
    df = _docs(
        spark,
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "zq xw vr ut")],
    )
    pairs = D.simhash_near_pairs(df, max_distance=3)
    got = {(r.id_a, r.id_b): r.distance for r in pairs.collect()}
    assert got == {(1, 2): 0}


def test_simhash_hamming_distance_expr(spark):
    df = spark.createDataFrame([(0b1011, 0b0010)], ["a", "b"])
    out = df.select(D.hamming_distance(F.col("a"), F.col("b")).alias("d")).first()
    assert out.d == 2


def test_minhash_shuffle_verification_matches_broadcast(spark, documents):
    """Corpus-scale shuffle-join verification (adaptive dispatch decides
    signatures don't fit executor memory) must equal the broadcast
    path. max_broadcast_docs=0 forces the shuffle path."""
    b = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in D.minhash_lsh_pairs(documents, num_hashes=32, bands=8).collect()
    }
    s = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in D.minhash_lsh_pairs(
            documents, num_hashes=32, bands=8, max_broadcast_docs=0
        ).collect()
    }
    assert b == s and len(b) > 0


def test_dedup_incremental_rejects_corpus_and_batch_dupes(spark):
    from hudi_utility_spark.ops.dedup import dedup_incremental
    from hudi_utility_spark.ops.text import fingerprint

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon")],
        "doc_id INT, text STRING",
    )
    batch = spark.createDataFrame(
        [
            (10, "Alpha  beta GAMMA!"),   # normalizes to corpus doc 1 → rejected
            (11, "zeta eta"),             # new → kept
            (12, "theta iota"),           # new, duplicated in batch → min id kept
            (13, "theta iota"),
        ],
        "doc_id INT, text STRING",
    )
    got = sorted(
        r.doc_id for r in dedup_incremental(batch, corpus=corpus).collect()
    )
    assert got == [11, 12]

    # persisted-store arm gives the identical answer
    store = fingerprint(corpus).select("fingerprint")
    got2 = sorted(
        r.doc_id
        for r in dedup_incremental(batch, corpus_fingerprints=store).collect()
    )
    assert got2 == [11, 12]


def test_incremental_minhash_gates_near_copies(spark, documents):
    from hudi_utility_spark.ops.dedup import incremental_minhash, minhash_bands

    corpus = documents.limit(100)
    store = minhash_bands(corpus)
    # replaying the corpus itself as the batch: every doc collides with
    # its own banded signature in the store -> nothing admitted
    readmitted = incremental_minhash(corpus, store)
    assert readmitted.count() == 0
    # a genuinely fresh batch (disjoint ids, fresh text) is admitted
    fresh = spark.createDataFrame(
        [(100000 + i, f"utterly novel content piece number {i} "
          f"with distinct trailing words {i * 7} {i * 13}") for i in range(5)],
        "doc_id long, text string",
    )
    admitted = incremental_minhash(fresh, store)
    assert admitted.count() == 5
    # near-copy of an admitted batch doc with a HIGHER id is rejected
    # by the within-batch lower-id rule
    near = fresh.union(
        spark.createDataFrame(
            [(200000, "utterly novel content piece number 0 "
              "with distinct trailing words 0 0")],
            "doc_id long, text string",
        )
    )
    kept = incremental_minhash(near, store)
    ids = {r["doc_id"] for r in kept.collect()}
    assert 200000 not in ids and len(ids) == 5


def test_dedup_spans_first_occurrence_wins_and_rebuilds(spark):
    from hudi_utility_spark.ops.text import dedup_spans

    # spans of 3 words; doc 1 owns "a b c"; doc 2 repeats it then adds
    # fresh content; doc 3 is entirely a repeat of doc 1
    rows = [
        (1, "a b c d e f"),
        (2, "a b c x y z"),
        (3, "a b c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_spans"], r["n_kept"], r["rebuilt"])
        for r in dedup_spans(df, span_tokens=3).collect()
    }
    assert got[1] == (2, 2, "a b c d e f")
    assert got[2] == (2, 1, "x y z")  # duplicate leading span removed
    assert got[3] == (1, 0, "")  # fully-duplicated doc rebuilds empty


def test_dedup_spans_preserves_span_order(spark):
    from hudi_utility_spark.ops.text import dedup_spans

    text = " ".join(f"w{i}" for i in range(9))  # 3 distinct spans of 3
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    r = dedup_spans(df, span_tokens=3).collect()[0]
    assert (r["n_spans"], r["n_kept"], r["rebuilt"]) == (3, 3, text)


def test_containment_catches_embedded_quote_jaccard_misses(spark):
    """A short doc fully quoted inside a much longer one: containment
    (A in B) = 1.0 while Jaccard is far below threshold — the asymmetric
    case the symmetric detector cannot flag."""
    from hudi_utility_spark.ops.dedup import containment_pairs, jaccard_pairs

    quote = "the quarterly revenue grew twelve percent year over year"
    filler = " ".join(f"unrelated commentary token{i} analysis" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, quote),
            (2, filler + " " + quote + " further discussion follows here"),
            (3, "completely different content about weather patterns today"),
        ],
        ["doc_id", "text"],
    )
    cont = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(docs, n=3, threshold=0.9).collect()
    }
    assert (1, 2) in cont and cont[(1, 2)] == 1.0
    assert (2, 1) not in cont                      # direction matters
    assert not [p for p in cont if 3 in p]
    jac = jaccard_pairs(docs, n=3, threshold=0.5).collect()
    assert not [r for r in jac if {r["id_a"], r["id_b"]} == {1, 2}]
    spark.catalog.clearCache()


def test_containment_matches_bruteforce(spark):
    """Prefix-filtered result == brute-force all-pairs containment on a
    seeded corpus (exactness of the asymmetric prefix bound)."""
    import itertools
    import re

    from hudi_utility_spark.ops.dedup import containment_pairs

    def h(i, j):
        import hashlib
        return int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:8], 16)

    vocab = [f"w{k}" for k in range(30)]
    docs = [
        (i, " ".join(vocab[h(i, j) % 30] for j in range(10 + h(i, 0) % 15)))
        for i in range(25)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    t = 0.5

    def grams(text):
        ws = re.sub(r"\s+", " ", text.strip()).split(" ")
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    sets = {i: grams(tx) for i, tx in docs}
    import math
    expected = {}
    for a, b in itertools.permutations(sets, 2):
        common = len(sets[a] & sets[b])
        if sets[a] and common >= math.ceil(t * len(sets[a])):
            expected[(a, b)] = round(common / len(sets[a]), 6)
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(df, n=3, threshold=t).collect()
    }
    assert got == expected
    spark.catalog.clearCache()


def test_semdedup_drops_near_dup_keeps_representative(spark):
    """Two near-identical vectors in one cell plus an orthogonal one:
    the junior near-dup is dropped, the senior survives, the orthogonal
    vector is untouched; with a threshold above their cosine, everyone
    survives."""
    from hudi_utility_spark.ops.dedup import semdedup

    rows = [
        (1, [1.0, 0.0, 0.0], 0),
        (2, [0.999, 0.01, 0.0], 0),   # near-dup of 1
        (3, [0.0, 1.0, 0.0], 1),
        (4, [0.0, 0.98, 0.1], 1),     # near-dup of 3
        (5, [0.0, 0.0, 1.0], 2),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    survivors = {r.vec_id for r in semdedup(df, threshold=0.95).collect()}
    assert survivors == {1, 3, 5}
    all_survive = {r.vec_id for r in semdedup(df, threshold=0.99999).collect()}
    assert all_survive == {1, 2, 3, 4, 5}


def test_semdedup_reassignment_beats_given_labels(spark):
    """A vector mislabeled into the wrong cell must be REASSIGNED to
    the nearest centroid before the within-cluster pass — so it IS
    deduped against its true neighbors (blocking on the raw label
    would miss it)."""
    from hudi_utility_spark.ops.dedup import semdedup

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.02], 0),
        (3, [0.0, 1.0], 1),
        (4, [0.02, 1.0], 1),
        # same direction as cell 0's centroid but labeled 1:
        (5, [0.99, 0.01], 1),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = {r.vec_id: r.cluster for r in semdedup(df, threshold=0.99).collect()}
    assert 5 not in out  # reassigned to cluster 0, deduped against 1/2
    assert set(out) == {1, 3}


def test_semdedup_mega_cluster_guard(spark):
    import pytest

    from hudi_utility_spark.ops.dedup import semdedup

    rows = [(i, [1.0, float(i % 3) / 100], 0) for i in range(30)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    with pytest.raises(ValueError, match="cluster count"):
        semdedup(df, threshold=0.99, max_cluster_rows=10)
