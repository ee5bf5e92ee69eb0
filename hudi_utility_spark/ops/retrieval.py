"""Lexical retrieval over document tables: BM25 ranking and TF-IDF
keyword extraction (north star — the search/labeling half of a
training-data platform; the reference's query surface has no retrieval,
so this extends SURVEY §2 the same way dedup/similarity do).

Scale shape:

* **BM25** — the query's terms are a handful of literals, so per-doc
  term frequencies are codegen'd array expressions (no explode, no
  shuffle on the corpus); the only aggregates are the corpus scalars
  (N, avgdl) and per-term document frequencies — O(terms) rows,
  cross-joined back as a broadcast. Top-k is TakeOrdered. At 100 TB:
  one map pass + one tiny aggregate, same class as brute-force cosine.
* **TF-IDF top terms** — explode to (doc, term) then two keyed
  aggregates (term → df, doc → norm) and a per-doc ranking window. The
  window partitions by document — millions of small partitions, no
  global window.

Tokenization is `ops.text.normalized` + split — identical, engine-
portable semantics (the DuckDB oracles reproduce it with regexp_replace
+ string_split).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hudi_utility_spark.ops.text import normalized


def _terms(col) -> Column:
    """Normalized word array; empty docs yield an empty array (split of
    '' would yield [''])."""
    return F.filter(F.split(normalized(col), " "), lambda t: t != "")


def _term_count(term: str) -> Column:
    # bound via helper, not a `t=t` default: a defaulted second lambda
    # param would make PySpark pass the array INDEX into it (HOF lambdas
    # are dispatched on arity — see ops/similarity.py)
    return F.size(F.filter("toks", lambda x: x == F.lit(term)))


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25 (Robertson;
    Lucene-style smooth idf = ln(1 + (N - df + 0.5)/(df + 0.5))).

    Per-doc tf for each query term is a map-side array count; corpus
    stats (N, avgdl, per-term df) are one aggregate producing O(terms)
    scalars broadcast back into the scoring expression. Ties break on
    ascending id for a total order."""
    terms = [t.lower() for t in query_terms]
    toks = _terms(F.col(text_col)).alias("toks")
    base = df.select(F.col(id_col), toks).select(
        id_col,
        F.size("toks").alias("dl"),
        *[_term_count(t).alias(f"tf_{i}") for i, t in enumerate(terms)],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs_total"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.join(F.broadcast(stats))
    score = None
    for i in range(len(terms)):
        idf = F.log(
            1.0
            + (F.col("n_docs_total") - F.col(f"df_{i}") + 0.5)
            / (F.col(f"df_{i}") + 0.5)
        )
        tf = F.col(f"tf_{i}").cast("double")
        part = idf * tf * (k1 + 1) / (
            tf + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
        )
        score = part if score is None else score + part
    return (
        scored.select(F.col(id_col), F.round(score, 6).alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def tfidf_top_terms(
    df: DataFrame,
    top_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-``top_n`` terms by tf-idf (tf = in-doc count,
    idf = ln(N / df), ties → lexicographically first term) — the
    keyword-labeling pass of a corpus exploration pipeline.

    Three keyed exchanges total — (doc, term) grouping, then a
    term-partitioned count window for document frequency (replacing a
    separate aggregate + self-join, which costs two more exchanges),
    then the doc-partitioned ranking window; every key is
    high-cardinality, so no hot partitions."""
    pairs = df.select(
        F.col(id_col), F.explode(_terms(F.col(text_col))).alias("term")
    )
    tf = pairs.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("n_docs_total"))
    scored = tf.withColumn(
        "term_df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    ).join(F.broadcast(n_docs)).select(
        id_col,
        "term",
        F.round(
            F.col("tf") * F.log(F.col("n_docs_total") / F.col("term_df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_n)
        .select(id_col, F.col("rn").alias("rank"), "term", "tfidf")
    )


def positional_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Positions-bearing inverted index (Lucene posting shape): one row
    per (term, doc) carrying the sorted 1-based position array. One
    explode + one (term, doc)-keyed aggregate; at scale the index is
    term-partitioned so a phrase probe reads only its terms' rows.
    Positions are array_sort'ed — never collect_list order."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.filter(F.split(normalized(F.col(text_col)), " "), lambda t: t != "")
        ).alias("pos0", "term"),
    )
    return toks.groupBy("term", "doc_id").agg(
        F.array_sort(F.collect_list(F.col("pos0") + 1)).alias("positions")
    )


def phrase_match(postings: DataFrame, phrase: str) -> DataFrame:
    """Exact phrase query over the positional index: for terms
    t0..t(n-1), a match at position p needs p+i in positions(ti) for
    every i — computed as the intersection of each term's positions
    shifted left by its offset. The probe filters the index to n
    literal terms (a pushable isin — at scale only those terms' posting
    rows are read), then chains n-1 doc-keyed joins between
    term-posting relations; docs missing any term drop out at the join.
    No corpus scan, no window, overlapping matches counted.

    Returns (doc_id, n_matches, first_pos) for docs with >= 1 match."""
    import re

    # same normalization as the index side: lowercase, punct -> space
    terms = [
        t
        for t in re.sub(r"[^a-z0-9\s]", " ", phrase.lower()).split()
        if t
    ]
    if not terms:
        raise ValueError("empty phrase")
    acc = None
    for i, t in enumerate(terms):
        side = (
            postings.filter(F.col("term") == t)
            .select(
                "doc_id",
                F.transform(F.col("positions"), lambda p: p - i).alias(f"p{i}"),
            )
        )
        acc = side if acc is None else acc.join(side, "doc_id")
    from functools import reduce

    starts = acc.select(
        "doc_id",
        reduce(
            lambda a, b: F.array_intersect(a, b),
            [F.col(f"p{i}") for i in range(len(terms))],
        ).alias("starts"),
    )
    return starts.filter(F.size("starts") > 0).select(
        "doc_id",
        F.size("starts").cast("long").alias("n_matches"),
        F.array_min("starts").cast("long").alias("first_pos"),
    )
