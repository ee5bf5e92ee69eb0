"""Oracle-checked text-analysis queries over the documents table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hudi_utility_spark.ops import text as X
from hudi_utility_spark.queries import query
from hudi_utility_spark.tables import load_table


@query(
    "text_token_counts",
    """
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens,
           len(string_split_regex(trim(text), '\\s+')) AS n_words,
           length(text) AS n_chars_computed
    FROM documents
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace words + BPE-ish regex segmentation."""
    d = load_table(spark, sf_dir, "documents")
    c = F.col("text")
    return d.select(
        "doc_id",
        X.token_count(c).alias("n_tokens"),
        X.whitespace_token_count(c).alias("n_words"),
        F.length(c).alias("n_chars_computed"),
    )


@query(
    "text_quality_stats",
    """
    SELECT doc_id,
           len(string_split_regex(trim(text), '\\s+')) AS n_words,
           ROUND(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
                 / greatest(length(text), 1), 6) AS punct_ratio,
           ROUND((length(text) - length(regexp_replace(text, '\\s', '', 'g')))
                 / greatest(length(text), 1), 6) AS space_ratio
    FROM documents
    """,
)
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring ratios (punctuation/whitespace density) — the
    oracle-checkable core of ops.text.with_text_stats."""
    d = load_table(spark, sf_dir, "documents")
    c = F.col("text")
    words = F.split(F.trim(c), r"\s+")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.round(
            F.length(F.regexp_replace(c, r"[a-zA-Z0-9\s]", ""))
            / F.greatest(F.length(c), F.lit(1)),
            6,
        ).alias("punct_ratio"),
        F.round(
            (F.length(c) - F.length(F.regexp_replace(c, r"\s", "")))
            / F.greatest(F.length(c), F.lit(1)),
            6,
        ).alias("space_ratio"),
    )


@query(
    "text_fingerprint",
    """
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'),
                                   '\\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint (md5 of normalized text) — the dedup identity."""
    d = load_table(spark, sf_dir, "documents")
    return X.fingerprint(d).select("doc_id", "fingerprint")


@query(
    "text_length_by_lang",
    """
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(AVG(n_chars), 4) AS avg_chars,
           MAX(n_chars) AS max_chars
    FROM documents GROUP BY lang
    """,
)
def text_length_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile by language tag."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query("text_language_id")
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language-ID heuristic (deterministic; no SQL oracle
    — the marker lists are engine code, so the driver's rows-only check
    applies; pytest asserts determinism and coverage)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        X.language_id(d)
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query("text_quality_score")
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score distribution (rows-only check; the exact
    component ratios are oracle-checked in text_quality_stats)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        X.quality_score(d)
        .select("doc_id", "quality")
        .filter(F.col("quality") >= 0.0)
    )
