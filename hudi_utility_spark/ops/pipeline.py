"""Composed corpus-cleaning pipeline — the end-to-end training-data
preparation flow the single-purpose ops exist for:

    raw documents → exact dedup (content fingerprint, min-id survivor)
                  → quality gate (C4/Gopher-style composite score)
                  → language ID (stopword-marker heuristic)

The reference's closest analogue is the bootstrap lifecycle
(``pyspark_script.py:323-401``: read → validate → plan-select → write →
reconcile); this pipeline is the same staged-funnel shape applied to a
document corpus instead of a partitioned table, with each stage one of
our §2 / north-star operators.

Scale notes (100 TB / 1000 executors):
- The only shuffle is the fingerprint window in the dedup stage — keyed
  on a 128-bit md5, so it is uniformly distributed (no skew) and ships
  only (fingerprint, doc_id, text) once. Quality scoring and language ID
  are pure map stages fused into the post-shuffle pipeline by
  whole-stage codegen; the funnel counts ride the same single pass via
  ``df.observe``-style aggregates rather than extra jobs.
- Stage order is deliberate: dedup first (cheapest way to shrink the
  corpus before the regex-heavy quality pass touches every byte), and
  near-dup (MinHash) would slot between dedup and quality via
  ``ops.dedup.minhash_lsh_pairs`` + ``near_dup_groups`` with the same
  min-id survivor rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hudi_utility_spark.ops.text import fingerprint, language_id, quality_score

DEFAULT_MIN_QUALITY = 0.5


def clean_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = DEFAULT_MIN_QUALITY,
) -> DataFrame:
    """Run the full cleaning funnel; returns surviving documents with
    ``fingerprint``, ``quality`` and ``lang_pred`` columns attached.

    Deterministic end to end: min-id wins dedup ties, score and language
    are pure functions of the text — so the result is oracle-checkable
    and rerun-stable (the property upsert/resume relies on elsewhere).
    """
    deduped = dedup_stage(df, id_col=id_col, text_col=text_col)
    gated = quality_stage(deduped, text_col=text_col, min_quality=min_quality)
    return language_id(gated, text_col)


def dedup_stage(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup on the content fingerprint, keeping the lowest id —
    the precombine-window idiom (``write.latest_by_key``) on md5 keys."""
    w = Window.partitionBy("fingerprint").orderBy(F.asc(id_col))
    return (
        fingerprint(df, text_col)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def quality_stage(
    df: DataFrame, text_col: str = "text", min_quality: float = DEFAULT_MIN_QUALITY
) -> DataFrame:
    """Score and gate. Keeps the ``quality`` column for downstream
    reporting; drops the intermediate stats columns."""
    scored = quality_score(df, text_col)
    extra = set(scored.columns) - set(df.columns) - {"quality"}
    return scored.filter(F.col("quality") >= min_quality).drop(*extra)


def corpus_funnel(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = DEFAULT_MIN_QUALITY,
) -> DataFrame:
    """Per-stage survivor counts — the observability face of the
    pipeline (what the reference surfaces as scraped record counts,
    ``app.py:320-321``, becomes a first-class DataFrame here)."""
    raw = df.select(F.lit("00_raw").alias("stage"), F.col(id_col))
    deduped = dedup_stage(df, id_col, text_col).select(
        F.lit("10_dedup").alias("stage"), F.col(id_col)
    )
    gated = quality_stage(dedup_stage(df, id_col, text_col), text_col, min_quality).select(
        F.lit("20_quality").alias("stage"), F.col(id_col)
    )
    return (
        raw.unionByName(deduped)
        .unionByName(gated)
        .groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def walkforward_folds(
    df: DataFrame,
    ts_col: str,
    n_folds: int,
    embargo_seconds: int,
    t_min_us: int,
    t_max_us: int,
) -> DataFrame:
    """Purged walk-forward cross-validation assignment (the
    Lopez de Prado embargo discipline, and the only split that doesn't
    leak for time-ordered training data): time is cut into ``n_folds``
    equal spans; each row gets its chronological ``fold``, plus a
    per-fold role — rows inside the fold span are ``test``, rows
    EARLIER than the span minus the embargo gap are ``train``, and rows
    inside the embargo buffer just before the span are ``purged``
    (dropped so serially-correlated labels can't bleed across the
    boundary). Emitted per (row, fold) via a bounded explode of the
    fold spine — n_folds literals, map-only, no shuffle until the
    caller aggregates.

    ``t_min_us``/``t_max_us`` bound the spine (pass them from one
    2-scalar aggregate, or from pipeline metadata at 100 TB).
    """
    from hudi_utility_spark.tsutil import us

    span = (t_max_us - t_min_us + 1) // n_folds + 1
    emb = embargo_seconds * 1_000_000
    folds = F.sequence(F.lit(0), F.lit(n_folds - 1))
    e = us(F.col(ts_col))
    lo = F.lit(t_min_us) + F.col("fold") * F.lit(span)
    return (
        df.withColumn("fold", F.explode(folds))
        .withColumn(
            "role",
            F.when((e >= lo) & (e < lo + F.lit(span)), F.lit("test"))
            .when(e < lo - F.lit(emb), F.lit("train"))
            .when((e >= lo - F.lit(emb)) & (e < lo), F.lit("purged"))
            .otherwise(F.lit("future")),
        )
    )
