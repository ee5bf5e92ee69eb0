"""Slowly-changing-dimension (SCD Type 2) construction and maintenance.

The reference manages keyed, upsertable tables whose merge semantics are
"latest precombine wins" (``pyspark_script.py:360-370`` — record key +
precombine + partition path). SCD2 is the complementary table-management
capability for the same keyed model: instead of keeping only the latest
version of each key, keep *every* version with an effective-time span
(``effective_from`` / ``effective_to`` / ``is_current``), so joins
against the dimension can be as-of-correct ("which plan was this user on
when the event happened"). Hudi itself ships this pattern as the classic
lakehouse SCD2 merge; here it is two pure DataFrame transforms.

Scale design: both transforms are one shuffle on the dimension key.
``scd2_from_history`` applies two windows over the same
``partitionBy(keys)`` exchange (Catalyst reuses the partitioning for the
second window — the filter between them preserves distribution), so a
100 TB change history costs exactly one key-hash shuffle, fully
parallel across keys, with per-task state bounded by the largest single
key's history. ``scd2_apply`` touches only the *current* slice of the
dimension plus the new changes — closed rows pass through untouched
(union, no shuffle), which is what makes daily incremental maintenance
O(changes), not O(history).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

EFF_FROM = "effective_from"
EFF_TO = "effective_to"
IS_CURRENT = "is_current"


def _tracked_struct(tracked: list[str]) -> Column:
    return F.struct(*[F.col(c) for c in tracked])


def scd2_from_history(
    changes: DataFrame,
    keys: list[str],
    ts_col: str,
    tracked: list[str],
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Build an SCD2 dimension from a full change history.

    Per key, order rows by ``(ts_col, *tiebreak)`` and keep only *change
    points* — rows whose tracked attributes differ (null-safely) from the
    previous row's (run compression: a key that reports the same value
    1000 times yields one version row). Each surviving version spans
    ``[effective_from, effective_to)``, where ``effective_to`` is the
    next version's start (NULL for the current version).

    Returns ``keys + tracked + [effective_from, effective_to,
    is_current]``. Non-key, non-tracked columns are dropped — a
    dimension row describes a span, not an event.

    One ``partitionBy(keys)`` shuffle total: the lag window, the
    change-point filter, and the lead window all share the exchange.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    cur = _tracked_struct(tracked)
    prev = F.lag(cur).over(w)
    # null-safe "differs from previous": first row of a key always opens
    # a version; eqNullSafe treats NULL attribute values as comparable
    changed = prev.isNull() | ~cur.eqNullSafe(prev)
    points = (
        changes.select(*keys, ts_col, *(tiebreak or []), *tracked)
        .withColumn("_chg", changed)
        .filter(F.col("_chg"))
        .drop("_chg")
    )
    out = (
        points.withColumn(EFF_FROM, F.col(ts_col))
        .withColumn(EFF_TO, F.lead(ts_col).over(w))
        .withColumn(IS_CURRENT, F.col(EFF_TO).isNull())
    )
    return out.select(*keys, *tracked, EFF_FROM, EFF_TO, IS_CURRENT)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    keys: list[str],
    ts_col: str,
    tracked: list[str],
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Incrementally merge new *changes* into an existing SCD2 *dim*.

    Contract: every change is at-or-after its key's current
    ``effective_from`` (the standard SCD2 forward-only assumption; late
    rows older than an already-closed span would require a history
    rewrite — use :func:`scd2_from_history` on the full log for that).

    Closed versions (``is_current = false``) pass through untouched.
    The current version of each key is re-expressed as a pseudo-change
    at its ``effective_from`` and re-compressed together with the new
    changes, which yields exactly the batch-rebuild result: a change
    whose attributes equal the current version extends the run (no new
    version); a differing change closes the current version at its
    timestamp and opens a new one.

    Invariant (pinned by tests/test_scd.py): for any split of a history
    H into (A, B) with max(A.ts) < min(B.ts),
    ``scd2_apply(scd2_from_history(A), B) ==
    scd2_from_history(A ∪ B)``.

    Cost: one key shuffle over (current versions ∪ changes) — O(keys +
    changes), independent of closed-history size.
    """
    closed = dim.filter(~F.col(IS_CURRENT)).select(
        *keys, *tracked, EFF_FROM, EFF_TO, IS_CURRENT
    )
    tb = tiebreak or []
    open_as_changes = dim.filter(F.col(IS_CURRENT)).select(
        *keys,
        F.col(EFF_FROM).alias(ts_col),
        *[F.lit(None).cast(changes.schema[c].dataType).alias(c) for c in tb],
        *tracked,
    )
    incoming = changes.select(*keys, ts_col, *tb, *tracked)
    rebuilt = scd2_from_history(
        open_as_changes.unionByName(incoming), keys, ts_col, tracked, tiebreak=tb
    )
    return closed.unionByName(rebuilt)


def asof_dimension_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: list[str],
    ts_col: str,
) -> DataFrame:
    """Join facts to the dimension version effective at each fact's
    timestamp: ``fact.ts ∈ [effective_from, effective_to)`` (current
    versions have an open right end). The span predicate is part of the
    join condition, so facts with no effective version survive as
    unmatched left rows (NULL dimension columns) instead of being
    filtered away. Catalyst plans the equi-part as a hash join and
    evaluates the span residually, so cost is one key shuffle (or a
    broadcast when the dimension is small, the usual case)."""
    f, d = facts.alias("f"), dim.alias("d")
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"f.{k}") == F.col(f"d.{k}"))
    cond = (
        cond
        & (F.col(f"f.{ts_col}") >= F.col(f"d.{EFF_FROM}"))
        & (
            F.col(f"d.{EFF_TO}").isNull()
            | (F.col(f"f.{ts_col}") < F.col(f"d.{EFF_TO}"))
        )
    )
    dim_cols = [c for c in dim.columns if c not in keys]
    return f.join(d, cond, "left").select(
        "f.*", *[F.col(f"d.{c}") for c in dim_cols]
    )
