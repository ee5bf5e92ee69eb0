"""Named query registry backing the driver contract (``__spark_entry__.py``).

Every operator family from SURVEY §2 lands here as a named query: a Spark
callable ``(spark, sf_dir) -> DataFrame`` plus, where SQL-expressible, a
DuckDB oracle string over the same parquet tables. Column names are
aliased identically on both sides (the driver's compare hashes values
after sorting columns by name).

Float discipline: aggregates over doubles are ``round()``-ed identically
on both sides (sum order differs between engines in the last ulp);
timestamps cross the compare as ``unix_micros`` bigints or DATEs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
# queries that mutate session-global state (scratch tables / dirs,
# memory-sink streams, session conf, catalog objects) and must never
# run inside bench.py's 4-wide parallel phases. Declared AT
# REGISTRATION via ``@query(..., sequential=True)`` — bench.py used to
# infer this from a hardcoded name-prefix list, which silently raced
# any future query that mutated state under an unlisted prefix
# (ADVICE r8).
SEQUENTIAL: set[str] = set()

# Sub-phase wall-clock reported by queries whose body spans a write
# LIFECYCLE (bootstrap/upsert/index build) plus a PROBE: the lifecycle
# runs eagerly inside the query function and stamps its seconds here;
# bench.py subtracts it from the query total to attribute build vs
# probe (r9 verdict #4 — a 2.5x swing in index_point_lookup was
# unattributable with one blended number). Last run wins per query.
PHASES: dict[str, dict[str, float]] = {}


def record_phase(name: str, phase: str, seconds: float) -> None:
    """Stamp a sub-phase duration for *name* (see ``PHASES``)."""
    PHASES.setdefault(name, {})[phase] = round(seconds, 3)


def query(name: str, oracle: str | None = None, sequential: bool = False):
    """Register a query under *name*, with an optional DuckDB oracle.

    ``sequential=True`` declares the query session-state-mutating
    (scratch writes, real streaming sinks, session conf): bench.py runs
    it outside the parallel warmup/tail phases."""

    def deco(fn):
        # a duplicate name silently SHADOWS the earlier query (dict
        # overwrite) — the earlier operator drops out of the oracle
        # gate with no signal. Fail loud at import instead (caught one
        # real shadowing in round 10).
        if name in QUERIES and QUERIES[name].__module__ != fn.__module__:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        if sequential:
            SEQUENTIAL.add(name)
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    from hudi_utility_spark.queries import (  # noqa: F401
        analytics_ext,
        corpus_q,
        dedup,
        engine_queries,
        entity_q,
        formats,
        joins_advanced,
        lifecycle_q,
        multimodal,
        pipeline_q,
        quality_q,
        relational,
        scale_q,
        scd_q,
        similarity,
        streaming,
        text,
        timeline_q,
        tpch_more,
        tpch_rest,
        udtf_q,
        variant_q,
        web_q,
    )
