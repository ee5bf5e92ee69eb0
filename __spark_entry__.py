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

load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the V4 partition-
    completeness audit (missing/incomplete/complete per month) — the
    reference's signature capability as one two-aggregate + one-join plan.
    """
    return QUERIES["v4_partition_audit"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys absent here are genuinely
    non-SQL-expressible (engine-specific hashes / approximate algorithms)
    and take the driver's rows-only check."""
    return dict(ORACLES)
