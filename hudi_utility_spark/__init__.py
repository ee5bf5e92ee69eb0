"""hudi_utility_spark — a PySpark-native analytics / table-management engine.

Re-expresses the capabilities of the reference "Hudi Bootstrap Application"
(SunilKumar005/Hudi_utility: Parquet/ORC → keyed-table bootstrap with
resume, validation, ledger, status events) as an idiomatic PySpark library,
and extends it with large-scale data-pipeline operators: deduplication,
similarity search, text analysis, multimodal column plumbing, and
structured-streaming windows.

Design notes
------------
* Everything is the DataFrame / SQL API; Catalyst owns the physical plan.
* Ingest targets a pure-Spark *keyed table*: Hive-style ``partitionBy``
  parquet layout, upsert = union + precombine window dedup
  (latest-by-key), COW = rewrite, MOR = base + delta-log resolved at read.
* No services: the reference's FastAPI/Postgres/WebSocket tier collapses
  into library calls + a parquet ledger table + observer callbacks.
"""

from hudi_utility_spark.session import get_spark
from hudi_utility_spark.table import KeyedTable, TableType, BootstrapMode
from hudi_utility_spark.io import read_source, sniff_format, resolve_source
from hudi_utility_spark.write import (
    full_bootstrap,
    upsert,
    upsert_partial,
    latest_by_key,
    merge_into,
    resolve_partial,
    delete_keys,
    write_zordered,
)
from hudi_utility_spark.scd import (
    asof_dimension_join,
    scd2_apply,
    scd2_from_history,
)
from hudi_utility_spark.materialize import replicate_incremental
from hudi_utility_spark.validate import table_diff
from hudi_utility_spark.repair import (
    missing_partitions,
    incomplete_partitions,
    partition_counts,
    resume_bootstrap,
)
from hudi_utility_spark.validate import (
    ValidationError,
    validate_request,
    validate_fields_in_schema,
    reconcile,
)
from hudi_utility_spark.ledger import Ledger
from hudi_utility_spark.events import StatusObserver

__all__ = [
    "get_spark",
    "KeyedTable",
    "TableType",
    "BootstrapMode",
    "read_source",
    "sniff_format",
    "resolve_source",
    "full_bootstrap",
    "upsert",
    "upsert_partial",
    "latest_by_key",
    "resolve_partial",
    "delete_keys",
    "merge_into",
    "write_zordered",
    "scd2_from_history",
    "scd2_apply",
    "asof_dimension_join",
    "replicate_incremental",
    "table_diff",
    "missing_partitions",
    "incomplete_partitions",
    "partition_counts",
    "resume_bootstrap",
    "ValidationError",
    "validate_request",
    "validate_fields_in_schema",
    "reconcile",
    "Ledger",
    "StatusObserver",
]

__version__ = "0.1.0"
