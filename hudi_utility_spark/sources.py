"""Custom connectors via the Spark 4 **Python Data Source API**
(`pyspark.sql.datasource`) — the extension point the reference lacks
entirely (its only inputs are files handed to ``spark.read``,
``pyspark_script.py:100-118``; adding a new source there means editing
the app). Here a new source is a class: schema, partition planning,
filter pushdown, and Arrow-batch reads, all in Python, executed
distributed by Spark.

The shipped source is a deterministic synthetic-corpus generator —
the dsdgen/TPC-style "data at any scale from a formula" connector that
a 100 TB benchmark needs (generating 100 TB beats copying it). Every
column derives from the portable md5 hash family this repo already
uses for oracle-checked sampling, so ANY engine can reproduce the
exact rows (the DuckDB oracle regenerates them from ``range()``).

Scale design:

* ``partitions()`` emits one ``InputPartition`` per shard — Spark
  schedules shards across executors; a 10^12-row corpus is just more
  shards, no driver state beyond the count.
* ``pushFilters()`` prunes shards: ``doc_id`` range and ``shard``
  equality/IN predicates narrow which partitions are planned AT ALL
  (partition-level pushdown — the Python analogue of parquet
  partition pruning). Filters are also returned to Spark, so
  re-evaluation keeps correctness even for partially-handled ranges.
* ``read()`` yields **pyarrow RecordBatches** (vectorized transfer),
  not per-row tuples; generation is O(rows/shard) with zero IO.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SYNTH_LANGS = ["en", "de", "fr", "es", "zh"]

SYNTH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("shard", LongType(), False),
        StructField("lang", StringType(), False),
        StructField("n_chars", IntegerType(), False),
        StructField("quality", DoubleType(), False),
        StructField("text", StringType(), False),
    ]
)


def _h48(i: int) -> int:
    """First 48 bits of md5(str(i)) — identical to the SQL twin
    ``CAST(concat('0x', substr(md5(CAST(i AS VARCHAR)), 1, 12)) AS
    BIGINT)`` used across this repo's oracles."""
    return int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)


def synth_row(i: int) -> tuple:
    """The generator formula for global row ``i`` (pure, portable)."""
    h = _h48(i)
    lang = SYNTH_LANGS[h % 5]
    n_chars = 64 + (h % 1937)
    quality = (h % 1000) / 1000.0
    # deterministic pseudo-text: enough structure for tokenizer/dedup
    # kernels to chew on, cheap to produce, same every run
    text = " ".join(f"tok{(h >> b) % 997}" for b in range(0, 40, 8))
    return (i, None, lang, n_chars, quality, text)


class _ShardPartition(InputPartition):
    def __init__(self, shard: int, start: int, end: int):
        self.shard = shard
        self.start = start  # inclusive global id
        self.end = end  # exclusive


class SynthDocsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", "1000"))
        self.rows_per_shard = int(options.get("rowsPerShard", "250"))
        # narrowed by pushFilters; start as the full domain
        self._lo = 0
        self._hi = self.rows
        self._shards: set[int] | None = None

    # -- planning ----------------------------------------------------
    def pushFilters(self, filters):
        """Partition-level pushdown: doc_id ranges and shard point/IN
        predicates narrow which shards are planned. Every filter is
        returned (Spark re-evaluates), so pushdown is purely a pruning
        optimization — never a correctness dependency."""
        for f in filters:
            col = f.attribute[-1] if getattr(f, "attribute", None) else None
            if col == "doc_id":
                if isinstance(f, GreaterThan):
                    self._lo = max(self._lo, f.value + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self._lo = max(self._lo, f.value)
                elif isinstance(f, LessThan):
                    self._hi = min(self._hi, f.value)
                elif isinstance(f, LessThanOrEqual):
                    self._hi = min(self._hi, f.value + 1)
                elif isinstance(f, EqualTo):
                    self._lo = max(self._lo, f.value)
                    self._hi = min(self._hi, f.value + 1)
            elif col == "shard":
                if isinstance(f, EqualTo):
                    s = {f.value}
                    self._shards = s if self._shards is None else self._shards & s
                elif isinstance(f, In):
                    s = set(f.value)
                    self._shards = s if self._shards is None else self._shards & s
            yield f

    def partitions(self):
        out = []
        per = self.rows_per_shard
        n_shards = (self.rows + per - 1) // per
        for s in range(n_shards):
            start, end = s * per, min((s + 1) * per, self.rows)
            # prune by pushed doc_id range and shard set
            start, end = max(start, self._lo), min(end, self._hi)
            if start >= end:
                continue
            if self._shards is not None and s not in self._shards:
                continue
            out.append(_ShardPartition(s, start, end))
        # Spark requires ≥1 partition; an empty plan still needs a stub
        return out or [_ShardPartition(0, 0, 0)]

    # -- execution ---------------------------------------------------
    def read(self, partition: _ShardPartition):
        import pyarrow as pa

        ids, shards, langs, ncs, quals, texts = [], [], [], [], [], []
        for i in range(partition.start, partition.end):
            _, _, lang, n_chars, quality, text = synth_row(i)
            ids.append(i)
            shards.append(partition.shard)
            langs.append(lang)
            ncs.append(n_chars)
            quals.append(quality)
            texts.append(text)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(shards, pa.int64()),
                pa.array(langs, pa.string()),
                pa.array(ncs, pa.int32()),
                pa.array(quals, pa.float64()),
                pa.array(texts, pa.string()),
            ],
            names=["doc_id", "shard", "lang", "n_chars", "quality", "text"],
        )


class SynthDocsDataSource(DataSource):
    """``spark.read.format("synth_docs")`` after
    ``register_sources(spark)``. Options: ``rows`` (total row count),
    ``rowsPerShard`` (partition granularity)."""

    @classmethod
    def name(cls):
        return "synth_docs"

    def schema(self):
        return SYNTH_SCHEMA

    def reader(self, schema):
        return SynthDocsReader(self.options)


def register_sources(spark) -> None:
    """Idempotently register every Python data source this module
    ships. Registration is session-scoped (the class is pickled to
    executors per-scan — no cluster install step, which is the point
    of the Python DataSource API)."""
    # runtime SQL conf; required for pushFilters-implementing readers
    # (sessions built by session.get_spark already set it)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SynthDocsDataSource)
    spark.dataSource.register(SynthEventsDataSource)
    spark.dataSource.register(JsonlExportDataSource)


# ---------------------------------------------------------------------------
# streaming source: deterministic event stream with replayable offsets

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceWriter,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

SYNTH_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]

SYNTH_EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("user_id", LongType(), False),
        StructField("event_type", StringType(), False),
        StructField("value", DoubleType(), False),
    ]
)


def synth_event(i: int) -> tuple:
    """Generator formula for event ``i`` — same portable md5 family."""
    h = _h48(i)
    return (
        i,
        h % 1000,
        SYNTH_EVENT_TYPES[h % 5],
        (h % 100_000) / 100.0,
    )


class SynthEventsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch source over the event formula. The offset is simply
    ``{"i": next_global_id}`` — total order, trivially checkpointable.

    Exactly-once comes from determinism: ``readBetweenOffsets(start,
    end)`` regenerates byte-identical rows for any committed range, so
    failure replay (Spark re-reads the last batch from the checkpoint)
    cannot produce drift. This is the property a REAL ingest source
    gets from a replayable log (Kafka offsets); the generator makes it
    testable hermetically.
    """

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsPerBatch", "100"))
        self.max_rows = int(options.get("maxRows", "1000"))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        lo = start["i"]
        hi = min(lo + self.rows_per_batch, self.max_rows)
        return iter([synth_event(i) for i in range(lo, hi)]), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([synth_event(i) for i in range(start["i"], end["i"])])


class SynthEventsDataSource(DataSource):
    """``spark.readStream.format("synth_events")`` after
    ``register_sources(spark)``. Options: ``rowsPerBatch``,
    ``maxRows`` (the stream idles once exhausted — bounded for
    tests; unbounded sources omit the cap)."""

    @classmethod
    def name(cls):
        return "synth_events"

    def schema(self):
        return SYNTH_EVENTS_SCHEMA

    def simpleStreamReader(self, schema):
        return SynthEventsStreamReader(self.options)


# ---------------------------------------------------------------------------
# batch writer: transactional JSONL export (stage -> commit-rename)


class _ExportCommit(WriterCommitMessage):
    def __init__(self, staged: str, rows: int):
        self.staged = staged
        self.rows = rows


class JsonlExportWriter(DataSourceWriter):
    """Per-task: write rows to a STAGING file (unique name, never the
    final path); return its path in the commit message. Driver commit:
    rename every staged file into the target dir, then write a
    ``_SUCCESS`` manifest listing them — readers that require the
    manifest never observe a partial export. Driver abort: staged
    files are deleted; the target dir is untouched. This is the
    standard two-phase object-store commit (Spark's own
    FileOutputCommitter v1 discipline) expressed through the Python
    writer API.

    ``mode("overwrite")`` is honored at COMMIT time, driver-side: the
    old ``_SUCCESS`` manifest is deleted first (manifest-requiring
    readers atomically stop seeing the previous export), then stale
    part files are removed, then the staged files are renamed in and a
    fresh manifest written. Append mode leaves prior parts in place and
    MERGES the prior manifest's file list into the new one, so a
    manifest reader always sees the full committed set. The empty
    ``_staging`` dir is removed after every successful commit."""

    def __init__(self, options, overwrite: bool = False):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator):
        import json as _json
        import os as _os
        import uuid as _uuid

        from pyspark import TaskContext

        tc = TaskContext.get()
        stage_dir = _os.path.join(self.path, "_staging")
        _os.makedirs(stage_dir, exist_ok=True)
        staged = _os.path.join(
            stage_dir, f"part-{tc.partitionId():05d}-{_uuid.uuid4().hex}.jsonl"
        )
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _ExportCommit(staged, n)

    def commit(self, messages):
        import json as _json
        import os as _os
        import shutil as _shutil

        manifest = _os.path.join(self.path, "_SUCCESS")
        prior = []
        if _os.path.exists(manifest):
            with open(manifest) as f:
                prior = _json.load(f).get("files", [])
        if self.overwrite:
            # Manifest first: readers that require it atomically stop
            # seeing the previous export before any part disappears.
            if _os.path.exists(manifest):
                _os.remove(manifest)
            for name in _os.listdir(self.path):
                full = _os.path.join(self.path, name)
                if name != "_staging" and _os.path.isfile(full):
                    _os.remove(full)
            prior = []
        final = list(prior)
        for m in messages:
            name = _os.path.basename(m.staged)
            dst = _os.path.join(self.path, name)
            _os.replace(m.staged, dst)
            final.append({"file": name, "rows": m.rows})
        with open(manifest, "w") as f:
            _json.dump({"files": final}, f)
        _shutil.rmtree(
            _os.path.join(self.path, "_staging"), ignore_errors=True
        )

    def abort(self, messages):
        import os as _os
        import shutil as _shutil

        for m in messages:
            if m is not None and _os.path.exists(m.staged):
                _os.remove(m.staged)
        _shutil.rmtree(_os.path.join(self.path, "_staging"), ignore_errors=True)


class JsonlExportDataSource(DataSource):
    """``df.write.format("jsonl_export").mode("append").save(path)``
    after ``register_sources(spark)`` — transactional JSONL export."""

    @classmethod
    def name(cls):
        return "jsonl_export"

    def writer(self, schema, overwrite: bool):
        return JsonlExportWriter(self.options, overwrite=overwrite)
