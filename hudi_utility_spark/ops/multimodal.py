"""Multimodal column plumbing (north star): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The decode/resize/frame-sample kernels need codec libraries absent from
this container, so the kernel is STUBBED — ``decode_stub`` raises
``NotImplementedError`` unless ``fake=True``, in which case it produces a
deterministic fake feature vector. Everything around the kernel — schema,
binary handling, Arrow batch shape, partition sizing — is real and
tested; swapping in PIL/ffmpeg later changes only the function body.

Scale notes: binary payloads dominate shuffle cost, so all transforms are
map-only (mapInPandas preserves partitioning); metadata is carried as
plain columns so filters on it prune before any decode runs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),       # opaque bytes
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    list(MEDIA_SCHEMA.fields)
    + [T.StructField("feature", T.ArrayType(T.FloatType()), True)]
)

# payload-free variant: what the extraction stage emits when the bytes
# are no longer needed downstream — at scale, re-emitting payloads from
# Python doubles the Arrow transfer and the next stage's shuffle input
FEATURE_SCHEMA_SLIM = T.StructType(
    [f for f in FEATURE_SCHEMA.fields if f.name != "payload"]
)


def attach_binary(
    df: DataFrame, src_col: str, id_col: str, media_type: str = "image"
) -> DataFrame:
    """Wrap an existing column as an opaque binary payload with metadata.

    Stand-in for reading real media files (binaryFile datasource in
    production: ``spark.read.format("binaryFile")``); keeps metadata as
    first-class columns so Catalyst can filter before any Python runs.
    """
    payload = F.col(src_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("byte_len"),
        F.sha2(payload, 256).alias("sha256"),
    )


def decode_stub(payload: bytes, media_type: str, fake: bool, dim: int = 8) -> list[float]:
    """The kernel boundary. Real impl: PIL/torchaudio/ffmpeg decode +
    model feature extraction. Not available in this container."""
    if not fake:
        raise NotImplementedError(
            "media decode requires codec libraries not present in this "
            "environment; pass fake=True for the deterministic test kernel"
        )
    # deterministic fake: digest bytes → dim floats in [0, 1). Rounded to
    # 6 decimals BEFORE the float32 cast in FEATURE_SCHEMA: a ≤6-sig-digit
    # value survives the float32 round trip exactly under %.6g
    # normalization, so the oracle (which computes the same slices in
    # double precision) hash-matches bit-for-bit.
    digest = hashlib.sha256(payload or b"").digest()
    return [
        round(int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32, 6)
        for i in range(dim)
    ]


def extract_features(
    df: DataFrame,
    fake: bool = True,
    dim: int = 8,
    batch_hint: int = 1024,
    keep_payload: bool = True,
) -> DataFrame:
    """Arrow-batched feature extraction over media rows via mapInPandas.

    The iterator-of-batches shape is exactly what a GPU decode kernel
    wants (amortized model load per partition, bounded batch memory);
    `batch_hint` documents the intended
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` sizing at scale.

    Pass ``keep_payload=False`` when downstream stages only need the
    features: the payload bytes then cross the Arrow boundary once
    (JVM→Python) instead of round-tripping, which at media scale halves
    the stage's serialization volume and keeps raw bytes out of any
    later shuffle.
    """
    schema = FEATURE_SCHEMA if keep_payload else FEATURE_SCHEMA_SLIM

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(p, t, fake=fake, dim=dim)
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            out = pdf if keep_payload else pdf.drop(columns=["payload"])
            out = out.copy()
            out["feature"] = feats
            yield out

    return df.mapInPandas(run, schema=schema)


def export_binary_files(
    df: DataFrame,
    out_dir: str,
    id_col: str = "media_id",
    payload_col: str = "payload",
    ext: str = "bin",
) -> int:
    """Export media payloads as one object file per row, written from the
    EXECUTORS (mapInPandas side effect) — the corpus→object-store export
    path, the write-side twin of the ``binaryFile`` datasource. No row
    ever crosses the driver; parallelism = input partitions; re-runs
    overwrite byte-identically (filenames are ``<id>.<ext>``). Returns
    the number of files written. On a cluster, ``out_dir`` is any
    Hadoop-visible URI mounted on the executors (s3a/hdfs via the local
    mount or a FileSystem call in the kernel); here it is a local path.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    count_schema = T.StructType([T.StructField("n", T.LongType(), False)])

    def write_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        for pdf in batches:
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                tmp = os.path.join(out_dir, f".{mid}.{ext}.tmp")
                with open(tmp, "wb") as fh:
                    fh.write(bytes(payload) if payload is not None else b"")
                os.replace(tmp, os.path.join(out_dir, f"{mid}.{ext}"))
                n += 1
        yield pd.DataFrame({"n": [n]})

    written = (
        df.select(id_col, payload_col)
        .mapInPandas(write_batches, schema=count_schema)
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    return int(written or 0)


def read_binary_files(
    spark, path: str, glob: str | None = None, recursive: bool = False
) -> DataFrame:
    """Scan a directory of opaque media objects with Spark's built-in
    ``binaryFile`` datasource → (path, modificationTime, length, content).
    ``pathGlobFilter`` prunes at FILE LISTING time (no bytes read for
    filtered-out objects) and ``length`` is listing metadata too — size
    filters run before any content IO. The production entry point the
    `attach_binary` stand-in documents."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def resize_stub(df: DataFrame, target: tuple[int, int] = (224, 224)) -> DataFrame:
    """Image resize plumbing: passes payloads through the same batch shape
    with the declared output geometry in metadata. Kernel stubbed (no
    image libs); geometry columns are real."""
    return df.withColumn("target_w", F.lit(target[0])).withColumn(
        "target_h", F.lit(target[1])
    )


def frame_sample_plan(df: DataFrame, every_n_seconds: int = 5) -> DataFrame:
    """Video frame-sampling *plan*: emits the frame timestamps a decoder
    would extract (metadata-only — durations are synthesized from payload
    length pending a real demuxer). Shows the explode-to-frames shape that
    fans one video row out to frame rows without shuffling."""
    dur = (F.col("byte_len") % 60 + 1).cast("int")  # fake seconds from size
    return df.select(
        "media_id",
        "media_type",
        dur.alias("duration_s"),
        F.explode(
            F.sequence(F.lit(0), dur - 1, F.lit(every_n_seconds))
        ).alias("frame_ts_s"),
    )
