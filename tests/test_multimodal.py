"""Multimodal plumbing: executor-side binary export, the binaryFile
datasource round trip, glob pruning, and the decode-kernel gate."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hudi_utility_spark.ops import multimodal as M


def test_export_and_binaryfile_roundtrip(spark, documents, tmp_path):
    media = M.attach_binary(documents.limit(50), "text", "doc_id")
    out = str(tmp_path / "objs")
    n = M.export_binary_files(media, out)
    assert n == 50
    assert len([f for f in os.listdir(out) if f.endswith(".bin")]) == 50
    # no stale tmp staging files survive the atomic renames
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]

    files = M.read_binary_files(spark, out, glob="*.bin")
    got = {
        r["media_id"]: (r["length"], r["md5"])
        for r in files.select(
            F.regexp_extract("path", r"(\d+)\.bin$", 1).cast("long").alias("media_id"),
            "length",
            F.md5("content").alias("md5"),
        ).collect()
    }
    want = {
        r["media_id"]: (r["byte_len"], r["md5"])
        for r in media.select(
            "media_id", "byte_len", F.md5("payload").alias("md5")
        ).collect()
    }
    assert got == want


def test_binaryfile_glob_prunes_listing(spark, documents, tmp_path):
    media = M.attach_binary(documents.limit(5), "text", "doc_id")
    out = str(tmp_path / "objs")
    M.export_binary_files(media, out)
    (tmp_path / "objs" / "stray.json").write_text("{}")
    only_bin = M.read_binary_files(spark, out, glob="*.bin")
    assert only_bin.count() == 5
    everything = M.read_binary_files(spark, out)
    assert everything.count() == 6


def test_export_rerun_is_idempotent(spark, documents, tmp_path):
    media = M.attach_binary(documents.limit(10), "text", "doc_id")
    out = str(tmp_path / "objs")
    M.export_binary_files(media, out)
    first = sorted(
        (r["path"], r["length"]) for r in M.read_binary_files(spark, out).collect()
    )
    M.export_binary_files(media, out)  # overwrite in place
    second = sorted(
        (r["path"], r["length"]) for r in M.read_binary_files(spark, out).collect()
    )
    assert first == second


def test_decode_stub_gates_without_fake():
    with pytest.raises(NotImplementedError):
        M.decode_stub(b"\x00\x01", "image", fake=False)


def test_resize_stub_and_frame_plan_shapes(spark, documents):
    media = M.attach_binary(documents.limit(10), "text", "doc_id", media_type="video")
    sized = M.resize_stub(media, target=(320, 240))
    rows = sized.select("media_id", "target_w", "target_h").collect()
    assert all((r["target_w"], r["target_h"]) == (320, 240) for r in rows)
    frames = M.frame_sample_plan(media, every_n_seconds=7)
    got = frames.collect()
    # one row per (video, sampled ts); ts stride honored, bounded by duration
    per = {}
    for r in got:
        per.setdefault(r["media_id"], []).append(r["frame_ts_s"])
    for mid, ts in per.items():
        ts.sort()
        assert ts[0] == 0 and all(b - a == 7 for a, b in zip(ts, ts[1:]))
