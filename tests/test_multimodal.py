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


def test_decode_stub_non_wave_riff_takes_fake_path():
    """A RIFF container that is not WAVE (WebP: 'RIFF....WEBP') must
    route to the fake/raise path, not the WAV chunk walker."""
    webp = b"RIFF" + (20).to_bytes(4, "little") + b"WEBPVP8 " + b"\x00" * 12
    feats = M.decode_stub(webp, "image", fake=True, dim=8)
    assert len(feats) == 8 and all(0.0 <= v < 1.0 for v in feats)
    with pytest.raises(NotImplementedError):
        M.decode_stub(webp, "image", fake=False)


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


# ---------------------------------------------------------------------------
# real WAV codec path (no stub): stdlib-wave encode -> hand-written RIFF parse


def _wav_bytes(mid: int, rate: int, channels: int, n_samples: int) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(M._ramp_pcm(mid, n_samples * channels))
    return buf.getvalue()


def test_decode_wav_roundtrip_matches_params():
    payload = _wav_bytes(7, 22050, 2, 123)
    meta = M.decode_wav(payload)
    assert meta["sample_rate"] == 22050
    assert meta["channels"] == 2
    assert meta["bits_per_sample"] == 16
    assert meta["n_samples"] == 123
    assert meta["duration_ms"] == 123 * 1000 // 22050
    expected = sum(((7 * 31 + 7 * j) % 65536) - 32768 for j in range(123 * 2))
    assert meta["pcm_sum"] == expected


def test_decode_wav_walks_unknown_chunks_and_pad_bytes():
    """The parser must be a generic chunk walk: inject a LIST chunk with
    an ODD size (forcing the word-align pad byte) between fmt and data."""
    import struct

    payload = _wav_bytes(3, 8000, 1, 10)
    fmt_chunk = payload[12:36]          # 'fmt ' + size(16) + body
    data_chunk = payload[36:]
    junk_body = b"INFOjunk!"            # 9 bytes -> odd, needs pad
    junk = b"LIST" + struct.pack("<I", len(junk_body)) + junk_body + b"\x00"
    body = b"WAVE" + fmt_chunk + junk + data_chunk
    rebuilt = b"RIFF" + struct.pack("<I", len(body)) + body
    meta = M.decode_wav(rebuilt)
    assert meta["n_samples"] == 10 and meta["sample_rate"] == 8000


def test_decode_wav_rejects_non_riff_and_truncated():
    with pytest.raises(ValueError, match="RIFF"):
        M.decode_wav(b"\x89PNG\r\n")
    with pytest.raises(ValueError, match="fmt or data"):
        import struct

        M.decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


def test_decode_stub_real_path_for_riff_payloads():
    """fake=False must DECODE (not raise) when the payload is WAV."""
    payload = _wav_bytes(1, 16000, 1, 64)
    feats = M.decode_stub(payload, "audio", fake=False, dim=8)
    assert len(feats) == 8
    assert feats[0] == round(16000 / 48000.0, 6)
    assert feats[1] == 0.5
    assert feats[3] > 0


def test_synth_wav_decode_wav_meta_dataframe_path(spark):
    params = spark.range(20).selectExpr(
        "id AS media_id",
        "16000 + CAST(id % 2 AS INT) * 28100 AS sample_rate",
        "1 + CAST(id % 2 AS INT) AS channels",
        "60 + CAST(id AS INT) AS n_samples",
    )
    wav = M.synth_wav(params)
    rows = {r["media_id"]: r for r in M.decode_wav_meta(wav).collect()}
    assert len(rows) == 20
    for mid, r in rows.items():
        assert r["channels"] == 1 + mid % 2
        assert r["n_samples"] == 60 + mid
        assert r["bits_per_sample"] == 16
    # payloads are genuine WAV files the stdlib decoder also accepts
    import io
    import wave

    sample = wav.filter("media_id = 0").collect()[0]  # channels=1 row
    with wave.open(io.BytesIO(bytes(sample["payload"]))) as w:
        assert w.getnframes() == (sample["byte_len"] - 44) // 2  # header=44B


def test_audio_dominant_freq_recovers_synthesized_tone(spark):
    """Pure tone at integer cycle count k -> FFT magnitude argmax must
    be exactly bin k; dominant_hz = k * rate / n."""
    params = spark.createDataFrame(
        [(i, 8000, 1, 512, 5 + i) for i in range(8)],
        "media_id long, sample_rate long, channels long, n_samples long, freq_bin long",
    )
    wav = M.synth_wav(params, waveform="sine")
    rows = {r["media_id"]: r for r in M.audio_dominant_freq(wav).collect()}
    for i in range(8):
        assert rows[i]["dominant_bin"] == 5 + i
        assert abs(rows[i]["dominant_hz"] - (5 + i) * 8000 / 512) < 1e-9


def test_audio_dominant_freq_deinterleaves_stereo(spark):
    """For channels=2 the FFT must run over the per-FRAME channel mean,
    not the interleaved byte stream — the interleaved spectrum of a
    k-cycle tone is not at bin k of the frame-rate axis."""
    params = spark.createDataFrame(
        [(0, 8000, 2, 256, 7)],
        "media_id long, sample_rate long, channels long, n_samples long, freq_bin long",
    )
    wav = M.synth_wav(params, waveform="sine")
    r = M.audio_dominant_freq(wav).collect()[0]
    assert r["n_samples"] == 256  # frames, not interleaved samples
    assert r["dominant_bin"] == 7
    assert abs(r["dominant_hz"] - 7 * 8000 / 256) < 1e-9


def test_sine_pcm_quantization_and_range():
    import numpy as np

    raw = np.frombuffer(M._sine_pcm(4, 256), dtype="<i2")
    assert len(raw) == 256
    assert raw.max() <= 12000 and raw.min() >= -12000
    # four zero crossings per cycle pattern: first sample is sin(0)=0
    assert raw[0] == 0


def test_decode_ppm_round_trip_and_header_paths():
    import numpy as np

    from hudi_utility_spark.ops.multimodal import _ramp_rgb, decode_ppm

    raster = _ramp_rgb(5, 4, 3)
    plain = b"P6\n4 3\n255\n" + raster
    commented = b"P6\n# a comment\n4 3\n# another\n255\n" + raster
    spaced = b"P6  4\t3\n255 " + raster
    expect = {
        "width": 4, "height": 3, "n_pixels": 12,
    }
    px = np.frombuffer(raster, dtype=np.uint8).reshape(3, 4, 3).astype(int)
    for k, c in (("sum_r", 0), ("sum_g", 1), ("sum_b", 2)):
        expect[k] = int(px[:, :, c].sum())
    for payload in (plain, commented, spaced):
        assert decode_ppm(payload) == expect


def test_decode_ppm_reject_paths():
    import pytest as _pytest

    from hudi_utility_spark.ops.multimodal import decode_ppm

    with _pytest.raises(ValueError, match="not a P6"):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with _pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n4 3")
    with _pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 6)
    with _pytest.raises(ValueError, match="raster size"):
        decode_ppm(b"P6\n2 2\n255\n" + b"\x00" * 5)


def test_synth_ppm_decode_meta_spark(spark):
    df = spark.createDataFrame(
        [(3, 4, 2), (4, 5, 3)], "media_id long, width int, height int"
    )
    from hudi_utility_spark.ops.multimodal import decode_ppm_meta, synth_ppm

    out = decode_ppm_meta(synth_ppm(df)).orderBy("media_id").collect()
    assert [(r.media_id, r.width, r.height, r.n_pixels) for r in out] == [
        (3, 4, 2, 8),
        (4, 5, 3, 15),
    ]


def test_incremental_dhash_gate_rejects_near_copies(spark):
    from hudi_utility_spark.ops.multimodal import incremental_dhash_gate

    # hand-built band rows: store has hash A; batch has an exact copy of
    # A (10), a 2-bit variant (11), a far image (12), and a within-batch
    # copy of the far image (13)
    A = (0x1234, 0x00FF, 0xABCD, 0x0F0F)
    far = (0x4321, 0xFF00, 0x5555, 0xF0F0)
    two_bit = (A[0] ^ 0b11, A[1], A[2], A[3])
    store = spark.createDataFrame(
        [(1, *A)], ["media_id", "band0", "band1", "band2", "band3"]
    )
    batch = spark.createDataFrame(
        [(10, *A), (11, *two_bit), (12, *far), (13, *far)],
        ["media_id", "band0", "band1", "band2", "band3"],
    )
    out = {r.media_id: r for r in incremental_dhash_gate(batch, store).collect()}
    assert not out[10].admitted and out[10].n_store_matches == 1
    assert not out[11].admitted and out[11].n_store_matches == 1
    assert out[12].admitted  # novel image: no store or lower-id match
    assert not out[13].admitted and out[13].n_batch_matches == 1
