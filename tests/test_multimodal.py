"""Multimodal binary-column tests: synthesized PNG/WAV headers through
the real Spark plumbing (sniff, stats, chunk, decode, frame-sample)."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.operators.multimodal import (
    blob_stats,
    chunk_blob,
    decode_media,
    frame_sample,
    media_summary,
    sniff_media_type,
)


def _png(w: int, h: int, payload: int = 500) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + struct.pack(">II", w, h) + b"\x08\x06\x00\x00\x00"
        + bytes(payload)
    )


def _wav(channels: int, rate: int, payload: int = 300) -> bytes:
    return (
        b"RIFF" + struct.pack("<I", 36 + payload) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate, rate * channels * 2, channels * 2, 16)
        + b"data" + struct.pack("<I", payload) + bytes(payload)
    )


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, _png(640, 480)),
        (1, _png(32, 32)),
        (2, _wav(2, 44100)),
        (3, b"\xffplain bytes no container at all" * 20),
        (4, b"\xff\xd8\xff\xe0JFIF-ish" + bytes(100)),
    ]
    return spark.createDataFrame(rows, "media_id BIGINT, content BINARY").cache()


def test_sniff_magic_bytes(media):
    got = {
        r["media_id"]: r["t"]
        for r in media.select("media_id", sniff_media_type("content").alias("t")).collect()
    }
    assert got[0] == "image/png" and got[1] == "image/png"
    assert got[2] == "audio/wav"
    assert got[3] == "application/octet-stream"
    assert got[4] == "image/jpeg"


def test_blob_stats(media):
    rows = {r["media_id"]: r for r in blob_stats(media).collect()}
    assert rows[0]["n_bytes"] == len(_png(640, 480))
    assert rows[0]["checksum"] == rows[0]["checksum"]  # deterministic
    a = blob_stats(media).orderBy("media_id").collect()
    b = blob_stats(media).orderBy("media_id").collect()
    assert [r["checksum"] for r in a] == [r["checksum"] for r in b]


def test_chunk_blob_roundtrip(media):
    chunks = chunk_blob(media, 100).filter(F.col("media_id") == 0).orderBy("chunk_id").collect()
    blob = _png(640, 480)
    assert b"".join(bytes(c["chunk"]) for c in chunks) == blob
    assert all(len(bytes(c["chunk"])) <= 100 for c in chunks)


def test_decode_media_headers_and_stub_features(media):
    rows = {r["media_id"]: r for r in decode_media(media).collect()}
    assert (rows[0]["width"], rows[0]["height"]) == (640, 480)
    assert (rows[1]["width"], rows[1]["height"]) == (32, 32)
    assert rows[2]["channels"] == 2 and rows[2]["sample_rate"] == 44100
    assert rows[3]["width"] is None and rows[3]["sample_rate"] is None
    for r in rows.values():
        assert len(r["features"]) == 8
        assert all(0.0 <= v <= 1.0 for v in r["features"])
    # stub features are content-deterministic
    again = {r["media_id"]: r for r in decode_media(media).collect()}
    assert rows[0]["features"] == again[0]["features"]


def test_frame_sample_shape(media):
    frames = frame_sample(media, n_frames=4, frame_bytes=64).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    assert all(len(v) == 4 for v in by_id.values())
    first = sorted(by_id[0], key=lambda r: r["frame_id"])
    blob = _png(640, 480)
    assert bytes(first[0]["frame"]) == blob[:64]  # frame 0 at offset 0
    assert bytes(first[-1]["frame"]) == blob[-64:]  # last frame at tail


def test_media_summary(media):
    rows = media_summary(decode_media(media)).collect()
    classes = {(r["width"], r["height"], r["channels"], r["sample_rate"]): r["n"] for r in rows}
    assert classes[(640, 480, None, None)] == 1
    assert classes[(None, None, 2, 44100)] == 1
    assert classes[(None, None, None, None)] == 2  # octet-stream + jpeg (no parser)
