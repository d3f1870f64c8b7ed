"""Multimodal (image/audio/video) columns as opaque BINARY + typed
metadata (engine extension; builder brief "multimodal columns").

Design: media rides in a ``content BINARY`` column with a sniffed
``media_type`` and a parsed header-metadata struct. Everything that can
be done without a codec is JVM-side Catalyst (magic-byte sniffing, byte
stats, chunking); codec work (pixel decode, resample, frame extraction)
is ``mapInPandas`` with Arrow batches — real schema/partitioning/batch
plumbing, with the codec itself STUBBED: this container ships no
image/audio libraries, so the decoder parses real container headers
(PNG IHDR, WAV fmt) and produces a deterministic content-hash-seeded
feature vector in place of pixels. Swap ``_fake_pixels`` for a PIL/
ffmpeg call when the libraries exist — the Spark plumbing is unchanged.

Scale notes: content bytes never leave the executors; per-row work is
O(bytes); the only shuffle anywhere is the optional groupBy in
``media_summary``. Arrow batch size bounds executor memory
(``spark.sql.execution.arrow.maxRecordsPerBatch`` for many-small-blobs;
large blobs should be chunked upstream with ``chunk_blob``).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# magic-byte prefixes, hex-encoded (JVM-side sniffing — no UDF)
_MAGIC = {
    "89504E47": "image/png",
    "FFD8FF": "image/jpeg",
    "47494638": "image/gif",
    "52494646": "audio/wav",  # RIFF container (WAV/AVI share it; fmt disambiguates)
    "494433": "audio/mp3",
    "1A45DFA3": "video/webm",
}


def sniff_media_type(content_col: Column | str) -> Column:
    """Magic-byte media-type detection as a pure Catalyst expression:
    hex the first 8 bytes, prefix-match the signature table. Runs in
    whole-stage codegen — sniffing 100 TB of blobs is a narrow scan."""
    c = F.col(content_col) if isinstance(content_col, str) else content_col
    head = F.upper(F.hex(F.substring(c, 1, 8)))
    expr = F.lit("application/octet-stream")
    for magic, mtype in reversed(list(_MAGIC.items())):
        expr = F.when(head.startswith(magic), F.lit(mtype)).otherwise(expr)
    return expr


def blob_stats(
    media: DataFrame, content_col: str = "content", id_col: str = "media_id"
) -> DataFrame:
    """Byte-level stats per blob — length, xxhash64 checksum, sniffed
    type. All JVM-side."""
    c = F.col(content_col)
    return media.select(
        id_col,
        F.length(c).cast("bigint").alias("n_bytes"),
        F.xxhash64(c).alias("checksum"),
        sniff_media_type(c).alias("media_type"),
    )


def chunk_blob(
    media: DataFrame,
    chunk_bytes: int,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Split each blob into fixed-size chunks → long format
    ``(media_id, chunk_id, chunk BINARY)``. Catalyst-only (sequence +
    substring on binary); the canonical pre-step before shipping huge
    blobs through Arrow (bounds per-batch memory)."""
    c = F.col(content_col)
    n_chunks = F.ceil(F.length(c) / chunk_bytes).cast("int")
    return media.select(
        id_col,
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        F.expr(f"substring({content_col}, chunk_id * {chunk_bytes} + 1, {chunk_bytes})").alias(
            "chunk"
        ),
    )


# ------------------------- header parsers ----------------------------
# Real container-header parsing (no codec needed): PNG IHDR, WAV fmt.


def _parse_png_header(b: bytes) -> dict | None:
    if len(b) < 24 or b[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    w, h = struct.unpack(">II", b[16:24])
    return {"width": int(w), "height": int(h), "channels": None, "sample_rate": None}


def _parse_wav_header(b: bytes) -> dict | None:
    if len(b) < 36 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    channels = struct.unpack("<H", b[22:24])[0]
    rate = struct.unpack("<I", b[24:28])[0]
    return {"width": None, "height": None, "channels": int(channels), "sample_rate": int(rate)}


def _fake_pixels(b: bytes, n_features: int = 8) -> list[float]:
    """STUB decoder: deterministic content-derived feature vector in
    place of real pixel statistics. Replace with PIL/librosa/ffmpeg
    when available — signature and batch shape stay identical."""
    import numpy as np

    seed = int.from_bytes(b[:8].ljust(8, b"\0"), "big") % (2**32)
    rng = np.random.RandomState(seed)
    return [float(v) for v in rng.uniform(0.0, 1.0, n_features)]


def decode_media(
    media: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    n_features: int = 8,
) -> DataFrame:
    """Decode + feature-extract as ``mapInPandas``: parses REAL headers
    (PNG dimensions, WAV channels/sample-rate) and emits a
    deterministic stub feature vector where a codec would emit pixel/
    sample statistics. One Arrow-batched pass, no shuffle; blobs stay
    on the executors."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                id_col: pdf[id_col],
                "width": [],
                "height": [],
                "channels": [],
                "sample_rate": [],
                "features": [],
            }
            for blob in pdf[content_col]:
                b = bytes(blob) if blob is not None else b""
                meta = _parse_png_header(b) or _parse_wav_header(b) or {
                    "width": None, "height": None, "channels": None, "sample_rate": None
                }
                out["width"].append(meta["width"])
                out["height"].append(meta["height"])
                out["channels"].append(meta["channels"])
                out["sample_rate"].append(meta["sample_rate"])
                out["features"].append(_fake_pixels(b, n_features))
            yield pd.DataFrame(out)

    schema = (
        f"{id_col} BIGINT, width INT, height INT, channels INT, "
        "sample_rate INT, features ARRAY<DOUBLE>"
    )
    return media.select(id_col, content_col).mapInPandas(run, schema)


def frame_sample(
    media: DataFrame,
    n_frames: int = 4,
    frame_bytes: int = 256,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Frame sampling plumbing: emit ``n_frames`` evenly-spaced byte
    windows per blob as ``(media_id, frame_id, frame BINARY)`` — the
    shape a real video decoder would produce (one row per decoded
    frame), with the codec stubbed to byte slices. Catalyst-only."""
    c = F.col(content_col)
    stride = max(n_frames - 1, 1)
    with_frames = media.select(
        id_col,
        c.alias("__content"),
        F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_id"),
    )
    return with_frames.select(
        id_col,
        "frame_id",
        F.expr(
            f"substring(__content, cast(frame_id * greatest(length(__content) - "
            f"{frame_bytes}, 0) / {stride} as int) + 1, {frame_bytes})"
        ).alias("frame"),
    )


def media_summary(decoded: DataFrame) -> DataFrame:
    """Corpus-level media profile: counts and mean feature vector per
    (width, height, channels, sample_rate) class — the groupBy is the
    module's only shuffle, over the (tiny) decoded-metadata table."""
    return decoded.groupBy("width", "height", "channels", "sample_rate").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col("features")[0]).alias("mean_f0"),
    )
