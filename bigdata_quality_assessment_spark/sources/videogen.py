"""Planted-near-duplicate animation corpus (round-12): deterministic
multi-frame patterned GIFs with known duplicate structure, so the
video-level perceptual dedup tier (:func:`..operators.phash.
near_dedup_videos`) has measurable recall and a runtime scaling
record — the animated sibling of :mod:`.imagegen`.

* **originals** are 3-frame 9×8 GIFs; each frame is a block pattern
  of palette indices keyed by ``(seed, key, frame)`` under Philox —
  every frame's dHash is a distinctive ~64-bit signature (full-width
  9×8 canvas = the hash grid, one index per grid cell);
* **dups** are byte-exact copies;
* **rebrights** keep the source's index stream but shift every
  palette gray level by a keyed clip-free delta — the decoded luma
  shifts uniformly per frame, so every frame dHash is INVARIANT
  (a re-graded/re-mastered animation, invisible to byte dedup);
* **recuts** replace the LAST frame with fresh content (2/3 aligned
  frames still match → dup at the default ``min_frame_frac=0.5``,
  distinct at 1.0 — the partial-edit case);
* **trims** (round-13, ``trim_rate`` — default 0 so existing corpora
  are byte-stable) drop the source's FIRST frame: every surviving
  frame's index shifts by one, so exact-alignment dedup
  (``max_offset=0``) keeps them by construction while the bounded
  offset scan (``max_offset≥1``) collapses them — the planted fixture
  for the commonest video-copy transform, a head trim;
* ground truth rides in ``role``
  ('orig'|'dup'|'rebright'|'recut'|'trim') and ``src_id``.

Counter-RNG discipline as everywhere in ``sources/``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_SCHEMA = "media_id long, content binary, role string, src_id long"
_W, _H, _NF = 9, 8, 3


def patterned_gif(
    frames: list[list[int]], palette: list[int], w: int = _W, h: int = _H
) -> bytes:
    """Multi-frame full-canvas GIF89a from explicit palette-index
    streams (literal LZW codes, CLEAR re-emitted before the code
    width would grow). ``palette`` is a list of gray levels (2^n
    entries, n ≥ 2); each frame is w·h indices."""
    import struct as _struct

    n = len(palette)
    assert n & (n - 1) == 0 and n >= 4
    pal_bits = n.bit_length() - 1
    out = bytearray(b"GIF89a")
    out += _struct.pack("<HH", w, h)
    out += bytes([0x80 | (pal_bits - 1), 0, 0])
    for lv in palette:
        out += bytes([lv, lv, lv])
    min_code = max(2, pal_bits)
    for indices in frames:
        out.extend(bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0]))
        out.extend(b"\x2c" + _struct.pack("<HHHH", 0, 0, w, h) + b"\x00")
        clear, eoi = 1 << min_code, (1 << min_code) + 1
        out.append(min_code)
        acc = nbits = 0
        data = bytearray()
        width = min_code + 1
        next_code = clear + 2

        def emit(code):
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += width
            while nbits >= 8:
                data.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        emit(clear)
        for v in indices:
            emit(v)
            next_code += 1
            if next_code == (1 << width):
                emit(clear)
                width = min_code + 1
                next_code = clear + 2
        emit(eoi)
        if nbits:
            data.append(acc & 0xFF)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.extend(bytes([len(chunk)]) + chunk)
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def planted_videos(
    spark: SparkSession,
    n_videos: int,
    dup_rate: float = 0.05,
    rebright_rate: float = 0.05,
    recut_rate: float = 0.04,
    seed: int = 0,
    num_partitions: int | None = None,
    trim_rate: float = 0.0,
) -> DataFrame:
    """Generate the corpus as one distributed Arrow pass over
    ``spark.range(n_videos)`` (see module docstring)."""
    if dup_rate + rebright_rate + recut_rate + trim_rate >= 1.0:
        raise ValueError("planted rates must sum below 1")

    def gen(batches):
        import numpy as np
        import pandas as pd

        def role_of(vid: int) -> str:
            u = np.random.Generator(
                np.random.Philox(key=[seed + 1, vid])
            ).random()
            if vid >= 16:
                if u < dup_rate:
                    return "dup"
                if u < dup_rate + rebright_rate:
                    return "rebright"
                if u < dup_rate + rebright_rate + recut_rate:
                    return "recut"
                if u < dup_rate + rebright_rate + recut_rate + trim_rate:
                    return "trim"
            return "orig"

        def base_indices(key: int, frame: int):
            """One frame's 72 palette indices: 8 gray levels in
            [32, 200] at palette slots 0-7, one index per hash-grid
            cell — keyed per (video, frame)."""
            g = np.random.Generator(
                np.random.Philox(key=[seed, key * 16 + frame])
            )
            return [int(v) for v in g.integers(0, 8, size=_W * _H)]

        base_palette = [32, 56, 80, 104, 128, 152, 176, 200]

        for pdf in batches:
            out = {"media_id": [], "content": [], "role": [], "src_id": []}
            for vid in pdf["id"]:
                vid = int(vid)
                role = role_of(vid)
                g2 = np.random.Generator(
                    np.random.Philox(key=[seed + 2, vid])
                )
                if role == "orig":
                    frames = [base_indices(vid, f) for f in range(_NF)]
                    blob = patterned_gif(frames, base_palette)
                    src_id = None
                else:
                    src = vid
                    while True:
                        src = int(g2.integers(0, vid))
                        if role_of(src) == "orig":
                            break
                    frames = [base_indices(src, f) for f in range(_NF)]
                    palette = base_palette
                    if role == "rebright":
                        # clip-free uniform shift: levels stay in
                        # [8, 255] for delta in [-24, 24] \ {0}
                        delta = int(g2.integers(1, 25)) * (
                            1 if g2.random() < 0.5 else -1
                        )
                        palette = [lv + delta for lv in base_palette]
                    elif role == "recut":
                        frames[-1] = base_indices(vid, _NF - 1)
                    elif role == "trim":
                        # head trim: source frames 1.._NF-1 at
                        # positions 0.._NF-2 — every index shifts
                        frames = frames[1:]
                    blob = patterned_gif(frames, palette)
                    src_id = src
                out["media_id"].append(vid)
                out["content"].append(blob)
                out["role"].append(role)
                out["src_id"].append(src_id)
            yield pd.DataFrame(out)

    rng = (
        spark.range(n_videos)
        if num_partitions is None
        else spark.range(n_videos, numPartitions=num_partitions)
    )
    return rng.mapInPandas(gen, _SCHEMA)
