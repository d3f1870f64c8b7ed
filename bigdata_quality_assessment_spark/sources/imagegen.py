"""Planted-near-duplicate image corpus (round-12, the image analog of
:mod:`.embgen` / :mod:`.textgen`): deterministic synthetic PNGs with
known duplicate structure so the perceptual-dedup tier
(:mod:`..operators.phash`) has measurable recall and a runtime scaling
record, not just fixture goldens.

* **originals** are 32×24 grayscale block mosaics — an 8×8 grid of
  uniform-gray 4×3 blocks with Philox-keyed levels. The block rows
  align 1:1 with the 8 dHash grid rows and the 4-px block columns
  straddle the 9 grid columns, so nearly every one of the 64 hash
  bits is an independent random sign (a 4×4 mosaic left only ~20
  informative bits and 45% of distinct originals collided within
  Hamming 3 — measured, which is why the grid is 8×8);
* **dups** re-encode the source's exact pixels (byte-identical PNG
  under the deterministic encoder — Hamming 0);
* **brights** are the source shifted by a keyed brightness delta in
  ±[8, 24], clip-free by construction (block levels live in [32, 223])
  — every gradient SIGN is preserved, so dHash is invariant (Hamming
  0) while the bytes and the exact pixels differ: the perceptual-dup
  case byte-level dedup can never catch;
* ground truth rides in ``role`` ('orig' | 'dup' | 'bright') and
  ``src_id``.

Counter-RNG discipline as everywhere in ``sources/``: every image is
a pure function of ``(seed, key)``, generated in one Arrow
``mapInPandas`` pass — identical bytes under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_SCHEMA = "media_id long, content binary, role string, src_id long"


def planted_images(
    spark: SparkSession,
    n_images: int,
    dup_rate: float = 0.06,
    bright_rate: float = 0.08,
    seed: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Generate the corpus as one distributed Arrow pass over
    ``spark.range(n_images)`` (see module docstring)."""
    if dup_rate + bright_rate >= 1.0:
        raise ValueError("dup_rate + bright_rate must sum below 1")

    def gen(batches):
        import numpy as np
        import pandas as pd

        from bigdata_quality_assessment_spark.operators.multimodal import (
            _encode_png,
        )

        def role_of(mid: int) -> str:
            u = np.random.Generator(
                np.random.Philox(key=[seed + 1, mid])
            ).random()
            if mid >= 16:
                if u < dup_rate:
                    return "dup"
                if u < dup_rate + bright_rate:
                    return "bright"
            return "orig"

        def base_pixels(key: int):
            """8×8 block mosaic (4×3-px blocks), levels in [32, 223]
            so a ±24 brightness shift can never clip (sign
            preservation)."""
            g = np.random.Generator(np.random.Philox(key=[seed, key]))
            blocks = g.integers(32, 224, size=(8, 8))
            px = np.repeat(np.repeat(blocks, 3, axis=0), 4, axis=1)
            return px.astype(np.uint8)[:, :, None]

        for pdf in batches:
            out = {"media_id": [], "content": [], "role": [], "src_id": []}
            for mid in pdf["id"]:
                mid = int(mid)
                role = role_of(mid)
                g2 = np.random.Generator(
                    np.random.Philox(key=[seed + 2, mid])
                )
                if role in ("dup", "bright"):
                    src = mid
                    while True:
                        src = int(g2.integers(0, mid))
                        if role_of(src) == "orig":
                            break
                    px = base_pixels(src)
                    if role == "bright":
                        delta = int(g2.integers(8, 25)) * (
                            1 if g2.random() < 0.5 else -1
                        )
                        px = (px.astype(np.int16) + delta).astype(np.uint8)
                    src_id = src
                else:
                    px = base_pixels(mid)
                    src_id = None
                out["media_id"].append(mid)
                out["content"].append(_encode_png(px))
                out["role"].append(role)
                out["src_id"].append(src_id)
            yield pd.DataFrame(out)

    rng = (
        spark.range(n_images)
        if num_partitions is None
        else spark.range(n_images, numPartitions=num_partitions)
    )
    return rng.mapInPandas(gen, _SCHEMA)
