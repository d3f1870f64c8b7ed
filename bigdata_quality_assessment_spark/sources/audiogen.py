"""Planted-near-duplicate audio corpus (round-13): deterministic PCM
WAV clips with known duplicate structure, so the audio perceptual
dedup tier (:func:`..operators.audio.near_dedup_audio`) has a
measurable recall gate and a runtime scaling record — the acoustic
sibling of :mod:`.imagegen` / :mod:`.videogen`, completing the planted
corpus family (text / embeddings / images / videos / audio).

* **originals** are 65-window mono 16-bit square-wave clips: each
  window holds a constant keyed amplitude (Philox per ``(seed, key,
  window)``-free counter design: one generator per clip), so the
  window RMS energy IS the amplitude and the 64 energy-transition
  bits of :func:`..operators.audio.energy_fingerprint_bits` are an
  exact, distinctive function of the amplitude pattern;
* **dups** are byte-exact copies;
* **regains** re-render the source's amplitude pattern under a keyed
  uniform gain in [0.3, 0.9] — amplitude DIFFERENCES stay ≥ 30 raw
  levels, so every strict energy-rise comparison (and every equality)
  survives integer re-quantization and the fingerprint is INVARIANT
  (a re-mastered / volume-normalized clip, invisible to byte dedup);
* **trims** (round-14, off by default for byte-stability of the
  pinned round-13 fixtures/corpora) are HEAD-TRIMMED copies: the
  source's rendered PCM minus a keyed 1-160 leading frames — an
  arbitrary, deliberately non-window-aligned cut, the commonest
  audio-copy transform. The whole-clip fingerprint misses them BY
  CONSTRUCTION (every energy window shifts); they exist to gate the
  peak-anchored segment tier
  (:func:`..operators.audio.audio_segment_fingerprints`). Extended
  corpora (``n_segments > 1`` or ``trim_rate > 0``) plant one keyed
  UNIQUE global-max window (amp 12000, above the 11900 lattice
  ceiling) at index >= 8, so the content-derived peak anchor is
  unambiguous and no planted trim (<= 160 frames = 5 windows) can
  remove it;
* ground truth rides in ``role`` ('orig'|'dup'|'regain'|'trim') and
  ``src_id``.

Counter-RNG discipline as everywhere in ``sources/``.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession

_SCHEMA = "media_id long, content binary, role string, src_id long"
_N_WINDOWS = 65
_FRAMES_PER_WINDOW = 32
_RATE = 8000


def square_wav(
    amps: list[int], rate: int = _RATE, head_trim_frames: int = 0
) -> bytes:
    """Mono 16-bit PCM WAV whose frames alternate ``+amp, -amp``
    within each of the ``len(amps)`` equal windows — window RMS equals
    the window amplitude exactly, making the energy fingerprint an
    exact integer function of ``amps``. ``head_trim_frames`` drops
    that many LEADING frames after rendering (the trim role): the
    retained samples are byte-identical to the source's tail, only
    re-wrapped with a shorter header."""
    import numpy as np

    a = np.repeat(
        np.asarray(amps, dtype=np.int16), _FRAMES_PER_WINDOW
    ).astype(np.int16)
    sign = np.where(np.arange(len(a)) % 2 == 0, 1, -1).astype(np.int16)
    a = (a * sign).astype("<i2")
    if head_trim_frames:
        a = a[head_trim_frames:]
    pcm = a.tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(pcm))
    )
    return hdr + pcm


def planted_audio(
    spark: SparkSession,
    n_clips: int,
    dup_rate: float = 0.05,
    regain_rate: float = 0.05,
    seed: int = 0,
    num_partitions: int | None = None,
    trim_rate: float = 0.0,
    n_segments: int = 1,
) -> DataFrame:
    """Generate the corpus as one distributed Arrow pass over
    ``spark.range(n_clips)`` (see module docstring). Defaults
    reproduce the round-13 corpus BYTE-EXACTLY; ``n_segments`` > 1
    renders ``65 * n_segments`` windows per clip (the segment tier
    needs multiple full segments per clip) and, together with
    ``trim_rate`` > 0, switches to the planted-peak amplitude pattern
    documented in the module docstring."""
    if dup_rate + regain_rate + trim_rate >= 1.0:
        raise ValueError("planted rates must sum below 1")
    if n_segments < 1:
        raise ValueError("n_segments must be >= 1")
    total_windows = _N_WINDOWS * n_segments
    extended = n_segments > 1 or trim_rate > 0

    def gen(batches):
        import numpy as np
        import pandas as pd

        def role_of(cid: int) -> str:
            u = np.random.Generator(
                np.random.Philox(key=[seed + 1, cid])
            ).random()
            if cid >= 16:
                if u < dup_rate:
                    return "dup"
                if u < dup_rate + regain_rate:
                    return "regain"
                if u < dup_rate + regain_rate + trim_rate:
                    return "trim"
            return "orig"

        def base_amps(key: int) -> list[int]:
            """Window amplitudes on a coarse 100-level lattice in
            [800, 11900]: adjacent-window differences are either 0 or
            >= 100 raw levels, so strict energy-rise bits survive any
            uniform gain >= 0.3 after int16 re-quantization. Extended
            corpora additionally plant one keyed unique global-max
            window (module docstring) for the peak anchor."""
            g = np.random.Generator(np.random.Philox(key=[seed, key]))
            amps = [
                int(v) * 100 for v in g.integers(8, 120, size=total_windows)
            ]
            if extended:
                pk = 8 + int(g.integers(0, total_windows - 12))
                amps[pk] = 12000
            return amps

        for pdf in batches:
            out = {"media_id": [], "content": [], "role": [], "src_id": []}
            for cid in pdf["id"]:
                cid = int(cid)
                role = role_of(cid)
                g2 = np.random.Generator(
                    np.random.Philox(key=[seed + 2, cid])
                )
                trim = 0
                if role == "orig":
                    amps = base_amps(cid)
                    src_id = None
                else:
                    src = cid
                    while True:
                        src = int(g2.integers(0, cid))
                        if role_of(src) == "orig":
                            break
                    amps = base_amps(src)
                    if role == "regain":
                        gain = 0.3 + 0.6 * float(g2.random())
                        amps = [max(1, int(round(a * gain))) for a in amps]
                    elif role == "trim":
                        trim = 1 + int(g2.integers(0, 160))
                    src_id = src
                out["media_id"].append(cid)
                out["content"].append(
                    square_wav(amps, head_trim_frames=trim)
                )
                out["role"].append(role)
                out["src_id"].append(src_id)
            yield pd.DataFrame(out)

    rng = (
        spark.range(n_clips)
        if num_partitions is None
        else spark.range(n_clips, numPartitions=num_partitions)
    )
    return rng.mapInPandas(gen, _SCHEMA)
