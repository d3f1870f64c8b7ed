"""Perceptual image hashing / near-dup image dedup (operators/phash.py)
and audio quality signals (operators/audio.py) — round-12 verdict
asks #2 and #3."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.operators.audio import audio_quality
from bigdata_quality_assessment_spark.operators.phash import (
    ahash_bits,
    dhash_bits,
    image_phash,
    near_dedup_images,
)
from bigdata_quality_assessment_spark.operators.multimodal import _encode_png
from bigdata_quality_assessment_spark.queries import (
    _audio_fixture_blobs,
    _phash_fixture_blobs,
)


def _gray(rows):
    return np.asarray(rows, dtype=np.uint8)[:, :, None]


STEP = _gray([[40] * 4 + [220] * 5] * 8)


def test_dhash_scale_invariance():
    """dHash is invariant to integer upscaling: the box-mean downscale
    of the 2x/3x nearest-neighbour enlargement reproduces the original
    grid exactly."""
    for f in (2, 3):
        big = STEP.repeat(f, axis=0).repeat(f, axis=1)
        assert dhash_bits(big) == dhash_bits(STEP)
        assert ahash_bits(big) == ahash_bits(STEP)


def test_dhash_brightness_invariance():
    """Uniform brightness shifts preserve every gradient sign, so the
    dHash is unchanged — the perceptual robustness exact byte hashing
    lacks."""
    brighter = np.clip(STEP.astype(np.int16) + 20, 0, 255).astype(np.uint8)
    assert dhash_bits(brighter) == dhash_bits(STEP)


def test_dhash_rgb_matches_gray():
    """An RGB image with equal channels has Rec.601 luma equal to the
    gray plane — same hash as the single-channel variant."""
    rgb = STEP.repeat(3, axis=2)
    assert dhash_bits(rgb) == dhash_bits(STEP)
    assert ahash_bits(rgb) == ahash_bits(STEP)


def test_tiny_image_grid_fallback():
    """Images smaller than the hash grid fall back to single-pixel
    boxes instead of crashing on empty means."""
    tiny = _gray([[0, 255], [255, 0]])
    assert isinstance(dhash_bits(tiny), int)
    assert isinstance(ahash_bits(tiny), int)


def test_image_phash_decoders(spark):
    """PNG decodes through the real codec; a GIF flat frame hashes to
    0 (no gradients); garbage gets NULL hashes."""
    from bigdata_quality_assessment_spark.queries import _animated_gif_blob

    media = spark.createDataFrame(
        [
            (0, _encode_png(STEP)),
            (1, _animated_gif_blob()),
            (2, b"garbage bytes"),
        ],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r for r in image_phash(media).collect()}
    assert rows[0]["decoder"] == "png" and rows[0]["dhash"] is not None
    # first GIF frame is full-screen flat gray 60 -> zero gradients
    assert rows[1]["decoder"] == "gif" and rows[1]["dhash"] == 0
    assert rows[2]["decoder"] is None and rows[2]["dhash"] is None


def test_near_dedup_images_fixture(spark):
    """The graded fixture clusters exactly {0,1,2} (Hamming 0 and 2)
    and keeps the min id; distinct patterns and the undecodable blob
    survive."""
    media = spark.createDataFrame(
        _phash_fixture_blobs(), "media_id long, content binary"
    )
    surv = sorted(
        r["media_id"] for r in near_dedup_images(media, max_hamming=3).collect()
    )
    assert surv == [0, 3, 4, 5, 6]


def test_near_dedup_images_hamming_zero(spark):
    """max_hamming=0 still collapses bit-exact perceptual copies (the
    re-encoded duplicate) but keeps the near-duplicate."""
    media = spark.createDataFrame(
        _phash_fixture_blobs(), "media_id long, content binary"
    )
    surv = sorted(
        r["media_id"] for r in near_dedup_images(media, max_hamming=0).collect()
    )
    assert surv == [0, 2, 3, 4, 5, 6]


def _wav(channels, rate, bits, samples):
    pcm = (
        struct.pack(f"<{len(samples)}h", *samples)
        if bits == 16
        else bytes(samples)
    )
    return (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack(
            "<IHHIIHH", 16, 1, channels, rate,
            rate * channels * bits // 8, channels * bits // 8, bits,
        )
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )


def test_audio_quality_formulas(spark):
    media = spark.createDataFrame(
        [
            (0, _wav(1, 8000, 16, [16384, -16384] * 10)),
            (1, _wav(1, 8000, 16, [0] * 10)),
            (2, b"not audio"),
        ],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r for r in audio_quality(media).collect()}
    half = rows[0]
    assert half["decoder"] == "wav"
    assert half["n_frames"] == 20
    assert half["clipping_rate"] == 0.0
    assert math.isclose(half["rms_dbfs"], 20 * math.log10(0.5))
    assert math.isclose(half["peak_dbfs"], 20 * math.log10(0.5))
    assert half["silence_fraction"] == 0.0
    assert half["dc_offset"] == 0.0
    silent = rows[1]
    assert silent["rms_dbfs"] is None and silent["peak_dbfs"] is None
    assert silent["silence_fraction"] == 1.0
    assert rows[2]["decoder"] is None and rows[2]["rms_dbfs"] is None


def test_audio_n_frames_matches_quality(spark):
    """The header-only n_frames probe (round-15: the seg_frames auto
    rule's cheap path) must agree with audio_quality's decoded
    n_frames on every blob — decodable (mono/stereo, 8/16-bit, odd
    trailing byte) and non-PCM alike."""
    from bigdata_quality_assessment_spark.operators.audio import audio_n_frames

    media = spark.createDataFrame(
        [
            (0, _wav(1, 8000, 16, [16384, -16384] * 10)),
            (1, _wav(1, 8000, 16, [0] * 10)),
            (2, b"not audio"),
            (3, _wav(2, 44100, 16, [100, -100] * 6 + [7])),
            (4, _wav(1, 8000, 8, [255, 0, 128, 128])),
            (5, None),
            (6, b"RIFF\x00\x00\x00\x00WAVE"),  # no chunks at all
        ],
        "media_id long, content binary",
    )
    want = {
        r["media_id"]: r["n_frames"] for r in audio_quality(media).collect()
    }
    got = {
        r["media_id"]: r["n_frames"] for r in audio_n_frames(media).collect()
    }
    assert got == want
    assert got[0] == 20 and got[3] == 6 and got[2] is None and got[5] is None


def test_audio_clipping_8bit(spark):
    """8-bit PCM full scale is 0 / 255 (unsigned), not ±32767."""
    media = spark.createDataFrame(
        [(0, _wav(1, 8000, 8, [255, 0, 128, 128]))],
        "media_id long, content binary",
    )
    r = audio_quality(media).collect()[0]
    assert r["clipping_rate"] == 0.5
    assert r["dc_offset"] == pytest.approx((127 / 128 - 1.0) / 4)


def test_audio_stereo_frames(spark):
    """n_frames counts frames, not interleaved samples; a trailing
    half-frame is dropped."""
    media = spark.createDataFrame(
        [(0, _wav(2, 44100, 16, [100, -100] * 6 + [7]))],
        "media_id long, content binary",
    )
    r = audio_quality(media).collect()[0]
    assert r["n_frames"] == 6
    assert r["channels"] == 2


def test_audio_fixture_blobs_decode(spark):
    """Every graded audio fixture except the non-WAV tail decodes."""
    media = spark.createDataFrame(
        _audio_fixture_blobs(), "media_id long, content binary"
    )
    rows = {r["media_id"]: r["decoder"] for r in audio_quality(media).collect()}
    assert rows == {0: "wav", 1: "wav", 2: "wav", 3: "wav", 4: "wav", 5: None}


def test_energy_fingerprint_gain_invariance():
    """Uniform gain scales every window energy equally — fingerprint
    unchanged (the perceptual-dup case byte dedup cannot catch)."""
    import numpy as np

    from bigdata_quality_assessment_spark.operators.audio import (
        energy_fingerprint_bits,
    )

    amps = [1000 if k % 2 == 0 else 8000 for k in range(65)]
    x = np.array(
        [v for a in amps for v in (a, -a)], dtype=np.float64
    ) / 32768.0
    base = energy_fingerprint_bits(x, 1)
    assert base == 6148914691236517205  # 0x5555... (rising at even k)
    for g in (0.5, 2.0, 0.013):
        assert energy_fingerprint_bits(x * g, 1) == base


def test_energy_fingerprint_too_short_is_none():
    import numpy as np

    from bigdata_quality_assessment_spark.operators.audio import (
        energy_fingerprint_bits,
    )

    assert energy_fingerprint_bits(np.ones(64), 1) is None
    assert energy_fingerprint_bits(np.ones(65), 1) is not None
    # stereo: frames = samples // channels
    assert energy_fingerprint_bits(np.ones(128), 2) is None


def test_audio_fingerprint_operator(spark):
    from bigdata_quality_assessment_spark.operators.audio import (
        audio_fingerprint,
    )
    from bigdata_quality_assessment_spark.queries import _afp_fixture_blobs

    clips = spark.createDataFrame(
        _afp_fixture_blobs(), "media_id long, content binary"
    )
    rows = {r["media_id"]: r for r in audio_fingerprint(clips).collect()}
    assert rows[0]["afp"] == rows[1]["afp"] == rows[2]["afp"]
    assert rows[3]["afp"] == -1
    assert rows[4]["afp"] == 140739635871744
    assert rows[5]["afp"] is None  # too short
    assert rows[6]["afp"] is None and rows[6]["decoder"] is None


def test_near_dedup_audio_fixture(spark):
    """The gain-shifted copy and the byte copy collapse into the
    source; distinct profiles and undecodable/too-short clips
    survive."""
    from bigdata_quality_assessment_spark.operators.audio import (
        near_dedup_audio,
    )
    from bigdata_quality_assessment_spark.queries import _afp_fixture_blobs

    clips = spark.createDataFrame(
        _afp_fixture_blobs(), "media_id long, content binary"
    )
    surv = sorted(
        r["media_id"] for r in near_dedup_audio(clips, max_hamming=3).collect()
    )
    assert surv == [0, 3, 4, 5, 6]


def test_frame_phash_animated_gif(spark):
    """The patterned-GIF fixture frames hash to the hand-derived
    still-fixture constants through the REAL frame_decode -> PNG ->
    dHash pipeline; byte-slice fallback frames get NULL hashes."""
    from bigdata_quality_assessment_spark.operators.phash import frame_phash
    from bigdata_quality_assessment_spark.queries import _vhash_fixture_blobs

    media = spark.createDataFrame(
        _vhash_fixture_blobs(), "media_id long, content binary"
    )
    rows = {
        (r["media_id"], r["frame_id"]): r["dhash"]
        for r in frame_phash(media, n_frames=4).collect()
    }
    STEP, DSTEP = 578721382704613384, 2604246222170760228
    assert rows[(0, 0)] == STEP and rows[(0, 1)] == 0 and rows[(0, 2)] == STEP
    assert rows[(2, 0)] == DSTEP and rows[(2, 2)] == DSTEP
    assert rows[(3, 0)] == rows[(3, 1)] == rows[(3, 2)] == STEP
    assert rows[(4, 0)] is None  # byte-slice fallback


def test_near_dedup_videos_aligned_frac(spark):
    """Aligned-frame matching: the byte copy (3/3) and the 2/3-match
    variant collapse into video 0; the 1/3-match variant and the
    undecodable blob survive."""
    from bigdata_quality_assessment_spark.operators.phash import (
        near_dedup_videos,
    )
    from bigdata_quality_assessment_spark.queries import _vhash_fixture_blobs

    media = spark.createDataFrame(
        _vhash_fixture_blobs(), "media_id long, content binary"
    )
    surv = sorted(
        r["media_id"]
        for r in near_dedup_videos(media, n_frames=4).collect()
    )
    assert surv == [0, 2, 4]
    # raising the bar to all-frames-match keeps the 2/3 variant
    strict = sorted(
        r["media_id"]
        for r in near_dedup_videos(
            media, n_frames=4, min_frame_frac=1.0
        ).collect()
    )
    assert strict == [0, 2, 3, 4]


def test_near_dedup_videos_synthetic_hashes(spark):
    """The decision rule on precomputed frame hashes: videos of
    different lengths compare over the shorter length."""
    from bigdata_quality_assessment_spark.operators.phash import (
        near_dedup_videos,
    )

    media = spark.createDataFrame(
        [(0, b"x"), (1, b"y"), (2, b"z")], "media_id long, content binary"
    )
    fh = spark.createDataFrame(
        # video 0: 4 frames; video 1: the same first 2 frames (a
        # truncated copy); video 2: unrelated
        [
            (0, 0, 111, 0), (0, 1, 222, 0), (0, 2, 333, 0), (0, 3, 444, 0),
            (1, 0, 111, 0), (1, 1, 222, 0),
            (2, 0, -559038737, 0), (2, 1, 999999999, 0),
        ],
        "media_id long, frame_id int, dhash long, ahash long",
    )
    surv = sorted(
        r["media_id"]
        for r in near_dedup_videos(media, frame_hashes=fh).collect()
    )
    # least(4, 2) = 2 aligned frames, both match -> 1 is a dup of 0
    assert surv == [0, 2]


def test_near_dedup_images_two_level_identical(spark):
    """The two-level (band, sub-band) scale regime is a candidate
    PREFILTER only: the verified pair set — hence the survivor set —
    is identical to single-level banding on the graded fixture, for
    every max_hamming the banding is complete for."""
    media = spark.createDataFrame(
        _phash_fixture_blobs(), "media_id long, content binary"
    )
    for mh in (0, 3):
        one = sorted(
            r["media_id"]
            for r in near_dedup_images(media, max_hamming=mh).collect()
        )
        two = sorted(
            r["media_id"]
            for r in near_dedup_images(
                media, max_hamming=mh, two_level=True
            ).collect()
        )
        assert one == two


def test_frame_phash_string_and_wide_ids(spark):
    """(id, frame_id) ride through frame_phash as real passthrough
    columns: string ids and hash-derived 64-bit ids survive intact
    (the round-12 arithmetic packing NULLed the former and
    overflowed/collided the latter)."""
    from bigdata_quality_assessment_spark.operators.phash import frame_phash
    from bigdata_quality_assessment_spark.queries import _animated_gif_blob

    gif = _animated_gif_blob()
    smedia = spark.createDataFrame(
        [("vid-a", gif), ("vid-b", gif)], "media_id string, content binary"
    )
    srows = frame_phash(smedia, n_frames=4).collect()
    assert {r["media_id"] for r in srows} == {"vid-a", "vid-b"}
    assert all(r["frame_id"] is not None for r in srows)

    wide = -(2**62) + 5, 2**62 + 11  # outside the old packing's range
    wmedia = spark.createDataFrame(
        [(wide[0], gif), (wide[1], gif)], "media_id long, content binary"
    )
    wrows = frame_phash(wmedia, n_frames=4).collect()
    assert {r["media_id"] for r in wrows} == set(wide)
    per_id = {}
    for r in wrows:
        per_id.setdefault(r["media_id"], set()).add(r["frame_id"])
    assert all(fids == {0, 1, 2} for fids in per_id.values())


def test_near_dedup_videos_string_ids(spark):
    """End-to-end video dedup under a string id column (the contract
    the packed key silently broke): byte-identical animations
    collapse, the min (lexicographic) id survives."""
    from bigdata_quality_assessment_spark.operators.phash import (
        near_dedup_videos,
    )
    from bigdata_quality_assessment_spark.queries import _animated_gif_blob

    gif = _animated_gif_blob()
    media = spark.createDataFrame(
        [("v1", gif), ("v2", gif), ("v3", b"not a video")],
        "media_id string, content binary",
    )
    surv = sorted(
        r["media_id"] for r in near_dedup_videos(media, n_frames=4).collect()
    )
    assert surv == ["v1", "v3"]


def test_near_dedup_videos_param_validation(spark):
    """min_frame_frac outside (0, 1] and negative max_offset raise
    instead of silently merging everything / disabling dedup."""
    from bigdata_quality_assessment_spark.operators.phash import (
        near_dedup_videos,
    )

    media = spark.createDataFrame([(0, b"x")], "media_id long, content binary")
    for bad in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError, match="min_frame_frac"):
            near_dedup_videos(media, min_frame_frac=bad)
    with pytest.raises(ValueError, match="max_offset"):
        near_dedup_videos(media, max_offset=-1)
    with pytest.raises(ValueError, match="max_hamming"):
        near_dedup_videos(media, max_hamming=4)


def test_energy_fingerprint_n_windows_guard(spark):
    """n_windows outside [2, 65] raises: more than 64 transition bits
    overflows the signed-BIGINT fingerprint and breaks the 4x16-bit
    band-completeness assumption."""
    from bigdata_quality_assessment_spark.operators.audio import (
        audio_fingerprint,
        energy_fingerprint_bits,
    )

    x = np.arange(200, dtype=np.float64) / 200.0
    for bad in (0, 1, 66, 128):
        with pytest.raises(ValueError, match="n_windows"):
            energy_fingerprint_bits(x, 1, n_windows=bad)
    media = spark.createDataFrame([(0, b"x")], "media_id long, content binary")
    with pytest.raises(ValueError, match="n_windows"):
        audio_fingerprint(media, n_windows=66)
    # boundary values stay legal
    assert energy_fingerprint_bits(x, 1, n_windows=2) is not None
    assert energy_fingerprint_bits(x, 1, n_windows=65) is not None


def test_image_phash_passthrough_collision_raises(spark):
    """passthrough_cols colliding with the hash-pass output columns
    (dhash/ahash/width/height/decoder) or id_col raise up front
    (round-14, ADVICE): a collision would otherwise produce
    duplicate/ambiguous columns at runtime, far from the call site."""
    import pytest

    from bigdata_quality_assessment_spark.operators.phash import image_phash

    media = spark.createDataFrame(
        [(1, b"", 7)], "media_id long, content binary, dhash long"
    )
    with pytest.raises(ValueError, match="passthrough_cols"):
        image_phash(media, passthrough_cols=("dhash",))
    with pytest.raises(ValueError, match="passthrough_cols"):
        image_phash(media, passthrough_cols=("media_id",))


def test_near_dedup_videos_two_level_auto(spark, monkeypatch):
    """near_dedup_videos resolves two_level='auto' (round-14 default)
    on the decodable-video count — the per-slot signature population —
    with survivor identity across the boundary and a ValueError on a
    non-bool non-'auto' value."""
    import pytest

    from bigdata_quality_assessment_spark.operators import text as T
    from bigdata_quality_assessment_spark.operators.phash import (
        near_dedup_videos,
    )

    # precomputed frame hashes sidestep blob decoding: 3 videos, two
    # identical, one distinct (2 frames each)
    fh = spark.createDataFrame(
        [
            (1, 0, 100), (1, 1, 200),
            (2, 0, 100), (2, 1, 200),
            (3, 0, -999), (3, 1, 12345),
        ],
        "media_id long, frame_id long, dhash long",
    )
    media = spark.createDataFrame(
        [(1,), (2,), (3,)], "media_id long"
    )
    with pytest.raises(ValueError, match="two_level"):
        near_dedup_videos(media, frame_hashes=fh, two_level="bogus")
    monkeypatch.setattr(T, "TWO_LEVEL_AUTO_THRESHOLD", 3)
    engaged = sorted(
        r["media_id"]
        for r in near_dedup_videos(
            media, frame_hashes=fh, two_level="auto"
        ).collect()
    )
    single = sorted(
        r["media_id"]
        for r in near_dedup_videos(
            media, frame_hashes=fh, two_level=False
        ).collect()
    )
    assert engaged == single == [1, 3]


def test_near_dedup_videos_max_bucket_salt_split_identical(spark):
    """Round-16 (VERDICT r15 ask #4, §2.5 skew): the hot-bucket
    salt-split is pair-PRESERVING — on a degenerate corpus where every
    clip shares one low-entropy fingerprint (one (slot, band) bucket
    holding the whole population, the measured plateau-audio hazard),
    survivors under max_bucket salting are identical to the unsalted
    plan, at several thresholds and with offsets."""
    from bigdata_quality_assessment_spark.operators.phash import (
        near_dedup_videos,
    )

    n = 24
    media = spark.createDataFrame(
        [(i, b"x") for i in range(n)], "media_id long, content binary"
    )
    rows = []
    for i in range(n):
        # all clips: identical fingerprint at slots 0..2 -> one hot
        # bucket per (slot, band); half the clips differ at slot 3 by
        # >3 bits so min_frame_frac decides
        rows += [(i, 0, 7), (i, 1, 7), (i, 2, 7)]
        rows.append((i, 3, 7 if i % 2 == 0 else (7 ^ 0xFF00)))
    fh = spark.createDataFrame(
        rows, "media_id long, frame_id int, dhash long"
    )
    want = sorted(
        r["media_id"]
        for r in near_dedup_videos(
            media, frame_hashes=fh, min_frame_frac=1.0, max_bucket=None
        ).collect()
    )
    for mb in (1, 4, 1000):
        got = sorted(
            r["media_id"]
            for r in near_dedup_videos(
                media, frame_hashes=fh, min_frame_frac=1.0, max_bucket=mb
            ).collect()
        )
        assert got == want, f"salt-split changed survivors at max_bucket={mb}"
    # offset path too (b side explodes deltas before the salted join)
    want_off = sorted(
        r["media_id"]
        for r in near_dedup_videos(
            media, frame_hashes=fh, min_frame_frac=0.5, max_offset=1,
            max_bucket=None,
        ).collect()
    )
    got_off = sorted(
        r["media_id"]
        for r in near_dedup_videos(
            media, frame_hashes=fh, min_frame_frac=0.5, max_offset=1,
            max_bucket=4,
        ).collect()
    )
    assert got_off == want_off
    with pytest.raises(ValueError, match="max_bucket"):
        near_dedup_videos(media, frame_hashes=fh, max_bucket=0)
