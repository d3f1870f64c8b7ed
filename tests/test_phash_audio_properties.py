"""Property tests for the perceptual-hash and audio tiers: the
vectorized implementations against naive references, codec round
trips, and crash-safety on adversarial bytes (no Spark session —
these exercise the pure per-blob kernels the Arrow passes wrap)."""

from __future__ import annotations

import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bigdata_quality_assessment_spark.operators.audio import (
    energy_fingerprint_bits,
)
from bigdata_quality_assessment_spark.operators.multimodal import (
    _encode_png,
    _wav_pcm,
)
from bigdata_quality_assessment_spark.operators.phash import (
    _luma_grid,
    ahash_bits,
    dhash_bits,
    _pixels_of,
)


@st.composite
def images(draw):
    h = draw(st.integers(1, 25))
    w = draw(st.integers(1, 25))
    ch = draw(st.sampled_from([1, 3]))
    data = draw(
        st.binary(min_size=h * w * ch, max_size=h * w * ch)
    )
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, ch)


def _naive_grid(px, out_h, out_w):
    p = px.astype(np.float64)
    if p.shape[2] >= 3:
        y = 0.299 * p[:, :, 0] + 0.587 * p[:, :, 1] + 0.114 * p[:, :, 2]
    else:
        y = p[:, :, 0]
    h, w = y.shape
    out = np.zeros((out_h, out_w))
    for i in range(out_h):
        r0, r1 = (i * h) // out_h, ((i + 1) * h) // out_h
        r1 = max(r0 + 1, r1)
        for j in range(out_w):
            c0, c1 = (j * w) // out_w, ((j + 1) * w) // out_w
            c1 = max(c0 + 1, c1)
            out[i, j] = y[r0:r1, c0:c1].mean()
    return out


@given(images())
@settings(max_examples=60, deadline=None)
def test_luma_grid_matches_naive(px):
    got = _luma_grid(px, 8, 9)
    want = _naive_grid(px, 8, 9)
    assert np.allclose(got, want, rtol=0, atol=1e-9)


@given(images())
@settings(max_examples=60, deadline=None)
def test_phash_survives_png_roundtrip(px):
    """Hashing the PNG-encoded bytes equals hashing the pixels
    directly — the codec is lossless and the decoder dispatch picks
    the PNG path."""
    decoded, which = _pixels_of(_encode_png(px))
    assert which == "png"
    assert dhash_bits(decoded) == dhash_bits(px)
    assert ahash_bits(decoded) == ahash_bits(px)


@given(st.binary(max_size=200))
@settings(max_examples=120, deadline=None)
def test_pixels_of_never_raises(b):
    px, which = _pixels_of(b)
    assert (px is None) == (which is None)


@given(
    st.lists(st.integers(-32768, 32767), min_size=0, max_size=400),
    st.sampled_from([1, 2]),
    st.sampled_from([8000, 44100]),
)
@settings(max_examples=60, deadline=None)
def test_wav_pcm_roundtrip_exact(samples, channels, rate):
    """Synthesized 16-bit PCM decodes to the exact written samples
    (truncated to whole frames)."""
    pcm = struct.pack(f"<{len(samples)}h", *samples)
    blob = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack(
            "<IHHIIHH", 16, 1, channels, rate,
            rate * channels * 2, channels * 2, 16,
        )
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    out = _wav_pcm(blob)
    assert out is not None
    x, raw, ch, r, bits = out
    n_frames = len(samples) // channels
    assert ch == channels and r == rate and bits == 16
    assert list(raw) == samples[: n_frames * channels]


@given(st.binary(max_size=120))
@settings(max_examples=120, deadline=None)
def test_wav_pcm_never_raises(b):
    """Arbitrary bytes — including truncated RIFF headers — return
    None, never raise (the Spark-task safety contract)."""
    _wav_pcm(b)
    _wav_pcm(b"RIFF" + b[:8] + b"WAVE" + b)


@given(
    st.lists(
        st.floats(-1.0, 1.0, allow_nan=False), min_size=65, max_size=300
    )
)
@settings(max_examples=60, deadline=None)
def test_energy_fingerprint_matches_naive(vals):
    x = np.array(vals, dtype=np.float64)
    got = energy_fingerprint_bits(x, 1)
    n = len(x)
    e = []
    for k in range(65):
        lo, hi = (k * n) // 65, ((k + 1) * n) // 65
        e.append(float((x[lo:hi] ** 2).mean()))
    want = 0
    for k in range(64):
        if e[k + 1] > e[k]:
            want |= 1 << k
    if want >= 1 << 63:
        want -= 1 << 64
    assert got == want


@st.composite
def clips_with_trim(draw):
    seg = draw(st.integers(65, 130))
    n_seg = draw(st.integers(3, 4))  # >= 3: a full segment survives any
    n = seg * n_seg + draw(st.integers(0, seg - 1))  # trim < seg below
    vals = draw(
        st.lists(
            st.integers(-20000, 20000), min_size=n, max_size=n
        )
    )
    x = np.asarray(vals, dtype=np.float64) / 32768.0
    p = draw(st.integers(seg, n - 1))  # peak survives any trim < seg
    x[p] = np.max(np.abs(x)) * 1.5 + 0.1  # unique global peak
    t = draw(st.integers(0, min(p, seg) - 1))
    return x, t, seg


@given(clips_with_trim())
@settings(max_examples=60, deadline=None)
def test_peak_anchored_segments_are_trim_invariant(case):
    """The operator-level invariant behind the audio trim tier
    (audio_segment_fingerprints): with a unique global peak that
    survives the cut, a head trim of ANY length < seg_frames leaves
    every full segment's fingerprint identical and shifts slot indices
    by a single consistent δ ∈ {0, 1} — exactly what the δ-offset
    verify absorbs. Pure-kernel replay of the Arrow pass's per-blob
    lattice (segment_anchor_frame + energy_fingerprint_bits on the
    anchored boundaries)."""
    from bigdata_quality_assessment_spark.operators.audio import (
        segment_anchor_frame,
    )

    x, t, seg = case
    xt = x[t:]

    def lattice_fps(arr):
        anchor = segment_anchor_frame(arr, 1)
        b0 = anchor % seg
        out = []
        j = 0
        while b0 + (j + 1) * seg <= len(arr):
            out.append(
                energy_fingerprint_bits(
                    arr[b0 + j * seg : b0 + (j + 1) * seg], 1, 65
                )
            )
            j += 1
        return out

    # anchor equivariance: same content frame before and after the cut
    assert segment_anchor_frame(xt, 1) == segment_anchor_frame(x, 1) - t

    src, trm = lattice_fps(x), lattice_fps(xt)
    assert trm  # at least one full segment always survives (n >= 2*seg)
    # one consistent slot shift, and every trimmed segment matches its
    # source segment bit-for-bit
    for delta in (0, 1):
        if len(trm) + delta <= len(src) and all(
            trm[j] == src[j + delta] for j in range(len(trm))
        ):
            break
    else:
        raise AssertionError((t, seg, src, trm))
