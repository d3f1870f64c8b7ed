"""Planted-audio corpus (sources/audiogen.py) + audio-dedup recall
over it — the acoustic sibling of the image/video/text/embedding
recall gates (round-13)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.operators.audio import (
    audio_fingerprint,
    near_dedup_audio,
)
from bigdata_quality_assessment_spark.sources.audiogen import (
    planted_audio,
    square_wav,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return planted_audio(spark, 400, seed=13).localCheckpoint()


def test_roles_and_structure(corpus):
    rows = corpus.collect()
    by_id = {r["media_id"]: r for r in rows}
    assert {r["role"] for r in rows} == {"orig", "dup", "regain"}
    for r in rows:
        if r["role"] == "orig":
            assert r["src_id"] is None
        else:
            assert by_id[r["src_id"]]["role"] == "orig"


def test_square_wav_decodes_exactly(spark):
    """The generated WAV round-trips through the repo's real PCM
    decoder with window RMS equal to the planted amplitude."""
    import numpy as np

    from bigdata_quality_assessment_spark.operators.multimodal import (
        _wav_pcm,
    )
    from bigdata_quality_assessment_spark.sources.audiogen import (
        _FRAMES_PER_WINDOW,
        _N_WINDOWS,
    )

    amps = [800 + 100 * (i % 100) for i in range(_N_WINDOWS)]
    x, raw, channels, rate, bits = _wav_pcm(square_wav(amps))
    assert (channels, rate, bits) == (1, 8000, 16)
    assert len(x) == _N_WINDOWS * _FRAMES_PER_WINDOW
    w0 = np.asarray(raw[:_FRAMES_PER_WINDOW], dtype="int64")
    assert float(np.sqrt(np.mean(w0 * w0))) == pytest.approx(amps[0])


def test_regain_is_fingerprint_invariant(corpus, spark):
    """Gain-scaled copies fingerprint identically to their source —
    the strict energy-rise bits survive integer re-quantization by
    the lattice-spacing argument in the module docstring."""
    fp = audio_fingerprint(corpus).select("media_id", "afp")
    pairs = (
        corpus.filter(F.col("role") == "regain")
        .select("media_id", "src_id")
        .join(fp, "media_id")
        .join(
            fp.select(
                F.col("media_id").alias("src_id"),
                F.col("afp").alias("src_afp"),
            ),
            "src_id",
        )
    )
    rows = pairs.collect()
    assert rows and all(r["afp"] == r["src_afp"] for r in rows)


def test_planted_audio_recall(corpus, spark):
    """dups and regains all collapse; originals survive (chance
    Hamming-3 collisions on keyed 64-bit patterns are vanishing)."""
    kept = {
        r["media_id"] for r in near_dedup_audio(corpus).collect()
    }
    by_role: dict = {}
    for r in corpus.select("media_id", "role").collect():
        by_role.setdefault(r["role"], set()).add(r["media_id"])
    assert not ((by_role["dup"] | by_role["regain"]) & kept)
    assert by_role["orig"] <= kept
    # two-level scale regime: identical survivors
    kept2 = {
        r["media_id"]
        for r in near_dedup_audio(corpus, two_level=True).collect()
    }
    assert kept2 == kept


def test_planted_audio_deterministic(spark):
    a = planted_audio(spark, 50, seed=13).collect()
    b = planted_audio(spark, 50, seed=13).collect()
    assert sorted((r["media_id"], bytes(r["content"])) for r in a) == sorted(
        (r["media_id"], bytes(r["content"])) for r in b
    )
