#!/usr/bin/env python
"""Stage-level timing for the default audio curation path at bench
config (20k planted clips) — locates where audio_curate_default's
wall-clock goes: sample/resolve, exact dedup, segment fingerprints,
band join + verify, closure + anti-join."""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.operators.audio import (
    audio_segment_fingerprints,
    near_dedup_audio,
)
from bigdata_quality_assessment_spark.pipeline import (
    AudioCurationConfig,
    curate_audio,
    resolve_audio_seg_frames,
)
from bigdata_quality_assessment_spark.session import build_session

spark = build_session(app_name="profile_audio")
spark.sparkContext.setLogLevel("ERROR")

aud_path = REPO / ".localdata" / "audio" / "20000" / "media.parquet"
media = spark.read.parquet(str(aud_path))

t0 = time.perf_counter()
seg = resolve_audio_seg_frames(media)
t1 = time.perf_counter()
print(f"resolve_seg_frames: {t1-t0:.2f}s  seg_frames={seg}")

sfp = audio_segment_fingerprints(media, seg).localCheckpoint(eager=False)
n_seg = sfp.count()
t2 = time.perf_counter()
print(f"segment_fingerprints: {t2-t1:.2f}s  rows={n_seg}")

# distinct fingerprints and per-band bucket skew
stats = sfp.agg(
    F.countDistinct("dhash").alias("nd"),
    F.count(F.lit(1)).alias("n"),
).first()
print(f"distinct dhash={stats['nd']} of {stats['n']}")
band = F.shiftrightunsigned(F.col("dhash"), 0).bitwiseAND(F.lit(0xFFFF))
top = (
    sfp.select(F.col("frame_id"), band.alias("b0"))
    .groupBy("frame_id", "b0").count()
    .orderBy(F.desc("count")).limit(5).collect()
)
print("top (slot, band0) buckets:", [(r["frame_id"], r["b0"], r["count"]) for r in top])
t3 = time.perf_counter()
print(f"stats: {t3-t2:.2f}s")

out = near_dedup_audio(
    media, seg_frames=seg, max_offset=1, min_seg_frac=0.5,
    fingerprints=sfp,
)
n = out.count()
t4 = time.perf_counter()
print(f"near_dedup(seg tier, precomputed fp): {t4-t3:.2f}s  survivors={n}")

t5 = time.perf_counter()
clean, _ = curate_audio(media, with_report=False)
nc = clean.count()
t6 = time.perf_counter()
print(f"curate_audio default end-to-end: {t6-t5:.2f}s  survivors={nc}")

spark.stop()
