#!/usr/bin/env python
"""Time curate_audio's default path on the EXTENDED planted corpus
(n_segments=4, planted trims) — the segment tier's design regime and
the corpus family the graded atrim part uses."""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.pipeline import (
    curate_audio,
    resolve_audio_seg_frames,
)
from bigdata_quality_assessment_spark.session import build_session
from bigdata_quality_assessment_spark.sources.audiogen import planted_audio

spark = build_session(app_name="profile_audio_ext")
spark.sparkContext.setLogLevel("ERROR")

p = REPO / ".localdata" / "audio_ext" / "20000" / "media.parquet"
if not p.exists():
    t0 = time.perf_counter()
    planted_audio(
        spark, 20000, seed=7, trim_rate=0.05, n_segments=4
    ).write.mode("overwrite").parquet(str(p))
    print(f"gen: {time.perf_counter()-t0:.2f}s")
media = spark.read.parquet(str(p))
n_in = media.count()
roles = {r["role"]: r["count"] for r in media.groupBy("role").count().collect()}
print(f"clips={n_in} roles={roles}")

t0 = time.perf_counter()
print("auto seg_frames:", resolve_audio_seg_frames(media))
print(f"resolve: {time.perf_counter()-t0:.2f}s")

for i in range(3):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    clean, _ = curate_audio(media, with_report=False)
    n = clean.count()
    print(f"curate_audio ext run{i}: {time.perf_counter()-t0:.2f}s survivors={n}")

spark.stop()
