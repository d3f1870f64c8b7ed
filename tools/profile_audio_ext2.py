#!/usr/bin/env python
"""Per-stage breakdown of curate_audio's default path on the extended
planted corpus."""

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
from bigdata_quality_assessment_spark.pipeline import resolve_audio_seg_frames
from bigdata_quality_assessment_spark.session import build_session

spark = build_session(app_name="profile_audio_ext2")
spark.sparkContext.setLogLevel("ERROR")
jvm = spark.sparkContext._jvm

p = REPO / ".localdata" / "audio_ext" / "20000" / "media.parquet"
media = spark.read.parquet(str(p))
media.count()

t0 = time.perf_counter()
seg = resolve_audio_seg_frames(media)
print(f"resolve(sample decode): {time.perf_counter()-t0:.2f}s seg={seg}", flush=True)

t0 = time.perf_counter()
digests = media.select("media_id", F.md5(F.col("content")).alias("__digest"))
firsts = (
    digests.filter(F.col("__digest").isNotNull())
    .groupBy("__digest").agg(F.min("media_id").alias("media_id"))
    .select("media_id")
)
nulls = digests.filter(F.col("__digest").isNull()).select("media_id")
cur = media.join(firsts.unionByName(nulls), "media_id", "left_semi").localCheckpoint(
    eager=False
)
n = cur.count()
print(f"exact_dedup+barrier: {time.perf_counter()-t0:.2f}s rows={n}", flush=True)

t0 = time.perf_counter()
sfp = audio_segment_fingerprints(cur, seg).localCheckpoint(eager=False)
ns = sfp.count()
print(f"segment_fingerprints: {time.perf_counter()-t0:.2f}s rows={ns}", flush=True)

t0 = time.perf_counter()
out = near_dedup_audio(cur, seg_frames=seg, max_offset=1, fingerprints=sfp)
print(f"band+verify+closure+anti: {time.perf_counter()-t0:.2f}s "
      f"survivors={out.count()}", flush=True)

t0 = time.perf_counter()
seg2 = resolve_audio_seg_frames(media)
print(f"resolve again (warm): {time.perf_counter()-t0:.2f}s", flush=True)

spark.stop()
