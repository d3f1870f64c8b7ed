#!/usr/bin/env python
"""Drill into near_dedup_videos internals on the extended audio corpus:
candidate volume, verify, closure, anti-join — each timed cumulatively
off a checkpointed fingerprint frame."""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.operators.audio import (
    audio_segment_fingerprints,
)
from bigdata_quality_assessment_spark.session import build_session

spark = build_session(app_name="profile_audio_ext3")
spark.sparkContext.setLogLevel("ERROR")

p = REPO / ".localdata" / "audio_ext" / "20000" / "media.parquet"
media = spark.read.parquet(str(p))

seg, max_offset, max_hamming, min_frac = 2080, 1, 3, 0.5
fh = (
    audio_segment_fingerprints(media, seg)
    .filter(F.col("dhash").isNotNull())
    .localCheckpoint(eager=True)
)
print("fp rows:", fh.count(), flush=True)
id_col = "media_id"

t0 = time.perf_counter()
n_by_vid = fh.groupBy(id_col).agg(F.count(F.lit(1)).alias("__nf"))
print("n_by_vid count:", n_by_vid.count(), f"{time.perf_counter()-t0:.2f}s", flush=True)


def _band(t):
    return F.shiftrightunsigned(F.col("dhash"), 16 * t).bitwiseAND(F.lit((1 << 16) - 1))


bands = F.array(*[_band(t) for t in range(4)])
fhe = fh.select(F.col(id_col), "frame_id", "dhash", F.posexplode(bands).alias("__t", "__b"))
a = fhe.select(F.col(id_col).alias("__ida"), F.col("frame_id").alias("__slot"),
               F.col("dhash").alias("__da"), "__t", "__b")
b = fhe.select(F.col(id_col).alias("__idb"), F.col("frame_id"), F.col("dhash").alias("__db"), "__t", "__b")
deltas = F.array(*[F.lit(d) for d in range(-max_offset, max_offset + 1)])
b = b.select("__idb", F.explode(deltas).alias("__delta"), "frame_id", "__db", "__t", "__b").select(
    "__idb", "__delta", (F.col("frame_id") - F.col("__delta")).alias("__slot"), "__db", "__t", "__b")

t0 = time.perf_counter()
raw_cand = a.join(b, ["__slot", "__t", "__b"]).filter(F.col("__ida") < F.col("__idb"))
print("raw candidate rows:", raw_cand.count(), f"{time.perf_counter()-t0:.2f}s", flush=True)

t0 = time.perf_counter()
cand_frames = raw_cand.dropDuplicates(["__ida", "__idb", "__delta", "__slot"]).filter(
    F.bit_count(F.col("__da").bitwiseXOR(F.col("__db"))) <= max_hamming)
matched = cand_frames.groupBy("__ida", "__idb", "__delta").agg(F.count(F.lit(1)).alias("__match"))
na = n_by_vid.select(F.col(id_col).alias("__ida"), F.col("__nf").alias("__na"))
nb = n_by_vid.select(F.col(id_col).alias("__idb"), F.col("__nf").alias("__nb"))
verified = (matched.join(na, "__ida").join(nb, "__idb")
            .filter(F.col("__match") >= min_frac * F.least("__na", "__nb"))
            .dropDuplicates(["__ida", "__idb"])).localCheckpoint(eager=True)
print("verified pairs:", verified.count(), f"{time.perf_counter()-t0:.2f}s", flush=True)

from bigdata_quality_assessment_spark.operators.graph import duplicate_drop_ids

t0 = time.perf_counter()
dup = duplicate_drop_ids(verified, "__ida", "__idb").select(F.col("id").alias(id_col))
dup = dup.localCheckpoint(eager=True)
print("drop ids:", dup.count(), f"{time.perf_counter()-t0:.2f}s", flush=True)

t0 = time.perf_counter()
out = media.join(dup, id_col, "left_anti")
print("survivors:", out.count(), f"{time.perf_counter()-t0:.2f}s", flush=True)

spark.stop()
