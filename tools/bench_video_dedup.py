#!/usr/bin/env python
"""Video-level perceptual-dedup scaling record (round-12; trim tier
round-14): generate planted animation corpora (sources/videogen.py —
3-frame patterned GIFs with byte dups, palette-rebright perceptual
dups, one-frame recuts, and optionally head-trimmed copies, ground
truth in role/src_id), then time the frame decode → per-frame dHash
pass and the full aligned-frame dedup, and measure planted recall /
original survival DISTRIBUTED. The runtime question is the per-frame
LZW decode scan + the frame-aligned band join (two-level nested
banding engages automatically at >=1M via the operator's
two_level="auto" default — recorded per scale); the quality question
is whether palette-re-graded copies, partial recuts and trimmed
copies collapse at scale.

Usage: python tools/bench_video_dedup.py [n_videos ...]
Env: SPARK_GRAFT_VIDEO_TRIM_RATE (default 0 — byte-stable corpora,
SURVEY §2.10), SPARK_GRAFT_VIDEO_MAX_OFFSET (default 0; when > 0 the
dedup + quality pass runs at BOTH offset 0 and this offset, pricing
the offset scan's (2·δ+1)× candidate volume and the trim-recall it
buys). Default scales: 10000 100000. Corpora cache under
.localdata/videos/<n>[_trim<rate>]/media.parquet (delete to
regenerate).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [10_000, 100_000]
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    trim_rate = float(os.environ.get("SPARK_GRAFT_VIDEO_TRIM_RATE", "0"))
    max_offset = int(os.environ.get("SPARK_GRAFT_VIDEO_MAX_OFFSET", "0"))

    from pyspark.sql import functions as F

    from bigdata_quality_assessment_spark.operators.phash import (
        frame_phash,
        near_dedup_videos,
    )
    from bigdata_quality_assessment_spark.session import build_session
    from bigdata_quality_assessment_spark.sources.videogen import (
        planted_videos,
    )

    spark = build_session(
        app_name="bench_video_dedup",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark.sparkContext._jvm

    def calibrate() -> float:
        xs = []
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(0, 768_000_000, 1, 32).selectExpr(
                "sum(sin(id * 1.0e-6) + cos(id * 1.0e-6)) as s"
            ).collect()
            xs.append(time.perf_counter() - t0)
        return round(statistics.median(xs), 3)

    calibrate()  # codegen warmup
    results = {}
    for n in scales:
        tag = str(n) if trim_rate == 0 else f"{n}_trim{trim_rate}"
        path = REPO / ".localdata" / "videos" / tag / "media.parquet"
        if not path.exists():
            t0 = time.perf_counter()
            planted_videos(
                spark, n, seed=7, trim_rate=trim_rate
            ).write.mode("overwrite").parquet(str(path))
            print(
                f"# generated {n} videos in {time.perf_counter()-t0:.1f}s",
                file=sys.stderr,
            )
        media = spark.read.parquet(str(path))
        stats = {
            "n_videos": n,
            "trim_rate": trim_rate,
            "two_level": n >= 1_000_000,  # the auto default's switch
            "cal_start": calibrate(),
        }

        def quality(offset: int) -> dict:
            kept = near_dedup_videos(
                media, n_frames=3, max_offset=offset
            ).select("media_id", F.lit(1).alias("__kept"))
            rows = (
                media.select("media_id", "role")
                .join(kept, "media_id", "left")
                .groupBy("role")
                .agg(
                    F.avg(F.col("__kept").isNull().cast("double")).alias(
                        "dropped"
                    ),
                    F.count(F.lit(1)).alias("cnt"),
                )
                .collect()
            )
            by_role = {r["role"]: round(float(r["dropped"]), 4) for r in rows}
            n_planted = sum(r["cnt"] for r in rows if r["role"] != "orig")
            hit = sum(
                float(r["dropped"]) * r["cnt"]
                for r in rows
                if r["role"] != "orig"
            )
            return {
                # micro (row-weighted) recall — comparable to the
                # pre-round-14 planted_recall records in BASELINE.md
                "recall": round(hit / n_planted, 4) if n_planted else None,
                "orig_survival": round(1.0 - by_role.get("orig", 0.0), 4),
                "dropped_by_role": by_role,
            }

        offsets = sorted({0, max_offset})
        for off in offsets:
            key = "" if off == 0 else f"_off{off}"
            stats[f"quality{key}"] = quality(off)

        def timed(name, fn):
            samples = []
            for _ in range(n_runs):
                spark.catalog.clearCache()
                jvm.System.gc()
                t0 = time.perf_counter()
                fn()
                samples.append(time.perf_counter() - t0)
            stats[name] = round(statistics.median(samples), 3)

        timed(
            "frame_phash",
            lambda: frame_phash(media, n_frames=3)
            .agg(F.sum(F.col("dhash") % 1000003))
            .collect(),
        )
        for off in offsets:
            key = "" if off == 0 else f"_off{off}"
            timed(
                f"near_dedup_videos{key}",
                lambda off=off: near_dedup_videos(
                    media, n_frames=3, max_offset=off
                ).count(),
            )
        stats["cal_end"] = calibrate()
        results[n] = stats
        print(json.dumps(stats))

    print(json.dumps({"metric": "video_dedup_scaling", "scales": results}))
    spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
