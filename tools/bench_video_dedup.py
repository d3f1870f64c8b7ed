#!/usr/bin/env python
"""Video-level perceptual-dedup scaling record (round-12): generate
planted animation corpora (sources/videogen.py — 3-frame patterned
GIFs with byte dups, palette-rebright perceptual dups, and one-frame
recuts, ground truth in role/src_id), then time the frame decode →
per-frame dHash pass and the full aligned-frame dedup, and measure
planted recall / original survival DISTRIBUTED. The runtime question
is the per-frame LZW decode scan + the frame-aligned band join; the
quality question is whether palette-re-graded copies and partial
recuts collapse at scale.

Usage: python tools/bench_video_dedup.py [n_videos ...]
Default scales: 10000 100000. Corpora cache under
.localdata/videos/<n>/media.parquet (delete to regenerate).
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
        path = REPO / ".localdata" / "videos" / str(n) / "media.parquet"
        if not path.exists():
            t0 = time.perf_counter()
            planted_videos(spark, n, seed=7).write.mode("overwrite").parquet(
                str(path)
            )
            print(
                f"# generated {n} videos in {time.perf_counter()-t0:.1f}s",
                file=sys.stderr,
            )
        media = spark.read.parquet(str(path))
        stats = {"n_videos": n, "cal_start": calibrate()}

        kept = near_dedup_videos(media, n_frames=3).select(
            "media_id", F.lit(1).alias("__kept")
        )
        qual = (
            media.select("media_id", "role")
            .join(kept, "media_id", "left")
            .agg(
                F.avg(
                    F.when(
                        F.col("role") != "orig",
                        F.col("__kept").isNull().cast("double"),
                    )
                ).alias("recall"),
                F.avg(
                    F.when(
                        F.col("role") == "orig",
                        F.col("__kept").isNotNull().cast("double"),
                    )
                ).alias("survival"),
            )
            .first()
        )
        stats["planted_recall"] = round(float(qual["recall"]), 4)
        stats["orig_survival"] = round(float(qual["survival"]), 4)

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
        timed(
            "near_dedup_videos",
            lambda: near_dedup_videos(media, n_frames=3).count(),
        )
        stats["cal_end"] = calibrate()
        results[n] = stats
        print(json.dumps(stats))

    print(json.dumps({"metric": "video_dedup_scaling", "scales": results}))
    spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
