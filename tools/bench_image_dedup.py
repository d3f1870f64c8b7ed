#!/usr/bin/env python
"""Perceptual-image-dedup scaling record (round-12): generate planted
image corpora (sources/imagegen.py — block-mosaic PNGs with exact-dup
re-encodes and brightness-shifted perceptual dups, ground truth in
role/src_id), then time the decode→dHash pass and the full banded
near-dedup, and measure planted recall / original survival
DISTRIBUTED (no driver-side id census). The runtime question is the
linear decode scan + the 4×16-bit band join; the quality question is
whether brightness-shifted perceptual dups — invisible to byte-level
dedup — collapse at scale.

Usage: python tools/bench_image_dedup.py [n_images ...]
Default scales: 20000 200000. Corpora cache under
.localdata/images/<n>/media.parquet (delete to regenerate).
Prints one JSON line per scale plus a summary line.
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
    scales = [int(a) for a in sys.argv[1:]] or [20_000, 200_000]
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    from pyspark.sql import functions as F

    from bigdata_quality_assessment_spark.operators.phash import (
        image_phash,
        near_dedup_images,
    )
    from bigdata_quality_assessment_spark.session import build_session
    from bigdata_quality_assessment_spark.sources.imagegen import (
        planted_images,
    )

    spark = build_session(
        app_name="bench_image_dedup",
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
        path = REPO / ".localdata" / "images" / str(n) / "media.parquet"
        if not path.exists():
            t0 = time.perf_counter()
            planted_images(spark, n, seed=7).write.mode("overwrite").parquet(
                str(path)
            )
            print(
                f"# generated {n} images in {time.perf_counter()-t0:.1f}s",
                file=sys.stderr,
            )
        media = spark.read.parquet(str(path))
        stats = {"n_images": n, "cal_start": calibrate()}

        # planted quality (untimed, distributed)
        kept = near_dedup_images(media, max_hamming=3).select(
            "media_id", F.lit(1).alias("__kept")
        )
        qual = (
            media.select("media_id", "role")
            .join(kept, "media_id", "left")
            .agg(
                F.avg(
                    F.when(
                        F.col("role").isin("dup", "bright"),
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
            "image_phash",
            # modulo before summing: raw 64-bit hashes overflow an
            # ANSI-mode long sum (the mapInPandas pass computes every
            # column regardless, so any dhash-consuming agg works)
            lambda: image_phash(media)
            .agg(F.sum(F.col("dhash") % 1000003))
            .collect(),
        )
        timed(
            "near_dedup_images",
            lambda: near_dedup_images(media, max_hamming=3).count(),
        )
        stats["cal_end"] = calibrate()
        results[n] = stats
        print(json.dumps(stats))

    print(json.dumps({"metric": "image_dedup_scaling", "scales": results}))
    spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
