#!/usr/bin/env python
"""Phase-level timing for near_dedup_minhash at $SPARK_GRAFT_SF_DIR
(round-16, VERDICT r15 ask #5): replicate the operator's stages with
explicit materialization per phase so wall-clock localizes to
shingle-hashing, the 128-lane signature fold, banding+candidates,
Jaccard verify, or closure. Phases after the first run from a
materialized shingle-hash table (the same lazy-barrier discipline the
operator uses), so each number isolates that stage's own cost.

Usage: SPARK_GRAFT_SF_DIR=... python tools/profile_near_dedup.py [n_passes]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.operators.text import (
    _shingle_expr,
    minhash_lsh_candidates,
)
from bigdata_quality_assessment_spark.operators.partitioning import (
    ensure_min_parallelism,
)
from bigdata_quality_assessment_spark.session import build_session
from bigdata_quality_assessment_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 1

spark = build_session(
    app_name="profile_near_dedup",
    extra_conf={"spark.ui.showConsoleProgress": "false"},
)
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext


def noop(df):
    df.write.format("noop").mode("overwrite").save()


for p in range(N_PASSES):
    spark.catalog.clearCache()
    sc._jvm.System.gc()
    docs = load_table(spark, "documents", SF_DIR)
    k, n_hashes, bands, min_jaccard = 3, 128, 16, 0.8

    t0 = time.perf_counter()
    sh = _shingle_expr(F.col("text"), k, "word")
    hashes = ensure_min_parallelism(docs.select("doc_id", "text")).select(
        "doc_id", F.explode(F.transform(sh, lambda s: F.xxhash64(s))).alias("__h")
    ).localCheckpoint(eager=False)
    sc.setJobDescription("nd: shingle+hash materialize")
    n_sh = hashes.count()
    t1 = time.perf_counter()
    print(f"[pass {p}] shingle+hash materialize: {t1 - t0:.3f}s  ({n_sh} rows)")

    lanes = [
        F.min(F.xxhash64(F.lit(i), F.col("__h"))).alias(f"__s{i}")
        for i in range(n_hashes)
    ]
    sigs = (
        hashes.groupBy("doc_id")
        .agg(*lanes)
        .select(
            "doc_id",
            F.array(*[F.col(f"__s{i}") for i in range(n_hashes)]).alias("sig"),
        )
    )
    sc.setJobDescription("nd: 128-lane signature fold")
    t0 = time.perf_counter()
    noop(sigs)
    t1 = time.perf_counter()
    print(f"[pass {p}] signature fold (noop): {t1 - t0:.3f}s")

    # candidates: banding + bucket self-join + distinct, from a
    # materialized signature table so the fold cost is excluded
    sigs_m = sigs.localCheckpoint(eager=False)
    sc.setJobDescription("nd: sigs materialize")
    sigs_m.count()
    sc.setJobDescription("nd: banding+candidates")
    t0 = time.perf_counter()
    cands = minhash_lsh_candidates(sigs_m, bands).localCheckpoint(eager=False)
    n_cand = cands.count()
    t1 = time.perf_counter()
    print(f"[pass {p}] band join + distinct: {t1 - t0:.3f}s  ({n_cand} pairs)")

    sizes = hashes.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = hashes.select(F.col("doc_id").alias("doc_a"), "__h")
    b = hashes.select(F.col("doc_id").alias("doc_b"), "__h")
    inter = (
        cands.join(a, "doc_a")
        .join(b, ["doc_b", "__h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    verified = (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")),
            "doc_b",
        )
        .filter(
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            >= min_jaccard
        )
    )
    sc.setJobDescription("nd: verify")
    t0 = time.perf_counter()
    verified_m = verified.localCheckpoint(eager=False)
    n_ver = verified_m.count()
    t1 = time.perf_counter()
    print(f"[pass {p}] verify (jaccard on candidates): {t1 - t0:.3f}s  ({n_ver} pairs)")

    from bigdata_quality_assessment_spark.operators.graph import duplicate_drop_ids

    sc.setJobDescription("nd: closure + anti-join")
    t0 = time.perf_counter()
    drop_ids = duplicate_drop_ids(verified_m).select(F.col("id").alias("doc_id"))
    n_out = docs.join(drop_ids, "doc_id", "left_anti").count()
    t1 = time.perf_counter()
    print(f"[pass {p}] closure + anti-join count: {t1 - t0:.3f}s  ({n_out} survivors)")

    # end-to-end reference (the bench's exact call)
    from bigdata_quality_assessment_spark.operators.text import near_dedup_minhash

    spark.catalog.clearCache()
    sc._jvm.System.gc()
    sc.setJobDescription("nd: end-to-end bench call")
    t0 = time.perf_counter()
    n = near_dedup_minhash(docs, k=3, n_hashes=128, bands=16, min_jaccard=0.8).count()
    t1 = time.perf_counter()
    print(f"[pass {p}] end-to-end near_dedup_minhash: {t1 - t0:.3f}s  ({n} survivors)")

spark.stop()
