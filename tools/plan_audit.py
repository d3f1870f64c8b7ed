#!/usr/bin/env python
"""Physical-plan audit: prints `explain(formatted)` for the engine's
hottest paths and flags scale anti-patterns:

  * `Exchange SinglePartition` on a data-sized frame (global window /
    unpartitioned sort) — single-executor bottleneck at scale;
  * missing `PushedFilters`/narrow `ReadSchema` on parquet scans;
  * `BatchEvalPython` (row-at-a-time Python UDF) — only ArrowEval /
    mapInPandas python boundaries are sanctioned;
  * data-sized `SortMergeJoin` where a broadcast was expected.

Run: python tools/plan_audit.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# substrings expected to appear ONLY on bounded (grid/sample-sized)
# frames; flagged when the plan section containing them scans a table.
FLAGS = ("Exchange SinglePartition", "BatchEvalPython")


def audit(name: str, df, allow: tuple[str, ...] = ()) -> list[str]:
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    # FLAGS are matched on the SIMPLE plan string: formatted mode prints
    # node names and their arguments in separate sections, so substrings
    # like "Exchange SinglePartition" can never match there (a vacuous
    # check, caught in review).
    simple = df._jdf.queryExecution().executedPlan().toString()
    findings = []
    lines = simple.splitlines()
    for flag in FLAGS:
        if flag in allow:
            continue
        if flag != "Exchange SinglePartition":
            if flag in simple:
                findings.append(flag)
            continue
        # a single-partition exchange is SANCTIONED when its child is a
        # partial aggregate (map-side combine ran: the exchange carries
        # one row per task, not data rows); the pathology is raw data
        # rows feeding a global window/sort through one partition
        for i, line in enumerate(lines):
            if flag in line:
                # the aggregate child may sit under wrapper nodes
                # (WholeStageCodegen / InputAdapter / AQEShuffleRead /
                # ShuffleQueryStage); walk past them to the first real
                # operator line before testing for the partial_ combine
                child = ""
                for nxt in lines[i + 1 : i + 6]:
                    stripped = re.sub(r"^[\s:+\-*()0-9]*", "", nxt)
                    # NB: ReusedExchange is deliberately NOT skipped —
                    # it is a leaf reference, not a wrapper; skipping
                    # it would land the check on an unrelated sibling
                    if not stripped or stripped.startswith(
                        ("WholeStageCodegen", "InputAdapter", "AQEShuffleRead",
                         "ShuffleQueryStage")
                    ):
                        continue
                    child = nxt
                    break
                if "partial_" not in child:
                    findings.append(flag)
                    break
    n_bc = len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan))
    n_smj = len(re.findall(r"SortMergeJoin", plan))
    n_codegen = len(re.findall(r"WholeStageCodegen", plan))
    print(f"\n=== {name} ===")
    print(f"broadcast_joins={n_bc} sortmerge_joins={n_smj} codegen_spans={n_codegen}"
          + (f"  FLAGS: {findings}" if findings else "  clean"))
    scans = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
    for s_ in scans[:4]:
        print("  ", s_)
    return findings


def main() -> int:
    from pyspark.sql import functions as F

    from bigdata_quality_assessment_spark.operators.density import (
        interp_uniform_grid,
        kde_1d,
    )
    from bigdata_quality_assessment_spark.operators.models import (
        predict_ensemble_stats,
        train_ensemble,
    )
    from bigdata_quality_assessment_spark.operators.score import (
        acquisition_us_lw,
        ensemble_stats,
        inverse_density_weights,
    )
    from bigdata_quality_assessment_spark.operators.select import pool_remove, top_k
    from bigdata_quality_assessment_spark.operators.text import (
        minhash_lsh_candidates,
        minhash_signatures,
    )
    from bigdata_quality_assessment_spark.session import build_session
    from bigdata_quality_assessment_spark.sources.generators import stub_predictions
    from bigdata_quality_assessment_spark.sources.tables import load_table

    spark = build_session(
        master="local[8]", shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    li = load_table(spark, "lineitem", SF_DIR)
    pts = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("point_id"),
        (F.col("l_quantity") / 50.0).alias("x1"),
        (F.col("l_discount") * 10.0).alias("x2"),
        F.log("l_extendedprice").alias("y"),
    )

    bad = []

    # column pruning / pushdown on a filtered scan
    bad += audit(
        "pruned_filtered_scan",
        li.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_quantity"),
    )

    # flagship composite
    scored = pts.join(ensemble_stats(stub_predictions(pts, 2)), "point_id")
    grid = kde_1d(scored, "y_mean", bw=0.1, ngrid=256)
    flag = interp_uniform_grid(scored, grid, q_col="y_mean", out_col="pdf_y_mean")
    flag = flag.withColumn("acq", acquisition_us_lw(flag))
    # top-k itself compiles to TakeOrderedAndProject (no global sort)
    bad += audit("flagship_us_lw", top_k(flag, "acq", 20))

    # fused scorer: must be a single narrow pass (no exchange at all)
    thetas = train_ensemble(pts.filter(F.col("point_id") % 9973 == 0), ["x1", "x2"], "y")
    fused = predict_ensemble_stats(pts, thetas, ["x1", "x2"], carry_cols=["y"])
    plan = fused._sc._jvm.PythonSQLUtils.explainString(fused._jdf.queryExecution(), "formatted")
    has_exchange = "Exchange" in plan
    print("\n=== fused_predict_stats ===")
    print(f"  exchange_free={not has_exchange}")
    if has_exchange:
        bad.append("fused scorer shuffles")

    # P12 weights: agg + broadcast, no Window, no single-partition pass of the pool
    bad += audit("inverse_density_weights", inverse_density_weights(pts.withColumn("pdf", F.col("y"))))

    # pool deletion must broadcast the tiny side
    sel = pts.filter(F.col("point_id") % 100000 == 3).select("point_id")
    bad += audit("pool_remove_broadcast_anti", pool_remove(pts, sel))

    # minhash candidates: shuffle only on (band,bucket) keys
    docs = load_table(spark, "documents", SF_DIR)
    bad += audit(
        "minhash_lsh_candidates",
        minhash_lsh_candidates(minhash_signatures(docs, n_hashes=32), bands=8),
    )

    # exact/simhash dedup: exchanges carry (digest/signature, id) only;
    # the drop-set anti-join is UNHINTED (round-14 — corpus-shaped at
    # web scale; AQE broadcasts measured-small drop sets itself)
    from bigdata_quality_assessment_spark.operators.text import (
        exact_dedup,
        simhash_near_dedup,
    )

    bad += audit("exact_dedup", exact_dedup(docs))
    # closure's single-partition hop moves the duplicates-only edge
    # list (threshold-bounded, operators/graph.py) — sanctioned
    bad += audit(
        "simhash_near_dedup", simhash_near_dedup(docs),
        allow=("Exchange SinglePartition",),
    )

    # knn: two-phase top-k — no single-partition sort over the scored
    # corpus (phase-1 window partitions on (query, spark_partition_id))
    from bigdata_quality_assessment_spark.operators.similarity import (
        ivf_knn,
        knn_brute_force,
    )

    emb = load_table(spark, "embeddings", SF_DIR)
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    knn_sql = knn_brute_force(emb, q, k=5, impl="sql")
    bad += audit("knn_two_phase_topk_sql", knn_sql)
    knn_plan = knn_sql._sc._jvm.PythonSQLUtils.explainString(
        knn_sql._jdf.queryExecution(), "formatted"
    )
    if "SPARK_PARTITION_ID" not in knn_plan.upper():
        bad.append("knn sql path missing partial-topk salt")
    # arrow (production) path: phase-1 is the in-batch gemm top-k —
    # no crossJoin fanout anywhere; the only window is the k-bounded
    # merge, so exactly one row_number and a MapInPandas node
    knn_arrow = knn_brute_force(emb, q, k=5)
    bad += audit("knn_gemm_topk_arrow", knn_arrow)
    arrow_plan = knn_arrow._sc._jvm.PythonSQLUtils.explainString(
        knn_arrow._jdf.queryExecution(), "formatted"
    )
    if "MapInPandas" not in arrow_plan:
        bad.append("knn arrow path missing the gemm MapInPandas stage")
    if "BroadcastNestedLoopJoin" in arrow_plan:
        bad.append("knn arrow path reintroduced the crossJoin fanout")
    bad += audit("ivf_knn", ivf_knn(emb, q, dim=64, k=5, n_centroids=8, n_probe=2))
    from bigdata_quality_assessment_spark.operators.similarity import ivfpq_knn

    ipq = ivfpq_knn(emb, q, dim=64, k=5, n_centroids=8, n_probe=2, m=4)
    bad += audit("ivfpq_knn", ipq)
    ipq_plan = ipq._sc._jvm.PythonSQLUtils.explainString(
        ipq._jdf.queryExecution(), "formatted"
    )
    if "CartesianProduct" in ipq_plan or "BroadcastNestedLoopJoin" in ipq_plan:
        bad.append("ivfpq degenerated to a product join")
    if "MapInPandas" not in ipq_plan:
        bad.append("ivfpq missing the Arrow index/scoring stages")

    # semantic_dedup (round-15): the drop-set anti-join is UNHINTED —
    # SemDeDup's own workload prunes ~50% of the corpus, so the
    # drop set is corpus-shaped and the build side belongs to AQE
    from bigdata_quality_assessment_spark.operators.similarity import semantic_dedup

    sd = semantic_dedup(emb, dim=64, eps=0.1, n_centroids=8, seed=0)
    bad += audit("semantic_dedup", sd)
    if "ResolvedHint" in sd._jdf.queryExecution().analyzed().toString():
        bad.append("semantic_dedup drop-set anti-join carries a forced hint")

    # as-of join: one hash exchange on the key, no cartesian/range blowup
    from bigdata_quality_assessment_spark.operators.asof import asof_join, time_rollup

    ev = load_table(spark, "events", SF_DIR).withColumn("ts", F.expr("ts DIV 1000"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("pv")
    )
    asof = asof_join(clicks, buys, on=["user_id"], ts_col="ts")
    bad += audit("asof_join", asof)
    # count structural nodes on the simple plan string (formatted mode
    # separates node names from their arguments, breaking substring
    # counts)
    asof_plan = asof._jdf.queryExecution().executedPlan().toString()
    if asof_plan.count("Exchange hashpartitioning") != 1:
        bad.append("asof join != exactly one hash exchange")
    if "CartesianProduct" in asof_plan or "BroadcastNestedLoopJoin" in asof_plan:
        bad.append("asof join degenerated to product")

    # media decode: ONE Arrow pass, blobs never leave the executors
    # after the decode fans out. The single sanctioned Exchange is the
    # ensure_min_parallelism ROUND-ROBIN widen of an under-split local
    # input (operators/partitioning.py — a no-op branch at real split
    # counts); any hash/range exchange means content bytes are
    # shuffling through operator logic.
    from bigdata_quality_assessment_spark.operators.multimodal import decode_media

    media = docs.select(
        F.col("doc_id").alias("media_id"), F.encode("text", "UTF-8").alias("content")
    )
    dec = decode_media(media)
    bad += audit("decode_media", dec)
    dec_plan = dec._sc._jvm.PythonSQLUtils.explainString(
        dec._jdf.queryExecution(), "formatted"
    )
    lowered = dec_plan.lower()
    if (
        "hashpartitioning" in lowered
        or "rangepartitioning" in lowered
        or ("exchange" in lowered and "roundrobinpartitioning" not in lowered)
    ):
        bad.append("decode_media shuffles blobs")

    # near-dedup with cluster closure: the closure's single-partition
    # hop is sanctioned ONLY because it moves the duplicates-only edge
    # list (threshold-bounded in operators/graph.py), never documents
    from bigdata_quality_assessment_spark.operators.text import near_dedup_minhash

    nd = near_dedup_minhash(docs, k=3, n_hashes=32, bands=8, min_jaccard=0.7)
    bad += audit(
        "near_dedup_minhash_cluster", nd, allow=("Exchange SinglePartition",)
    )

    # incremental BM25 search (round-14): postings without df + delta-df
    # side frame; the only broadcasts are query-scoped, scoring is one
    # aggregation, the top-k window partitions on query_id (no
    # single-partition sort)
    from bigdata_quality_assessment_spark.operators.text import (
        bm25_index_delta,
        bm25_search,
        merge_bm25_stats,
    )

    p_a, d_a, s_a = bm25_index_delta(docs, n_buckets=8)
    qdf = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    inc = bm25_search(
        p_a, qdf, merge_bm25_stats(s_a), top_k=5, max_df_frac=0.5,
        df_frame=d_a,
    )
    bad += audit("bm25_inc_search", inc)

    # audio segment-tier dedup (round-14): peak-anchored segment
    # fingerprints through the slot-banded offset verify — one Arrow
    # decode pass, slim exchanges, closure hop sanctioned as above
    from bigdata_quality_assessment_spark.operators.audio import near_dedup_audio
    from bigdata_quality_assessment_spark.sources.audiogen import planted_audio

    aud = planted_audio(spark, 300, trim_rate=0.1, n_segments=4, seed=5)
    seg = near_dedup_audio(aud, seg_frames=2080, max_offset=1)
    bad += audit(
        "audio_segment_dedup", seg, allow=("Exchange SinglePartition",)
    )
    # rollup: Expand + single aggregation, no re-scan per level
    roll = time_rollup(ev.withColumn("ts", F.col("ts") * 1000), "ts", "value")
    roll_plan = roll._jdf.queryExecution().executedPlan().toString()
    print("\n=== time_rollup ===")
    one_scan = roll_plan.count("FileScan parquet") == 1 and "Expand" in roll_plan
    print(f"  single_scan_with_expand={one_scan}")
    if not one_scan:
        bad.append("rollup rescans per level")

    print("\n" + ("AUDIT FAIL: " + str(bad) if bad else "AUDIT CLEAN"))
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
