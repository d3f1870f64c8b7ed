#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship composites at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "headline_total", "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>}

Each query materializes its (small) result with a collect/count so the
measured time covers the full plan execution, not plan construction.

The printed line carries ONLY {metric, value, unit, queries, sf} — the
driver keeps just the tail of stdout, so the line must stay small. The
full record (query_stats, extras, extras_stats) is written to
``BENCH_DETAIL.json`` at the repo root on every run.

Steady-state protocol (round 6): every headline query runs THREE timed
passes and the reported per-query number is the MEDIAN; the JSON also
carries ``query_stats`` with {median, spread, n_runs} per query so a
single noisy pass is visible instead of silently becoming the record
(this container shows 5x run-to-run swings on identical plans under
noisy-neighbor steal — round 5's driver snapshot overstated the
steady-state by ~25% for exactly this reason). Pass 1 additionally
absorbs one-off JVM/codegen/Arrow-worker warmup; the median discards
it unless noise inverts the ordering. ``queries`` stays name→seconds
(now the median) so cross-round comparisons keep working. Extras track
scaling trends outside the headline and (round 7) use the same
median-of-n protocol, reported in ``extras_stats``; the structural
extras (20-iter loop sentinel, the 20-batch streaming-ingest-with-
compaction run) are single end-to-end measurements by design.

Steal-robust protocol (round 9): the shared-VM noise swung the
recorded headline 25.8→43.5 s across rounds on UNCHANGED plans, so a
single median can no longer adjudicate the 2× bar. Three additions:

- a fixed CALIBRATION job (pure CPU, no I/O, constant work: one
  whole-stage-codegen sum over ``spark.range`` — nothing this repo
  optimizes can change it) timed at bench start / mid / end; its
  median over the pinned quiet-host reference ``CAL_REF`` is the
  run's ``steal`` factor.
- best-of-N per query alongside the median (``query_stats[q]["best"]``
  and the compact line's ``best`` = sum of per-query bests): the best
  pass is the one least polluted by steal.
- per-query steal-NORMALIZED ratios vs the r3 operative baseline
  (``ratio_vs_r3`` in BENCH_DETAIL.json): median/steal vs the pinned
  r3 FINAL v2 numbers (r7 quiet-host for the queries added later), so
  plan regressions separate from host noise without ad-hoc reruns.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Quiet-host reference for the calibration job (seconds): measured
# round 9 on an idle window, local[32] — 5 steady-state samples
# 0.97/1.01/1.02/1.05/1.09 s. The job is constant work (768M-row
# codegen sin+cos sum, no I/O, no shuffle), so cal_median/CAL_REF is a
# direct estimate of how much slower THIS run's CPU was than the
# reference window — the steal factor.
CAL_REF = 1.0

# Operative per-query baseline for steal-normalized ratios: the r3
# FINAL v2 medians (BASELINE.md "Round-3 FINAL v2" table); the three
# queries added in round 4 (asof/time_rollup/session) use their r7
# quiet-host medians (BENCH_r07, the best serialized record of those
# unchanged plans). active_loop_3iter is the r3 FINAL v2 12.3 s.
R3_OPERATIVE = {
    "flagship_us_lw": 3.9,
    "ensemble_scoring": 2.3,
    "kde_events": 0.9,
    "histogram": 0.7,
    "topk": 0.4,
    "profile": 2.9,
    "sliding_windows": 0.9,
    "near_dedup_minhash": 5.9,
    "knn_cosine": 1.0,
    "asof_join": 0.43,
    "time_rollup": 0.27,
    "session_windows": 0.44,
    "active_loop_3iter": 12.3,
}


def _sf_label(path: str) -> float:
    try:
        return float(path.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        return -1.0


def main() -> None:
    from pyspark.sql import functions as F

    from bigdata_quality_assessment_spark.loop import active_sampling_loop
    from bigdata_quality_assessment_spark.operators.density import (
        histogram,
        interp_uniform_grid,
        kde_1d,
    )
    from bigdata_quality_assessment_spark.operators.models import (
        predict_ensemble_stats,
        train_ensemble,
    )
    from bigdata_quality_assessment_spark.operators.profiling import profile_table
    from bigdata_quality_assessment_spark.operators.score import (
        acquisition_us_lw,
        ensemble_stats,
        regression_metrics,
    )
    from bigdata_quality_assessment_spark.operators.select import argmax, top_k
    from bigdata_quality_assessment_spark.operators.similarity import knn_brute_force
    from bigdata_quality_assessment_spark.operators.text import near_dedup_minhash
    from bigdata_quality_assessment_spark.operators.windows import (
        horizon_abs_error,
        sliding_windows,
    )
    from bigdata_quality_assessment_spark.session import build_session
    from bigdata_quality_assessment_spark.sources.generators import (
        grid_points_2d,
        stub_predictions,
    )
    from bigdata_quality_assessment_spark.sources.tables import load_table

    spark = build_session(
        app_name="bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    # Silence executor WARN chatter (notably `WindowExec: No Partition
    # Defined` — each such window in this repo is a documented BOUNDED
    # frame: sampler prefix-sum offsets over n_parts rows, grid-sized
    # interp/latin-hypercube sorts — never a pool-sized partition; see
    # PLANS.md). Keeps the one-line JSON contract clean.
    spark.sparkContext.setLogLevel("ERROR")
    # Silence the known-benign `Ignoring ... non-existent accumulator`
    # DAGScheduler ERROR tail: pass-1 localCheckpoint RDDs are GC'd by
    # the ContextCleaner while pass-2 runs, and straggler task-end
    # updates for the cleaned accumulators then log at ERROR. rc and
    # timings are unaffected (the update is dropped by design), but the
    # spam buries real failures in the bench tail — turn that one
    # logger off, leaving every other ERROR visible.
    jvm = spark.sparkContext._jvm
    jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.scheduler.DAGScheduler",
        jvm.org.apache.logging.log4j.Level.FATAL,
    )

    def points(sf_dir: str):
        li = load_table(spark, "lineitem", sf_dir)
        return li.select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("point_id"),
            (F.col("l_quantity") / 50.0).alias("x1"),
            (F.col("l_discount") * 10.0).alias("x2"),
            F.log("l_extendedprice").alias("y"),
        )

    def q_flagship_us_lw():
        """M2(stub)→A5/A6→A11→J3→P15→T2 over the full lineitem pool.

        ``scored`` feeds THREE consumers — the KDE bounds aggregate,
        the KDE binning pass, and the interp query side — and each as
        a separate subtree re-executes the scan + model crossJoin +
        600k-key stats shuffle. A localCheckpoint makes it one
        execution read by all three (round-15; measured sf0.1
        3.19 s → 2.21 s median, same top-20 ids, grid pdf differs at
        1 ulp from partial-sum order). Round-16: the barrier is now
        EAGER — the round-15 LAZY barrier let the three consumers
        race the cold blocks inside the one collect job (per-partition
        cache semantics recompute what a concurrent reader finds
        unmaterialized), measured at sf10 as a 31.9–160 s spread on
        identical passes; eager vs lazy A/B read sf10 50.1 vs 67.8 s
        median and sf0.1 2.41 vs 2.66 s — one clean execution wins at
        both scales. (An earlier round measured ``.cache()`` here as
        2× slower than recompute; the checkpoint differs: it truncates
        lineage, so each consumer analyzes a two-node plan.)"""
        pts = points(SF_DIR)
        # carry point columns through the stats groupBy (F.first per
        # unique key) — one shuffle, no join-back exchange of the pool.
        scored = ensemble_stats(
            stub_predictions(pts, 2, carry_cols=["x1", "x2", "y"]),
            carry_cols=["x1", "x2", "y"],
        ).localCheckpoint(eager=True)
        grid = kde_1d(scored, "y_mean", bw=0.1, ngrid=256)
        with_fy = interp_uniform_grid(scored, grid, q_col="y_mean", out_col="pdf_y_mean")
        acq = with_fy.withColumn("acq", acquisition_us_lw(with_fy))
        return top_k(acq, "acq", 20).collect()

    def q_ensemble_scoring():
        """M1 train (poly ridge) + M2 mapInPandas inference over the full
        pool + A5/A6 reduction + A1-A3 metrics + T1 argmax."""
        pts = points(SF_DIR)
        train = pts.filter(F.col("point_id") % 997 == 0)
        thetas = train_ensemble(train, ["x1", "x2"], "y", n_models=2, seed=42)
        scored = predict_ensemble_stats(
            pts, thetas, ["x1", "x2"], carry_cols=["x1", "x2", "y"]
        ).withColumn(
            "se", (F.col("y_mean") - F.col("y")) * (F.col("y_mean") - F.col("y"))
        ).cache()
        # one Arrow inference pass, pinned by an explicit materialization;
        # metrics + argmax then fuse into a single job over the cache
        # (two separate actions would each re-run the 600k-row predict).
        scored.count()
        out = (
            regression_metrics(scored, "y_mean", "y", "y_var")
            .crossJoin(argmax(scored, "se"))
            .collect()
        )
        scored.unpersist()
        return out

    def q_kde_events():
        ev = load_table(spark, "events", SF_DIR)
        return kde_1d(ev, "value", bw=20.0, ngrid=1024, lo=0.0, hi=500.0).collect()

    def q_histogram():
        li = load_table(spark, "lineitem", SF_DIR)
        return histogram(li, "l_extendedprice", nbins=50).collect()

    def q_topk():
        li = load_table(spark, "lineitem", SF_DIR)
        li = li.withColumn("lid", F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        return top_k(li, "l_extendedprice", 100, id_col="lid").collect()

    def q_profile():
        li = load_table(spark, "lineitem", SF_DIR)
        return profile_table(
            li, ["l_quantity", "l_extendedprice", "l_discount", "l_returnflag", "l_shipdate"]
        ).collect()

    def q_sliding_windows():
        ev = load_table(spark, "events", SF_DIR)
        w = sliding_windows(
            ev, "event_id", "value", history=10, prediction=5, group_cols=["user_id"]
        )
        w = w.withColumn("pred", F.slice(F.col("history"), 6, 5))
        return horizon_abs_error(w, pred_col="pred").agg(F.avg("horizon_err")).collect()

    def q_near_dedup():
        docs = load_table(spark, "documents", SF_DIR)
        return near_dedup_minhash(docs, k=3, n_hashes=128, bands=16, min_jaccard=0.8).count()

    def q_knn():
        emb = load_table(spark, "embeddings", SF_DIR)
        q = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return knn_brute_force(emb, q, k=10).collect()

    def q_asof_join():
        """Point-in-time join: every click -> most recent prior purchase
        per user (union + last-ignorenulls window; ONE key exchange)."""
        from bigdata_quality_assessment_spark.operators.asof import asof_join

        ev = load_table(spark, "events", SF_DIR).withColumn("ts", F.expr("ts DIV 1000"))
        left = ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts", "value"
        )
        right = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", F.col("value").alias("purchase_value")
        )
        out = asof_join(left, right, on=["user_id"], ts_col="ts")
        return out.agg(
            F.count(F.lit(1)), F.sum("purchase_value"), F.max("ts_right")
        ).collect()

    def q_time_rollup():
        """Hour/day/total ROLLUP grouping sets in one shuffle."""
        from bigdata_quality_assessment_spark.operators.asof import time_rollup

        ev = load_table(spark, "events", SF_DIR)
        return time_rollup(ev, "ts", "value", levels=(86400, 3600)).collect()

    def q_session_windows():
        """Gap-merged session windows (SessionWindow aggregation; same
        physical operator batch and streaming — withWatermark is a
        batch no-op)."""
        from bigdata_quality_assessment_spark.streaming.aggregates import (
            session_metrics,
            with_event_time,
        )

        ev = with_event_time(load_table(spark, "events", SF_DIR))
        return session_metrics(ev, gap="6 hours").agg(
            F.count(F.lit(1)), F.sum("sum_value")
        ).collect()

    def q_active_loop_3iter():
        pts = grid_points_2d(spark, 100).cache()
        pts.count()
        res = active_sampling_loop(
            pts, ["x1", "x2"], n_iter=3, n_init=100, n_models=2, ngrid=256, bw=0.1
        )
        n = res.train.count()
        pts.unpersist()
        return n

    queries = {
        "flagship_us_lw": q_flagship_us_lw,
        "ensemble_scoring": q_ensemble_scoring,
        "kde_events": q_kde_events,
        "histogram": q_histogram,
        "topk": q_topk,
        "profile": q_profile,
        "sliding_windows": q_sliding_windows,
        "near_dedup_minhash": q_near_dedup,
        "knn_cosine": q_knn,
        "asof_join": q_asof_join,
        "time_rollup": q_time_rollup,
        "session_windows": q_session_windows,
        "active_loop_3iter": q_active_loop_3iter,
    }

    # isolated-probe mode (round-14, verdict ask #6): run ONLY the
    # named headline queries — same session, same calibration
    # brackets, same median-of-n + firm-up protocol — so a drifting
    # query can be adjudicated serialized without hand-copying its
    # body into a one-off script. Implies headline-only.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = {k.strip() for k in only.split(",") if k.strip()}
        unknown = keep - queries.keys()
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_BENCH_ONLY unknown: {sorted(unknown)}")
        queries = {k: v for k, v in queries.items() if k in keep}

    import statistics

    def calibrate() -> float:
        """Median-of-3 of the fixed pure-CPU job (see CAL_REF)."""
        xs = []
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(0, 768_000_000, 1, 32).selectExpr(
                "sum(sin(id * 1.0e-6) + cos(id * 1.0e-6)) as s"
            ).collect()
            xs.append(time.perf_counter() - t0)
        return statistics.median(xs)

    # one discarded pass absorbs the codegen warmup (~3 s first-ever run)
    calibrate()
    cal_samples = [calibrate()]

    # Arrow cold-vs-warm accounting (round-10 verdict ask #4): the
    # FIRST Arrow stage per python worker pays the pandas-import cold
    # start (~2-2.5 s/worker; PLANS.md round-8 measured 117.8 s
    # executor-time cold vs 18.9 s warm on a real query). Measure it
    # explicitly on a trivial mapInPandas probe — the delta is what a
    # reader subtracts from any first-Arrow-run sample — and running
    # it HERE keeps the headline loop warm, so the cold start no
    # longer hides inside the first Arrow headline query's first
    # sample (it used to be amortized by the median, but inflated
    # that query's recorded spread).
    def _arrow_probe() -> float:
        t0 = time.perf_counter()
        spark.range(0, 32, 1, 32).mapInPandas(
            lambda it: iter(it), "id long"
        ).count()
        return time.perf_counter() - t0

    arrow_cold = round(_arrow_probe(), 3)
    arrow_warm = round(min(_arrow_probe() for _ in range(3)), 3)

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    bests: dict[str, float] = {}
    stats: dict[str, dict[str, float]] = {}
    for name, fn in queries.items():
        # inter-query hygiene: drop any cross-query cached frames and
        # force a JVM GC so the ContextCleaner releases the PREVIOUS
        # query's localCheckpoint blocks — without this, a heavy
        # query's barrier blocks linger in the block manager and the
        # NEXT query pays its GC pressure (measured at sf1: knn_cosine
        # 29 s in-bench directly after the 46 s near-dedup vs 2-4 s
        # isolated; both best-of-2 runs were polluted)
        # round-16: the hygiene runs per SAMPLE, not just per query —
        # the protocol timed_extra always used. With the dedup/flagship
        # barriers now eager, each pass stores GB-scale checkpoint
        # blocks at sf10; without an inter-pass GC the ContextCleaner
        # has not yet released pass k's blocks while pass k+1 runs, and
        # the accumulated storage turned sf10 medians into noise
        # (near_dedup spread 156 s on identical plans). Timed region
        # unchanged — the GC runs strictly between passes.
        samples: list[float] = []
        for _ in range(n_runs):
            spark.catalog.clearCache()
            jvm.System.gc()
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        # adaptive firm-up (round 7; widened round 12 per verdict
        # "what's wrong" #2): a 3-run median whose spread exceeds
        # ~50% of the median is noise-dominated — the committed r11
        # flagship spread was 5.06 s on n_runs=3 because one polluted
        # pass becomes the recorded spread. Keep sampling (up to 7)
        # until the spread settles under the ratio or the cap hits,
        # for multi-second and sub-second queries alike.
        if n_runs == 3:
            while (
                len(samples) < 7
                and max(samples) - min(samples)
                > 0.5 * statistics.median(samples)
            ):
                spark.catalog.clearCache()
                jvm.System.gc()
                t0 = time.perf_counter()
                fn()
                samples.append(time.perf_counter() - t0)
        # sub-second firm-up (round 11, verdict "what's wrong" #2): a
        # sub-second median is dominated by fixed scheduling overhead,
        # where single steal spikes flipped the committed normalized
        # ratio past 1.2 two rounds running while closing serialized
        # runs read clean — extend to 7 samples so the recorded median
        # of exactly these queries stops crying wolf
        if n_runs == 3 and statistics.median(samples) < 1.0:
            while len(samples) < 7:
                spark.catalog.clearCache()
                jvm.System.gc()
                t0 = time.perf_counter()
                fn()
                samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)
        bests[name] = round(min(samples), 3)
        stats[name] = {
            "median": timings[name],
            "best": bests[name],
            "spread": round(max(samples) - min(samples), 3),
            "n_runs": len(samples),
        }

    # mid-run steal sample: headline queries just finished, extras next
    cal_samples.append(calibrate())

    # headline-only mode (round 12): replicates at big SFs want a
    # second headline sample without paying the ~20-min extras suite
    headline_only = (
        os.environ.get("SPARK_GRAFT_BENCH_HEADLINE_ONLY") == "1" or bool(only)
    )

    loop20 = 0.0
    extras: dict = {}
    extras_stats: dict = {}
    if not headline_only:
        # plan-depth regression sentinel (round-5): the 20-iteration loop
        # must stay flat per iteration (eager-checkpoint lineage cuts —
        # a growing plan shows up here as superlinear s/iter). Recorded
        # OUTSIDE the headline sum and run once (not best-of-2) so
        # headline_total stays comparable with pre-round-5 baselines.
        t0 = time.perf_counter()
        pts20 = grid_points_2d(spark, 100).cache()
        pts20.count()
        active_sampling_loop(
            pts20, ["x1", "x2"], n_iter=20, n_init=100, n_models=2, ngrid=256, bw=0.1
        ).train.count()
        pts20.unpersist()
        loop20 = time.perf_counter() - t0

        # round-5 continuation operators — recorded as extras (outside the
        # headline sum) so their scaling is tracked per-round. Extras get
        # the SAME inter-query hygiene as the headline loop: without it, a
        # heavy neighbor's lingering blocks inflate the next extra's run
        # (measured at sf1: decontaminate 63.8 s in-bench directly after
        # the 20-iter loop vs 16-18 s isolated). Round 7: extras now use
        # the SAME median-of-n protocol as the headline (round-6 verdict
        # ask #3) and report ``extras_stats`` {median, spread, n_runs} —
        # the 63.8-vs-17 artifact was a single polluted run becoming the
        # record; a median with a visible spread can't silently do that.
        extras_stats: dict[str, dict[str, float]] = {}

        def timed_extra(name, fn):
            samples: list[float] = []
            for _ in range(n_runs):
                spark.catalog.clearCache()
                jvm.System.gc()
                t0 = time.perf_counter()
                fn()
                samples.append(time.perf_counter() - t0)
            extras[name] = round(statistics.median(samples), 3)
            extras_stats[name] = {
                "median": extras[name],
                "best": round(min(samples), 3),
                "spread": round(max(samples) - min(samples), 3),
                "n_runs": n_runs,
            }

        from bigdata_quality_assessment_spark.operators.similarity import semantic_dedup
        from bigdata_quality_assessment_spark.operators.text import decontaminate
        from bigdata_quality_assessment_spark.pipeline import CurationConfig, curate

        extras: dict[str, float] = {}
        docs = load_table(spark, "documents", SF_DIR)
        bench_docs = docs.filter(F.col("doc_id") % 97 == 0)
        timed_extra("decontaminate",
                    lambda: decontaminate(docs, bench_docs, k=5).filter("contaminated").count())
        emb = load_table(spark, "embeddings", SF_DIR)
        timed_extra("semantic_dedup",
                    lambda: semantic_dedup(emb, dim=64, eps=0.03, n_centroids=16, keep="min_id").count())
        def run_curate():
            _clean, report = curate(
                docs, benchmark=bench_docs,
                config=CurationConfig(near_dedup=False, decon_k=5, quality_frac=0.3),
            )
            report.collect()

        timed_extra("curate_pipeline", run_curate)
        from bigdata_quality_assessment_spark.operators.bpe import (
            bpe_token_count,
            train_bpe,
        )
        from bigdata_quality_assessment_spark.operators.similarity import knn_quantized

        def run_bpe():
            merges = train_bpe(docs, n_merges=200, sample_n=2000)
            bpe_token_count(docs, merges).agg(F.sum("n_bpe_tokens")).collect()

        timed_extra("bpe_train_encode", run_bpe)
        q = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        timed_extra("knn_quantized", lambda: knn_quantized(emb, q, k=5).collect())

        from bigdata_quality_assessment_spark.operators.classifier import (
            classify_quality,
            distill_quality_classifier,
        )
        from bigdata_quality_assessment_spark.operators.similarity import knn_pq
        from bigdata_quality_assessment_spark.operators.text import (
            dedup_spans,
            ngram_lm_score,
        )

        timed_extra("ngram_lm_score",
                    lambda: ngram_lm_score(docs).agg(F.sum("n_lm_tokens")).collect())
        timed_extra("dedup_spans",
                    lambda: dedup_spans(docs, 5).agg(F.sum("n_spans_removed")).collect())
        from bigdata_quality_assessment_spark.operators.text import dedup_substrings

        timed_extra("dedup_substrings",
                    lambda: dedup_substrings(docs, 10).agg(F.sum("n_tokens_removed")).collect())
        def run_classifier():
            _model = distill_quality_classifier(docs, dim=256, n_train=2000)
            classify_quality(docs, _model).agg(F.sum("p_good")).collect()

        timed_extra("quality_classifier", run_classifier)
        timed_extra("knn_pq",
                    lambda: knn_pq(emb, q, dim=64, k=5, m=8, rescore_factor=8).collect())

        # round-7 (verdict ask #5): the ANN family was the only operator
        # family with no per-round scaling record — time both bucketed
        # tiers so sf0.1→sf1→sf10 ratios land in BASELINE.md beside the
        # dedup curves.
        from bigdata_quality_assessment_spark.operators.similarity import (
            ann_hyperplane_knn,
            ivf_knn,
            ivfpq_knn,
        )

        timed_extra("ann_hyperplane_knn",
                    lambda: ann_hyperplane_knn(
                        emb, q, dim=64, k=5, n_planes=12, n_tables=4, n_probes=4
                    ).collect())
        timed_extra("knn_ivf",
                    lambda: ivf_knn(
                        emb, q, dim=64, k=5, n_centroids=16, n_probe=4
                    ).collect())
        # round-8: the composed billion-vector tier (coarse cells +
        # residual PQ, ADC scoring) — cold index build + query
        timed_extra("knn_ivfpq",
                    lambda: ivfpq_knn(
                        emb, q, dim=64, k=5, n_centroids=16, n_probe=4, m=8,
                        rescore_factor=8,
                    ).collect())
        # round-8/9: the two-corpus-sided tiers. Round 11 (verdict "what's
        # wrong" #1): use the PRODUCTION configuration — planes scale with
        # the corpus (p = log2(|right|·tables/64), as tools/
        # bench_ann_scaling.py records) and max_bucket engages the skew
        # guard — instead of fixed 10 planes, which at the sf10 corpus
        # measured a quadratic candidate blowup no deployment would run
        # (871 s committed round 10 vs tens of seconds in the production
        # scaling record). The config is recorded alongside the timing.
        import math

        from bigdata_quality_assessment_spark.operators.similarity import (
            knn_join,
            knn_label,
        )

        n_vec = emb.count()
        jp = max(10, math.ceil(math.log2(max(n_vec // 2, 2) * 6 / 64)))
        extras["knn_join_config"] = f"n_planes={jp},n_tables=6,max_bucket=4096"
        timed_extra("knn_join",
                    lambda: knn_join(
                        emb.filter(F.col("vec_id") % 2 == 0),
                        emb.filter(F.col("vec_id") % 2 == 1),
                        dim=64, k=3, n_planes=jp, n_tables=6, max_bucket=4096,
                    ).count())
        timed_extra("knn_label",
                    lambda: knn_label(
                        emb.filter(F.col("vec_id") % 2 == 0),
                        emb.filter(F.col("vec_id") % 2 == 1).select(
                            "vec_id", "embedding", "label"
                        ),
                        dim=64, k=3, n_planes=jp, n_tables=6, max_bucket=4096,
                    ).count())

        # round-11 (verdict ask #1, second half): the near-dedup headline
        # runs on the driver's 30-word-vocabulary documents — the
        # adversarial chance-collision regime. Time the SAME production
        # operator on the realistic textgen corpus at the SF-matched doc
        # count (5k docs ≈ sf0.1's documents table), cached under
        # .localdata/rtext like tools/bench_rtext_scaling.py, so the
        # per-round record carries both regimes side by side.
        from bigdata_quality_assessment_spark.sources.textgen import (
            realistic_documents,
        )

        sf_val = _sf_label(SF_DIR)
        n_rtext = max(5_000, int(50_000 * sf_val)) if sf_val > 0 else 5_000
        rt_path = REPO / ".localdata" / "rtext" / str(n_rtext) / "documents.parquet"
        if not rt_path.exists():
            realistic_documents(spark, n_rtext, seed=7).write.mode(
                "overwrite"
            ).parquet(str(rt_path))
        rtext_docs = spark.read.parquet(str(rt_path))
        extras["near_dedup_rtext_n_docs"] = n_rtext
        timed_extra("near_dedup_rtext",
                    lambda: near_dedup_minhash(
                        rtext_docs, k=3, n_hashes=128, bands=16, min_jaccard=0.8
                    ).count())

        # round-12: per-round records for the two new retrieval/multimodal
        # tiers. BM25 scored retrieval on the SAME realistic corpus (the
        # retrieval-decontamination shape: query set = corpus subset, one
        # shared tf scan); perceptual image dedup on an SF-matched planted
        # block-mosaic corpus (decode → dHash → banded Hamming dedup),
        # cached under .localdata/images like the rtext corpus.
        from bigdata_quality_assessment_spark.operators.phash import (
            near_dedup_images,
        )
        from bigdata_quality_assessment_spark.operators.text import bm25_retrieve
        from bigdata_quality_assessment_spark.sources.imagegen import (
            planted_images,
        )

        # query count held ~30 as the corpus scales (a benchmark suite is
        # fixed-size, the corpus is not) and high-df stopword terms pruned
        # — without the df guard every query matches nearly every doc and
        # the score join turns quadratic at sf10's 500k-doc corpus
        q_mod = max(167, n_rtext // 30)
        extras["bm25_rtext_query_mod"] = q_mod
        timed_extra("bm25_rtext",
                    lambda: bm25_retrieve(
                        rtext_docs, top_k=10,
                        query_filter=(F.col("doc_id") % q_mod) == 0,
                        max_df_frac=0.1,
                    ).count())

        # round-13: the PREBUILT-index path on the same corpus + query
        # workload — repeat-query cost vs bm25_rtext's per-call corpus
        # recompute. The index builds once per corpus size (cached
        # bucket-partitioned under .localdata, stats json beside it);
        # the timed part is the warm search: bucket-pruned scan +
        # broadcast query terms + one aggregation.
        from bigdata_quality_assessment_spark.operators.text import (
            bm25_search,
            build_bm25_index,
        )

        idx_path = REPO / ".localdata" / "bm25idx" / str(n_rtext)
        if not (idx_path / "stats.json").exists():
            t0 = time.perf_counter()
            postings, bstats = build_bm25_index(rtext_docs, n_buckets=64)
            postings.write.mode("overwrite").partitionBy("__bucket").parquet(
                str(idx_path / "postings")
            )
            extras["bm25_idx_build"] = round(time.perf_counter() - t0, 3)
            (idx_path / "stats.json").write_text(json.dumps(bstats))
        bidx = spark.read.parquet(str(idx_path / "postings"))
        bstats = json.loads((idx_path / "stats.json").read_text())
        bq = rtext_docs.filter((F.col("doc_id") % q_mod) == 0).select(
            F.col("doc_id").alias("query_id"), "text"
        )
        timed_extra("bm25_idx_search",
                    lambda: bm25_search(
                        bidx, bq, bstats, top_k=10, max_df_frac=0.1,
                    ).count())

        # round-14 (verdict ask #5): incremental index maintenance —
        # append a 1k-doc batch to the persisted incremental layout vs
        # the full-rebuild cost the denormalized layout forces, then
        # search through the delta-df path. Built fresh each run into a
        # scratch dir (appends mutate it); the base build once per
        # corpus, cached.
        import shutil as _shutil

        from bigdata_quality_assessment_spark.operators.text import (
            append_bm25_index,
            bm25_search as _bm25_search_inc,
            open_bm25_index,
        )
        from bigdata_quality_assessment_spark.sources.textgen import (
            realistic_documents,
        )

        inc_base = REPO / ".localdata" / "bm25inc2" / str(n_rtext)
        if not (inc_base / "stats.json").exists():
            t0 = time.perf_counter()
            append_bm25_index(rtext_docs, str(inc_base), n_buckets=64)
            extras["bm25_inc_build"] = round(time.perf_counter() - t0, 3)
        inc_run = REPO / ".localdata" / "bm25inc2" / f"{n_rtext}_run"
        _shutil.rmtree(inc_run, ignore_errors=True)
        _shutil.copytree(inc_base, inc_run)
        batch = realistic_documents(spark, 1_000, seed=11).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
        )
        t0 = time.perf_counter()
        append_bm25_index(batch, str(inc_run))
        extras["bm25_inc_append_1k"] = round(time.perf_counter() - t0, 3)
        ip, idf_frame, istats, itombs = open_bm25_index(spark, str(inc_run))
        t0 = time.perf_counter()
        _bm25_search_inc(
            ip, bq, istats, top_k=10, max_df_frac=0.1, df_frame=idf_frame,
            tombstones=itombs,
        ).count()
        extras["bm25_inc_search"] = round(time.perf_counter() - t0, 3)
        # round-16 (VERDICT r15 ask #7): the opened-handle amortized
        # path — materialize folds + stores the df deltas once per
        # handle; the repeat search is the steady-state per-query
        # cost, to be read against bm25_idx_search (denormalized
        # parity is the target; scores are pytest-pinned identical)
        t0 = time.perf_counter()
        ipm, idfm, istatsm, itombsm = open_bm25_index(
            spark, str(inc_run), materialize=True
        )
        extras["bm25_inc_open_materialize"] = round(
            time.perf_counter() - t0, 3
        )
        _reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            _bm25_search_inc(
                ipm, bq, istatsm, top_k=10, max_df_frac=0.1,
                df_frame=idfm, tombstones=itombsm,
            ).count()
            _reps.append(time.perf_counter() - t0)
        extras["bm25_inc_search_repeat"] = round(statistics.median(_reps), 3)
        # deletion leg (round-14): remove a 1k-doc slice, search with
        # the tombstone anti-join — both O(batch)/query-scoped, so the
        # two numbers must stay flat as the corpus scales
        from bigdata_quality_assessment_spark.operators.text import (
            delete_bm25_docs,
        )

        del_docs = rtext_docs.filter(
            (F.col("doc_id") % max(2, n_rtext // 1_000)) == 1
        ).select("doc_id", "text")  # ~1k docs at any corpus size
        t0 = time.perf_counter()
        delete_bm25_docs(del_docs, str(inc_run))
        extras["bm25_inc_delete"] = round(time.perf_counter() - t0, 3)
        ip2, idf2, istats2, itombs2 = open_bm25_index(spark, str(inc_run))
        t0 = time.perf_counter()
        _bm25_search_inc(
            ip2, bq, istats2, top_k=10, max_df_frac=0.1, df_frame=idf2,
            tombstones=itombs2,
        ).count()
        extras["bm25_inc_search_postdelete"] = round(
            time.perf_counter() - t0, 3
        )
        _shutil.rmtree(inc_run, ignore_errors=True)
        n_img = max(20_000, int(200_000 * sf_val)) if sf_val > 0 else 20_000
        img_path = REPO / ".localdata" / "images" / str(n_img) / "media.parquet"
        if not img_path.exists():
            planted_images(spark, n_img, seed=7).write.mode(
                "overwrite"
            ).parquet(str(img_path))
        img_media = spark.read.parquet(str(img_path))
        extras["image_dedup_n_images"] = n_img
        # two-level banding is the >=1M-signature regime (identical
        # survivors, ~2^12x fewer band candidates — BASELINE round-13);
        # below that the 4x explode rows cost more than they save
        img_two = n_img >= 1_000_000
        extras["image_dedup_two_level"] = img_two
        timed_extra("image_dedup",
                    lambda: near_dedup_images(
                        img_media, max_hamming=3, two_level=img_two
                    ).count())

        # round-13 (verdict ask #6): video-level perceptual dedup as a
        # per-run extra so regressions surface in BENCH_DETAIL — the
        # SF-matched planted-animation corpus (3-frame patterned GIFs:
        # byte dups, palette-rebright perceptual dups, one-frame recuts),
        # frame decode → per-frame dHash → frame-aligned banded dedup.
        from bigdata_quality_assessment_spark.operators.phash import (
            near_dedup_videos,
        )
        from bigdata_quality_assessment_spark.sources.videogen import (
            planted_videos,
        )

        n_vid = max(10_000, int(100_000 * sf_val)) if sf_val > 0 else 10_000
        vid_path = REPO / ".localdata" / "videos" / str(n_vid) / "media.parquet"
        if not vid_path.exists():
            planted_videos(spark, n_vid, seed=7).write.mode(
                "overwrite"
            ).parquet(str(vid_path))
        vid_media = spark.read.parquet(str(vid_path))
        extras["video_dedup_n_videos"] = n_vid
        # two_level="auto" (the round-14 operator default) engages the
        # nested banding at >=1M videos — record which regime this SF got
        extras["video_dedup_two_level"] = n_vid >= 1_000_000
        timed_extra("video_dedup",
                    lambda: near_dedup_videos(vid_media, n_frames=3).count())
        # decode-vs-band split (round-14, verdict ask #2): time the GIF
        # frame-decode pass alone, then band/verify/closure over the
        # pre-materialized frame hashes — single-run each, they sum to
        # ~video_dedup and localize which side a regression lives on
        from bigdata_quality_assessment_spark.operators.phash import (
            frame_phash,
        )

        spark.catalog.clearCache()
        t0 = time.perf_counter()
        vid_fh = frame_phash(vid_media, 3).localCheckpoint(eager=False)
        vid_fh.count()
        extras["video_dedup_decode"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        near_dedup_videos(vid_media, n_frames=3, frame_hashes=vid_fh).count()
        extras["video_dedup_band"] = round(time.perf_counter() - t0, 3)

        # round-13: audio perceptual dedup as a per-run extra — the
        # SF-matched planted-audio corpus (square-wave energy envelopes:
        # byte dups + gain-scaled perceptual dups), WAV PCM decode →
        # energy fingerprint → banded dedup.
        from bigdata_quality_assessment_spark.operators.audio import (
            near_dedup_audio,
        )
        from bigdata_quality_assessment_spark.sources.audiogen import (
            planted_audio,
        )

        n_aud = max(20_000, int(200_000 * sf_val)) if sf_val > 0 else 20_000
        aud_path = REPO / ".localdata" / "audio" / str(n_aud) / "media.parquet"
        if not aud_path.exists():
            planted_audio(spark, n_aud, seed=7).write.mode(
                "overwrite"
            ).parquet(str(aud_path))
        aud_media = spark.read.parquet(str(aud_path))
        extras["audio_dedup_n_clips"] = n_aud
        aud_two = n_aud >= 1_000_000
        extras["audio_dedup_two_level"] = aud_two
        timed_extra("audio_dedup",
                    lambda: near_dedup_audio(
                        aud_media, two_level=aud_two
                    ).count())
        # round-15: the DEFAULT audio curation path (trim-robust
        # segment tier, seg_frames auto-derived) — the BASELINE row
        # for what a pipeline user gets without opting into anything.
        # Measured on the EXTENDED planted corpus (n_segments=4 +
        # planted trims — the segment tier's design regime and the
        # corpus family the graded atrim part uses): on the 1-segment
        # corpus above, auto seg_frames (p10/4) puts 8-frame energy
        # windows under the generator's 32-frame constant plateaus,
        # and the resulting low-entropy fingerprints measured a
        # band-bucket candidate blowup (one (slot, band) key held
        # 1,378 of 60k segments) plus wholesale false merges — a
        # degenerate-input artifact, not the default path's cost
        # (OPTIMIZATION_r15.md, audio_curate_default).
        from bigdata_quality_assessment_spark.pipeline import curate_audio
        from bigdata_quality_assessment_spark.sources.audiogen import (
            planted_audio,
        )

        n_aud_ext = max(5_000, int(50_000 * sf_val)) if sf_val > 0 else 5_000
        aud_ext_path = (
            REPO / ".localdata" / "audio_ext" / str(n_aud_ext) / "media.parquet"
        )
        # generator-params sidecar (round-16, ADVICE r15): the cache
        # path is keyed by clip count only, so a seed/trim/segment
        # change would silently reuse a stale corpus — pin the params
        # beside the parquet and regenerate on mismatch
        aud_ext_params = {"seed": 7, "trim_rate": 0.05, "n_segments": 4}
        aud_ext_sidecar = aud_ext_path.parent / "params.json"
        stale = (
            not aud_ext_sidecar.exists()
            or json.loads(aud_ext_sidecar.read_text()) != aud_ext_params
        )
        if not aud_ext_path.exists() or stale:
            planted_audio(
                spark, n_aud_ext, **aud_ext_params
            ).write.mode("overwrite").parquet(str(aud_ext_path))
            aud_ext_sidecar.write_text(json.dumps(aud_ext_params))
        extras["audio_curate_corpus_params"] = json.dumps(aud_ext_params)
        aud_ext = spark.read.parquet(str(aud_ext_path))
        extras["audio_curate_n_clips"] = n_aud_ext
        timed_extra("audio_curate_default",
                    lambda: curate_audio(
                        aud_ext, with_report=False
                    )[0].count())

        # streaming-ingest state evidence (round 6: per-batch flatness;
        # round 7, verdict ask #7: compaction). 20 equal batches in two
        # availableNow drains with a compact_ingest_state pass between —
        # per-batch fold time must stay O(batch) across the whole run, the
        # compaction must reset the state FILE COUNT (the one cost that
        # grows with history length, not state size), and post-compaction
        # per-batch time must not exceed pre-compaction.
        import shutil
        import tempfile

        from bigdata_quality_assessment_spark.streaming.ingest import (
            compact_ingest_state,
            init_ingest_store,
            streaming_ingest_curated,
        )

        def _state_files(root: str) -> tuple[int, int]:
            n = b = 0
            for dirpath, _dirs, files in os.walk(root):
                for f in files:
                    if f.endswith(".parquet"):
                        n += 1
                        b += os.path.getsize(os.path.join(dirpath, f))
            return n, b

        def _drain(batch_ids, stage, store, ck, bm25=None):
            base = docs.select("doc_id", "text")
            for b in batch_ids:
                base.filter(F.col("doc_id") % 20 == b).coalesce(1).write.mode(
                    "overwrite"
                ).parquet(os.path.join(stage, f"b{b}"))
            stream = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(os.path.join(stage, "*"))
            )
            qi = streaming_ingest_curated(
                stream, store, checkpoint=ck, bm25_index_path=bm25
            )
            qi.awaitTermination()
            prog = [p for p in qi.recentProgress if p.get("numInputRows", 0) > 0]
            return [p["durationMs"]["triggerExecution"] / 1000.0 for p in prog]

        ing_root = tempfile.mkdtemp(prefix="bench_ingest_")
        try:
            store = os.path.join(ing_root, "store")
            stage = os.path.join(ing_root, "arrivals")
            ck = os.path.join(ing_root, "ck")
            init_ingest_store(spark, store)
            t0 = time.perf_counter()
            durs_a = _drain(range(10), stage, store, ck)
            files_pre, bytes_pre = _state_files(store)
            compact_ingest_state(spark, store)
            files_post, bytes_post = _state_files(store)
            # same checkpoint: availableNow resumes and drains ONLY the 10
            # newly staged files against the compacted store
            durs_b = _drain(range(10, 20), stage, store, ck)
            extras["ingest_20batch_total"] = round(time.perf_counter() - t0, 3)
            if len(durs_a) >= 3 and len(durs_b) >= 3:
                extras["ingest_batch_first3_mean"] = round(sum(durs_a[:3]) / 3, 3)
                extras["ingest_batch_last3_mean"] = round(sum(durs_b[-3:]) / 3, 3)
                extras["ingest_batch_precompact_mean"] = round(
                    sum(durs_a[-3:]) / 3, 3
                )
                # durs_b[0] carries the second drain's query-start overhead
                # (stream + checkpoint re-init), not per-batch fold cost —
                # skip it so the pre/post comparison is steady-state both sides
                extras["ingest_batch_postcompact_mean"] = round(
                    sum(durs_b[1:4]) / 3, 3
                )
            extras["ingest_state_files_precompact"] = files_pre
            extras["ingest_state_files_postcompact"] = files_post
            extras["ingest_state_mb_precompact"] = round(bytes_pre / 1e6, 3)
            extras["ingest_state_mb_postcompact"] = round(bytes_post / 1e6, 3)
            # round-15: the BM25-lockstep tier (VERDICT r14 Missing
            # #2b) — a 10-batch drain that also maintains the
            # incremental BM25 index per batch; per-batch time must
            # stay flat (append is O(batch)), and the marginal cost vs
            # the plain drain above is the price of a continuously
            # searchable curated corpus
            store2 = os.path.join(ing_root, "store_bm25")
            ck2 = os.path.join(ing_root, "ck_bm25")
            idx2 = os.path.join(ing_root, "bm25idx")
            init_ingest_store(spark, store2)
            t0 = time.perf_counter()
            durs_c = _drain(range(10), stage, store2, ck2, bm25=idx2)
            extras["ingest_bm25_10batch_total"] = round(
                time.perf_counter() - t0, 3
            )
            if len(durs_c) >= 6:
                extras["ingest_bm25_batch_first3_mean"] = round(
                    sum(durs_c[:3]) / 3, 3
                )
                extras["ingest_bm25_batch_last3_mean"] = round(
                    sum(durs_c[-3:]) / 3, 3
                )
        finally:
            shutil.rmtree(ing_root, ignore_errors=True)

    # end-of-run steal sample, then the factor for this whole run
    cal_samples.append(calibrate())
    cal_median = round(statistics.median(cal_samples), 3)
    steal = round(cal_median / CAL_REF, 3)
    # steal-normalized per-query ratios vs the operative baseline:
    # (median / steal) / r3 — >1 means slower than r3 AFTER removing
    # this run's measured CPU-steal factor, i.e. a real plan delta
    ratios = {
        q: round((timings[q] / steal) / R3_OPERATIVE[q], 2)
        for q in timings
        if q in R3_OPERATIVE
    }

    spark.stop()
    # The driver records only the LAST ~2000 characters of stdout and
    # parses the headline JSON out of that window — round 7's line grew
    # past it (extras + extras_stats pushed it over) and the record
    # landed unparseable. Keep the final line COMPACT (headline +
    # per-query medians only; ~450 chars at 13 queries) and spill the
    # full stats/extras payload to BENCH_DETAIL.json beside this script
    # so nothing is lost — BASELINE.md points the reader there.
    detail = {
        "metric": "headline_total",
        "value": round(sum(timings.values()), 3),
        "value_best": round(sum(bests.values()), 3),
        "unit": "sec",
        "calibration": {
            "samples": [round(x, 3) for x in cal_samples],
            "median": cal_median,
            "ref": CAL_REF,
            "steal": steal,
        },
        "queries": timings,
        "queries_best": bests,
        "query_stats": stats,
        "ratio_vs_r3_steal_normalized": ratios,
        "arrow_cold_start": {
            "cold": arrow_cold,
            "warm": arrow_warm,
            "delta": round(arrow_cold - arrow_warm, 3),
        },
        "extras": (
            {
                "active_loop_20iter": round(loop20, 3),
                "active_loop_20iter_s_per_iter": round(loop20 / 20, 3),
                **extras,
            }
            if not headline_only
            else {}
        ),
        "extras_stats": extras_stats,
        "sf": _sf_label(SF_DIR),
    }
    with open(REPO / "BENCH_DETAIL.json", "w") as f:
        json.dump(detail, f, indent=1)
    compact = {
        "metric": "headline_total",
        "value": detail["value"],
        "best": detail["value_best"],
        "calibration": cal_median,
        "steal": steal,
        "unit": "sec",
        "queries": timings,
        "sf": detail["sf"],
        "detail": "BENCH_DETAIL.json",
    }
    line = json.dumps(compact)
    if len(line) > 1600:  # belt-and-braces: never outgrow the tail again
        compact.pop("queries")
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()
