#!/usr/bin/env python
"""Phase-level timing for the active-sampling loop at bench config.

Replicates bench.py's `q_active_loop_3iter` but with per-phase timers
inside a copy of the loop body, to locate where wall-clock goes
(planning vs KDE vs explorer collect vs member fits). Mirrors the
fused loop shape: eager-checkpointed scored frame, one kde_1d_multi
tagged pass (pred/truth/pool), metrics crossJoined onto the explorer
union, one collect per iteration.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.loop import initial_selection
from bigdata_quality_assessment_spark.operators.density import (
    interp_uniform_grid,
    kde_1d_multi,
    log_pdf_error,
)
from bigdata_quality_assessment_spark.operators.models import (
    fit_poly_member,
    predict_ensemble_stats,
)
from bigdata_quality_assessment_spark.operators.score import (
    acquisition_us,
    acquisition_us_lw,
    regression_metrics,
)
from bigdata_quality_assessment_spark.session import build_session
from bigdata_quality_assessment_spark.sources.generators import grid_points_2d

spark = build_session(app_name="profile_loop")
spark.sparkContext.setLogLevel("ERROR")

T: dict[str, float] = {}


def tick(name: str, t0: float) -> float:
    t = time.perf_counter()
    T[name] = T.get(name, 0.0) + (t - t0)
    return t


t0 = time.perf_counter()
pts = grid_points_2d(spark, 100).cache()
pts.count()
t0 = tick("setup_points", t0)

init = initial_selection(pts, n_init=100, bw=0.1, ngrid=256, seed=42)
keep_cols = ["point_id", "x1", "x2", "y"]
train_rows = [tuple(r[c] for c in keep_cols) for r in init.select(*keep_cols).collect()]
t0 = tick("initial_selection", t0)

explorer_ids: set = set()
acq_list = ("se", "us", "us_lw")


def fit_members():
    X = np.array([t[1:3] for t in train_rows], dtype="float64")
    y = np.array([t[-1] for t in train_rows], dtype="float64")
    return [list(fit_poly_member(X, y, mid, seed=42)) for mid in range(2)]


thetas = fit_members()
t0 = tick("fit", t0)

from pyspark.sql import Observation


def _pad_bounds(mn, mx, pad=0.01):
    span = (mx - mn) if (mx - mn) > 0 else 1.0
    return (mn - pad * span, mx + pad * span)


for it in range(3):
    not_picked = ~F.col("point_id").isin(*explorer_ids) if explorer_ids else None
    obs = Observation()
    pool_col = (
        F.when(not_picked, F.col("y_mean")) if not_picked is not None
        else F.col("y_mean")
    )
    scored = (
        predict_ensemble_stats(
            pts, thetas, ["x1", "x2"], carry_cols=["x1", "x2", "y"]
        )
        .withColumn("se", (F.col("y_mean") - F.col("y")) * (F.col("y_mean") - F.col("y")))
        .observe(
            obs,
            F.least(F.min("y_mean"), F.min("y")).alias("jmn"),
            F.greatest(F.max("y_mean"), F.max("y")).alias("jmx"),
            F.min(pool_col).alias("pmn"), F.max(pool_col).alias("pmx"),
        )
        .localCheckpoint(eager=True)
    )
    ob = obs.get
    t0 = tick("materialize_scored", t0)

    joint = _pad_bounds(ob["jmn"], ob["jmx"])
    specs = [
        {"tag": "pred", "col": "y_mean", "bw": 0.1, "bounds": joint},
        {"tag": "truth", "col": "y", "bw": 0.1, "bounds": joint},
        {"tag": "pool", "col": "y_mean", "bw": 0.1, "where": not_picked,
         "bounds": _pad_bounds(ob["pmn"], ob["pmx"])},
    ]
    grids = kde_1d_multi(scored, specs, ngrid=256)
    pred_grid, truth_grid, pool_grid = grids["pred"], grids["truth"], grids["pool"]
    t0 = tick("plan_kde_multi", t0)

    metric_frame = regression_metrics(scored, "y_mean", "y", "y_var").crossJoin(
        log_pdf_error(pred_grid, truth_grid)
    )
    t0 = tick("plan_metrics", t0)

    candidates = scored.filter(not_picked) if explorer_ids else scored
    topk_frames = [
        candidates.orderBy(F.col("se").desc(), F.col("point_id").asc())
        .limit(3)
        .select(*keep_cols, F.col("se").alias("__score"), F.lit("se").alias("__explorer"))
    ]
    with_us = candidates.withColumn("acq", acquisition_us(candidates))
    topk_frames.append(
        with_us.orderBy(F.col("acq").desc(), F.col("point_id").asc())
        .limit(3)
        .select(*keep_cols, F.col("acq").alias("__score"), F.lit("us").alias("__explorer"))
    )
    with_fy = interp_uniform_grid(candidates, pool_grid, q_col="y_mean", out_col="pdf_y_mean")
    with_lw = with_fy.withColumn("acq", acquisition_us_lw(with_fy))
    topk_frames.append(
        with_lw.orderBy(F.col("acq").desc(), F.col("point_id").asc())
        .limit(3)
        .select(*keep_cols, F.col("acq").alias("__score"), F.lit("us_lw").alias("__explorer"))
    )
    union = topk_frames[0]
    for f in topk_frames[1:]:
        union = union.unionByName(f)
    t0 = tick("plan_explorers", t0)
    rows = union.crossJoin(F.broadcast(metric_frame)).collect()
    t0 = tick("fused_collect", t0)

    by_explorer: dict[str, list] = {}
    for r in rows:
        by_explorer.setdefault(r["__explorer"], []).append(r)
    taken: dict = {}
    for name in acq_list:
        ranked = sorted(by_explorer.get(name, ()), key=lambda r: (-r["__score"], r["point_id"]))
        for r in ranked:
            if r["point_id"] not in taken:
                taken[r["point_id"]] = r
                break
    train_rows.extend(tuple(r[c] for c in keep_cols) for r in taken.values())
    explorer_ids.update(taken)
    thetas = fit_members()
    t0 = tick("fit", t0)

print({k: round(v, 2) for k, v in T.items()}, "total", round(sum(T.values()), 2))
spark.stop()
