"""Sequence operators: sliding-window featurization, min-max scaling,
per-window horizon error.

Covers SURVEY.md §2.7 W1/W3, §2.2 P11, §2.4 A4.

Scale notes:
  * windows partition by series key (``trajectory_id`` / ``user_id``)
    — fully parallel across series, which is the axis that grows at
    100 TB (many series), not within-series length. A single
    unpartitioned series falls back to one task by necessity; callers
    with one huge series should segment it first (overlap = history+
    prediction−1 rows per boundary).
  * min-max scaling broadcasts the two-row aggregate back over the
    data — no collect, no second scan of the raw table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def minmax_scale(
    df: DataFrame,
    col: str,
    out_col: str | None = None,
    group_cols: list[str] | None = None,
    feature_range: tuple[float, float] = (0.0, 1.0),
) -> DataFrame:
    """P11: sklearn-``MinMaxScaler`` semantics — ``(y−min)/(max−min)``
    mapped onto ``feature_range`` (SDE_forecast_ActiveSampling.py:50-54).
    Grouped variant scales each series independently."""
    out_col = out_col or f"{col}_scaled"
    a, b = feature_range
    if group_cols:
        agg = df.groupBy(*group_cols).agg(F.min(col).alias("__mn"), F.max(col).alias("__mx"))
        src = df.join(F.broadcast(agg), group_cols)
    else:
        agg = df.agg(F.min(col).alias("__mn"), F.max(col).alias("__mx"))
        src = df.crossJoin(F.broadcast(agg))
    span = F.col("__mx") - F.col("__mn")
    unit = F.when(span > 0, (F.col(col) - F.col("__mn")) / span).otherwise(F.lit(0.0))
    return src.withColumn(out_col, unit * (b - a) + F.lit(a)).drop("__mn", "__mx")


def sliding_windows(
    df: DataFrame,
    order_col: str,
    value_col: str,
    history: int = 10,
    prediction: int = 5,
    horizon: int = 0,
    stride: int = 1,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """W1: stride-``stride`` sliding windows — ``history`` past values
    as the input array, the ``prediction`` values after a ``horizon``
    gap as the target array (SDE_forecast_ActiveSampling.py:57-71).

    ``window_id`` is the starting ``order_col`` value. Incomplete
    trailing windows are dropped (size filters), matching the
    reference's loop bound ``len − history − prediction − horizon + 1``.
    """
    part = group_cols or []
    w_hist = Window.partitionBy(*part).orderBy(order_col).rowsBetween(0, history - 1)
    w_tgt = (
        Window.partitionBy(*part)
        .orderBy(order_col)
        .rowsBetween(history + horizon, history + horizon + prediction - 1)
    )
    out = (
        df.select(
            *part,
            F.col(order_col).alias("window_id"),
            F.collect_list(value_col).over(w_hist).alias("history"),
            F.collect_list(value_col).over(w_tgt).alias("target"),
        )
        .filter((F.size("history") == history) & (F.size("target") == prediction))
    )
    if stride > 1:
        # window_id is the starting step; the reference strides the
        # loop index, equivalent to taking every stride-th start.
        rn = Window.partitionBy(*part).orderBy("window_id")
        out = (
            out.withColumn("__rn", F.row_number().over(rn) - 1)
            .filter(F.col("__rn") % stride == 0)
            .drop("__rn")
        )
    return out


def horizon_abs_error(
    windows: DataFrame,
    pred_col: str = "pred",
    target_col: str = "target",
    out_col: str = "horizon_err",
) -> DataFrame:
    """A4: per-window summed absolute error across the prediction
    horizon — ``Σ |ŷᵢ − yᵢ|`` over two array columns, as a JVM-side
    fold (np.sum(abs(...), axis=1), SDE_forecast_ActiveSampling.py:220)."""
    err = F.aggregate(
        F.zip_with(F.col(pred_col), F.col(target_col), lambda a, b: F.abs(a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return windows.withColumn(out_col, err)


def concat_history_target(
    windows: DataFrame, out_col: str = "joint"
) -> DataFrame:
    """U2: column concatenation ``hstack((X_hist, Y_pred))`` → the
    joint matrix fed to POD (SDE_forecast_ActiveSampling.py:92)."""
    return windows.withColumn(out_col, F.concat(F.col("history"), F.col("target")))
