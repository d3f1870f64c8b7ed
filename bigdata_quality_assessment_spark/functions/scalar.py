"""Scalar projections P1, P7-P10, P13 (SURVEY.md §2.2).

Every function maps Columns → Column with built-in ``pyspark.sql
.functions`` only, so Catalyst constant-folds the literals and the
whole expression compiles into whole-stage codegen — the 100 TB hot
path never leaves the JVM.

Reference citations (files under /root/reference/):
  * P1  affine rescale      core/inputs.py:73-79
  * P7  squared error       BigDataQualityAssessment_ActiveSampling.py:112,187,224
  * P8  absolute error      SDE_forecast_ActiveSampling.py:191,216,220
  * P9  log with floor clip BigDataQualityAssessment_ActiveSampling.py:212-214
  * P10 finite predicate    BigDataQualityAssessment_ActiveSampling.py:217
  * P13 non-negativity      SDE_forecast_ActiveSampling.py:77,141
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def affine_rescale(col: Column | str, lo: float, hi: float) -> Column:
    """P1: map a ``[0,1]`` value onto ``[lo, hi]``."""
    return _c(col) * (hi - lo) + F.lit(lo)


def squared_error(pred: Column | str, truth: Column | str) -> Column:
    """P7: ``(ŷ − y)²``. Written as a product (single correctly-rounded
    multiply) rather than ``pow(x, 2)`` so the result is bit-identical
    across engines — libm ``pow`` is not guaranteed correctly rounded."""
    diff = _c(pred) - _c(truth)
    return diff * diff


def abs_error(pred: Column | str, truth: Column | str) -> Column:
    """P8: ``|ŷ − y|``."""
    return F.abs(_c(pred) - _c(truth))


def log_clip(col: Column | str, floor: float = -6.0) -> Column:
    """P9: ``max(log(p), floor)`` — densities floored at e^floor
    before log-space comparison."""
    return F.greatest(F.log(_c(col)), F.lit(floor))


def finite(col: Column | str) -> Column:
    """P10: predicate — true iff the value is finite (not NaN/±Inf/null)."""
    c = _c(col)
    return c.isNotNull() & ~F.isnan(c) & (c != F.lit(float("inf"))) & (c != F.lit(float("-inf")))


def clamp_nonneg(col: Column | str) -> Column:
    """P13: ``p·(p ≥ 0)`` — clamp negatives (interp overshoot) to zero."""
    return F.greatest(_c(col), F.lit(0.0))
