"""As-of join + time rollup: pandas-merge_asof parity, tolerance,
session windows, and the single-exchange plan contract."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.operators.asof import asof_join, time_rollup


@pytest.fixture(scope="module")
def frames(spark):
    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 200),
            "ts": rng.integers(0, 10_000, 200),
            "lval": rng.normal(size=200).round(3),
        }
    )
    right = (
        pd.DataFrame(
            {
                "k": rng.integers(0, 5, 80),
                "ts": rng.integers(0, 10_000, 80),
                "rval": rng.normal(size=80).round(3),
            }
        )
        .drop_duplicates(["k", "ts"])
        .reset_index(drop=True)
    )
    return left, right


def test_asof_join_matches_pandas_merge_asof(spark, frames):
    left, right = frames
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on=["k"],
            ts_col="ts",
        )
        .toPandas()
        .sort_values(["k", "ts", "lval"])
        .reset_index(drop=True)
    )
    expect = (
        pd.merge_asof(
            left.sort_values("ts"),
            right.sort_values("ts"),
            on="ts",
            by="k",
            direction="backward",
            suffixes=("", "_right"),
        )
        .rename(columns={"ts_right": "__unused"})
        .sort_values(["k", "ts", "lval"])
        .reset_index(drop=True)
    )
    assert len(got) == len(left)
    assert np.allclose(
        got["rval"].fillna(-999), expect["rval"].fillna(-999), atol=1e-12
    )


def test_asof_join_inclusive_and_ts_right(spark, frames):
    left = spark.createDataFrame([(1, 100, "a")], "k INT, ts INT, lval STRING")
    right = spark.createDataFrame(
        [(1, 100, 1.0), (1, 99, 2.0), (1, 101, 3.0)], "k INT, ts INT, rval DOUBLE"
    )
    row = asof_join(left, right, on=["k"], ts_col="ts").collect()[0]
    assert row["rval"] == 1.0  # inclusive <=: the ts=100 right row wins
    assert row["ts_right"] == 100


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([(1, 1000, "x"), (1, 50, "y")], "k INT, ts INT, lval STRING")
    right = spark.createDataFrame([(1, 10, 7.0)], "k INT, ts INT, rval DOUBLE")
    out = {
        r["lval"]: r["rval"]
        for r in asof_join(left, right, on=["k"], ts_col="ts", tolerance=100).collect()
    }
    assert out["y"] == 7.0  # within 100 ticks
    assert out["x"] is None  # match exists but stale -> nulled


def test_asof_join_single_exchange_plan(spark, frames):
    left, right = frames
    out = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right), on=["k"], ts_col="ts"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one hash exchange on the key (plus nothing range-shaped / nested-loop)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_time_rollup_levels_consistent(spark):
    rng = np.random.default_rng(3)
    n = 500
    ts = (1_700_000_000 + rng.integers(0, 5 * 86400, n)) * 1_000_000_000
    df = spark.createDataFrame(
        pd.DataFrame({"ts": ts, "v": rng.normal(size=n)})
    )
    out = time_rollup(df, "ts", "v", levels=(86400, 3600)).toPandas()
    finest = out[(out.bucket_86400s != -1) & (out.bucket_3600s != -1)]
    days = out[(out.bucket_86400s != -1) & (out.bucket_3600s == -1)]
    total = out[(out.bucket_86400s == -1) & (out.bucket_3600s == -1)]
    assert len(total) == 1 and total.n.iloc[0] == n
    assert finest.n.sum() == n and days.n.sum() == n
    # day subtotal == sum of its hours
    per_day = finest.groupby("bucket_86400s").n.sum()
    for d, cnt in per_day.items():
        assert days[days.bucket_86400s == d].n.iloc[0] == cnt
    # hour buckets nest inside their day bucket
    assert ((finest.bucket_3600s // 86400) * 86400 == finest.bucket_86400s).all()


@pytest.mark.parametrize("direction", ["forward", "nearest"])
def test_asof_join_directions_match_pandas(spark, frames, direction):
    """Round-5: forward and nearest directions must reproduce pandas
    merge_asof exactly (backward covered above), including pandas'
    backward-wins-ties rule for nearest."""
    left, right = frames
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on=["k"],
            ts_col="ts",
            direction=direction,
        )
        .toPandas()
        .sort_values(["k", "ts", "lval"])
        .reset_index(drop=True)
    )
    expect = (
        pd.merge_asof(
            left.sort_values("ts"),
            right.sort_values("ts"),
            on="ts",
            by="k",
            direction=direction,
            suffixes=("", "_right"),
        )
        .sort_values(["k", "ts", "lval"])
        .reset_index(drop=True)
    )
    assert len(got) == len(left)
    assert np.allclose(
        got["rval"].fillna(-999), expect["rval"].fillna(-999), atol=1e-12
    )


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_join_direction_tolerance_matches_pandas(spark, frames, direction):
    left, right = frames
    tol = 500
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on=["k"],
            ts_col="ts",
            direction=direction,
            tolerance=tol,
        )
        .toPandas()
        .sort_values(["k", "ts", "lval"])
        .reset_index(drop=True)
    )
    expect = (
        pd.merge_asof(
            left.sort_values("ts"),
            right.sort_values("ts"),
            on="ts",
            by="k",
            direction=direction,
            tolerance=tol,
            suffixes=("", "_right"),
        )
        .sort_values(["k", "ts", "lval"])
        .reset_index(drop=True)
    )
    assert np.allclose(
        got["rval"].fillna(-999), expect["rval"].fillna(-999), atol=1e-12
    )


def test_asof_join_directions_single_exchange_plan(spark, frames):
    """nearest evaluates two window frames but must still shuffle the
    union exactly once (two sorts over one exchange, no second
    hashpartitioning of the data)."""
    left, right = frames
    for direction in ("forward", "nearest"):
        out = asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on=["k"],
            ts_col="ts",
            direction=direction,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1, (direction, plan)


def test_asof_join_all_directions_consistent_and_one_exchange(spark, frames):
    """direction='all' must equal the three single-direction results
    column-for-column while planning a single exchange subtree
    (reused) instead of three."""
    left, right = frames
    l_df, r_df = spark.createDataFrame(left), spark.createDataFrame(right)
    alld = asof_join(l_df, r_df, on=["k"], ts_col="ts", direction="all").toPandas()
    for tag, direction in (("_b", "backward"), ("_f", "forward"), ("_n", "nearest")):
        single = (
            asof_join(l_df, r_df, on=["k"], ts_col="ts", direction=direction)
            .toPandas()
            .sort_values(["k", "ts", "lval"])
            .reset_index(drop=True)
        )
        a = alld.sort_values(["k", "ts", "lval"]).reset_index(drop=True)
        assert np.allclose(
            a[f"rval{tag}"].fillna(-999), single["rval"].fillna(-999), atol=1e-12
        )
    plan = (
        asof_join(l_df, r_df, on=["k"], ts_col="ts", direction="all")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
