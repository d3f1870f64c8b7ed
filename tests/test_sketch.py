"""Misra-Gries frequent-items: heavy-hitter guarantee and count
bounds vs exact groupBy counts on zipf-ish data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.operators.sketch import frequent_items


def test_frequent_items_heavy_hitter_guarantee(spark):
    import random

    random.seed(7)
    # zipf-ish: item i appears ~ 4000/i times, plus a long noise tail
    rows = []
    for i in range(1, 21):
        rows += [(f"hot{i}",)] * (4000 // i)
    rows += [(f"noise{j}",) for j in range(5000)]
    random.shuffle(rows)
    df = spark.createDataFrame(rows, "item string").repartition(8)
    n = len(rows)

    capacity = 64
    out = frequent_items(df, "item", k=20, capacity=capacity).collect()
    got = {r.item: (r.est_count, r.max_error) for r in out}
    exact = {
        r.item: r.cnt
        for r in df.groupBy("item").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    # guarantee: every item with true count > n/capacity is present
    threshold = n / capacity
    for item, cnt in exact.items():
        if cnt > threshold:
            assert item in got, (item, cnt, threshold)
    # bounds: est <= true <= est + max_error
    for item, (est, err) in got.items():
        assert est <= exact[item] <= est + err, (item, est, err, exact[item])


def test_frequent_items_small_input_is_exact(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1 + [(None,)], "item string"
    ).coalesce(1)
    out = frequent_items(df, "item", k=3, capacity=16).collect()
    assert [(r.item, r.est_count) for r in out] == [("a", 5), ("b", 3), ("c", 1)]


def test_frequent_items_k_validation(spark):
    df = spark.createDataFrame([("a",)], "item string")
    with pytest.raises(ValueError):
        frequent_items(df, "item", k=10, capacity=5)


def test_streaming_frequent_items(spark, tmp_path):
    import time

    from pyspark.sql import functions as F2

    from bigdata_quality_assessment_spark.operators.sketch import (
        streaming_frequent_items,
    )
    from bigdata_quality_assessment_spark.streaming.aggregates import (
        run_available_now,
    )

    stage = tmp_path / "items"
    stage.mkdir()
    # two micro-batches; 'alpha' is hot across both
    b0 = [("alpha",)] * 50 + [(f"x{j}",) for j in range(30)]
    b1 = [("alpha",)] * 40 + [("beta",)] * 35 + [(f"y{j}",) for j in range(20)]
    for i, rows in enumerate([b0, b1]):
        spark.createDataFrame(rows, "item string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(stage / f"b{i}"))
        time.sleep(0.05)

    stream = (
        spark.readStream.schema("item string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stage / "*"))
    )
    out = run_available_now(
        streaming_frequent_items(stream, "item", capacity=16, n_shards=4), "hh"
    )
    # latest emission per shard = rows with that shard's max shard_rows
    rows_out = out.collect()
    max_rows = {}
    for r in rows_out:
        max_rows[r.shard] = max(max_rows.get(r.shard, 0), r.shard_rows)
    got = {
        r.item: (r.est_count, r.shard_rows)
        for r in rows_out
        if r.shard_rows == max_rows[r.shard]
    }
    exact = {}
    for rows in [b0, b1]:
        for (it,) in rows:
            exact[it] = exact.get(it, 0) + 1
    # heavy hitters present with valid bounds across the whole stream
    for item in ("alpha", "beta"):
        assert item in got, got
        est, shard_rows = got[item]
        assert est <= exact[item] <= est + shard_rows / 16 + 1e-9, (item, est, shard_rows)
    # items of one shard never appear in another
    by_item = out.groupBy("item").agg(F2.count_distinct("shard").alias("ns")).collect()
    assert all(r.ns == 1 for r in by_item)


def test_profile_correlations_single_pass_and_values(spark):
    """All pairwise Pearson aggregates fold into ONE aggregation
    (single FileScan in the executed plan); values match numpy;
    constant columns yield NULL; non-numerics are skipped."""
    import numpy as np

    from bigdata_quality_assessment_spark.operators.profiling import (
        profile_correlations,
    )

    rng = np.random.RandomState(5)
    x = rng.normal(size=200)
    y = 2 * x + rng.normal(scale=0.1, size=200)
    z = rng.normal(size=200)
    rows = [(float(a), float(b), float(c), "s", 1.0) for a, b, c in zip(x, y, z)]
    df = spark.createDataFrame(rows, "x double, y double, z double, s string, k double")
    out = profile_correlations(df)
    got = {(r.col_a, r.col_b): r.value for r in out.collect()}
    assert ("x", "s") not in got and not any("s" in k for k in got)
    assert got[("x", "y")] == pytest.approx(float(np.corrcoef(x, y)[0, 1]), abs=1e-12)
    assert got[("x", "z")] == pytest.approx(float(np.corrcoef(x, z)[0, 1]), abs=1e-12)
    assert got[("x", "k")] is None  # zero-variance column
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE echoes the pre-adaptive plan too
    assert final.count("Scan ExistingRDD") + final.count("FileScan") <= 1


def test_profile_correlations_pairwise_complete_nulls(spark):
    """Asymmetric NULL patterns: the correlation must be computed over
    PAIRWISE-complete rows (what Pearson means) — a column-complete
    stddev against a pairwise-complete covariance reports a
    non-correlation for perfectly dependent paired data."""
    from bigdata_quality_assessment_spark.operators.profiling import (
        profile_correlations,
    )

    rows = [(0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (1000.0, None)]
    df = spark.createDataFrame(rows, "a double, b double")
    got = {(r.col_a, r.col_b): r.value for r in profile_correlations(df).collect()}
    assert got[("a", "b")] == pytest.approx(1.0, abs=1e-12)
