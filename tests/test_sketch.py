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
