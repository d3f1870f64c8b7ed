"""Bucketed-table co-located joins: the engine's 100 TB strategy for
the repeated point_id equi-joins — both sides pre-bucketed on the key
join with NO exchange in the plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.sources.tables import (
    read_bucketed,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    from bigdata_quality_assessment_spark.sources.generators import grid_points_2d

    pts = grid_points_2d(spark, 30)
    write_bucketed(pts, "bt_points", ["point_id"], n_buckets=8, sort_cols=["point_id"])
    write_bucketed(
        pts.select("point_id", (F.col("y") * 2).alias("score")),
        "bt_scores",
        ["point_id"],
        n_buckets=8,
        sort_cols=["point_id"],
    )
    yield "bt_points", "bt_scores"
    spark.sql("DROP TABLE IF EXISTS bt_points")
    spark.sql("DROP TABLE IF EXISTS bt_scores")


def test_bucketed_join_is_exchange_free(spark, bucketed_pair):
    a, b = bucketed_pair
    # disable auto-broadcast to exercise the large×large case the
    # bucketing exists for (at test scale Catalyst would broadcast)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, a).join(read_bucketed(spark, b), "point_id")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert joined.count() == 900
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_values(spark, bucketed_pair):
    a, b = bucketed_pair
    joined = read_bucketed(spark, a).join(read_bucketed(spark, b), "point_id")
    row = joined.filter(F.col("point_id") == 5).first()
    assert abs(row["score"] - 2 * row["y"]) < 1e-12
