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


def test_events_ts_normalized_across_storage_types(spark, tmp_path):
    """events.ts must come back as IDENTICAL epoch-nanos BIGINT whether
    the parquet stores timestamp[us], timestamp[ns], or timestamp[ms]
    (the driver has shipped different types in different rounds)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdata_quality_assessment_spark.operators import density  # noqa: F401 (spark session warm)
    from bigdata_quality_assessment_spark.sources.tables import load_table

    base_us = [1_700_000_000_000_000 + i * 1_234_567 for i in range(20)]
    cols = {
        "event_id": pa.array(range(20), pa.int64()),
        "user_id": pa.array([i % 3 for i in range(20)], pa.int64()),
        "event_type": pa.array(["click"] * 20),
        "value": pa.array([float(i) for i in range(20)]),
        "props": pa.array(["{}"] * 20),
    }
    expected = [us * 1000 for us in base_us]
    got = {}
    for unit in ("us", "ns", "ms"):
        d = tmp_path / f"ev_{unit}"
        d.mkdir()
        if unit == "ms":
            ts = pa.array([us // 1000 for us in base_us], pa.timestamp("ms"))
            exp = [us // 1000 * 1_000_000 for us in base_us]
        elif unit == "us":
            ts = pa.array(base_us, pa.timestamp("us"))
            exp = expected
        else:
            ts = pa.array([us * 1000 for us in base_us], pa.timestamp("ns"))
            exp = expected
        t = pa.table({"event_id": cols["event_id"], "ts": ts, **{k: v for k, v in cols.items() if k != "event_id"}})
        pq.write_table(t, str(d / "events.parquet"))
        df = load_table(spark, "events", str(d))
        assert dict(df.dtypes)["ts"] == "bigint", df.dtypes
        vals = [r["ts"] for r in df.orderBy("event_id").collect()]
        assert vals == exp, (unit, vals[:3], exp[:3])
        got[unit] = vals
    assert got["us"] == got["ns"]


def test_events_ts_ntz_is_session_timezone_invariant(spark, tmp_path):
    """TimestampNTZ storage must yield the same epoch-nanos under ANY
    session timezone (ADVICE r4: the old cast-to-timestamp path shifted
    values by the session offset for non-UTC sessions)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdata_quality_assessment_spark.sources.tables import load_table

    base_us = [1_700_000_000_000_000 + i * 7_777_777 for i in range(10)]
    d = tmp_path / "ev_ntz"
    d.mkdir()
    t = pa.table(
        {
            "event_id": pa.array(range(10), pa.int64()),
            # pyarrow timestamp without tz metadata -> Spark TimestampNTZ
            # (with spark.sql.parquet.inferTimestampNTZ.enabled default)
            "ts": pa.array(base_us, pa.timestamp("us")),
            "user_id": pa.array([0] * 10, pa.int64()),
            "event_type": pa.array(["click"] * 10),
            "value": pa.array([0.0] * 10),
            "props": pa.array(["{}"] * 10),
        }
    )
    pq.write_table(t, str(d / "events.parquet"))
    expected = [us * 1000 for us in base_us]
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    old_infer = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        for tz in ("UTC", "America/Los_Angeles", "Asia/Kolkata"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            df = load_table(spark, "events", str(d))
            vals = [r["ts"] for r in df.orderBy("event_id").collect()]
            assert vals == expected, (tz, vals[:2], expected[:2])
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", old_infer)
