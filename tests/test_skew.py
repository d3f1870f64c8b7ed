"""Skew stress tests (VERDICT r3 item 7): a hot key owning ~50% of the
rows must not land on one reducer. Pins BOTH 100 TB mitigation tiers:
AQE's automatic skew-join split (session.py enables it) and the
explicit salted_join for the pathological case."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.operators.select import salted_join


def _hot_key_frames(spark, n_big=200_000, n_keys=1000):
    # key 0 owns ~half the big side
    big = spark.range(n_big).select(
        F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % n_keys).alias("k"),
        F.concat(F.lit("payload_"), F.col("id")).alias("v"),
    )
    small = spark.range(n_keys).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    return big, small


SKEW_CONF = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
}


def test_aqe_skew_join_splits_hot_key(spark):
    """With thresholds scaled to test size, the FINAL adaptive plan must
    mark the join skew-handled: SortMergeJoin(skew=true) reading an
    'AQEShuffleRead coalesced and skewed' child — the hot partition was
    split across reducers at runtime."""
    old = {k: spark.conf.get(k, None) for k in SKEW_CONF}
    for k, v in SKEW_CONF.items():
        spark.conf.set(k, v)
    try:
        big, small = _hot_key_frames(spark)
        j = big.join(small, "k")
        assert len(j.collect()) == 200_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        assert "skewed" in plan, plan
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)


def test_salted_join_partitions_on_salt_and_matches_plain(spark):
    """The explicit tier: the physical exchange must partition on
    (key, __salt) — each hot key spreads over n_salts reducers — and
    the result must equal the plain join exactly."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        big, small = _hot_key_frames(spark, n_big=20_000, n_keys=100)
        sj = salted_join(big, small, "k", n_salts=8)
        plan = sj._jdf.queryExecution().executedPlan().toString()
        assert "hashpartitioning(k" in plan and "__salt" in plan, plan
        got = {(r["k"], r["v"], r["w"]) for r in sj.collect()}
        want = {(r["k"], r["v"], r["w"]) for r in big.join(small, "k").collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
