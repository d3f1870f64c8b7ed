"""Counter-RNG stream: partition invariance, engine parity, and
sampler contracts under the counter default.

The whole point of the md5 counter stream (functions/counter_rng.py)
is that every variate is a pure function of the ROW, never of the
physical plan — ``F.rand(seed)`` changes values whenever the split
count changes, which at 100 TB means "seeded" is a fiction. These
tests pin that property, plus exact parity between the Spark, python
and (via duckdb) SQL twins of the stream.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.functions.counter_rng import (
    TWO52,
    counter_gaussian,
    counter_hash,
    counter_uniform,
    py_counter_gaussian,
    py_counter_hash,
    py_counter_uniform,
    sql_counter_uniform,
)
from bigdata_quality_assessment_spark.operators.select import (
    weighted_sample_with_replacement,
    weighted_sample_without_replacement,
)
from bigdata_quality_assessment_spark.sources.generators import (
    gaussian_samples,
    latin_hypercube,
    ou_process,
    uniform_samples,
)


def test_spark_python_twins_agree(spark):
    rows = (
        spark.range(50)
        .select(
            "id",
            counter_hash("t", 7, F.col("id")).alias("h"),
            counter_uniform("t", 7, F.col("id")).alias("u"),
        )
        .collect()
    )
    for r in rows:
        assert r["h"] == py_counter_hash("t", 7, r["id"])
        assert r["u"] == py_counter_uniform("t", 7, r["id"])  # bit-exact


def test_duckdb_twin_agrees_bit_exactly(spark):
    """The SQL twin (what every sampler oracle is built from) must
    reproduce the uniform BIT-exactly — power-of-two division leaves
    no rounding anywhere."""
    got = duckdb.sql(
        f"SELECT {sql_counter_uniform(chr(39) + 't:7:' + chr(39) + ' || CAST(id AS VARCHAR)')} AS u "
        "FROM range(50) t(id) ORDER BY id"
    ).fetchall()
    for i, (u,) in enumerate(got):
        assert u == py_counter_uniform("t", 7, i)


def test_gaussian_twin_close(spark):
    """Box-Muller goes through libm: JVM vs CPython may differ by a
    few ulp, never more."""
    rows = (
        spark.range(200)
        .select(counter_gaussian("g", 1, F.col("id")).alias("z"), "id")
        .collect()
    )
    for r in rows:
        assert abs(r["z"] - py_counter_gaussian("g", 1, r["id"])) < 1e-12


def test_uniform_in_open_interval(spark):
    vals = [
        r["u"]
        for r in spark.range(1000)
        .select(counter_uniform("o", F.col("id")).alias("u"))
        .collect()
    ]
    assert all(0.0 < v < 1.0 for v in vals)
    # 52-bit stream: mean within a few sigma of 1/2
    assert abs(np.mean(vals) - 0.5) < 4 * (1 / math.sqrt(12 * 1000))


@pytest.mark.parametrize("n_parts", [1, 7])
def test_samplers_partition_invariant(spark, n_parts):
    """The counter default makes every sampler's OUTPUT independent of
    the input partition layout — the property F.rand can never give."""
    uni = uniform_samples(spark, 300, [0.0], [1.0], seed=9)
    base = {r["point_id"]: r["x1"] for r in uni.collect()}
    re = {
        r["point_id"]: r["x1"]
        for r in uni.repartition(n_parts).collect()
    }
    assert base == re

    gau = gaussian_samples(spark, 200, [1.0], [[4.0]], seed=9)
    gbase = {r["point_id"]: r["x1"] for r in gau.collect()}
    gre = {r["point_id"]: r["x1"] for r in gau.repartition(n_parts).collect()}
    assert gbase == gre


def test_weighted_with_replacement_partition_invariant(spark):
    df = spark.range(500).select(
        F.col("id").alias("point_id"),
        (F.col("id") % 13 + 1).cast("double").alias("w"),
    )
    a = sorted(
        (r["draw_id"], r["point_id"])
        for r in weighted_sample_with_replacement(df, "w", 64, seed=3, n_parts=8).collect()
    )
    b = sorted(
        (r["draw_id"], r["point_id"])
        for r in weighted_sample_with_replacement(
            df.repartition(3), "w", 64, seed=3, n_parts=8
        ).collect()
    )
    assert a == b
    assert len(a) == 64


def test_weighted_without_replacement_partition_invariant(spark):
    df = spark.range(300).select(
        F.col("id").alias("point_id"),
        (F.col("id") % 7 + 1).cast("double").alias("w"),
    )
    a = sorted(r["point_id"] for r in weighted_sample_without_replacement(df, "w", 20, seed=5).collect())
    b = sorted(
        r["point_id"]
        for r in weighted_sample_without_replacement(df.repartition(5), "w", 20, seed=5).collect()
    )
    assert a == b
    assert len(set(a)) == 20  # distinct — without replacement


def test_ou_counter_matches_python_twin(spark):
    """The applyInPandas recurrence under the counter default replays
    exactly the hashlib/math python twin — the same stream the DuckDB
    recursive-CTE oracle consumes."""
    sigma, mu, tau, dt, n = 2.0, 2.0, 0.5, 0.001, 100
    rows = (
        ou_process(spark, n_trajectories=1, n_steps=n, dt=dt, sigma=sigma,
                   mu=mu, tau=tau, seed=11)
        .orderBy("step")
        .collect()
    )
    sigma_bis = sigma * math.sqrt(2.0 / tau)
    sqrtdt = math.sqrt(dt)
    x = np.zeros(n)
    for i in range(n - 1):
        eps = py_counter_gaussian("ou", 11, 0, i)
        x[i + 1] = x[i] + dt * (-(0.25 * x[i] - mu) / tau) + sigma_bis * sqrtdt * eps
    assert np.allclose([r["y"] for r in rows], x, atol=1e-12)


def test_lhs_counter_keeps_stratification(spark):
    n = 64
    df = latin_hypercube(spark, n, [0.0, 0.0], [1.0, 1.0], seed=5).toPandas()
    for col in ("x1", "x2"):
        strata = np.floor(df[col].to_numpy() * n).astype(int)
        assert sorted(strata) == list(range(n))


def test_hash_split_counter_mode_contract(spark):
    """Counter-mode hash_split keeps the xxhash64 mode's contract:
    disjoint+exhaustive, proportional, and stable under
    repartitioning."""
    from bigdata_quality_assessment_spark.operators.select import hash_split

    df = spark.range(4000).select(F.col("id").alias("doc_id"))
    out = hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}, hash_fn="counter")
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == 4000
    assert abs(counts["train"] / 4000 - 0.8) < 0.03
    re = hash_split(
        df.repartition(7), {"train": 0.8, "val": 0.1, "test": 0.1}, hash_fn="counter"
    )
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {r["doc_id"]: r["split"] for r in re.collect()}
    assert a == b


def test_mixture_sample_counter_mode_rates(spark):
    from bigdata_quality_assessment_spark.operators.select import mixture_sample

    df = spark.range(6000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("source"),
    )
    out = mixture_sample(df, {"a": 0.5, "b": 1.0}, hash_fn="counter")
    counts = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert counts["b"] == 3000  # rate 1.0 keeps everything
    assert abs(counts["a"] / 3000 - 0.5) < 0.05


def test_hash_is_52_bits(spark):
    mx = (
        spark.range(5000)
        .select(counter_hash("b", F.col("id")).alias("h"))
        .agg(F.max("h"), F.min("h"))
        .first()
    )
    assert 0 <= mx[1] and mx[0] < TWO52
