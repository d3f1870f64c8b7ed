"""Planted-image corpus (sources/imagegen.py) + perceptual-dedup
recall over it — the image analog of the text/embedding recall gates."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.operators.phash import (
    image_phash,
    near_dedup_images,
)
from bigdata_quality_assessment_spark.sources.imagegen import planted_images


@pytest.fixture(scope="module")
def corpus(spark):
    return planted_images(spark, 600, seed=11).localCheckpoint()


def test_roles_and_structure(corpus):
    rows = corpus.collect()
    by_id = {r["media_id"]: r for r in rows}
    roles = {r["role"] for r in rows}
    assert roles == {"orig", "dup", "bright"}
    for r in rows:
        if r["role"] == "orig":
            assert r["src_id"] is None
        else:
            assert by_id[r["src_id"]]["role"] == "orig"


def test_dup_is_byte_identical_and_bright_is_not(corpus):
    rows = corpus.collect()
    by_id = {r["media_id"]: r for r in rows}
    n_dup = n_bright = 0
    for r in rows:
        if r["role"] == "dup":
            assert bytes(r["content"]) == bytes(by_id[r["src_id"]]["content"])
            n_dup += 1
        elif r["role"] == "bright":
            assert bytes(r["content"]) != bytes(by_id[r["src_id"]]["content"])
            n_bright += 1
    assert n_dup > 0 and n_bright > 0


def test_brightness_shift_preserves_dhash(corpus, spark):
    """The clip-free brightness construction preserves every gradient
    sign, so each planted bright pair hashes Hamming-0 — the
    perceptual-dup case byte dedup can never catch."""
    ph = image_phash(corpus).select("media_id", "dhash")
    joined = (
        corpus.filter(F.col("role") == "bright")
        .select("media_id", "src_id")
        .join(ph, "media_id")
        .join(
            ph.select(
                F.col("media_id").alias("src_id"),
                F.col("dhash").alias("src_dhash"),
            ),
            "src_id",
        )
    )
    rows = joined.collect()
    assert rows and all(r["dhash"] == r["src_dhash"] for r in rows)


def test_planted_image_recall(corpus, spark):
    """Every planted pair collapses (Hamming 0 ≤ any threshold) and
    original false-merge stays under 1% (distinct mosaics landing
    within Hamming 3 by chance)."""
    surv = near_dedup_images(corpus, max_hamming=3).select(
        "media_id", F.lit(1).alias("__kept")
    )
    m = (
        corpus.select("media_id", "role", "src_id")
        .join(surv, "media_id", "left")
        .agg(
            F.avg(
                F.when(
                    F.col("role").isin("dup", "bright"),
                    F.col("__kept").isNull().cast("double"),
                )
            ).alias("recall"),
            F.avg(
                F.when(
                    F.col("role") == "orig",
                    F.col("__kept").isNotNull().cast("double"),
                )
            ).alias("orig_survival"),
        )
        .first()
    )
    assert m["recall"] == 1.0
    assert m["orig_survival"] >= 0.99


def test_partitioning_invariance(spark):
    a = {
        (r["media_id"], bytes(r["content"]), r["role"], r["src_id"])
        for r in planted_images(spark, 80, seed=5, num_partitions=1).collect()
    }
    b = {
        (r["media_id"], bytes(r["content"]), r["role"], r["src_id"])
        for r in planted_images(spark, 80, seed=5, num_partitions=11).collect()
    }
    assert a == b
