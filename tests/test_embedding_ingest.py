"""Streaming embedding ingest (round 9): the vector twin of the text
curation tier — per-batch LSH dedup against accumulated state,
first-arrival-wins, verify tier, forget propagation, compaction."""

from __future__ import annotations

import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.streaming.embedding_ingest import (
    compact_embedding_state,
    forget_embeddings,
    init_embedding_store,
    read_embedding_corpus,
    streaming_embedding_ingest,
)

DIM = 16


def _vec(seed, jitter=0.0):
    rng = np.random.RandomState(seed)
    v = rng.randn(DIM)
    if jitter:
        v = v + np.random.RandomState(seed + 1000).randn(DIM) * jitter
    return [float(x) for x in v]


def _stage_and_drain(spark, tmp_path, batches, root, ck="ckpt", **kw):
    stage = tmp_path / "arrivals"
    stage.mkdir(exist_ok=True)
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            rows, f"vec_id long, embedding array<float>"
        ).coalesce(1).write.mode("overwrite").parquet(str(stage / f"b{i}"))
        time.sleep(0.05)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stage / "*"))
    )
    q = streaming_embedding_ingest(
        stream, root, checkpoint=str(tmp_path / ck), **kw
    )
    q.awaitTermination()


def test_embedding_ingest_first_arrival_wins(spark, tmp_path):
    root = str(tmp_path / "store")
    init_embedding_store(spark, root, DIM, n_planes=10, n_tables=4, seed=7)
    batches = [
        [(0, _vec(1)), (1, _vec(2))],
        # near-dup of 0 (tiny jitter -> same buckets), new vec, invalid rows
        [(10, _vec(1, 1e-4)), (11, _vec(3)), (12, None), (13, [0.0] * 4)],
        # exact replay of id 1 (duplicate delivery), near-dup of 3,
        # within-batch pair: 21 first, 22 its near-dup
        [(1, _vec(2)), (20, _vec(3, 1e-4)), (21, _vec(4)), (22, _vec(4, 1e-4))],
    ]
    _stage_and_drain(spark, tmp_path, batches, root)
    ids = sorted(r.vec_id for r in read_embedding_corpus(spark, root).collect())
    assert ids == [0, 1, 11, 21], ids
    buckets = spark.read.parquet(root + "/buckets")
    assert buckets.select("vec_id").distinct().count() == 4
    assert buckets.count() == 4 * 4  # n_tables keys per accepted vector


def test_embedding_ingest_verify_threshold_keeps_band_collisions(spark, tmp_path):
    """With exact verification, a band collision between genuinely
    dissimilar vectors must NOT drop the arrival (the band-level path
    would); a true near-dup above threshold still drops."""
    root = str(tmp_path / "store")
    # 2 planes -> frequent random collisions
    init_embedding_store(spark, root, DIM, n_planes=2, n_tables=2, seed=3)
    vecs = [(i, _vec(100 + i)) for i in range(12)]
    dup = [(50, _vec(100, 1e-5))]  # near-dup of vec_id 0
    _stage_and_drain(
        spark, tmp_path, [vecs, dup], root, verify_threshold=0.95
    )
    ids = sorted(r.vec_id for r in read_embedding_corpus(spark, root).collect())
    # all 12 dissimilar vectors survive despite 2-plane collisions;
    # the true near-dup is dropped
    assert ids == list(range(12)), ids


def test_embedding_ingest_replay_idempotent(spark, tmp_path):
    root = str(tmp_path / "store")
    init_embedding_store(spark, root, DIM, seed=5)
    batches = [[(0, _vec(1)), (1, _vec(2))]]
    _stage_and_drain(spark, tmp_path, batches, root, ck="ck1")
    n1 = read_embedding_corpus(spark, root).count()
    # fresh checkpoint, same files: the id replay gate (not the
    # marker) must keep the corpus unchanged
    _stage_and_drain(spark, tmp_path, batches, root, ck="ck2")
    assert read_embedding_corpus(spark, root).count() == n1 == 2


def test_forget_embeddings_propagates(spark, tmp_path):
    root = str(tmp_path / "store")
    init_embedding_store(spark, root, DIM, seed=9)
    _stage_and_drain(
        spark, tmp_path, [[(i, _vec(10 + i)) for i in range(4)]], root
    )
    removed = forget_embeddings(spark, root, [1, 3])
    assert removed == 2
    ids = sorted(r.vec_id for r in read_embedding_corpus(spark, root).collect())
    assert ids == [0, 2]
    # state rebuilt from the surviving corpus: forgotten ids gone, so
    # a re-arrival of id 1's vector is ACCEPTED (no phantom suppression)
    b = spark.read.parquet(root + "/buckets")
    assert sorted(
        r.vec_id for r in b.select("vec_id").distinct().collect()
    ) == [0, 2]
    stage2 = tmp_path / "re"
    stage2.mkdir()
    spark.createDataFrame(
        [(99, _vec(11))], "vec_id long, embedding array<float>"
    ).coalesce(1).write.parquet(str(stage2 / "b0"))
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .parquet(str(stage2 / "*"))
    )
    q = streaming_embedding_ingest(stream, root, checkpoint=str(tmp_path / "ck3"))
    q.awaitTermination()
    ids = sorted(r.vec_id for r in read_embedding_corpus(spark, root).collect())
    assert ids == [0, 2, 99], ids


def test_compact_embedding_state(spark, tmp_path):
    import os

    root = str(tmp_path / "store")
    init_embedding_store(spark, root, DIM, seed=11)
    _stage_and_drain(
        spark, tmp_path,
        [[(i, _vec(200 + i))] for i in range(5)],  # 5 one-row batches
        root,
    )
    def nfiles(p):
        return sum(
            f.endswith(".parquet")
            for _, _, fs in os.walk(os.path.join(root, p))
            for f in fs
        )
    pre = nfiles("buckets")
    out = compact_embedding_state(spark, root)
    assert out["buckets"] < pre
    assert read_embedding_corpus(spark, root).count() == 5


def test_embedding_ingest_single_batch_matches_batch_dedup(spark, tmp_path):
    """Batch parity on clique-shaped duplicate clusters: one streamed
    batch with exact-cosine verification must keep exactly the rows
    batch embedding_near_dedup (same LSH family, same threshold)
    keeps — greedy first-arrival-drop equals closure min-id when every
    duplicate cluster is a mutual-similarity clique."""
    from bigdata_quality_assessment_spark.operators.similarity import (
        embedding_near_dedup,
    )

    rows = []
    vid = 0
    for cluster_seed in range(4):  # 4 cliques of 3 near-identical vecs
        for j in range(3):
            rows.append((vid, _vec(300 + cluster_seed, jitter=1e-5 * j)))
            vid += 1
    for s in range(5):  # 5 singletons
        rows.append((vid, _vec(400 + s)))
        vid += 1

    root = str(tmp_path / "store")
    init_embedding_store(spark, root, DIM, n_planes=8, n_tables=4, seed=21)
    _stage_and_drain(
        spark, tmp_path, [rows], root, verify_threshold=0.95
    )
    streamed = sorted(
        r.vec_id for r in read_embedding_corpus(spark, root).collect()
    )
    batch = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    want = sorted(
        r.vec_id
        for r in embedding_near_dedup(
            batch, threshold=0.95, dim=DIM, n_planes=8, n_tables=4, seed=21
        ).collect()
    )
    assert streamed == want and len(streamed) <= 4 + 5


def test_embedding_ingest_crash_window_heals_on_replay(spark, tmp_path):
    """Round-10 ADVICE fix: a crash BETWEEN the corpus append and the
    bucket append (id corpus-present, bucket-absent, no commit marker)
    must replay to the exact no-crash state — the id is NOT
    re-accepted (no duplicate corpus rows) and its band keys are
    healed into the bucket store so it screens future near-dups."""
    root = str(tmp_path / "store")
    init_embedding_store(spark, root, DIM, n_planes=10, n_tables=4, seed=7)

    # simulate the crash: id 0 lands in the corpus only (the state the
    # old code left behind when the bucket append never ran)
    spark.createDataFrame(
        [(0, _vec(1))], "vec_id long, embedding array<float>"
    ).write.mode("append").parquet(root + "/corpus")
    assert spark.read.parquet(root + "/buckets").count() == 0

    # redeliver the crashed batch (0 plus a new id), then a batch with
    # a near-dup of 0 that only the healed bucket keys can screen
    batches = [
        [(0, _vec(1)), (1, _vec(2))],
        [(10, _vec(1, 1e-4)), (11, _vec(3))],
    ]
    _stage_and_drain(spark, tmp_path, batches, root)

    corpus = read_embedding_corpus(spark, root)
    ids = sorted(r.vec_id for r in corpus.collect())
    assert ids == [0, 1, 11], ids  # no duplicate 0; near-dup 10 screened
    assert corpus.count() == corpus.select("vec_id").distinct().count()
    buckets = spark.read.parquet(root + "/buckets")
    assert buckets.select("vec_id").distinct().count() == 3
    assert buckets.filter(F.col("vec_id") == 0).count() == 4  # healed keys


def test_embedding_ingest_event_time_watermark(spark, tmp_path):
    """Round-10: the vector tier's event-time lateness bound. Arrivals
    older than (max observed event time from PRIOR batches − delay)
    drop before every other gate; fresh rows advance the watermark;
    NULL event times drop; and the accepted set has BATCH PARITY with
    pre-filtering the late rows under the same horizon rule and
    running the fold without event time."""
    import json as _json
    import time as _time

    root = str(tmp_path / "store")
    init_embedding_store(spark, root, DIM, n_planes=10, n_tables=4, seed=7)
    schema = "vec_id long, embedding array<float>, ts double"
    batches = [
        [(0, _vec(10), 1000.0), (1, _vec(11), 1100.0)],
        # horizon = 1100 - 600 = 500: id 2 late (450), id 3 on the
        # boundary-accept side (600), id 4 fresh (2000), id 5 NULL ts
        [(2, _vec(12), 450.0), (3, _vec(13), 600.0),
         (4, _vec(14), 2000.0), (5, _vec(15), None)],
        # horizon = 2000 - 600 = 1400: id 6 late (1300), id 7 ok (1500)
        [(6, _vec(16), 1300.0), (7, _vec(17), 1500.0)],
    ]
    stage = tmp_path / "arrivals"
    stage.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(stage / f"b{i}"))
        _time.sleep(0.05)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stage / "*"))
    )
    q = streaming_embedding_ingest(
        stream, root, checkpoint=str(tmp_path / "ck"),
        event_time_col="ts", late_delay_s=600.0,
    )
    q.awaitTermination()
    ids = sorted(r.vec_id for r in read_embedding_corpus(spark, root).collect())
    assert ids == [0, 1, 3, 4, 7], ids
    with open(root + "/watermark.json") as fh:
        assert _json.load(fh)["max_event_ts"] == 2000.0

    # batch parity: replay the same horizon rule eagerly, feed the
    # surviving rows through the fold WITHOUT event time — same set
    root2 = str(tmp_path / "store2")
    init_embedding_store(spark, root2, DIM, n_planes=10, n_tables=4, seed=7)
    horizon = None
    kept_batches = []
    for rows in batches:
        kept = [
            (i, v) for (i, v, ts) in rows
            if ts is not None and (horizon is None or ts >= horizon - 600.0)
        ]
        kept_batches.append(kept)
        mx = max((ts for (_, _, ts) in rows if ts is not None), default=None)
        if mx is not None:
            horizon = mx if horizon is None else max(horizon, mx)
    _stage_and_drain(spark, tmp_path, kept_batches, root2, ck="ck2")
    ids2 = sorted(r.vec_id for r in read_embedding_corpus(spark, root2).collect())
    assert ids2 == ids
