"""Okapi BM25 scored retrieval (operators/text.py bm25_retrieve) —
round-12 verdict ask #5."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.operators.text import bm25_retrieve


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_bm25_exact_formula(spark):
    """Hand-computed score on a 3-doc corpus, one-term query."""
    docs = _docs(spark, ["a b", "a a b", "c"])
    q = spark.createDataFrame([(0, "a")], "query_id long, text string")
    rows = {
        r["doc_id"]: r["score"]
        for r in bm25_retrieve(docs, q, top_k=None).collect()
    }
    # N=3 docs, df(a)=2, avgdl=(2+3+1)/3=2, idf=ln(1+(3-2+0.5)/2.5)
    idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    k1, b = 1.2, 0.75

    def tnorm(tf, dl):
        return tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / 2.0))

    assert rows.keys() == {0, 1}  # doc 2 shares no term
    assert rows[0] == pytest.approx(idf * tnorm(1, 2))
    assert rows[1] == pytest.approx(idf * tnorm(2, 3))


def test_bm25_length_normalization(spark):
    """Same tf in a shorter document scores higher (the b-weighted
    length penalty BM25 adds over plain tf-idf)."""
    docs = _docs(spark, ["a b", "a b c d e f g h", "x y z"])
    q = spark.createDataFrame([(0, "a")], "query_id long, text string")
    rows = {
        r["doc_id"]: r["score"]
        for r in bm25_retrieve(docs, q, top_k=None).collect()
    }
    assert rows[0] > rows[1]


def test_bm25_self_retrieval_ranks_first(spark):
    """A query that IS a corpus document retrieves that document at
    rank 1 — the retrieval-decontamination use case."""
    docs = _docs(
        spark,
        ["alpha beta gamma", "delta epsilon", "alpha delta", "zeta eta"],
    )
    q = spark.createDataFrame(
        [(7, "alpha beta gamma")], "query_id long, text string"
    )
    top = bm25_retrieve(docs, q, top_k=2).orderBy("rank").collect()
    assert top[0]["doc_id"] == 0 and top[0]["rank"] == 1


def test_bm25_top_k_and_tiebreak(spark):
    """Identical documents tie exactly; the rank tie-break is doc id
    ascending; top_k truncates per query."""
    docs = _docs(spark, ["a b", "a b", "a b", "c"])
    q = spark.createDataFrame([(0, "a b")], "query_id long, text string")
    top = bm25_retrieve(docs, q, top_k=2).orderBy("rank").collect()
    assert [r["doc_id"] for r in top] == [0, 1]
    full = bm25_retrieve(docs, q, top_k=None).collect()
    scores = {r["doc_id"]: r["score"] for r in full}
    assert scores[0] == scores[1] == scores[2]


def test_bm25_multiple_queries_and_dup_terms(spark):
    """Queries score independently; repeated query terms count once
    (distinct-term contract)."""
    docs = _docs(spark, ["a b c", "b c d", "d e f"])
    q = spark.createDataFrame(
        [(1, "a"), (2, "a a a"), (3, "f")], "query_id long, text string"
    )
    rows = bm25_retrieve(docs, q, top_k=None).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], {})[r["doc_id"]] = r["score"]
    assert by_q[1] == by_q[2]  # duplicate terms change nothing
    assert set(by_q[3]) == {2}


def test_bm25_empty_docs_excluded_from_stats(spark):
    """Token-less documents join neither N nor avgdl and are never
    retrieved."""
    docs = _docs(spark, ["a b", "", "   ", "a"])
    q = spark.createDataFrame([(0, "a")], "query_id long, text string")
    rows = {
        r["doc_id"]: r["score"]
        for r in bm25_retrieve(docs, q, top_k=None).collect()
    }
    assert set(rows) == {0, 3}
    # N=2, df(a)=2, avgdl=1.5 — the empty docs are invisible
    idf = math.log(1 + (2 - 2 + 0.5) / (2 + 0.5))
    assert rows[3] == pytest.approx(
        idf * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 1.0 / 1.5))
    )


def test_bm25_max_df_frac_prunes_stopwords(spark):
    """High-df terms are dropped from the query side under
    max_df_frac (the retrieval scale guard): a query of only such
    terms retrieves nothing; mixed queries keep their rare terms."""
    docs = _docs(spark, ["the a", "the b", "the c", "the d b"])
    q = spark.createDataFrame(
        [(0, "the"), (1, "the b")], "query_id long, text string"
    )
    rows = bm25_retrieve(docs, q, top_k=None, max_df_frac=0.5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    # 'the' has df 4/4 > 0.5 -> pruned everywhere
    assert 0 not in by_q
    assert by_q[1] == {1, 3}  # only 'b' (df 2/4 <= 0.5) scores


def _hint_children(plan: str) -> list[str]:
    """The immediate-child line of every broadcast hint in an
    analyzed-plan string (tree text: the child of a node at prefix
    length p is the next line whose node marker sits at p + 3)."""
    lines = plan.splitlines()
    out = []
    for i, line in enumerate(lines):
        if "ResolvedHint (strategy=broadcast)" not in line:
            continue
        depth = max(line.find("+- "), line.find(":- "))
        for nxt in lines[i + 1 :]:
            m = max(nxt.find("+- "), nxt.find(":- "))
            if m == depth + 3:
                out.append(nxt)
                break
    return out


def test_bm25_df_broadcast_is_query_scoped(spark):
    """The scale pin for round-12 `weak` #1: no broadcast hint may sit
    DIRECTLY on the full-vocabulary df aggregate (one row per distinct
    corpus term — an OOM at web scale). The df side must be semi-joined
    to the driver-sized query-term set first, so every broadcast build
    side is query-shaped."""
    docs = _docs(spark, ["a b c", "a d e", "f g"])
    q = spark.createDataFrame([(0, "a f")], "query_id long, text string")
    for kwargs in ({}, {"max_df_frac": 0.9}):
        out = bm25_retrieve(docs, q, top_k=None, **kwargs)
        plan = out._jdf.queryExecution().analyzed().toString()
        kids = _hint_children(plan)
        assert kids, "expected broadcast hints in the bm25 plan"
        for child in kids:
            assert not (
                "Aggregate" in child and "count(1) AS df" in child
            ), f"full df_counts broadcast directly:\n{child}"
        # the query-scoped df slice exists: every df aggregate feeds a
        # term join (the semi-join to the query-term set), never a
        # broadcast directly
        lines = plan.splitlines()
        df_lines = [
            i for i, l in enumerate(lines) if "count(1) AS df" in l
        ]
        assert df_lines
        for i in df_lines:
            assert "Join Inner, (term" in lines[i - 1]


def test_tf_idf_df_join_is_unhinted(spark):
    """tf_idf's df→tf scoring join carries NO broadcast hint (the df
    table is corpus-vocabulary-shaped; AQE picks the strategy from
    measured sizes)."""
    from bigdata_quality_assessment_spark.operators.text import tf_idf

    docs = _docs(spark, ["a b c", "a d"])
    plan = tf_idf(docs)._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in plan


def test_bm25_index_search_matches_retrieve(spark, tmp_path):
    """bm25_search over a prebuilt (persisted, bucket-partitioned)
    index returns IDENTICAL scores to the from-scratch bm25_retrieve
    on the same corpus + queries, including under max_df_frac."""
    from bigdata_quality_assessment_spark.operators.text import (
        bm25_search,
        build_bm25_index,
    )

    docs = _docs(
        spark,
        [
            "apple banana cherry", "apple apple date", "banana elder fig",
            "grape apple banana banana", "human iris joke", "",
        ],
    )
    q = spark.createDataFrame(
        [(0, "apple banana"), (1, "iris"), (2, "")],
        "query_id long, text string",
    )
    postings, stats = build_bm25_index(docs, n_buckets=8)
    path = str(tmp_path / "bm25_idx")
    postings.write.partitionBy("__bucket").parquet(path)
    index = spark.read.parquet(path)

    for kwargs in ({}, {"max_df_frac": 0.5}):
        want = {
            (r["query_id"], r["doc_id"]): r["score"]
            for r in bm25_retrieve(docs, q, top_k=None, **kwargs).collect()
        }
        got = {
            (r["query_id"], r["doc_id"]): r["score"]
            for r in bm25_search(index, q, stats, top_k=None, **kwargs).collect()
        }
        assert set(got) == set(want)
        for key, s in want.items():
            assert got[key] == pytest.approx(s, rel=1e-12)

    # ranked path: same winners, rank column present
    ranked = bm25_search(index, q, stats, top_k=2).collect()
    assert all(r["rank"] in (1, 2) for r in ranked)


def test_bm25_search_prunes_partitions(spark, tmp_path):
    """The lake contract: the query terms' bucket set lands as a
    STATIC partition predicate — the executed plan's parquet scan
    shows a __bucket partition filter (whole index files are skipped
    before the term join)."""
    from bigdata_quality_assessment_spark.operators.text import (
        bm25_search,
        build_bm25_index,
    )

    docs = _docs(spark, [f"word{i} filler text" for i in range(50)])
    postings, stats = build_bm25_index(docs, n_buckets=16)
    path = str(tmp_path / "bm25_idx")
    postings.write.partitionBy("__bucket").parquet(path)
    index = spark.read.parquet(path)
    q = spark.createDataFrame([(0, "word7")], "query_id long, text string")
    out = bm25_search(index, q, stats, top_k=None)
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert scan and any("__bucket" in l for l in scan)
    # and the search actually scores the right doc
    rows = out.collect()
    assert {r["doc_id"] for r in rows} == {7}


def test_bm25_search_empty_query_set(spark, tmp_path):
    """Token-less query batches return an empty, correctly-shaped
    frame instead of an unpruned scan (isin([]) would not prune)."""
    from bigdata_quality_assessment_spark.operators.text import (
        bm25_search,
        build_bm25_index,
    )

    docs = _docs(spark, ["a b", "c d"])
    postings, stats = build_bm25_index(docs, n_buckets=4)
    index = postings
    q = spark.createDataFrame([(0, ""), (1, "  ")], "query_id long, text string")
    out = bm25_search(index, q, stats)
    assert out.count() == 0
    assert set(out.columns) == {"query_id", "doc_id", "score", "rank"}


def test_bm25_incremental_append_matches_rebuild(spark, tmp_path):
    """The round-14 incremental layout (VERDICT r13 Missing #3):
    appending a corpus in batches — postings without df + per-batch
    df deltas + additive stats — searches with scores IDENTICAL to
    the full single-shot rebuild AND to from-scratch bm25_retrieve,
    including under max_df_frac; existing posting files are never
    rewritten by an append."""
    import os

    from bigdata_quality_assessment_spark.operators.text import (
        append_bm25_index,
        bm25_search,
        open_bm25_index,
    )

    texts = [
        "apple banana cherry", "apple apple date", "banana elder fig",
        "grape apple banana banana", "human iris joke", "",
        "apple kiwi", "lemon mango iris",
    ]
    docs = _docs(spark, texts)
    b1 = docs.filter(F.col("doc_id") < 5)
    b2 = docs.filter(F.col("doc_id") >= 5)
    path = str(tmp_path / "bm25_inc")
    append_bm25_index(b1, path, n_buckets=8)

    def file_set(sub):
        out = {}
        for dirpath, _d, files in os.walk(os.path.join(path, sub)):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(dirpath, f)
                    out[p] = os.path.getmtime(p)
        return out

    before = file_set("postings")
    stats = append_bm25_index(b2, path)
    after = file_set("postings")
    # append-stability: every batch-1 file still present, untouched
    assert set(before) <= set(after)
    assert all(after[p] == m for p, m in before.items())
    assert stats["n_docs"] == 7.0  # the empty doc joins no stats

    postings, df_frame, rstats, tombs = open_bm25_index(spark, path)
    assert tombs is None
    assert rstats == stats
    q = spark.createDataFrame(
        [(0, "apple banana"), (1, "iris"), (2, "")],
        "query_id long, text string",
    )
    for kwargs in ({}, {"max_df_frac": 0.5}):
        want = {
            (r["query_id"], r["doc_id"]): r["score"]
            for r in bm25_retrieve(docs, q, top_k=None, **kwargs).collect()
        }
        got = {
            (r["query_id"], r["doc_id"]): r["score"]
            for r in bm25_search(
                postings, q, rstats, top_k=None, df_frame=df_frame, **kwargs
            ).collect()
        }
        assert set(got) == set(want)
        for key, s in want.items():
            assert got[key] == pytest.approx(s, rel=1e-9)


def test_bm25_incremental_df_compaction_preserves_scores(spark, tmp_path):
    """compact_bm25_index_df folds the per-batch df delta rows to one
    per term (integer sums — exact); search results are unchanged and
    the df row count drops to the distinct-term count."""
    from bigdata_quality_assessment_spark.operators.text import (
        append_bm25_index,
        bm25_search,
        compact_bm25_index_df,
        open_bm25_index,
    )

    docs = _docs(spark, ["a b", "a c", "b c d", "a d"])
    path = str(tmp_path / "bm25_inc")
    for lo, hi in ((0, 2), (2, 3), (3, 4)):
        append_bm25_index(
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
            path,
            n_buckets=4,
        )
    q = spark.createDataFrame([(0, "a d")], "query_id long, text string")
    postings, df_frame, stats, _ = open_bm25_index(spark, path)
    before = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_search(
            postings, q, stats, top_k=None, df_frame=df_frame
        ).collect()
    }
    n = compact_bm25_index_df(spark, path)
    assert n == 4  # distinct terms a b c d
    postings2, df2, stats2, _ = open_bm25_index(spark, path)
    assert df2.count() == 4
    after = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_search(
            postings2, q, stats2, top_k=None, df_frame=df2
        ).collect()
    }
    assert after == before


def test_bm25_incremental_validation(spark, tmp_path):
    from bigdata_quality_assessment_spark.operators.text import (
        append_bm25_index,
        merge_bm25_stats,
    )

    docs = _docs(spark, ["a b"])
    path = str(tmp_path / "bm25_inc")
    append_bm25_index(docs, path, n_buckets=4)
    with pytest.raises(ValueError, match="n_buckets"):
        append_bm25_index(docs, path, n_buckets=8)
    with pytest.raises(ValueError, match="n_buckets"):
        merge_bm25_stats(
            {"n_docs": 1, "sum_dl": 2, "n_buckets": 4},
            {"n_docs": 1, "sum_dl": 2, "n_buckets": 8},
        )
    m = merge_bm25_stats(
        None, {"n_docs": 2, "sum_dl": 5, "n_buckets": 4},
        {"n_docs": 3, "sum_dl": 7, "n_buckets": 4},
    )
    assert m == {
        "n_docs": 5.0, "sum_dl": 12, "avgdl": 12 / 5, "n_buckets": 4,
    }


def test_bm25_incremental_search_plan_shape(spark, tmp_path):
    """Scale pins for the incremental layout's search (the round-14
    sf10 finding): (1) BOTH the postings and df-delta parquet scans
    carry a __bucket partition filter (whole files skipped before any
    join); (2) every broadcast hint's build side is query-scoped —
    qterms or the df-pruned per-term aggregate — never the raw
    df-delta or postings frames (corpus/vocabulary-shaped)."""
    from bigdata_quality_assessment_spark.operators.text import (
        append_bm25_index,
        bm25_search,
        open_bm25_index,
    )

    docs = _docs(spark, [f"word{i} filler text" for i in range(50)])
    path = str(tmp_path / "bm25_inc")
    append_bm25_index(docs.filter(F.col("doc_id") < 40), path, n_buckets=16)
    append_bm25_index(docs.filter(F.col("doc_id") >= 40), path)
    postings, df_frame, stats, _ = open_bm25_index(spark, path)
    q = spark.createDataFrame([(0, "word7")], "query_id long, text string")
    out = bm25_search(
        postings, q, stats, top_k=None, max_df_frac=0.9, df_frame=df_frame
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "PartitionFilters" in l]
    pruned = [l for l in scans if "__bucket" in l]
    assert len(pruned) >= 2, plan  # postings scan AND df-delta scan
    analyzed = out._jdf.queryExecution().analyzed().toString()
    for child in _hint_children(analyzed):
        # every hinted build side must mention the query-shaped frames'
        # lineage, never a bare parquet relation of df/postings
        assert "Relation" not in child, f"corpus-shaped broadcast:\n{child}"
    rows = out.collect()
    assert {r["doc_id"] for r in rows} == {7}


def test_bm25_delete_matches_rebuild_and_compaction(spark, tmp_path):
    """Deletion contract (round-14): after delete_bm25_docs, search
    scores are IDENTICAL to an index built on only the surviving
    documents (df decrements + tombstone anti-join + stats
    decrements); compact_bm25_index then rewrites the tombstoned
    postings out, clears tombstones/, and scores are unchanged with
    no anti-join needed."""
    import os

    from bigdata_quality_assessment_spark.operators.text import (
        append_bm25_index,
        bm25_search,
        compact_bm25_index,
        delete_bm25_docs,
        open_bm25_index,
    )

    texts = [
        "apple banana cherry", "apple apple date", "banana elder fig",
        "grape apple banana banana", "human iris joke",
        "apple kiwi", "lemon mango iris", "apple iris",
    ]
    docs = _docs(spark, texts)
    path = str(tmp_path / "bm25_del")
    append_bm25_index(docs.filter(F.col("doc_id") < 4), path, n_buckets=8)
    append_bm25_index(docs.filter(F.col("doc_id") >= 4), path)
    deleted = docs.filter(F.col("doc_id").isin(1, 6))
    stats = delete_bm25_docs(deleted, path)
    survivors = docs.filter(~F.col("doc_id").isin(1, 6))

    ref_path = str(tmp_path / "bm25_ref")
    ref_stats = append_bm25_index(survivors, ref_path, n_buckets=8)
    assert stats["n_docs"] == ref_stats["n_docs"]
    assert stats["sum_dl"] == ref_stats["sum_dl"]
    assert stats["avgdl"] == pytest.approx(ref_stats["avgdl"], rel=1e-12)

    q = spark.createDataFrame(
        [(0, "apple banana"), (1, "iris")], "query_id long, text string"
    )

    def scores(at):
        p, d, s, t = open_bm25_index(spark, at)
        return {
            (r["query_id"], r["doc_id"]): r["score"]
            for r in bm25_search(
                p, q, s, top_k=None, df_frame=d, tombstones=t
            ).collect()
        }

    want = scores(ref_path)
    got = scores(path)
    assert set(got) == set(want)
    assert 1 not in {d for (_q, d) in got} and 6 not in {d for (_q, d) in got}
    for key, v in want.items():
        assert got[key] == pytest.approx(v, rel=1e-9)

    # full compaction: tombstones gone, postings shrunk, scores equal
    before_rows = spark.read.parquet(os.path.join(path, "postings")).count()
    out = compact_bm25_index(spark, path)
    assert out["tombstones_dropped"] == 2
    assert out["postings_rows"] < before_rows
    assert not os.path.exists(os.path.join(path, "tombstones"))
    p2, d2, s2, t2 = open_bm25_index(spark, path)
    assert t2 is None
    assert d2.count() == out["df_rows"]
    after = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_search(p2, q, s2, top_k=None, df_frame=d2).collect()
    }
    assert set(after) == set(want)
    for key, v in want.items():
        assert after[key] == pytest.approx(v, rel=1e-9)


def test_bm25_crashed_append_is_invisible_and_recovered(spark, tmp_path):
    """Round-15 atomicity (ADVICE): the stats.json replace is the
    commit point of the three-write batch protocol. A crash after the
    parquet appends but before the stats write leaves orphan
    ``__batch`` directories that (a) open_bm25_index never reads
    (committed-prefix partition filter — search results match the
    pre-crash index exactly) and (b) the next serialized append
    removes before reusing the batch id (no double-counted rows)."""
    import os

    from bigdata_quality_assessment_spark.operators.text import (
        append_bm25_index,
        bm25_index_delta,
        bm25_search,
        open_bm25_index,
    )

    docs = _docs(spark, ["apple banana", "apple cherry", "banana date"])
    path = str(tmp_path / "bm25_crash")
    append_bm25_index(docs.filter(F.col("doc_id") < 2), path, n_buckets=4)
    q = spark.createDataFrame([(0, "apple banana")], "query_id long, text string")

    def scores():
        p, d, s, _t = open_bm25_index(spark, path)
        return s, {
            (r["query_id"], r["doc_id"]): r["score"]
            for r in bm25_search(p, q, s, top_k=None, df_frame=d).collect()
        }

    committed_stats, want = scores()

    # simulate the crash: batch 1's parquet lands, stats.json does not
    crash_batch = docs.filter(F.col("doc_id") == 2)
    postings, df_delta, _delta = bm25_index_delta(crash_batch, n_buckets=4)
    postings.withColumn("__batch", F.lit(1)).write.mode("append").partitionBy(
        "__batch", "__bucket"
    ).parquet(os.path.join(path, "postings"))
    df_delta.withColumn("__batch", F.lit(1)).write.mode("append").partitionBy(
        "__batch", "__bucket"
    ).parquet(os.path.join(path, "df"))
    assert os.path.isdir(os.path.join(path, "postings", "__batch=1"))

    got_stats, got = scores()
    assert got_stats == committed_stats  # uncommitted counters invisible
    assert got == want                   # uncommitted rows invisible

    # recovery: the next append reuses id 1 after removing the orphans
    append_bm25_index(crash_batch, path)
    p, d, s, _t = open_bm25_index(spark, path)
    assert s["n_batches"] == 2 and s["n_docs"] == 3.0
    # no double count: doc 2 contributes exactly one posting per term
    rows = p.filter(F.col("doc_id") == 2).collect()
    assert sorted(r["term"] for r in rows) == ["banana", "date"]

    ref_path = str(tmp_path / "bm25_crash_ref")
    append_bm25_index(docs, ref_path, n_buckets=4)
    pr, dr, sr, _tr = open_bm25_index(spark, ref_path)
    ref = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_search(pr, q, sr, top_k=None, df_frame=dr).collect()
    }
    _s, now = scores()
    assert set(now) == set(ref)
    for key, v in ref.items():
        assert now[key] == pytest.approx(v, rel=1e-9)


def test_bm25_needs_compaction_trigger(spark, tmp_path):
    """Round-15 compaction policy (VERDICT r14 Missing #2): the
    trigger stays off on a freshly-built index, flips on after many
    small appends (df_delta_ratio) and after a heavy delete
    (tombstone_frac), and resets after compact_bm25_index."""
    from bigdata_quality_assessment_spark.operators.text import (
        append_bm25_index,
        bm25_index_stats,
        bm25_needs_compaction,
        compact_bm25_index,
        delete_bm25_docs,
    )

    texts = ["alpha beta gamma"] * 8
    docs = _docs(spark, texts)
    path = str(tmp_path / "bm25_policy")
    append_bm25_index(docs.filter(F.col("doc_id") < 4), path, n_buckets=4)
    st = bm25_index_stats(spark, path)
    assert not bm25_needs_compaction(st)
    assert st["n_tombstones"] == 0 and st["tombstone_frac"] == 0.0

    # 4 more single-doc appends: the shared terms now carry 5 delta
    # rows each -> ratio well past the 3.0 default
    for i in range(4, 8):
        append_bm25_index(docs.filter(F.col("doc_id") == i), path)
    st = bm25_index_stats(spark, path)
    assert st["df_delta_ratio"] > 3.0
    assert bm25_needs_compaction(st)

    compact_bm25_index(spark, path)
    st = bm25_index_stats(spark, path)
    assert st["df_delta_ratio"] == 1.0
    assert not bm25_needs_compaction(st)

    # heavy delete: 3 of 8 docs tombstoned -> frac 0.375 > 0.2
    delete_bm25_docs(docs.filter(F.col("doc_id") < 3), path)
    st = bm25_index_stats(spark, path)
    assert st["n_tombstones"] == 3
    assert st["tombstone_frac"] == pytest.approx(3 / 8)
    assert bm25_needs_compaction(st)
    assert not bm25_needs_compaction(st, max_tombstone_frac=0.5)

    compact_bm25_index(spark, path)
    st = bm25_index_stats(spark, path)
    assert st["n_tombstones"] == 0
    assert not bm25_needs_compaction(st)


def test_bm25_compaction_drops_fully_deleted_terms(spark, tmp_path):
    """Round-15 (ADVICE): terms whose folded df sums to 0 — every
    contributing document deleted — are dropped from df/ at
    compaction instead of accumulating forever; scores on surviving
    terms are unchanged."""
    from bigdata_quality_assessment_spark.operators.text import (
        append_bm25_index,
        bm25_search,
        compact_bm25_index,
        delete_bm25_docs,
        open_bm25_index,
    )

    docs = _docs(spark, ["apple banana", "apple cherry", "unique banana"])
    path = str(tmp_path / "bm25_zero")
    append_bm25_index(docs, path, n_buckets=4)
    # doc 2 is the only holder of 'unique': its df folds to 0
    delete_bm25_docs(docs.filter(F.col("doc_id") == 2), path)
    compact_bm25_index(spark, path)
    p, d, s, t = open_bm25_index(spark, path)
    terms = {r["term"] for r in d.collect()}
    assert "unique" not in terms
    assert {"apple", "banana", "cherry"} <= terms
    q = spark.createDataFrame(
        [(0, "apple banana unique")], "query_id long, text string"
    )
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_search(p, q, s, top_k=None, df_frame=d).collect()
    }
    assert set(got) == {0, 1}  # doc 2 gone; 'unique' contributes nothing


def test_bm25_search_rejects_df_frame_on_denormalized_index(spark):
    """Round-15 (ADVICE): passing df_frame with a build_bm25_index
    postings frame (which already carries df) fails fast with a clear
    ValueError instead of an ambiguous-column AnalysisException at
    scoring time."""
    from bigdata_quality_assessment_spark.operators.text import (
        bm25_search,
        build_bm25_index,
    )

    docs = _docs(spark, ["apple banana", "apple cherry"])
    postings, stats = build_bm25_index(docs, n_buckets=4)
    q = spark.createDataFrame([(0, "apple")], "query_id long, text string")
    fake_df = postings.select("term", "df", "__bucket")
    with pytest.raises(ValueError, match="df_frame"):
        bm25_search(postings, q, stats, df_frame=fake_df)


def test_bm25_delete_is_idempotent_per_id(spark, tmp_path):
    """Round-15: re-deleting already-tombstoned ids is a no-op (the
    anti-join against committed tombstones), so a crashed caller —
    streaming.ingest.forget's BM25 leg — can re-run its delete safely;
    df and stats are decremented exactly once."""
    from bigdata_quality_assessment_spark.operators.text import (
        append_bm25_index,
        bm25_search,
        delete_bm25_docs,
        open_bm25_index,
    )

    docs = _docs(spark, ["apple banana", "apple cherry", "banana date"])
    path = str(tmp_path / "bm25_idem")
    append_bm25_index(docs, path, n_buckets=4)
    victim = docs.filter(F.col("doc_id") == 0)
    s1 = delete_bm25_docs(victim, path)
    s2 = delete_bm25_docs(victim, path)  # full replay: pure no-op
    assert s2 == s1
    # mixed replay: one already-deleted id + one fresh id — only the
    # fresh one contributes
    s3 = delete_bm25_docs(docs.filter(F.col("doc_id") < 2), path)
    assert s3["n_docs"] == 1.0 and s3["n_tombstones"] == 2
    p, d, s, t = open_bm25_index(spark, path)
    q = spark.createDataFrame([(0, "apple banana")], "query_id long, text string")
    got = {
        r["doc_id"]
        for r in bm25_search(p, q, s, top_k=None, df_frame=d, tombstones=t).collect()
    }
    assert got == {2}
    # df integrity: 'apple' was in docs 0+1, both deleted exactly once
    rows = {r["term"]: 0 for r in d.collect()}
    for r in d.collect():
        rows[r["term"]] = rows.get(r["term"], 0) + r["df"]
    assert rows["apple"] == 0 and rows["banana"] == 1


def test_bm25_open_materialized_handle_scores_identical(spark, tmp_path):
    """Round-16 (VERDICT r15 ask #7): open_bm25_index(materialize=True)
    folds the per-batch df deltas once per handle (exact integer sums)
    and stores them — repeated searches skip the per-batch delta-dir
    reads. Scores must be IDENTICAL to the plain handle, including
    under max_df_frac and with tombstones; the folded df frame carries
    one row per (term, bucket)."""
    from bigdata_quality_assessment_spark.operators.text import (
        append_bm25_index,
        bm25_search,
        delete_bm25_docs,
        open_bm25_index,
    )

    texts = [
        "apple banana cherry", "apple apple date", "banana elder fig",
        "grape apple banana banana", "human iris joke", "",
        "apple kiwi", "lemon mango iris",
    ]
    docs = _docs(spark, texts)
    path = str(tmp_path / "bm25_mat")
    append_bm25_index(docs.filter(F.col("doc_id") < 5), path, n_buckets=8)
    append_bm25_index(docs.filter(F.col("doc_id") >= 5), path)
    delete_bm25_docs(docs.filter(F.col("doc_id") == 3), path)

    q = spark.createDataFrame(
        [(0, "apple banana"), (1, "iris"), (2, "")],
        "query_id long, text string",
    )
    p0, d0, s0, t0 = open_bm25_index(spark, path)
    p1, d1, s1, t1 = open_bm25_index(spark, path, materialize=True)
    assert s1 == s0
    # folded: one row per (term, bucket); plain: one row per batch
    plain_rows = d0.count()
    folded = d1.collect()
    assert len(folded) == d0.select("term", "__bucket").distinct().count()
    assert len(folded) < plain_rows
    # totals preserved term by term (exact integers)
    want_df = {}
    for r in d0.collect():
        want_df[r["term"]] = want_df.get(r["term"], 0) + r["df"]
    got_df = {}
    for r in folded:
        got_df[r["term"]] = got_df.get(r["term"], 0) + r["df"]
    assert got_df == want_df
    for kwargs in ({}, {"max_df_frac": 0.5}):
        want = {
            (r["query_id"], r["doc_id"]): r["score"]
            for r in bm25_search(
                p0, q, s0, top_k=None, df_frame=d0, tombstones=t0, **kwargs
            ).collect()
        }
        got = {
            (r["query_id"], r["doc_id"]): r["score"]
            for r in bm25_search(
                p1, q, s1, top_k=None, df_frame=d1, tombstones=t1, **kwargs
            ).collect()
        }
        assert set(got) == set(want)
        for key, s in want.items():
            assert got[key] == pytest.approx(s, rel=1e-12)
