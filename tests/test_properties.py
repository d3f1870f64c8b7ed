"""Hypothesis property tests: numpy-parity for the numeric core
(interp, trapz, histogram, KDE mass) under randomized inputs — the
reference IS numpy, so `op(spark) == op(numpy)` is the strongest
property available (SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

floats = st.floats(min_value=-50, max_value=50, allow_nan=False, width=64)


@given(qs=st.lists(floats, min_size=1, max_size=25))
@SET
def test_interp_uniform_matches_numpy(spark, qs):
    from bigdata_quality_assessment_spark.operators.density import interp_uniform_grid

    gx = np.linspace(-60.0, 60.0, 31)
    gf = np.sin(gx / 7.0) * 3.0
    grid = spark.createDataFrame(
        [(int(i), float(x), float(f)) for i, (x, f) in enumerate(zip(gx, gf))],
        "node INT, grid_x DOUBLE, pdf DOUBLE",
    )
    q = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(qs)], "qid BIGINT, v DOUBLE"
    )
    got = {
        r["qid"]: r["fy"]
        for r in interp_uniform_grid(q, grid, q_col="v", out_col="fy").collect()
    }
    want = np.interp(np.array(qs), gx, gf)
    for i, w in enumerate(want):
        assert abs(got[i] - w) < 1e-9, (qs[i], got[i], w)


@given(
    fs=st.lists(floats, min_size=2, max_size=30),
)
@SET
def test_trapz_matches_numpy(spark, fs):
    from bigdata_quality_assessment_spark.operators.density import trapz

    xs = np.linspace(0.0, 1.0, len(fs)) ** 2  # irregular spacing
    df = spark.createDataFrame(
        [(float(x), float(f)) for x, f in zip(xs, fs)], "x DOUBLE, f DOUBLE"
    )
    got = trapz(df, "x", "f").first()["integral"]
    want = float(np.trapz(np.array(fs), xs))
    assert abs(got - want) < 1e-9 * max(1.0, abs(want))


@given(vals=st.lists(st.floats(min_value=0.0, max_value=100.0, allow_nan=False, width=64), min_size=1, max_size=60))
@SET
def test_histogram_matches_numpy(spark, vals):
    from bigdata_quality_assessment_spark.operators.density import histogram

    df = spark.createDataFrame([(float(v),) for v in vals], "v DOUBLE")
    h = histogram(df, "v", nbins=7, density=True, lo=0.0, hi=100.0)
    got = {r["bin"]: (r["cnt"], r["pdf"]) for r in h.collect()}
    want_cnt, edges = np.histogram(np.array(vals), bins=7, range=(0.0, 100.0))
    want_pdf, _ = np.histogram(np.array(vals), bins=7, range=(0.0, 100.0), density=True)
    for b in range(7):
        assert got[b][0] == int(want_cnt[b]), (b, got[b], want_cnt[b])
        assert abs(got[b][1] - float(want_pdf[b])) < 1e-9


@given(
    vals=st.lists(st.floats(min_value=-5, max_value=5, allow_nan=False, width=64), min_size=3, max_size=40),
    bw=st.floats(min_value=0.1, max_value=2.0, allow_nan=False, width=64),
)
@SET
def test_kde_integrates_to_one(spark, vals, bw):
    from bigdata_quality_assessment_spark.operators.density import kde_1d, trapz

    df = spark.createDataFrame([(float(v),) for v in vals], "v DOUBLE")
    lo, hi = min(vals) - 6 * bw, max(vals) + 6 * bw  # cover the kernel mass
    g = kde_1d(df, "v", bw=float(bw), ngrid=256, lo=float(lo), hi=float(hi))
    mass = trapz(g, "grid_x", "pdf").first()["integral"]
    assert abs(mass - 1.0) < 2e-3, mass


@given(
    changes=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),      # key
            st.floats(min_value=-10, max_value=10, allow_nan=False, width=64),
            st.sampled_from(["I", "U", "D"]),
        ),
        min_size=0,
        max_size=25,
    ),
    n_target=st.integers(min_value=0, max_value=5),
)
@SET
def test_apply_cdc_matches_dict_fold(spark, changes, n_target):
    """apply_cdc == a sequential python-dict fold of the change log in
    seq order, for any interleaving of I/U/D over overlapping keys."""
    from bigdata_quality_assessment_spark.operators.select import apply_cdc

    target_rows = [(k, float(k) * 100.0) for k in range(n_target)]
    # unique monotone seqs: list position
    change_rows = [
        (k, x, i, op) for i, (k, x, op) in enumerate(changes)
    ]
    target = spark.createDataFrame(
        target_rows, "k long, x double"
    ) if target_rows else spark.createDataFrame([], "k long, x double")
    log = spark.createDataFrame(
        change_rows, "k long, x double, seq long, op string"
    ) if change_rows else spark.createDataFrame([], "k long, x double, seq long, op string")

    got = {r.k: r.x for r in apply_cdc(target, log, "k").collect()}

    state = dict(target_rows)
    for k, x, _seq, op in sorted(change_rows, key=lambda r: r[2]):
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = x
    assert got == state


@given(
    counts=st.lists(st.integers(min_value=0, max_value=40), min_size=0, max_size=40),
    budget=st.integers(min_value=8, max_value=32),
)
@SET
def test_pack_sequences_invariants(spark, counts, budget):
    """Invariants for any chunk stream: every chunk assigned exactly
    once; non-oversize sequences within budget; seq_tokens consistent."""
    from bigdata_quality_assessment_spark.operators.text import pack_sequences

    rows = [(i, 0, c) for i, c in enumerate(counts)]
    df = spark.createDataFrame(
        rows, "doc_id long, chunk_id long, n_chunk_tokens long"
    ).coalesce(1) if rows else spark.createDataFrame(
        [], "doc_id long, chunk_id long, n_chunk_tokens long"
    )
    out = pack_sequences(df, max_tokens=budget).collect()
    assert len(out) == len(rows)
    assert sorted(r.doc_id for r in out) == sorted(r[0] for r in rows)
    seqs = {}
    for r in out:
        seqs.setdefault(r.seq_id, []).append(r)
    for rows_ in seqs.values():
        tot = sum(r.n_chunk_tokens for r in rows_)
        assert all(r.seq_tokens == tot for r in rows_)
        if not any(r.oversize for r in rows_):
            assert tot <= budget
        else:
            assert len(rows_) == 1  # oversize chunks are singletons


@given(
    vals=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=300),
    capacity=st.integers(min_value=4, max_value=32),
)
@SET
def test_misra_gries_bounds_property(spark, vals, capacity):
    from collections import Counter

    from bigdata_quality_assessment_spark.operators.sketch import frequent_items

    df = spark.createDataFrame([(f"i{v}",) for v in vals], "item string").coalesce(1)
    out = frequent_items(df, "item", k=capacity, capacity=capacity).collect()
    exact = Counter(f"i{v}" for v in vals)
    n = len(vals)
    got = {r.item: (r.est_count, r.max_error) for r in out}
    for item, cnt in exact.items():
        if cnt > n / capacity:
            assert item in got, (item, cnt, n, capacity)
    for item, (est, err) in got.items():
        assert est <= exact[item] <= est + err


_words = st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"])
_doc = st.lists(_words, min_size=0, max_size=24).map(" ".join)


@given(texts=st.lists(_doc, min_size=1, max_size=8))
@SET
def test_dedup_spans_matches_python_reference(spark, texts):
    """Random tiny-vocabulary corpora (maximal span collisions): the
    operator's keep/remove decisions and reassembled text equal a
    direct python implementation of first-global-occurrence-wins."""
    from bigdata_quality_assessment_spark.operators.text import dedup_spans

    span = 3
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {r["doc_id"]: r for r in dedup_spans(docs, span).collect()}

    # python reference
    spans = {}
    for i, t in enumerate(texts):
        ws = [w for w in t.split(" ") if w]
        spans[i] = [" ".join(ws[k: k + span]) for k in range(0, len(ws), span)]
    counts = {}
    for i in sorted(spans):
        for s in spans[i]:
            counts[s] = counts.get(s, 0) + 1
    firsts = {}
    for i in sorted(spans):
        for sid, s in enumerate(spans[i]):
            firsts.setdefault(s, (i, sid))
    for i, t in enumerate(texts):
        kept = [
            s for sid, s in enumerate(spans[i])
            if counts[s] < 2 or firsts[s] == (i, sid)
        ]
        r = got[i]
        assert r["n_spans"] == len(spans[i])
        assert r["n_spans_removed"] == len(spans[i]) - len(kept)
        expect = " ".join(kept) if spans[i] else None
        assert r["text_deduped"] == expect, (i, texts)


@given(texts=st.lists(_doc, min_size=1, max_size=6))
@SET
def test_ngram_lm_matches_python_reference(spark, texts):
    """Self-trained bigram perplexity equals the closed-form python
    computation on arbitrary random corpora (incl. empty docs)."""
    from collections import Counter

    from bigdata_quality_assessment_spark.operators.text import ngram_lm_score

    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {r["doc_id"]: r for r in ngram_lm_score(docs, add_k=0.5).collect()}

    def pairs(t):
        ws = [w for w in t.split(" ") if w]
        return list(zip(["<s>"] + ws[:-1], ws))

    bi = Counter(p for t in texts for p in pairs(t))
    ctx = Counter()
    for (pv, _), c in bi.items():
        ctx[pv] += c
    v = len({w for t in texts for w in t.split(" ") if w})
    for i, t in enumerate(texts):
        ps = pairs(t)
        r = got[i]
        assert r["n_lm_tokens"] == len(ps)
        if not ps:
            assert r["ppl"] is None
            continue
        lp = sum(np.log((bi[p] + 0.5) / (ctx[p[0]] + 0.5 * v)) for p in ps) / len(ps)
        assert r["avg_logp"] == pytest.approx(lp, rel=1e-10, abs=1e-12)


@given(texts=st.lists(_doc, min_size=1, max_size=6))
@SET
def test_dedup_substrings_matches_python_reference(spark, texts):
    """Windowed exact-substring dedup equals the direct python
    computation of covered-position excision on random tiny-vocabulary
    corpora (heavy unaligned collisions by construction)."""
    from bigdata_quality_assessment_spark.operators.text import dedup_substrings

    L = 3
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {r["doc_id"]: r for r in dedup_substrings(docs, min_tokens=L).collect()}

    toks = {i: [w for w in t.split(" ") if w] for i, t in enumerate(texts)}
    grams = {}
    for i in sorted(toks):
        ws = toks[i]
        for p in range(max(len(ws) - L + 1, 0)):
            grams.setdefault(tuple(ws[p : p + L]), []).append((i, p))
    removed = {i: set() for i in toks}
    for g, occ in grams.items():
        if len(occ) >= 2:
            for (i, p) in occ[1:]:  # occurrences after the global first
                removed[i].update(range(p, p + L))
    for i, ws in toks.items():
        kept = [w for q, w in enumerate(ws) if q not in removed[i]]
        r = got[i]
        assert r["n_tokens"] == len(ws)
        assert r["n_tokens_removed"] == len(removed[i])
        expect = " ".join(kept) if ws else None
        assert r["text_deduped"] == expect, (i, texts)


# ------------------------------------------------------------------
# Round-8 Arrow scoring paths: property fuzz — the gemm brute-force
# kNN must agree with the Catalyst fold on ARBITRARY degenerate
# corpora (null vectors, ragged dims, zero norms, duplicate values).
# ------------------------------------------------------------------

_vec = st.one_of(
    st.none(),
    st.lists(floats, min_size=0, max_size=6),
)


@given(vecs=st.lists(_vec, min_size=2, max_size=14))
@SET
def test_brute_knn_gemm_matches_fold_on_degenerate_corpora(spark, vecs):
    from bigdata_quality_assessment_spark.operators.similarity import (
        knn_brute_force,
    )

    rows = [(i, v) for i, v in enumerate(vecs)]
    corpus = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    q = corpus.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def key(df):
        out = {}
        for r in df.collect():
            c = r["cosine"]
            out[(r["query_id"], r["rank"])] = (
                r["vec_id"],
                None if c is None else round(c, 9),
            )
        return out

    a = key(knn_brute_force(corpus, q, k=4, impl="arrow"))
    s = key(knn_brute_force(corpus, q, k=4, impl="sql"))
    assert set(a) == set(s)
    for kk, (vid, cos) in s.items():
        avid, acos = a[kk]
        # identical candidate at every rank; cosine equal up to
        # accumulation-order float noise (gemm vs strict fold)
        assert avid == vid, (kk, avid, vid, vecs)
        if cos is None:
            assert acos is None, (kk, vecs)
        else:
            assert acos is not None and abs(acos - cos) < 1e-9, (kk, vecs)


@given(vecs=st.lists(_vec, min_size=3, max_size=10))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ann_candidate_scoring_arrow_matches_sql_on_degenerate(spark, vecs):
    """The bucketed tiers' Arrow candidate scorer (query vectors in
    the closure) must agree with the fold on arbitrary degenerate
    corpora too — same (id, rank) sets; buckets drop invalid vectors
    identically on both paths."""
    from bigdata_quality_assessment_spark.operators.similarity import (
        _hyperplanes,
        ann_hyperplane_knn,
    )

    rows = [(i, v) for i, v in enumerate(vecs)]
    corpus = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    q = corpus.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    planes = [_hyperplanes(4, 3, 5 + t) for t in range(2)]

    def key(df):
        return sorted(
            (r["query_id"], r["rank"], r["vec_id"]) for r in df.collect()
        )

    a = key(ann_hyperplane_knn(corpus, q, dim=4, k=3, n_planes=3,
                               n_tables=2, planes=planes, impl="arrow"))
    s = key(ann_hyperplane_knn(corpus, q, dim=4, k=3, n_planes=3,
                               n_tables=2, planes=planes, impl="sql"))
    assert a == s, (a, s, vecs)


# ---- round-9 Arrow/Catalyst equivalence fuzz (text family) -----------

# texts exercising the token-boundary edge cases: space runs, leading/
# trailing spaces, unicode, repetition — the shapes the per-doc Counter
# and the tagged-explode must agree on exactly
_text_alpha = st.text(
    alphabet=st.sampled_from(list("ab c") + ["é", "世", " "]),
    min_size=0,
    max_size=40,
)


@given(texts=st.lists(st.one_of(st.none(), _text_alpha), min_size=1, max_size=8))
@SET
def test_ngram_repetition_arrow_sql_fuzz(spark, texts):
    from bigdata_quality_assessment_spark.operators.text import (
        ngram_repetition_stats,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    a = {r["doc_id"]: tuple(r) for r in ngram_repetition_stats(docs, impl="arrow").collect()}
    s = {r["doc_id"]: tuple(r) for r in ngram_repetition_stats(docs, impl="sql").collect()}
    assert a == s


@given(texts=st.lists(st.one_of(st.none(), _text_alpha), min_size=1, max_size=8))
@SET
def test_doc_fingerprints_arrow_sql_fuzz(spark, texts):
    from bigdata_quality_assessment_spark.operators.text import doc_fingerprints

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    a = {
        (r["doc_id"], r["fp"])
        for r in doc_fingerprints(docs, k=4, mod_p=1, impl="arrow").collect()
    }
    s = {
        (r["doc_id"], r["fp"])
        for r in doc_fingerprints(docs, k=4, mod_p=1, impl="sql").collect()
    }
    assert a == s
