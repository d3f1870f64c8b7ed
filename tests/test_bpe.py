"""BPE tokenizer tests: hand-verified merges on a classic corpus,
python-reference parity for the distributed encode, reconstruction
property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.operators.bpe import (
    EOW,
    bpe_encode,
    bpe_token_count,
    encode_word,
    train_bpe,
)


@pytest.fixture(scope="module")
def toy_docs(spark):
    # the Sennrich running example: low/lower/newest/widest family
    rows = [
        (0, "low low low low low"),
        (1, "lower lower"),
        (2, "newest newest newest newest newest newest"),
        (3, "widest widest widest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_bpe_learns_frequent_pairs(toy_docs):
    merges = train_bpe(toy_docs, n_merges=10)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    # the est</w> suffix family dominates newest/widest and must fully
    # merge within 10 rounds; low compresses to a single token
    assert encode_word("newest", ranks)[-1].endswith("est" + EOW)
    assert len(encode_word("newest", ranks)) <= 3
    assert encode_word("low", ranks)[0].startswith("low")
    # determinism: retraining yields the identical table
    assert merges == train_bpe(toy_docs, n_merges=10)


def test_encode_word_greedy_rank_order():
    ranks = {("e", "s"): 0, ("es", "t"): 1, ("est", EOW): 2, ("l", "o"): 3, ("lo", "w"): 4}
    assert encode_word("newest", ranks) == ["n", "e", "w", "est" + EOW]
    assert encode_word("low", ranks) == ["low", EOW]
    assert encode_word("xyz", ranks) == ["x", "y", "z", EOW]


def test_bpe_encode_distributed_matches_reference(toy_docs, spark):
    merges = train_bpe(toy_docs, n_merges=10)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    enc = {r.doc_id: r.bpe_tokens for r in bpe_encode(toy_docs, merges).collect()}
    for row in toy_docs.collect():
        expect = []
        for w in row.text.split(" "):
            toks = encode_word(w, ranks)
            if toks[-1] == EOW and len(toks) > 1:
                toks = toks[:-2] + [toks[-2] + EOW]
            expect.extend(toks)
        assert enc[row.doc_id] == expect, row.doc_id
        # reconstruction: stripping EOW and joining yields the text
        rebuilt = "".join(enc[row.doc_id]).replace(EOW, " ").rstrip()
        assert rebuilt == row.text


def test_bpe_token_count_and_empty(spark, toy_docs):
    merges = train_bpe(toy_docs, n_merges=10)
    docs = spark.createDataFrame(
        [(0, "newest low"), (1, ""), (2, None)], "doc_id long, text string"
    )
    out = {r.doc_id: r.n_bpe_tokens for r in bpe_token_count(docs, merges).collect()}
    assert out[1] == 0 and out[2] == 0
    assert out[0] >= 2  # a merged corpus word + at least one token for 'low'
    # more merges -> never more tokens on trained words
    out_few = {r.doc_id: r.n_bpe_tokens for r in bpe_token_count(docs, train_bpe(toy_docs, n_merges=2)).collect()}
    assert out[0] <= out_few[0]
