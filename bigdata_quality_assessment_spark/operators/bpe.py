"""Byte-pair-encoding tokenizer: driver-trained merge table, executor
Arrow-batched encode (engine extension; extends the regex token
counting of operators/text.py to REAL subword tokenization — the token
counts an LLM training pipeline actually budgets with).

Algorithm: classic BPE (Sennrich et al. 2015, arXiv:1508.07909) over
whitespace words with an end-of-word marker. Training is driver-side
on a BOUNDED sample (the merge table is the model — a few thousand
string pairs, kilobytes); encoding ships the merge ranks to executors
inside a ``mapInPandas`` closure and applies them greedily per word
with a per-batch word cache — natural-language batches repeat words
heavily, so the cache collapses most of the per-row work to a dict
hit. No shuffle anywhere: train reads a ``limit`` sample, encode is a
narrow map over the corpus.

Known limitation: a corpus whose TEXT contains the literal marker
string ``</w>`` can merge character runs into a symbol equal to the
marker, making token streams ambiguous (the standard weakness of
string-level BPE; byte-level BPE is the production answer). Rebind
``EOW`` to a string absent from the corpus when this matters.

The 100 TB posture mirrors every model-bearing operator in this repo
(ensemble train → broadcast infer): fit small on the driver, apply
wide on the cluster.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .partitioning import ensure_min_parallelism

EOW = "</w>"


def _word_freqs(texts) -> Counter:
    wf: Counter = Counter()
    for t in texts:
        if t:
            wf.update(t.split(" "))
    wf.pop("", None)
    return wf


def train_bpe(
    docs: DataFrame,
    n_merges: int = 200,
    sample_n: int = 10_000,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge table from a bounded corpus sample.
    Returns ``[(left, right), ...]`` — merge i has rank i; earlier
    merges apply first at encode time. Deterministic: ties in pair
    frequency break lexicographically."""
    texts = [r[0] for r in docs.select(text_col).limit(sample_n).collect()]
    wf = _word_freqs(texts)
    vocab = {w: tuple(w) + (EOW,) for w in wf}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, freq in wf.items():
            sym = vocab[w]
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        # max by (freq, pair) with lexicographic tie-break, deterministic
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        for w in vocab:
            sym = vocab[w]
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            vocab[w] = tuple(out)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode of one word: repeatedly apply the
    lowest-ranked applicable merge (the reference implementation the
    distributed path is tested against)."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col: array<string>`` — the BPE token stream of
    ``text_col`` (whitespace-split words, each greedily merged, EOW
    marker fused into each word's final token). One ``mapInPandas``
    pass; the merge table rides in the task closure (kilobytes); a
    per-batch word->tokens cache collapses repeated words to dict
    hits."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    # NB: a fresh StructType — StructType.add would MUTATE the frame's
    # cached schema object and desync it from the actual plan
    schema = T.StructType(
        list(docs.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    )

    def encode_batches(batches):
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def enc_text(t):
            if not t:
                return []
            out = []
            for w in t.split(" "):
                if not w:
                    continue
                toks = cache.get(w)
                if toks is None:
                    toks = encode_word(w, ranks)
                    # fuse a standalone EOW marker into the last real
                    # token so the stream length equals the subword
                    # count (encode_word's final symbol otherwise
                    # always ends with EOW already)
                    if toks[-1] == EOW and len(toks) > 1:
                        toks = toks[:-2] + [toks[-2] + EOW]
                    cache[w] = toks
                out.extend(toks)
            return out

        for pdf in batches:
            pdf[out_col] = pd.Series([enc_text(t) for t in pdf[text_col]], index=pdf.index, dtype=object)
            yield pdf

    # per-row Python merge loops — widen an under-split local input so
    # they parallelize (no-op at real split counts)
    return ensure_min_parallelism(docs).mapInPandas(encode_batches, schema=schema)


def bpe_token_count(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Per-document BPE token count — the budgeting statistic."""
    enc = bpe_encode(docs, merges, text_col, out_col="__toks")
    return enc.withColumn(out_col, F.size("__toks")).drop("__toks")
