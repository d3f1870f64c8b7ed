#!/usr/bin/env python
"""Measured-cost lens for the text-family Catalyst HOF lambda sites
(round-9 verdict ask #6): time each operator whose plan contains an
interpreted higher-order-function lambda at a given SF dir, plus the
one A/B this round's migration created (doc_fingerprints arrow vs the
rolling-hash fold). Median-of-3, same hygiene as bench.py.

    python tools/bench_text_hof.py .localdata/sf1

Prints one JSON line; findings land in PLANS.md (the per-site
classification table).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    from pyspark.sql import functions as F

    from bigdata_quality_assessment_spark.operators.text import (
        dedup_substrings,
        doc_fingerprints,
        minhash_signatures,
        ngram_lm_score,
        ngram_repetition_stats,
        simhash,
        text_stats,
    )
    from bigdata_quality_assessment_spark.session import build_session
    from bigdata_quality_assessment_spark.sources.tables import load_table

    spark = build_session(
        app_name="bench_text_hof",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark.sparkContext._jvm

    docs = load_table(spark, "documents", sf_dir)
    n_docs = docs.count()
    n_tokens = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("t")
    ).first()["t"]

    queries = {
        # O(tokens)/row HOF sites under test
        "ngram_repetition_stats": lambda: ngram_repetition_stats(docs)
        .agg(F.sum("dup_word_frac"), F.sum("top_bigram_frac")).collect(),
        "minhash_signatures": lambda: minhash_signatures(docs, n_hashes=128)
        .select(F.min(F.element_at("sig", 1)), F.count(F.lit(1))).collect(),
        "simhash": lambda: simhash(docs)
        .agg(F.min("simhash"), F.count(F.lit(1))).collect(),
        "bigram_lm_score": lambda: ngram_lm_score(docs)
        .agg(F.sum("n_lm_tokens")).collect(),
        "dedup_substrings": lambda: dedup_substrings(docs, 10)
        .agg(F.sum("n_tokens_removed")).collect(),
        # the round-9 A/B: arrow migration vs the interpreted fold
        "doc_fingerprints_arrow": lambda: doc_fingerprints(
            docs, k=8, mod_p=16, impl="arrow"
        ).count(),
        "doc_fingerprints_fold": lambda: doc_fingerprints(
            docs, k=8, mod_p=16, impl="sql"
        ).count(),
        # HOF-free reference point for per-token cost framing
        "text_stats": lambda: text_stats(docs)
        .agg(F.sum("n_tokens")).collect(),
    }
    meds: dict[str, float] = {}
    stats: dict[str, dict[str, float]] = {}
    for name, fn in queries.items():
        samples = []
        for _ in range(n_runs):
            spark.catalog.clearCache()
            jvm.System.gc()
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        meds[name] = round(statistics.median(samples), 3)
        stats[name] = {
            "median": meds[name],
            "spread": round(max(samples) - min(samples), 3),
            "n_runs": n_runs,
        }
    spark.stop()
    print(json.dumps({
        "sf_dir": sf_dir, "n_docs": n_docs, "n_tokens": int(n_tokens),
        "queries": meds, "stats": stats,
    }))


if __name__ == "__main__":
    main()
