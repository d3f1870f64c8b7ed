#!/usr/bin/env python
"""Generate the committed planted-recall fixture (round-11 verdict ask #1):
a small realistic-text corpus (sources/textgen.py — Zipfian 50k vocab,
planted dup/near/contam ground truth) written ONCE to
``fixtures/textgen_recall.parquet`` so the graded registry and the DuckDB
oracle read the identical bytes. The corpus is a pure function of
(seed, doc_id) under a counter RNG, so regeneration is deterministic —
``tests/test_textgen.py::test_recall_fixture_matches_generator`` re-derives
it per-run and fails if the committed file ever drifts from the code.

Same committed-fixture discipline as the m4 loop golden
(tools/gen_loop_golden.py).
"""
from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_DOCS = 2000
SEED = 0

def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdata_quality_assessment_spark.session import build_session
    from bigdata_quality_assessment_spark.sources.textgen import (
        realistic_documents,
    )

    spark = build_session(master="local[8]", shuffle_partitions=8)
    pdf = (
        realistic_documents(spark, N_DOCS, seed=SEED)
        .orderBy("doc_id")
        .toPandas()
    )
    out = REPO / "fixtures" / "textgen_recall.parquet"
    out.parent.mkdir(exist_ok=True)
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
            ("role", pa.string()),
            ("src_id", pa.int64()),
        ]
    )
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema), out)
    n_roles = pdf.groupby("role").size().to_dict()
    print(f"wrote {out} ({len(pdf)} docs, roles={n_roles})")
    spark.stop()


if __name__ == "__main__":
    main()
