#!/usr/bin/env python
"""Generate the committed planted-embedding-recall fixture (round-12
verdict ask #1): a small embedding corpus with planted exact- and
near-duplicates at controlled cosine (sources/embgen.py), written ONCE
to ``fixtures/embgen_recall.parquet`` so the graded registry and the
DuckDB oracle read the identical bytes. The corpus is a pure function
of (seed, vec_id) under a counter RNG, so regeneration is
deterministic — ``tests/test_embgen.py`` re-derives it per-run and
fails if the committed file ever drifts from the code.

Same committed-fixture discipline as tools/gen_recall_fixture.py
(the round-11 text recall fixture).
"""
from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_VECS = 2000
SEED = 0

def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bigdata_quality_assessment_spark.session import build_session
    from bigdata_quality_assessment_spark.sources.embgen import (
        planted_embeddings,
    )

    spark = build_session(master="local[8]", shuffle_partitions=8)
    pdf = (
        planted_embeddings(spark, N_VECS, seed=SEED)
        .orderBy("vec_id")
        .toPandas()
    )
    out = REPO / "fixtures" / "embgen_recall.parquet"
    out.parent.mkdir(exist_ok=True)
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
            ("role", pa.string()),
            ("src_id", pa.int64()),
        ]
    )
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema), out)
    n_roles = pdf.groupby("role").size().to_dict()
    print(f"wrote {out} ({len(pdf)} vecs, roles={n_roles})")
    spark.stop()


if __name__ == "__main__":
    main()
