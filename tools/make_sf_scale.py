#!/usr/bin/env python
"""Scale-up testdata generator: replicate an sf dir N× into a local
parquet dir for multi-SF scaling measurements (round-5 verdict #1 —
the 100 TB story needs a measured sf0.1→sf1 curve, not just plan
arithmetic).

Semantics of the ×N replication (fact tables only; dims copy as-is,
mirroring how a real workload grows facts against stable dims):

* ``lineitem``  — l_orderkey offset per replica (order structure and
  value distributions preserved; point_id = orderkey*10+linenumber
  stays unique).
* ``events``    — event_id and user_id offset per replica; timestamps
  unchanged, so the event RATE grows ×N over the same wall-clock span
  (what higher traffic looks like) and per-user series stay realistic.
* ``documents`` — doc_id offset; for replicas > 0 the token order is
  deterministically permuted (xxhash64(word, pos, replica) sort key),
  which preserves token/length statistics but destroys shingle
  overlap, so near-dedup candidate structure scales ~linearly instead
  of exploding with N² cross-replica duplicate pairs.
* ``embeddings`` — vec_id offset, vectors unchanged.

Usage: python tools/make_sf_scale.py [src_sf_dir] [dest_dir] [N]
Default: /root/testdata/sf0.1 -> <repo>/.localdata/sf1, N=10.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DIM_TABLES = ("region", "nation", "customer", "supplier", "part", "orders")


def main() -> None:
    from pyspark.sql import functions as F

    from bigdata_quality_assessment_spark.session import build_session
    from bigdata_quality_assessment_spark.sources.tables import load_table

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dest = Path(sys.argv[2]) if len(sys.argv) > 2 else REPO / ".localdata" / "sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    dest.mkdir(parents=True, exist_ok=True)

    spark = build_session(
        app_name="make_sf_scale",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    for t in DIM_TABLES:
        shutil.copy(Path(src) / f"{t}.parquet", dest / f"{t}.parquet")

    reps = spark.range(n).select(F.col("id").alias("__r"))

    def offset(col: str, df):
        mx = df.agg(F.max(col)).first()[0] + 1
        return (F.col(col) + F.col("__r") * F.lit(int(mx))).alias(col)

    li = load_table(spark, "lineitem", src)
    li.crossJoin(reps).select(
        offset("l_orderkey", li), *[c for c in li.columns if c != "l_orderkey"]
    ).write.mode("overwrite").parquet(str(dest / "lineitem.parquet"))

    # read events RAW (not via load_table, which normalizes ts to
    # epoch-nanos long): the replica must keep the source's TIMESTAMP
    # storage so the DuckDB oracle SQL (epoch_ns(ts)) binds at every
    # SF — round-6 find: the sf1 replica stored ts as BIGINT and the
    # streaming-metrics oracle failed to bind there
    ev = spark.read.parquet(f"{src}/events.parquet")
    ev.crossJoin(reps).select(
        offset("event_id", ev),
        "ts",
        offset("user_id", ev),
        "event_type",
        "value",
        "props",
    ).write.mode("overwrite").parquet(str(dest / "events.parquet"))

    docs = load_table(spark, "documents", src)
    shuffled = F.array_join(
        F.transform(
            F.array_sort(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w, i: F.struct(
                        F.xxhash64(w, i, F.col("__r")).alias("k"), w.alias("w")
                    ),
                )
            ),
            lambda s: s["w"],
        ),
        " ",
    )
    docs.crossJoin(reps).select(
        offset("doc_id", docs),
        F.when(F.col("__r") == 0, F.col("text")).otherwise(shuffled).alias("text"),
        *[c for c in docs.columns if c not in ("doc_id", "text")],
    ).write.mode("overwrite").parquet(str(dest / "documents.parquet"))

    emb = load_table(spark, "embeddings", src)
    emb.crossJoin(reps).select(
        offset("vec_id", emb), *[c for c in emb.columns if c != "vec_id"]
    ).write.mode("overwrite").parquet(str(dest / "embeddings.parquet"))

    for t in ("lineitem", "events", "documents", "embeddings"):
        print(t, spark.read.parquet(str(dest / f"{t}.parquet")).count())
    spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
