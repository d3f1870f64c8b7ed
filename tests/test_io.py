"""CSV/JSONL ingest + lake sink: schema enforcement, corrupt-row
quarantine, partition pruning on the landed layout."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigdata_quality_assessment_spark.sources.io import (
    quarantine,
    read_csv,
    read_jsonl,
    write_lake,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def test_csv_roundtrip_and_quarantine(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,lang,score\n1,en,0.5\n2,de,0.25\nnot_a_number,xx,zzz\n3,fr,1.0\n")
    df = read_csv(spark, str(p), SCHEMA)
    clean, corrupt = quarantine(df)
    rows = {r["id"]: r for r in clean.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2]["score"] == 0.25
    bad = corrupt.collect()
    assert len(bad) == 1 and "not_a_number" in bad[0]["_corrupt_record"]


def test_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "lang": "en", "score": 0.5}\n'
        "{this is not json}\n"
        '{"id": 2, "lang": "de", "score": 1.5}\n'
    )
    clean, corrupt = quarantine(read_jsonl(spark, str(p), SCHEMA))
    assert {r["id"] for r in clean.collect()} == {1, 2}
    assert corrupt.count() == 1


def test_write_lake_partition_pruning(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, ["en", "de", "fr"][i % 3], float(i)) for i in range(30)], SCHEMA
    )
    out = str(tmp_path / "lake")
    write_lake(df, out, partition_cols=["lang"], max_records_per_file=7)
    back = spark.read.parquet(out)
    assert back.count() == 30
    q = back.filter(F.col("lang") == "de")
    assert q.count() == 10
    plan = q._jdf.queryExecution().executedPlan().toString()
    # directory-partition pruning: the de-filter becomes a PartitionFilter
    # on the scan, not a row filter over all three partitions
    assert "PartitionFilters: [isnotnull(lang" in plan or "PartitionFilters: [(lang" in plan, plan


def test_csv_failfast_raises(spark, tmp_path):
    import pytest
    from py4j.protocol import Py4JJavaError

    p = tmp_path / "bad.csv"
    p.write_text("id,lang,score\n1,en,0.5\nboom,xx,zzz\n")
    df = read_csv(spark, str(p), SCHEMA, mode="FAILFAST")
    with pytest.raises(Exception):
        df.collect()


def test_orc_lake_roundtrip_and_pruning(spark, tmp_path):
    from bigdata_quality_assessment_spark.sources.io import read_lake

    df = spark.createDataFrame(
        [(i, ["en", "de", "fr"][i % 3], float(i)) for i in range(30)], SCHEMA
    )
    out = str(tmp_path / "orc_lake")
    write_lake(df, out, partition_cols=["lang"], format="orc")
    back = read_lake(spark, out, format="orc")
    assert back.count() == 30
    assert sorted(back.columns) == sorted(df.columns)
    # values identical to the parquet path
    a = sorted(map(tuple, back.select("id", "lang", "score").collect()))
    b = sorted(map(tuple, df.select("id", "lang", "score").collect()))
    assert a == b
    q = back.filter(F.col("lang") == "de")
    assert q.count() == 10
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan or "PartitionFilters: [(lang" in plan, plan
    # statistics pushdown reaches the ORC scan for data columns too
    p2 = (
        back.filter(F.col("id") > 20)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in p2 and "GreaterThan(id,20)" in p2, p2


def test_write_lake_rejects_unknown_format(spark, tmp_path):
    import pytest

    df = spark.createDataFrame([(1, "en", 0.5)], SCHEMA)
    with pytest.raises(ValueError):
        write_lake(df, str(tmp_path / "x"), format="avro")


def test_zorder_key_matches_python_morton(spark):
    from bigdata_quality_assessment_spark.sources.io import zorder_key

    import pytest as _pt

    def morton(vals, bits):
        out = 0
        n = len(vals)
        for b in range(bits):
            for i, v in enumerate(vals):
                out |= ((v >> b) & 1) << (b * n + i)
        return out

    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r.x, r.y): r.z for r in
           df.withColumn("z", zorder_key(["x", "y"], bits=4)).collect()}
    for x, y in rows:
        assert got[(x, y)] == morton([x, y], 4), (x, y)
    # aligned 2x2 blocks are contiguous in morton rank (the locality
    # property data-skipping relies on)
    ranked = sorted(rows, key=lambda p: got[p])
    pos = {p: i for i, p in enumerate(ranked)}
    for bx in range(0, 8, 2):
        for by in range(0, 8, 2):
            block = [pos[(bx + dx, by + dy)] for dx in (0, 1) for dy in (0, 1)]
            assert max(block) - min(block) == 3, (bx, by, block)
    with _pt.raises(ValueError):
        zorder_key(["x", "y"], bits=32)


def test_write_clustered_tightens_file_ranges(spark, tmp_path):
    import random

    from bigdata_quality_assessment_spark.sources.io import write_clustered

    random.seed(3)
    rows = [(random.randrange(256), random.randrange(256)) for _ in range(4000)]
    df = spark.createDataFrame(rows, "x long, y long")
    clustered = str(tmp_path / "clustered")
    plain = str(tmp_path / "plain")
    write_clustered(df.repartition(8), clustered, ["x", "y"], n_files=8, zorder_bits=8)
    df.repartition(8).write.parquet(plain)

    def mean_span(path, col):
        back = spark.read.parquet(path).withColumn("f", F.input_file_name())
        spans = back.groupBy("f").agg(
            (F.max(col) - F.min(col)).alias("span")
        ).collect()
        return sum(r.span for r in spans) / len(spans)

    # z-clustering shrinks BOTH columns' per-file value ranges vs the
    # random layout (this is exactly what row-group pruning exploits)
    for col in ("x", "y"):
        assert mean_span(clustered, col) < 0.7 * mean_span(plain, col), col
    # rows survive exactly
    a = sorted(map(tuple, spark.read.parquet(clustered).collect()))
    assert a == sorted(rows)


def test_compact_lake_and_partition_stats(spark, tmp_path):
    from bigdata_quality_assessment_spark.sources.io import (
        compact_lake,
        partition_stats,
    )
    import os

    path = str(tmp_path / "many")
    df = spark.createDataFrame([(i, float(i)) for i in range(1000)], "id long, v double")
    df.repartition(20).write.parquet(path)  # 20 small files
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_before == 20
    n_files = compact_lake(spark, path, target_records_per_file=500)
    assert n_files == 2
    n_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_after == 2
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert sorted(r.id for r in back.collect()) == list(range(1000))

    ps = partition_stats(back)
    rows = ps.collect()
    assert sum(r.rows for r in rows) == 1000
    assert all(r.rows > 0 for r in rows)
