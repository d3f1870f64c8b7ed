"""Input-parallelism guard for compute-heavy operator entry points.

Spark's scan parallelism is the input split count, and a parquet file
is only splittable at row-group boundaries. A small table written as
one part with one row group therefore arrives as ONE partition, and
every map-side stage before the operator's first shuffle — shingling,
signature folds, regexp chains, Pandas-UDF decode — serializes onto a
single core no matter how many the cluster has. (Measured: the sf0.1
documents table is one 0.6 MB part/row-group; MinHash near-dedup ran
4.9 s as-is vs 2.7 s widened on local[32], and a 500-query brute-force
kNN batch pinned one core for 14+ CPU-minutes on the sf1 replica.)

``ensure_min_parallelism`` round-robins such an input up to the
cluster's default parallelism. The repartition costs one shuffle of
the operator's narrow input projection — paid once, BEFORE the heavy
per-row work fans out — and is a no-op branch whenever the input
already has enough splits, which is always true for the multi-split
datasets a real cluster reads. Operators apply it only where their
own first stage is the expensive one; pure projections (text_stats,
quality_score, redaction) leave partitioning to the caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame) -> DataFrame:
    """Repartition ``df`` up to ``defaultParallelism`` if it arrives
    with fewer partitions; identity otherwise (the at-scale path)."""
    if df.isStreaming:
        # a streaming frame has no static partition count to inspect
        # (.rdd is illegal); micro-batch parallelism is the source's
        # concern (maxFilesPerTrigger etc.), not this guard's
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def id_ddl_type(df: DataFrame, col: str) -> str:
    """The DDL type string of ``df[col]`` — used by Arrow operators to
    carry the caller's id column through a ``mapInPandas`` schema
    unchanged (a hardcoded ``long`` would silently miscast string or
    int ids on the Arrow path while the Catalyst path preserves them)."""
    return df.schema[col].dataType.simpleString()
