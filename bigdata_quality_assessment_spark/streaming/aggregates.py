"""Structured Streaming variants of the engine's metric/density
operators (SURVEY.md §2.9 roadmap): windowed A1-family metrics,
streaming histogram (A7), histogram-drift detection (A13-flavored),
and a custom stateful running-stats operator via
``applyInPandasWithState``.

Event time: the driver's events.parquet carries a TIMESTAMP(NANOS)
column, normalized to epoch-nanos BIGINT by sources/tables.load_table
(see sources/tables.py) and converted here to a real TimestampType
``ts`` (microsecond truncation — irrelevant at minute/hour window
granularity). Watermarks and windows therefore run on the table's real
event time; ``with_synthetic_event_time`` remains for sources with no
timestamp at all.

Scale notes: every aggregation here is keyed by (window, …) — state is
bounded by watermark horizon × key cardinality, and Spark drops state
past the watermark. The stateful operator keeps O(1) state per group
(count/mean/M2 — Welford), the streaming analog of A5/A6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdata_quality_assessment_spark.sources.tables import EVENTS_SCHEMA


def with_event_time(df: DataFrame, ts_nanos_col: str = "ts") -> DataFrame:
    """Convert the epoch-nanos BIGINT ``ts`` to a TimestampType event-
    time column. INTEGER division (DIV) is load-bearing: epoch-nanos
    (~1.7e18) exceeds 2^53, so float division rounds the dividend and
    yields ±1 µs errors; DIV stays in exact 64-bit integer arithmetic
    and matches DuckDB's epoch_us truncation bit-for-bit."""
    return df.withColumn(
        ts_nanos_col, F.expr(f"timestamp_micros({ts_nanos_col} DIV 1000)")
    )


def with_synthetic_event_time(
    df: DataFrame, id_col: str = "event_id", step_seconds: int = 1, epoch: int = 1_700_000_000
) -> DataFrame:
    """Synthesize a monotone event-time column from the row id — for
    sources that genuinely carry no timestamp."""
    return df.withColumn(
        "ts", F.timestamp_seconds(F.lit(epoch) + F.col(id_col) * step_seconds)
    )


def stage_stream_source(
    spark: SparkSession, sf_dir: str, staging_root: str = "/tmp/spark_graft_streaming"
) -> str:
    """Stage the events table into a stream-readable landing directory.

    The streaming parquet source validates the FULL file schema (unlike
    the batch reader with an explicit schema), and the driver's raw
    TIMESTAMP(NANOS) column blocks it; re-landing through the batch
    nanosAsLong reader (ts → plain BIGINT) mirrors a real ingest zone.
    Idempotent per sf_dir; the tag is versioned on the landed schema."""
    import hashlib
    import os

    from bigdata_quality_assessment_spark.sources.tables import load_table

    # tag on the SOURCE file identity too: the driver regenerates the
    # testdata between rounds (and has changed ts storage type before);
    # a stale landing dir must not survive that.
    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    tag = hashlib.md5(
        f"{sf_dir}:ts_ns:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:8]
    path = f"{staging_root}/events_{tag}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        load_table(spark, "events", sf_dir).write.mode("overwrite").parquet(path)
    return path


def streaming_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the staged events landing dir; a
    production ingest points the same reader at an arriving-files path
    or Kafka source — downstream plans are unchanged."""
    path = stage_stream_source(spark, sf_dir)
    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(path)
    return with_event_time(raw)


def windowed_metrics(
    stream: DataFrame,
    value_col: str = "value",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming A1-family: per event-time window (and optional keys)
    count / mean / min / max / population variance. Watermark bounds
    state; late rows beyond it are dropped, matching the engine's
    documented late-data policy."""
    keys = [F.window("ts", window)] + [F.col(c) for c in (group_cols or [])]
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(value_col).alias("mean"),
            F.min(value_col).alias("lo"),
            F.max(value_col).alias("hi"),
            F.var_pop(value_col).alias("var"),
        )
    )


def windowed_quantiles(
    stream: DataFrame,
    value_col: str = "value",
    percentiles: tuple[float, ...] = (0.5, 0.95),
    accuracy: int = 10_000,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming windowed approximate quantiles:
    ``approx_percentile`` (GK sketch — mergeable, bounded memory, so
    it is legal inside a streaming aggregation where an exact
    percentile's full-value buffer would be unbounded state). Emits
    one row per window with ``p<pct>`` columns; rank error <=
    1/accuracy. The streaming face of profiling.approx_profile."""
    keys = [F.window("ts", window)] + [F.col(c) for c in (group_cols or [])]
    # fixed-width names: 0.5 -> p50, 0.95 -> p95, 1.0 -> p100 (a raw
    # str(p) scheme produced dotted/ambiguous names like 'p1.0'/'p5')
    aggs = [
        F.percentile_approx(value_col, p, accuracy).alias(
            f"p{int(round(p * 100)):02d}"
        )
        for p in percentiles
    ]
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"), *aggs)
    )


def windowed_histogram(
    stream: DataFrame,
    value_col: str = "value",
    nbins: int = 10,
    lo: float = 0.0,
    hi: float = 500.0,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming A7: equal-width histogram per event-time window —
    the incremental form of the batch operator (same binning rule:
    right-closed last bin, in-range filter)."""
    width = (hi - lo) / nbins
    bin_idx = F.least(
        F.floor((F.col(value_col) - lo) / width), F.lit(nbins - 1)
    ).cast("int")
    return (
        stream.filter(F.col(value_col).between(lo, hi))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), bin_idx.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_drift(
    windowed_hist: DataFrame, reference_hist: DataFrame, nbins: int = 10
) -> DataFrame:
    """Drift score per window: L1 distance between the window's
    normalized bin mass and a (static, broadcast) reference histogram —
    the streaming counterpart of the A13 density-error metric, on the
    A7 estimator instead of the KDE. Join side is nbins rows →
    broadcast; works on the *output* of windowed_histogram in
    complete/update mode or on its batch materialization."""
    ref = reference_hist.select(
        F.col("bin").alias("bin"), (F.col("cnt") / F.sum("cnt").over(Window.partitionBy())).alias("ref_p")
    )
    cur = windowed_hist.withColumn(
        "p", F.col("cnt") / F.sum("cnt").over(Window.partitionBy("window"))
    )
    return (
        cur.join(F.broadcast(ref), "bin", "left")
        .groupBy("window")
        .agg(F.sum(F.abs(F.col("p") - F.coalesce("ref_p", F.lit(0.0)))).alias("l1_drift"))
    )


def session_metrics(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows over event time: per key, events closer than
    ``gap`` merge into one session (``F.session_window`` — dynamic,
    data-driven windows; Spark merges overlapping [ts, ts+gap) spans in
    the state store). Emits per-session count / value stats / span.

    Scale: state per key is one open session (merged incrementally);
    the watermark closes sessions whose end fell behind it, so state is
    bounded by key cardinality × gap horizon — the canonical streaming
    sessionization plan. Batch parity: same call compiles to a
    SessionWindow aggregation over the static frame (one shuffle on
    (key, session)); the SQL-oracle form is the lag/gap/cumsum
    session-id assignment (see st_session_windows)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(value_col).alias("mean_value"),
            F.sum(value_col).alias("sum_value"),
        )
    )


def chan_merge(n: int, mean: float, m2: float, vals) -> tuple[int, float, float]:
    """Merge one value chunk into carried ``(n, mean, M2)`` moments via
    Chan et al.'s pairwise update — the batch-parallel form of Welford's
    recurrence (identical result, O(1) scalar ops per chunk)."""
    import numpy as np

    nb = len(vals)
    if nb == 0:
        return n, mean, m2
    mb = float(vals.mean())
    m2b = float(np.square(vals - mb).sum())
    delta = mb - mean
    tot = n + nb
    return tot, mean + delta * nb / tot, m2 + m2b + delta * delta * n * nb / tot


def running_stats_stateful(
    stream: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): per-key
    running count/mean/variance — O(1) state per key, exact across
    micro-batches. Emits the updated stats row per key per batch (the
    streaming A5/A6 contract).

    Per-chunk moments are computed vectorized (numpy ``len``/``mean``/
    sum-of-squared-deviations over the whole Arrow batch) and merged
    into the carried ``(n, mean, M2)`` state with Chan's pairwise
    update — algebraically the batch form of Welford, so results are
    exact (not approximated) while Python executes O(1) ops per
    micro-batch chunk instead of O(rows)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} STRING, n BIGINT, mean DOUBLE, var_pop DOUBLE"
    state_schema = "n BIGINT, mean DOUBLE, m2 DOUBLE"

    def update(key, pdfs, state: GroupState):
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        for pdf in pdfs:
            n, mean, m2 = chan_merge(n, mean, m2, pdf[value_col].to_numpy(dtype="float64"))
        state.update((n, mean, m2))
        yield pd.DataFrame(
            {key_col: [key[0]], "n": [n], "mean": [mean], "var_pop": [m2 / n if n else 0.0]}
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def run_available_now(stream_df: DataFrame, name: str, output_mode: str = "update") -> DataFrame:
    """Drain the stream with the available-now trigger into a memory
    sink and return the materialized result — the test/bench harness
    path (a production job would writeStream to a real sink)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")



def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    watermark: str = "10 minutes",
    within_watermark: bool = True,
) -> DataFrame:
    """Streaming exact dedup for a document ingest: content digest +
    Spark's built-in streaming deduplication state. The idiomatic
    scale path — state lives in the state store (RocksDB in
    production), keyed by the 32-char digest, NOT the document body,
    and ``dropDuplicatesWithinWatermark`` bounds it by the watermark
    horizon (an unbounded-history dedup would grow state forever on an
    infinite stream; the batch ``exact_dedup`` covers that case over
    the lake). Emits the first-seen row per digest."""
    digested = stream.withColumn("__h", F.md5(F.col(text_col))).withWatermark(
        "ts", watermark
    )
    if within_watermark:
        out = digested.dropDuplicatesWithinWatermark(["__h"])
    else:
        out = digested.dropDuplicates(["__h"])
    return out.drop("__h")
