"""Stream-stream joins: watermarked backward as-of enrichment.

The batch engine's as-of join (operators/asof.py:32, union+window) has
no streaming equivalent in Spark — window functions are unsupported on
streams — and the round-4 verdict flagged the stream-stream join as
the one common streaming shape missing from the surface. This module
closes it with the native two-stateful-operator plan (Spark 3.5+):

1. a watermarked stream-stream LEFT OUTER **time-interval join**
   (``r.ts <= l.ts AND r.ts >= l.ts - lookback``) — state for both
   sides lives in the state store and is evicted by the watermark +
   interval bound;
2. a downstream **windowed aggregation** that collapses each left
   event's interval candidates to the single latest one with
   ``max_by`` (backward as-of), emitting in append mode once the
   join's output watermark passes the event's window.

Scale shape: the join shuffles both streams once on the equi-keys
(same wire cost as the batch plan); per-key state is bounded by
``lookback + watermark`` horizon, NOT history size — the lookback is
the knob that trades enrichment reach for state. The aggregation
keeps one row of state per in-flight left event and drops it on
emission. No driver-side work anywhere.

Emission semantics (matters for draining/testing): an event emits
only after the global watermark advances past
``event_ts + lookback + watermark``; with an ``availableNow`` drain
the trailing events inside that horizon stay in state and are NOT
emitted. Consumers that need a deterministic cut (tests, the
registry oracle) should filter both sides to
``ts <= max(ts) - lookback - watermark - slack``.

Starvation caveat (pinned by a test): under Spark's DEFAULT
``spark.sql.streaming.multipleWatermarkPolicy=min``, a right stream
that produces NO data holds the global watermark at the epoch, so no
left events emit at all — an idle dimension feed stalls enrichment.
This is the engine's multi-watermark policy, not an operator choice;
deployments that prefer left-side progress over right-side
completeness set the policy to ``max`` (accepting that right rows
arriving later than the left watermark may be treated as late).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    payload_cols: list[str] | None = None,
    lookback: str = "5 minutes",
    watermark: str = "2 minutes",
    emit_window: str = "1 second",
    suffix: str = "_right",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """For every left-stream row, attach the right-stream row with the
    greatest ``ts_col`` <= the left row's ``ts_col`` (and within
    ``lookback``), per ``on`` key — the streaming form of
    ``operators.asof.asof_join(..., tolerance=lookback)``: events
    older than ``lookback`` yield NULL payload, exactly like the batch
    ``tolerance``.

    Both inputs must carry a TimestampType ``ts_col``. Output columns:
    every left column, the ``payload_cols`` (default: all non-key,
    non-ts right columns), and the matched right timestamp as
    ``{ts_col}{suffix}``.

    PRECONDITION: left rows must be unique across their full column
    set (carry an event id). The reduction groups by every left
    column, so fully-identical left rows would collapse into one
    output row — unlike the batch ``asof_join``, which preserves left
    multiplicity, a stream offers no deterministic way to mint a
    distinguishing id.

    Ties among right rows at identical (key, ts) are broken
    arbitrarily by ``max_by`` unless ``tiebreak_cols`` names right
    columns to order by (descending, after ts) — streams cannot be
    pre-deduped with a window function, so the deterministic pick has
    to happen inside the reduction.
    """
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in (*on, ts_col)]
    carried = [*payload_cols, ts_col]
    r = right.select(
        *[F.col(c).alias(f"__r_{c}") for c in (*on, *carried)]
    ).withWatermark(f"__r_{ts_col}", watermark)
    lw = left.withWatermark(ts_col, watermark)
    cond = reduce(
        lambda a, b: a & b,
        [F.col(k) == F.col(f"__r_{k}") for k in on]
        + [
            F.col(f"__r_{ts_col}") <= F.col(ts_col),
            F.col(f"__r_{ts_col}")
            >= F.col(ts_col) - F.expr(f"INTERVAL {lookback}"),
        ],
    )
    joined = lw.join(r, cond, "leftOuter")
    # windowed max_by: the window column exists to satisfy the
    # multiple-stateful-operator contract (append-mode aggregation
    # downstream of a stream-stream join must group on an event-time
    # window); left rows are unique per group, so it is dropped after.
    # The left timestamp itself is re-projected as a PLAIN column for
    # grouping — a stream may carry at most one event-time column, and
    # the window expression is it.
    other = [c for c in left.columns if c != ts_col]
    agg = (
        # alias with empty metadata: a bare alias COPIES the watermark
        # tag and trips the one-event-time-column-per-stream check
        joined.withColumn("__l_ts", F.col(ts_col).alias("__l_ts", metadata={}))
        .groupBy(F.window(ts_col, emit_window), F.col("__l_ts"), *other)
        .agg(
            F.max_by(
                F.struct(*[F.col(f"__r_{c}") for c in carried]),
                # struct ordering is lexicographic: ties at equal right
                # ts fall through to the tiebreak columns (descending)
                F.struct(
                    F.col(f"__r_{ts_col}"),
                    *[F.col(f"__r_{c}") for c in (tiebreak_cols or [])],
                ),
            ).alias("__m")
        )
    )
    return agg.select(
        *[F.col("__l_ts").alias(ts_col) if c == ts_col else F.col(c) for c in left.columns],
        *[F.col(f"__m.__r_{c}").alias(c) for c in payload_cols],
        F.col(f"__m.__r_{ts_col}").alias(f"{ts_col}{suffix}"),
    )
