"""As-of (point-in-time) join and time-hierarchy rollup.

Neither exists in the reference (its only range-flavored lookup is the
J3 linear interpolation, ``core/likelihood.py:56-57``) and Spark has no
built-in ASOF JOIN — but any event-time pipeline at scale needs "attach
the most recent dimension row as of this event's timestamp" (slowly
changing dimensions, last-known-price, feature freshness joins).

Scale design (the part that matters at 100 TB):

* ``asof_join`` is the union+window formulation, NOT a range join: tag
  both inputs, union them, and run ``last(value, ignorenulls=True)``
  over ``partitionBy(keys).orderBy(ts, side)``. Exactly ONE hash
  exchange on the join keys (the same shuffle an equi-join would pay)
  and one within-partition sort — no range-predicate row explosion, no
  per-key candidate blowup on skewed timestamps, and both sides stream
  through the window operator. A broadcast-range formulation would put
  the FULL right side in every task; a theta-join ``l.ts >= r.ts``
  would be quadratic. At 1000 executors this plan is just a bucketed
  sort-merge pass.
* ``time_rollup`` uses native ``ROLLUP`` grouping sets, so Spark
  computes day/hour/grand-total in one shuffle with partial (map-side)
  aggregation instead of three scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    tolerance: int | float | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the matching right row per ``on``
    key group — pandas ``merge_asof`` semantics, all three directions:

    * ``backward`` (default): greatest right ``ts_col`` <= left's
      (DuckDB ``ASOF JOIN``);
    * ``forward``: smallest right ``ts_col`` >= left's;
    * ``nearest``: whichever of the two is closer in time, backward
      winning exact-distance ties (pandas' rule);
    * ``all``: every direction at once — output carries each payload
      column three times with ``_b`` / ``_f`` / ``_n`` suffixes
      (before the ts rename), from a single shuffle. Use this when a
      consumer wants several directions: three separate calls would
      shuffle the union three times.

    All directions stay the union+window formulation — ONE hash
    exchange on the keys regardless (``nearest``/``all`` add a second
    within-partition sort over the same exchange, not a new shuffle).

    ``right_cols`` are the right-side payload columns to carry (default:
    everything except keys and ts). The matched right timestamp is
    exposed as ``{ts_col}{suffix}``. With ``tolerance`` set, matches
    farther than ``tolerance`` (in ``ts_col`` units, direction-aware)
    are nulled out — pandas merge_asof's ``tolerance``.

    Ties: right rows sort inside the match frame at equal ts
    (inclusive match in every direction), and among right rows at
    identical (keys, ts) the pick is deterministic only if the rows
    are — pre-dedup the right side (see the x_asof_join registry
    query, which keeps max event_id per (user, ts)).
    """
    if direction not in ("backward", "forward", "nearest", "all"):
        raise ValueError(f"unknown direction {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*on, ts_col)]
    payload = [*right_cols, ts_col]

    # Tagged union: left carries its full row + null payload slots;
    # right carries keys/ts + payload. __side places right rows inside
    # the window frame at equal ts (before left for backward frames,
    # after left for forward frames) => inclusive match.
    lhs = left.select(
        *left.columns,
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in payload],
    )
    rhs = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in (*on, ts_col)],
        *on,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
    ).select(*lhs.columns)
    union = lhs.unionByName(rhs)

    w_back = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    def matches(w, fill, prefix: str) -> list:
        return [
            fill(f"__r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in payload
        ]

    if direction == "backward":
        picked = {"": [(c, F.col(f"__{c}")) for c in payload]}
        filled = union.select(*left.columns, "__side", *matches(w_back, F.last, "__"))
    elif direction == "forward":
        picked = {"": [(c, F.col(f"__{c}")) for c in payload]}
        filled = union.select(*left.columns, "__side", *matches(w_fwd, F.first, "__"))
    else:  # nearest / all: evaluate both frames over the ONE exchange
        filled = union.select(
            *left.columns,
            "__side",
            *matches(w_back, F.last, "__b_"),
            *matches(w_fwd, F.first, "__f_"),
        )
        back_ts = F.col(f"__b_{ts_col}")
        fwd_ts = F.col(f"__f_{ts_col}")
        use_back = F.when(back_ts.isNull(), F.lit(False)).otherwise(
            fwd_ts.isNull()
            | ((F.col(ts_col) - back_ts) <= (fwd_ts - F.col(ts_col)))
        )
        nearest = [
            (c, F.when(use_back, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}")))
            for c in payload
        ]
        if direction == "nearest":
            picked = {"": nearest}
        else:
            picked = {
                "_b": [(c, F.col(f"__b_{c}")) for c in payload],
                "_f": [(c, F.col(f"__f_{c}")) for c in payload],
                "_n": nearest,
            }

    out = filled.filter(F.col("__side") == 1)
    sel = [F.col(c) for c in left.columns] + [
        m.alias(f"__m_{c}{d}") for d, cols in picked.items() for c, m in cols
    ]
    out = out.select(*sel)
    if tolerance is not None:
        kept = [F.col(c) for c in left.columns]
        for d in picked:
            stale = F.abs(F.col(ts_col) - F.col(f"__m_{ts_col}{d}")) > F.lit(tolerance)
            kept += [
                F.when(stale, F.lit(None)).otherwise(F.col(f"__m_{c}{d}")).alias(f"__m_{c}{d}")
                for c in payload
            ]
        out = out.select(*kept)
    renames = {
        f"__m_{c}{d}": (f"{ts_col}{suffix}{d}" if c == ts_col else f"{c}{d}")
        for d in picked
        for c in payload
    }
    return out.withColumnsRenamed(renames)


def time_rollup(
    df: DataFrame,
    ts_nanos_col: str,
    value_col: str,
    levels: tuple[int, ...] = (86400, 3600),
    null_bucket: int = -1,
) -> DataFrame:
    """Multi-resolution time rollup (the "hypertable rollup" shape):
    bucket the epoch-nanos timestamp at each level (seconds) and
    aggregate count/sum/min/max with ROLLUP grouping sets — finest
    buckets, each coarser level's subtotals, and the grand total in ONE
    aggregation pass (one shuffle, map-side partials).

    ``levels`` must be coarsest→finest (e.g. day, hour). Null grouping
    slots in super-aggregate rows are coalesced to ``null_bucket`` so
    downstream consumers (and cross-engine comparisons) need no
    three-valued-logic handling.
    """
    bucket_cols = []
    out = df
    for lv in levels:
        name = f"bucket_{lv}s"
        out = out.withColumn(
            name, (F.floor(F.col(ts_nanos_col) / F.lit(lv * 1_000_000_000)) * lv).cast("long")
        )
        bucket_cols.append(name)
    agg = out.rollup(*bucket_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_col).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )
    return agg.select(
        *[F.coalesce(F.col(c), F.lit(null_bucket)).alias(c) for c in bucket_cols],
        "n",
        "sum_value",
        "min_value",
        "max_value",
    )
