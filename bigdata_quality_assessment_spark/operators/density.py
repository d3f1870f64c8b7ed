"""Density stack: histogram, trapezoidal integration, KDE, linear
interpolation, log-pdf-error metric.

Covers SURVEY.md §2.4 A7/A8/A9/A10/A11/A13 and §2.3 J3.

Scale notes:
  * the KDE is linear binning (one distributed pass: each point
    splits its weight between its two neighboring grid nodes, then a
    groupBy over ≤``ngrid`` keys) followed by a kernel convolution on
    the BINNED grid — cost O(data) + O(ngrid²) where ngrid ≤ 4096.
    The data-sized pass is pure Catalyst; the grid²-sized pass is a
    broadcast self-join of a tiny frame. This is the FFTKDE
    decomposition (linear binning + grid convolution,
    /root/reference/core/utils.py:105-120) re-expressed relationally —
    the O(data) term dominates at 100 TB and parallelizes linearly.
  * interpolation against a UNIFORM grid is an index computation +
    broadcast hash equi-join — no range join, no sort, O(data).
  * trapz over a grid is a lag-window over ≤ngrid rows (tiny); the
    grouped variant partitions by series key for many-series use.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def minmax(df: DataFrame, col: str) -> DataFrame:
    """A10: global min/max of a column (one-row frame, broadcastable)."""
    return df.agg(F.min(col).alias("lo"), F.max(col).alias("hi"))


def histogram(
    df: DataFrame,
    col: str,
    nbins: int = 9,
    density: bool = True,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """A7: equal-width histogram over ``[lo, hi]`` (data range when
    unspecified), matching ``plt.hist(..., density=True)`` — the
    right edge of the last bin is inclusive
    (BigDataQualityAssessment_ActiveSampling.py:58-61).

    Returns ``(bin INT, bin_lo DOUBLE, bin_hi DOUBLE, cnt BIGINT,
    pdf DOUBLE)`` with ALL ``nbins`` rows present — empty bins carry
    ``cnt=0``/``pdf=0.0``, matching ``np.histogram``'s dense bin axis.
    Single shuffle of ≤nbins keys after a map-side combine; range
    bounds (when derived) ride in via a broadcast cross join of a
    one-row aggregate, never a driver collect.
    """
    spark = df.sparkSession
    if lo is None or hi is None:
        bounds = df.agg(F.min(col).cast("double").alias("__lo"), F.max(col).cast("double").alias("__hi"))
    else:
        bounds = spark.range(1).select(
            F.lit(float(lo)).alias("__lo"), F.lit(float(hi)).alias("__hi")
        )
    # degenerate range (all values equal, or caller passed lo == hi):
    # expand by ±0.5 exactly as np.histogram does — ANSI mode would
    # otherwise throw DIVIDE_BY_ZERO on the zero bin width
    span_ok = F.col("__hi") > F.col("__lo")
    bounds = bounds.select(
        F.when(span_ok, F.col("__lo")).otherwise(F.col("__lo") - 0.5).alias("__lo"),
        F.when(span_ok, F.col("__hi")).otherwise(F.col("__hi") + 0.5).alias("__hi"),
    )

    src = df.crossJoin(F.broadcast(bounds))
    lo_c, hi_c = F.col("__lo"), F.col("__hi")
    width = (hi_c - lo_c) / nbins
    raw_bin = F.floor((F.col(col) - lo_c) / width)
    bin_idx = F.least(raw_bin, F.lit(nbins - 1)).cast("int")  # right-closed last bin
    counts = (
        src.filter(F.col(col).between(lo_c, hi_c))
        .select(bin_idx.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # Dense bin axis: every bin 0..nbins-1 appears even when empty.
    axis = (
        spark.range(nbins)
        .select(F.col("id").cast("int").alias("bin"))
        .crossJoin(F.broadcast(bounds))
    )
    dense = axis.join(counts, "bin", "left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0).cast("bigint"))
    )
    total = Window.partitionBy()  # ≤nbins rows at this point — bounded
    out = dense.select(
        "bin",
        (lo_c + F.col("bin") * width).alias("bin_lo"),
        (lo_c + (F.col("bin") + 1) * width).alias("bin_hi"),
        "cnt",
        (
            # empty input → total 0 → pdf 0.0 (ANSI would throw on 0/0)
            F.when(
                F.sum("cnt").over(total) > 0,
                F.col("cnt") / (F.sum("cnt").over(total) * width),
            ).otherwise(F.lit(0.0))
            if density
            else F.lit(None).cast("double")
        ).alias("pdf"),
    )
    return out


def trapz(
    df: DataFrame,
    x_col: str,
    f_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """A8: trapezoidal integration ``∫ f dx`` over a (possibly
    irregular) grid: ``Σ (xᵢ−xᵢ₋₁)·(fᵢ+fᵢ₋₁)/2`` via a lag window
    (np.trapz, BigDataQualityAssessment_ActiveSampling.py:219).

    With ``group_cols`` the window partitions by series — fully
    parallel across series. Ungrouped use is reserved for grid-sized
    frames (≤4096 rows by construction)."""
    w = Window.partitionBy(*(group_cols or [])).orderBy(x_col)
    seg = (F.col(x_col) - F.lag(x_col).over(w)) * (F.col(f_col) + F.lag(f_col).over(w)) / 2.0
    segs = df.withColumn("__seg", seg)
    if group_cols:
        return segs.groupBy(*group_cols).agg(F.sum("__seg").alias("integral"))
    return segs.agg(F.sum("__seg").alias("integral"))


def grid_nint(df: DataFrame, f_col: str, axis_cols: list[str]) -> DataFrame:
    """A9: iterated trapezoidal integration of ``f`` over an N-D
    lattice (core/utils.py:43-52): integrate one axis per pass,
    grouping by the remaining axes."""
    cur = df.select(*axis_cols, F.col(f_col).alias("__f"))
    remaining = list(axis_cols)
    while remaining:
        axis = remaining.pop()  # innermost axis first, like grid_nint
        if remaining:
            cur = trapz(cur, axis, "__f", group_cols=remaining).withColumnRenamed(
                "integral", "__f"
            )
        else:
            cur = trapz(cur, axis, "__f")
    return cur


def scott_bandwidth(df: DataFrame, col: str) -> DataFrame:
    """A11 helper: Scott's-rule bandwidth ``n^(-1/5)·σ`` with the
    reference's floor/fallback to 1.0 when the data is degenerate
    (core/utils.py:108-119). ``scipy.stats.gaussian_kde`` computes the
    data covariance with ``bias=False`` (ddof=1) ⇒ SAMPLE std here,
    and ``custom_KDE`` replaces any ``bw < 1e-8`` (including NaN/None
    fallout) with 1.0. One-row frame ``(bw DOUBLE)``."""
    raw = F.pow(F.count(F.lit(1)).cast("double"), F.lit(-0.2)) * F.stddev_samp(col)
    return df.agg(
        F.when(F.coalesce(raw, F.lit(0.0)) >= 1e-8, raw).otherwise(F.lit(1.0)).alias("bw")
    )


def kde_1d(
    df: DataFrame,
    col: str,
    bw: float | str | DataFrame,
    ngrid: int = 1024,
    lo: float | None = None,
    hi: float | None = None,
    pad: float = 0.01,
    weight_col: str | None = None,
    bounds: DataFrame | None = None,
) -> DataFrame:
    """A11: Gaussian-kernel KDE on a uniform grid via exact linear
    binning + grid-space convolution — the relational re-expression of
    KDEpy's FFTKDE (linear binning + FFT convolution,
    core/utils.py:105-120).

    Phase 1 (O(data), distributed): each point at fractional grid
    position ``p`` contributes weight ``(1−frac)`` to node ``⌊p⌋`` and
    ``frac`` to node ``⌊p⌋+1``; a groupBy over ≤ngrid keys sums them.
    Phase 2 (O(ngrid²), broadcast): convolve the binned weights with
    the Gaussian kernel evaluated at node distances. ngrid ≤ 4096 by
    contract, so phase 2 is a tiny-frame self-join regardless of the
    input size.

    Grid bounds default to the data range padded by ``pad`` (1%, as
    the reference's evaluation grid), derived LAZILY via a broadcast
    one-row aggregate — no driver collect, no eager job; the whole
    composite (e.g. A13's two KDEs + interp + trapz) stays one Spark
    job. Returns ``density(node INT, grid_x DOUBLE, pdf DOUBLE)`` with
    ∫pdf dx ≈ 1.

    ``bw`` may be a one-row DataFrame with column ``bw`` (e.g. from
    ``scott_bandwidth``) — it rides the broadcast bounds frame, so
    auto-bandwidth stays lazy (the reference's default path,
    core/utils.py:108-119) — or the string ``"scott"`` as shorthand
    for ``scott_bandwidth(df, col)``. ``bounds`` may be a one-row frame with
    columns ``lo``/``hi`` to share an externally-derived evaluation
    range (A13 rebuilds it per iteration from the joint pred+truth
    data range, BigDataQualityAssessment_ActiveSampling.py:201-205).
    """
    spark = df.sparkSession

    if isinstance(bw, str):
        if bw != "scott":
            raise ValueError(f"bw must be a float, DataFrame, or 'scott'; got {bw!r}")
        bw = scott_bandwidth(df, col)

    # per-name column sources: resolved off the broadcast bounds frame
    # by default; when lo/hi AND bw are plain floats they fold in as
    # literals and the one-row frame + its broadcast cross-join drop
    # out of the plan entirely (round-15 — same rule as kde_1d_multi's
    # tuple bounds; the arithmetic is the identical IEEE double op
    # sequence, so grids are bit-identical)
    ref: dict[str, Column] = {}

    def _ref(name: str) -> Column:
        return ref.get(name, F.col(name))

    if bounds is not None:
        bounds = bounds.select(
            F.col("lo").cast("double").alias("__lo"),
            F.col("hi").cast("double").alias("__hi"),
        )
    elif lo is None or hi is None:
        raw = df.agg(F.min(col).cast("double").alias("__mn"), F.max(col).cast("double").alias("__mx"))
        span = F.when(F.col("__mx") - F.col("__mn") > 0, F.col("__mx") - F.col("__mn")).otherwise(
            F.lit(1.0)
        )
        bounds = raw.select(
            (F.col("__mn") - pad * span).alias("__lo"),
            (F.col("__mx") + pad * span).alias("__hi"),
        )
    else:
        bounds = None
        ref["__lo"] = F.lit(float(lo))
        ref["__hi"] = F.lit(float(hi))
        ref["__dx"] = F.lit((float(hi) - float(lo)) / (ngrid - 1))
    if bounds is not None:
        bounds = bounds.withColumn(
            "__dx", (F.col("__hi") - F.col("__lo")) / (ngrid - 1)
        )
    if isinstance(bw, DataFrame):
        ebw = F.broadcast(bw.select(F.col("bw").cast("double").alias("__bw")))
        bounds = ebw if bounds is None else bounds.crossJoin(ebw)
    else:
        ref["__bw"] = F.lit(float(bw))

    w = F.col(weight_col) if weight_col else F.lit(1.0)
    pos = (F.col(col) - _ref("__lo")) / _ref("__dx")
    node0 = F.floor(pos).cast("int")
    frac = pos - F.floor(pos)
    base = df.filter(F.col(col).isNotNull())
    if bounds is not None:
        base = base.crossJoin(F.broadcast(bounds))
    # Two (node, weight) contributions per row; clamp to the grid so
    # boundary points (pos == ngrid-1) land entirely on the last node.
    contrib = (
        base
        .select(
            F.explode(
                F.array(
                    F.struct(node0.alias("node"), (w * (1.0 - frac)).alias("bw_")),
                    F.struct((node0 + 1).alias("node"), (w * frac).alias("bw_")),
                )
            ).alias("c"),
            _ref("__lo").alias("__lo"),
            _ref("__dx").alias("__dx"),
            _ref("__bw").alias("__bw"),
        )
        .select(
            F.least(F.greatest(F.col("c.node"), F.lit(0)), F.lit(ngrid - 1)).alias("node"),
            F.col("c.bw_").alias("w"),
            "__lo",
            "__dx",
            "__bw",
        )
    )
    # __lo/__dx/__bw are constant across rows; F.first rides them
    # through the groupBy so the grid phase needs no second bounds scan.
    binned = contrib.groupBy("node").agg(
        F.sum("w").alias("w"),
        F.first("__lo").alias("__lo"),
        F.first("__dx").alias("__dx"),
        F.first("__bw").alias("__bw"),
    )

    grid = spark.range(ngrid).select(F.col("id").cast("int").alias("eval_node"))
    norm_const = 1.0 / (F.col("__bw") * math.sqrt(2.0 * math.pi))
    kernel = F.exp(
        -0.5
        * F.pow((F.col("eval_node") - F.col("node")) * F.col("__dx") / F.col("__bw"), 2)
    ) * norm_const
    # Every eval node pairs with every binned node (tiny broadcast
    # cross join), so sum(w) per eval node IS the global weight total —
    # normalization rides along without an extra pass.
    pdf = (
        grid.join(F.broadcast(binned), F.lit(True))
        .groupBy("eval_node")
        .agg(
            F.sum(kernel * F.col("w")).alias("kw_sum"),
            F.sum("w").alias("w_tot"),
            F.first("__lo").alias("__lo"),
            F.first("__dx").alias("__dx"),
        )
        .select(
            F.col("eval_node").alias("node"),
            (F.col("__lo") + F.col("eval_node") * F.col("__dx")).alias("grid_x"),
            (F.col("kw_sum") / F.col("w_tot")).alias("pdf"),
        )
    )
    # LAZY plan barrier on the ≤ngrid-row result. Without it every
    # downstream reference re-executes the WHOLE subtree including the
    # O(data) binning scan — ``interp_uniform_grid`` alone references
    # its grid three times (two bracket joins + the bounds agg), and
    # measured plans showed 3× the binning shuffle and 7× the source
    # scan in one job with ReuseExchange finding nothing (the broadcast
    # subtrees differ above the shared exchange). The checkpoint makes
    # single-execution physical: still no eager job (eager=False — the
    # first action materializes it), but all consumers then share the
    # stored ≤ngrid rows. At 100 TB this is the difference between one
    # pool scan per KDE and one per KDE *reference*.
    return pdf.localCheckpoint(eager=False)


def kde_1d_pair(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bw: float | str | DataFrame,
    ngrid: int = 1024,
    bounds: DataFrame | None = None,
    pad: float = 0.01,
) -> tuple[DataFrame, DataFrame]:
    """A11 (fused): two KDEs over the SAME frame and evaluation grid in
    ONE data scan + ONE shuffle — the A13 log-pdf-error shape, where
    the reference KDEs both the predicted and the true target over a
    shared grid (BigDataQualityAssessment_ActiveSampling.py:199-207).

    ``kde_1d`` twice costs two full passes over the pool (two scans,
    two ≤ngrid-key shuffles); fused, both series bin in one tagged
    pass — see ``kde_1d_multi``, of which this is the two-series
    special case (shared joint-range grid, no predicates). The
    single-exchange contract is pinned by a plan assertion in
    tests/test_density.py. At 100 TB this halves the per-iteration
    metric cost of the §3.1 loop.

    ``bw``: float, ``"scott"`` (per-series Scott auto-bandwidth, folded
    into the same one-row aggregate as bounds derivation — no extra
    pass; the reference's default, core/utils.py:108-119), or a
    one-row ``bw`` frame shared by both series.

    ``bounds``: optional one-row ``lo``/``hi`` frame (the loop passes
    the joint pred+truth range); defaults to the joint range of the two
    columns padded ``pad``, derived lazily like ``kde_1d``.
    """
    shared: dict = (
        {"range_cols": [col_a, col_b]} if bounds is None else {"bounds": bounds}
    )
    grids = kde_1d_multi(
        df,
        [
            {"tag": "a", "col": col_a, "bw": bw, **shared},
            {"tag": "b", "col": col_b, "bw": bw, **shared},
        ],
        ngrid=ngrid,
        pad=pad,
    )
    return grids["a"], grids["b"]


def kde_1d_multi(
    df: DataFrame,
    specs: list[dict],
    ngrid: int = 1024,
    pad: float = 0.01,
) -> dict[str, DataFrame]:
    """A11 (fused, N-way): any number of KDEs over the SAME frame in
    ONE data scan, ONE (tag, node) shuffle, and ONE plan barrier — the
    generalization of ``kde_1d_pair`` that also admits per-series row
    predicates and per-series evaluation ranges. Built for the §3.1
    loop, where one iteration needs THREE densities of the scored
    pool: pred + truth on a shared joint-range grid (A13,
    BigDataQualityAssessment_ActiveSampling.py:199-207) and the
    us_lw/us_lgw pool density of the predicted means over the current
    candidates (core/likelihood.py:53-58). Unfused that is 3 pool
    passes and 3 barrier plan-compilations per iteration; fused it is
    one of each — at 100 TB the scan fusion is the win, at bench SF
    the ~1 s/plan physical-planning cost of each lazy-checkpoint
    barrier is.

    ``specs``: ordered list of dicts with keys
      * ``tag`` (str, unique) — names the output grid;
      * ``col`` (str) — the value column to density-estimate;
      * ``bw`` (float | ``"scott"`` | DataFrame) — Gaussian kernel
        bandwidth. ``"scott"`` computes the per-series Scott
        auto-bandwidth ``n^(-1/5)·σ`` (sample std, 1.0 degenerate
        floor — ``scott_bandwidth``'s exact rule, the reference's
        default, core/utils.py:108-119) over this series'
        predicate-filtered rows (count(*) semantics, matching
        ``scott_bandwidth``), FOLDED into the same one-row aggregate
        that derives grid bounds — when at least one spec derives its
        bounds internally, auto-bandwidth costs no extra pass; when
        ALL bounds are external the scott aggregate is its own one-row
        pass over ``df`` (still lazy, rides the broadcast). A one-row
        ``bw`` frame rides the broadcast lazily like external bounds;
      * ``where`` (Column, optional) — row predicate restricting this
        series (rows failing it contribute nothing, exactly as if the
        frame were pre-filtered);
      * ``weight_col`` (str, optional) — per-row weight column for this
        series (the reference's ``weights=fx`` path,
        core/likelihood.py:51), applied to both linear-binning
        contributions;
      * ``range_cols`` (list[str], optional, default ``[col]``) —
        columns whose (predicate-filtered) joint min/max define this
        series' grid bounds, padded ``pad`` per side (giving two specs
        the same ``range_cols`` puts them on an identical grid);
      * ``bounds`` (DataFrame or (lo, hi) floats, optional) — external
        bounds overriding range derivation. A one-row lo/hi FRAME stays
        lazy and rides the broadcast; a PLAIN ``(lo, hi)`` tuple folds
        in as literals (round-15): no bounds aggregate, and when every
        spec is literal-bounded with a float ``bw`` the broadcast
        cross-join disappears from the plan entirely — the barrier's
        call-time work shrinks to the binning map stage alone. The
        §3.1 loop feeds this from an ``Observation`` on the scored
        pool's materialization job (min/max are order-independent, so
        the observed bounds are bit-identical to the aggregate's).

    All internal ranges fold into a single one-row aggregate over
    ``df``, so bounds derivation adds no extra pass. Returns
    ``{tag: density(node INT, grid_x DOUBLE, pdf DOUBLE)}``.
    """
    spark = df.sparkSession
    tags = [s["tag"] for s in specs]
    if len(set(tags)) != len(tags):
        raise ValueError(f"duplicate tags in specs: {tags}")

    def _masked(s: dict, c: str) -> Column:
        w = s.get("where")
        return F.when(w, F.col(c)) if w is not None else F.col(c)

    internal = [s for s in specs if s.get("bounds") is None]
    scott = [s for s in specs if isinstance(s.get("bw"), str)]
    # per-tag column sources: names resolved off the broadcast frame
    # ``b`` by default; literal-bounds tags (and float bandwidths)
    # resolve to F.lit instead, so a fully-literal spec list never
    # builds ``b`` at all (round-15 — drops the bounds aggregate AND
    # the broadcast cross-join from the plan)
    ref: dict[str, Column] = {}

    def _ref(name: str) -> Column:
        return ref.get(name, F.col(name))
    for s in scott:
        if s["bw"] != "scott":
            raise ValueError(
                f"bw must be a float, DataFrame, or 'scott'; got {s['bw']!r}"
            )
    b: DataFrame | None = None
    if internal or scott:
        agg_exprs = []
        for s in internal:
            t = s["tag"]
            rng = s.get("range_cols", [s["col"]])
            mins = [F.min(_masked(s, c)).cast("double") for c in rng]
            maxs = [F.max(_masked(s, c)).cast("double") for c in rng]
            agg_exprs.append(
                (mins[0] if len(mins) == 1 else F.least(*mins)).alias(f"__mn_{t}")
            )
            agg_exprs.append(
                (maxs[0] if len(maxs) == 1 else F.greatest(*maxs)).alias(f"__mx_{t}")
            )
        for s in scott:
            t = s["tag"]
            # count(*) semantics over the predicate-passing rows (NOT
            # non-null count) — scott_bandwidth and the SQL oracle both
            # use total row count, and the two differ on null-bearing
            # columns
            w = s.get("where")
            n_expr = F.count(F.when(w, 1)) if w is not None else F.count(F.lit(1))
            agg_exprs.append(n_expr.alias(f"__n_{t}"))
            agg_exprs.append(F.stddev_samp(_masked(s, s["col"])).alias(f"__sd_{t}"))
        sel = []
        for s in internal:
            t = s["tag"]
            span = F.when(
                F.col(f"__mx_{t}") - F.col(f"__mn_{t}") > 0,
                F.col(f"__mx_{t}") - F.col(f"__mn_{t}"),
            ).otherwise(F.lit(1.0))
            sel.append((F.col(f"__mn_{t}") - pad * span).alias(f"__lo_{t}"))
            sel.append((F.col(f"__mx_{t}") + pad * span).alias(f"__hi_{t}"))
        for s in scott:
            t = s["tag"]
            raw = F.pow(F.col(f"__n_{t}").cast("double"), F.lit(-0.2)) * F.col(
                f"__sd_{t}"
            )
            sel.append(
                F.when(F.coalesce(raw, F.lit(0.0)) >= 1e-8, raw)
                .otherwise(F.lit(1.0))
                .alias(f"__bw_{t}")
            )
        b = df.agg(*agg_exprs).select(*sel)
    for s in specs:
        if s.get("bounds") is None:
            continue
        t = s["tag"]
        if isinstance(s["bounds"], DataFrame):
            eb = s["bounds"].select(
                F.col("lo").cast("double").alias(f"__lo_{t}"),
                F.col("hi").cast("double").alias(f"__hi_{t}"),
            )
            b = eb if b is None else b.crossJoin(F.broadcast(eb))
        else:
            lo, hi = s["bounds"]
            ref[f"__lo_{t}"] = F.lit(float(lo))
            ref[f"__hi_{t}"] = F.lit(float(hi))
            # same IEEE double arithmetic the Catalyst dx expression
            # performs — bit-identical grid spacing
            ref[f"__dx_{t}"] = F.lit((float(hi) - float(lo)) / (ngrid - 1))
    for s in specs:
        t = s["tag"]
        if isinstance(s["bw"], DataFrame):
            ebw = s["bw"].select(F.col("bw").cast("double").alias(f"__bw_{t}"))
            b = ebw if b is None else b.crossJoin(F.broadcast(ebw))
        elif not isinstance(s["bw"], str):
            ref[f"__bw_{t}"] = F.lit(float(s["bw"]))
    for t in tags:
        if f"__dx_{t}" not in ref:
            b = b.withColumn(
                f"__dx_{t}", (_ref(f"__hi_{t}") - _ref(f"__lo_{t}")) / (ngrid - 1)
            )

    arrays = []
    for s in specs:
        t = s["tag"]
        pos = (F.col(s["col"]) - _ref(f"__lo_{t}")) / _ref(f"__dx_{t}")
        node0 = F.floor(pos).cast("int")
        frac = pos - F.floor(pos)
        w0: Column = 1.0 - frac
        w1: Column = frac
        if s.get("weight_col"):
            w0, w1 = w0 * F.col(s["weight_col"]), w1 * F.col(s["weight_col"])
        if s.get("where") is not None:
            w0, w1 = F.when(s["where"], w0), F.when(s["where"], w1)

        def _mk(node: Column, w: Column, t: str = t) -> Column:
            return F.struct(
                F.lit(t).alias("tag"),
                node.alias("node"),
                w.alias("w"),
                _ref(f"__lo_{t}").alias("lo"),
                _ref(f"__dx_{t}").alias("dx"),
                _ref(f"__bw_{t}").alias("kbw"),
            )

        arrays.append(F.array(_mk(node0, w0), _mk(node0 + 1, w1)))

    contrib = (
        (df if b is None else df.crossJoin(F.broadcast(b)))
        .select(F.explode(F.concat(*arrays)).alias("c"))
        .filter(F.col("c.w").isNotNull())
        .select(
            F.col("c.tag").alias("tag"),
            F.least(F.greatest(F.col("c.node"), F.lit(0)), F.lit(ngrid - 1)).alias(
                "node"
            ),
            F.col("c.w").alias("w"),
            F.col("c.lo").alias("__lo"),
            F.col("c.dx").alias("__dx"),
            F.col("c.kbw").alias("__bw"),
        )
    )
    # The ONE lazy barrier (see kde_1d_pair's): keeps the per-tag
    # filters from pushing below the aggregate into N source scans,
    # and is the only physical-plan compilation the whole N-density
    # family pays.
    binned = contrib.groupBy("tag", "node").agg(
        F.sum("w").alias("w"),
        F.first("__lo").alias("__lo"),
        F.first("__dx").alias("__dx"),
        F.first("__bw").alias("__bw"),
    ).localCheckpoint(eager=False)

    grid = spark.range(ngrid).select(F.col("id").cast("int").alias("eval_node"))
    norm_const = 1.0 / (F.col("__bw") * math.sqrt(2.0 * math.pi))
    kernel = F.exp(
        -0.5
        * F.pow((F.col("eval_node") - F.col("node")) * F.col("__dx") / F.col("__bw"), 2)
    ) * norm_const

    def _convolve(tag: str) -> DataFrame:
        one = binned.filter(F.col("tag") == tag).drop("tag")
        return (
            grid.join(F.broadcast(one), F.lit(True))
            .groupBy("eval_node")
            .agg(
                F.sum(kernel * F.col("w")).alias("kw_sum"),
                F.sum("w").alias("w_tot"),
                F.first("__lo").alias("__lo"),
                F.first("__dx").alias("__dx"),
            )
            .select(
                F.col("eval_node").alias("node"),
                (F.col("__lo") + F.col("eval_node") * F.col("__dx")).alias("grid_x"),
                (F.col("kw_sum") / F.col("w_tot")).alias("pdf"),
            )
        )

    return {t: _convolve(t) for t in tags}


def interp_uniform_grid(
    queries: DataFrame,
    grid: DataFrame,
    q_col: str,
    grid_x_col: str = "grid_x",
    grid_f_col: str = "pdf",
    node_col: str = "node",
    out_col: str = "interp",
    deriv_col: str | None = None,
) -> DataFrame:
    """J3 (fast path): ``np.interp`` against a UNIFORM grid — bracket
    index is computed arithmetically, then two broadcast hash
    equi-joins fetch the bracketing values. No range join, no sort;
    O(data) and shuffle-free at any query count.

    Out-of-range queries clamp to the boundary values, matching
    np.interp. The grid frame must carry an integer ``node`` column
    (0..g-1) and uniform ``grid_x`` spacing — exactly what ``kde_1d``
    emits.

    ``deriv_col``: additionally emit the first derivative of the
    piecewise-linear interpolant — the segment slope ``(f1−f0)/dx`` —
    matching ``InterpolatedUnivariateSpline(k=1).derivative()``
    (core/likelihood.py:73: ``fy_jac`` for the us_lgw weight), which
    is piecewise-constant and extrapolates with the edge segment's
    slope.

    Plan shape (round-16): ONE one-row aggregate over the grid packs
    bounds AND the node-ordered f-array into a single broadcast
    (``(lo, hi, nmax, farr)``); each query row then fetches its two
    bracketing values by array index (``F.get`` — 0-based, NULL out of
    range). The previous shape was three broadcasts per call (a bounds
    aggregate + two bracket hash joins), i.e. three broadcast builds
    and two join probes per query row where one ≤32 KB array lookup
    suffices — the grid is ≤4096 rows by the kde contract. Values are
    bit-identical: same bounds arithmetic, same f values, same clamp
    sequence (oracle-pinned via j3_interp / p14_p17 / the m4 loop
    golden). Degenerate inputs degrade exactly as the join path did —
    rows preserved; NULL queries clamp to node 0's value (both paths:
    ``greatest(NULL, 0)`` selects 0 for the bracket index and 0.0 for
    the fraction); empty grids yield NULL out/deriv columns.
    """
    g = grid.select(
        F.col(node_col).alias("__n"),
        F.col(grid_x_col).alias("__gx"),
        F.col(grid_f_col).alias("__gf"),
    )
    packed = g.agg(
        F.min("__gx").alias("__lo"),
        F.max("__gx").alias("__hi"),
        F.max("__n").alias("__nmax"),
        # collect_list is order-nondeterministic; the struct sort
        # re-establishes node order (nodes are distinct by contract)
        F.transform(
            F.array_sort(F.collect_list(F.struct("__n", "__gf"))),
            lambda s: s["__gf"],
        ).alias("__farr"),
    )
    q = queries.crossJoin(F.broadcast(packed))
    dx = (F.col("__hi") - F.col("__lo")) / F.col("__nmax")
    pos = (F.col(q_col) - F.col("__lo")) / dx
    idx = F.least(F.greatest(F.floor(pos), F.lit(0)), F.col("__nmax") - 1).cast("int")
    f0 = F.get("__farr", idx)
    f1 = F.get("__farr", idx + 1)
    frac_clamped = F.least(F.greatest(pos - idx, F.lit(0.0)), F.lit(1.0))
    val = f0 + (f1 - f0) * frac_clamped
    out = q.withColumn(out_col, val)
    if deriv_col is not None:
        out = out.withColumn(deriv_col, (f1 - f0) / dx)
    return out.drop("__lo", "__hi", "__nmax", "__farr")


def interp_linear(
    queries: DataFrame,
    grid: DataFrame,
    q_col: str,
    grid_x_col: str,
    grid_f_col: str,
    out_col: str = "interp",
) -> DataFrame:
    """J3 (general path): ``np.interp`` against an ARBITRARY sorted
    grid — a broadcast range join on the ``lead()``-augmented grid.
    Correct for irregular grids; prefer ``interp_uniform_grid`` when
    the spacing is uniform (it avoids the nested-loop join)."""
    w = Window.orderBy(grid_x_col)
    aug = grid.select(
        F.col(grid_x_col).alias("__x0"),
        F.col(grid_f_col).alias("__f0"),
        F.lead(grid_x_col).over(w).alias("__x1"),
        F.lead(grid_f_col).over(w).alias("__f1"),
        F.min(grid_x_col).over(Window.partitionBy()).alias("__xmin"),
    )
    q = queries
    cond = (
        # interior bracket [x0, x1)
        ((F.col(q_col) >= F.col("__x0")) & (F.col(q_col) < F.col("__x1")))
        # above range: clamp to the last grid row
        | (F.col("__x1").isNull() & (F.col(q_col) >= F.col("__x0")))
        # below range: clamp to the first grid row
        | ((F.col(q_col) < F.col("__xmin")) & (F.col("__x0") == F.col("__xmin")))
    )
    joined = q.join(F.broadcast(aug), cond, "inner")
    val = (
        F.when(F.col("__x1").isNull() | (F.col(q_col) < F.col("__x0")), F.col("__f0"))
        .otherwise(
            F.col("__f0")
            + (F.col("__f1") - F.col("__f0"))
            * (F.col(q_col) - F.col("__x0"))
            / (F.col("__x1") - F.col("__x0"))
        )
    )
    return joined.withColumn(out_col, val).drop("__x0", "__f0", "__x1", "__f1", "__xmin")


def log_pdf_error(
    pdf_a: DataFrame,
    pdf_b: DataFrame,
    x_col: str = "grid_x",
    f_col: str = "pdf",
    floor: float = -6.0,
) -> DataFrame:
    """A13: ``∫ |clip(log p̂) − clip(log p)| dx`` over a SHARED grid —
    the reference's convergence metric
    (BigDataQualityAssessment_ActiveSampling.py:199-219, README.md:168-170).

    Both inputs are grid-sized density frames (from ``kde_1d`` on the
    same bounds); joined on the grid axis, clipped logs (P9), finite
    filter (P10), trapezoid sum (A8). Returns one row
    ``(log_pdf_error DOUBLE)``."""
    a = pdf_a.select(F.col(x_col).alias("x"), F.col(f_col).alias("fa"))
    b = pdf_b.select(F.col(x_col).alias("x"), F.col(f_col).alias("fb"))
    # Densities are floored at 1e-300 before the log: np.log(0) → -inf
    # clips to the floor anyway, and engines disagree on ln(0) (Spark
    # null, DuckDB error) — the tiny positive floor makes P9 yield the
    # clip value deterministically on every engine.
    diff = (
        a.join(b, "x")
        .select(
            "x",
            F.abs(
                F.greatest(F.log(F.greatest("fa", F.lit(1e-300))), F.lit(floor))
                - F.greatest(F.log(F.greatest("fb", F.lit(1e-300))), F.lit(floor))
            ).alias("d"),
        )
        .filter(~F.isnan("d") & F.col("d").isNotNull())
    )
    return trapz(diff, "x", "d").withColumnRenamed("integral", "log_pdf_error")
