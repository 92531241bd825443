"""Temporal joins Spark has no built-in operator for: as-of join and
range (interval) join. Both are expressed as compositions of shuffle-
once primitives -- no cross joins, no per-row Python -- per the
custom-operator ladder (composition first).

As-of join (price-at-time, state-at-event): implemented with the
union + ordered-window trick. Both sides are unioned on the join key,
sorted by (ts, side) within each key partition, and `last(value,
ignorenulls)` carries the most recent right-side value forward onto
each left row. ONE shuffle on the key -- same cost as an aggregation --
versus the naive per-left-row subquery (quadratic) or an
explode-and-filter. This is the standard scalable formulation (same
shape Flink's event-time join and pandas.merge_asof use).

Range join: equi-join on (key, time_bucket) with the left side
replicated into each bucket its interval overlaps, then an exact
range filter. Candidate volume is bounded by bucket width, not
|left| x |right| per key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame,
              key: str | Sequence[str],
              left_ts: str, right_ts: str, value_cols: list[str],
              suffix: str = "_asof",
              direction: str = "backward",
              allow_exact_matches: bool = True,
              tolerance: float | None = None) -> DataFrame:
    """For each left row, attach the right row's value_cols from the
    nearest right event per key (composite keys accepted):
    `direction` "backward" = latest right_ts <= left_ts (the classic
    ASOF), "forward" = earliest right_ts >= left_ts;
    `allow_exact_matches=False` makes the comparison strict (< / >,
    the sink DB's ASOF operator variants); `tolerance` (seconds, or
    the ts columns' native numeric unit) NULLs the match when the gap
    exceeds it -- the pandas merge_asof surface, distributed.

    One union + ONE keyed window in every variant: direction flips the
    window's sort, strictness flips which side sorts first at equal
    ts (the left row then fills before seeing the tied right row).
    Right-side ties on (key, ts) must be pre-deduped by the caller so
    the result is deterministic.

    The fill carries the WHOLE matched right row as one struct (its
    timestamp plus every value column together), so a NULL value in
    the nearest right row stays NULL in the output -- exact
    pandas.merge_asof semantics -- rather than falling back to an
    older row's value validated against the newer row's timestamp."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: "
                         f"{direction!r}")
    keys = [key] if isinstance(key, str) else list(key)
    side = "__side"
    # inclusive: right sorts before left at equal ts (tie matches);
    # strict: left first (tie invisible to the fill)
    r_side, l_side = (0, 1) if allow_exact_matches else (1, 0)
    out_vals = [f"{c}{suffix}" for c in value_cols]
    # the matched right row travels as ONE struct so value + ts always
    # come from the SAME row (NULL values do not fall back to older rows)
    rtypes = dict(right.dtypes)
    match_t = "struct<__mts:double," + ",".join(
        f"{o}:{rtypes[c]}" for c, o in zip(value_cols, out_vals)) + ">"
    l_tag = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"), F.lit(l_side).alias(side),
        F.lit(True).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
        F.lit(None).cast(match_t).alias("__rmatch"))
    r_tag = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"), F.lit(r_side).alias(side),
        F.lit(False).alias("__is_left"),
        F.lit(None).cast(l_tag.schema["__row"].dataType).alias("__row"),
        F.struct(
            F.col(right_ts).cast("timestamp").cast("double")
             .alias("__mts"),
            *[F.col(c).alias(o)
              for c, o in zip(value_cols, out_vals)]).alias("__rmatch"))
    order = [F.col("__ts").asc(), F.col(side).asc()] \
        if direction == "backward" \
        else [F.col("__ts").desc(), F.col(side).asc()]
    w = (Window.partitionBy(*keys).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = l_tag.unionByName(r_tag).select(
        F.col("__is_left"), F.col("__row"), F.col("__ts"),
        F.last("__rmatch", ignorenulls=True).over(w).alias("__m"))
    out = filled.filter(F.col("__is_left"))
    if tolerance is not None:
        gap = F.abs(F.col("__ts").cast("timestamp").cast("double")
                    - F.col("__m.__mts"))
        ok = F.col("__m.__mts").isNotNull() & (gap <= F.lit(tolerance))
        out = out.select(
            "__row",
            F.when(ok, F.col("__m")).otherwise(F.lit(None)).alias("__m"))
    return out.select(
        "__row.*",
        *[F.col(f"__m.{o}").alias(o) for o in out_vals])


def range_join_binned(left: DataFrame, right: DataFrame, key: str,
                      left_ts: str, right_ts: str,
                      lookback_s: int, bin_s: int | None = None) -> DataFrame:
    """Pairs (l, r) with r.ts in [l.ts - lookback, l.ts], joined on
    (key, bin): the left row lands in every bin its window overlaps
    (ceil(lookback/bin)+1 replicas -- 2 at the default bin width), the
    right row in exactly one; an exact filter trims bin-edge
    false candidates. Replication factor is constant, so the shuffle
    is O(|left| + |right|), never per-key quadratic."""
    bin_s = bin_s or lookback_s
    if lookback_s % bin_s != 0:
        # bin coverage proof (floor((t - L)/b) = floor(t/b) - L/b)
        # requires b | L; a ragged bin could miss boundary candidates
        raise ValueError("bin_s must divide lookback_s")
    n_bins = lookback_s // bin_s + 1
    l_bin = F.floor(F.unix_timestamp(F.col(left_ts)) / bin_s)
    r_bin = F.floor(F.unix_timestamp(F.col(right_ts)) / bin_s)
    l_rep = left.withColumn(
        "__bin", F.explode(F.sequence(l_bin - n_bins + 1, l_bin)))
    r_rep = right.withColumn("__bin", r_bin)
    lo = F.col(left_ts) - F.expr(f"INTERVAL {lookback_s} SECONDS")
    return (l_rep.join(r_rep, [key, "__bin"])
            .filter((F.col(right_ts) <= F.col(left_ts)) &
                    (F.col(right_ts) >= lo))
            .drop("__bin"))


def fill_time_gaps(df: DataFrame, key_col: str, ts_col: str,
                   value_col: str, step_seconds: int,
                   how: str = "ffill") -> DataFrame:
    """Regularize a per-key time series to a fixed step, filling the
    gaps -- capability parity with the sink database's
    `ORDER BY .. WITH FILL [INTERPOLATE]` (ClickHouse), which the
    reference's users run over synced series.

    Plan shape (scale stance): ONE aggregation finds each key's
    [min, max] span; the dense grid is `sequence(min, max, interval)`
    exploded FROM that 1-row-per-key relation (the fill never scans
    the fact table twice); actual points left-join back on
    (key, tick); then
      how='ffill'  -> last(ignorenulls) window carries the previous
                      observation forward (step function), or
      how='interp' -> linear interpolation between the previous and
                      next observations, from two mirrored
                      last/first(ignorenulls) windows over the SAME
                      (key x time) partitioning -- no extra shuffle.
    Grid ticks are aligned to each key's own min (the WITH FILL FROM
    analog). Points before a key's first observation stay NULL in
    both modes (nothing to carry/anchor); trailing NULLs only in
    'interp' when no later point exists. A source row whose value is
    NULL counts as a gap, not an observation -- it gets filled like
    any missing tick (and is_observed reports false for it).

    Returns (key, tick, value, is_observed)."""
    if how not in ("ffill", "interp"):
        raise ValueError("how must be 'ffill' or 'interp'")
    k, ts = F.col(key_col).alias("key"), F.col(ts_col)
    pts = df.select(k, ts.alias("tick"),
                    F.col(value_col).cast("double").alias("v"))
    span = pts.groupBy("key").agg(F.min("tick").alias("lo"),
                                  F.max("tick").alias("hi"))
    grid = span.select(
        "key", F.explode(F.sequence(
            "lo", "hi",
            F.expr(f"INTERVAL {int(step_seconds)} SECONDS"))).alias("tick"))
    joined = grid.join(pts, ["key", "tick"], "left")
    w_prev = (Window.partitionBy("key").orderBy("tick")
              .rowsBetween(Window.unboundedPreceding, 0))
    if how == "ffill":
        filled = F.last("v", ignorenulls=True).over(w_prev)
    else:
        w_next = (Window.partitionBy("key").orderBy("tick")
                  .rowsBetween(0, Window.unboundedFollowing))
        pv = F.last("v", ignorenulls=True).over(w_prev)
        nv = F.first("v", ignorenulls=True).over(w_next)
        pt = F.last(F.when(F.col("v").isNotNull(), F.col("tick")),
                    ignorenulls=True).over(w_prev)
        nt = F.first(F.when(F.col("v").isNotNull(), F.col("tick")),
                     ignorenulls=True).over(w_next)
        frac = ((F.unix_timestamp("tick") - F.unix_timestamp(pt))
                / F.when(F.unix_timestamp(nt) == F.unix_timestamp(pt),
                         F.lit(None))
                   .otherwise(F.unix_timestamp(nt) - F.unix_timestamp(pt)))
        filled = (F.when(F.col("v").isNotNull(), F.col("v"))
                   .when(pv.isNull() | nv.isNull(), pv)
                   .otherwise(F.round(pv + (nv - pv) * frac, 6)))
    return joined.select(
        "key", "tick", filled.alias("value"),
        F.col("v").isNotNull().alias("is_observed"))


def exponential_moving_average(df: DataFrame, key_col: str, ts_col: str,
                               value_col: str, alpha: float,
                               out_col: str = "ema",
                               tiebreak_col: str | None = None
                               ) -> DataFrame:
    """Per-key EMA over time order (the sink DB's
    exponentialMovingAverage / the classic smoothing pass):
    ema_t = alpha * x_t + (1 - alpha) * ema_{t-1}, seeded at the first
    observation.

    The recurrence is inherently sequential per key, so like the funnel
    scan it runs as ONE applyInPandas over key groups -- but inside the
    group it is pandas' vectorized C `ewm`, not a Python loop. A
    closed-form window formulation exists (x_i weights (1-alpha)^(t-i))
    but overflows double for series longer than a few thousand rows;
    the grouped scan has no length limit. Sequential per key, parallel
    across keys -- the same per-key-memory contract as every stateful
    operator here. Adds `out_col`, preserves the input columns. Pass
    `tiebreak_col` when equal timestamps are possible -- without it a
    tie's scan order follows arrival order, which is not deterministic
    across partitionings."""
    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1]")
    cols = df.columns
    out_fields = ", ".join(f"`{c}` {t}" for c, t in df.dtypes)
    schema = f"{out_fields}, {out_col} double"
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def scan(pdf):
        pdf = pdf.sort_values(order, kind="mergesort")
        pdf[out_col] = (pdf[value_col].astype("float64")
                        .ewm(alpha=alpha, adjust=False).mean())
        return pdf

    return (df.groupBy(key_col).applyInPandas(scan, schema)
              .select(*cols, out_col))


def delta_sum(df: DataFrame, key_col: str, ts_col: str,
              value_col: str,
              tiebreak_col: str | None = None) -> DataFrame:
    """(key, delta_sum): the sink DB's deltaSum aggregate -- the sum
    of POSITIVE successive differences in (ts, tiebreak) order, the
    standard reading of monotonically-increasing counters that
    occasionally reset (a reset's negative delta is skipped instead of
    poisoning the total). One keyed window (lag) + one keyed sum that
    share the partitioning -- a single exchange."""
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    diff = F.col(value_col) - F.lag(value_col, 1).over(w)
    return (df.withColumn("__d", diff)
              .groupBy(F.col(key_col).alias("key"))
              .agg(F.sum(F.greatest(F.col("__d"), F.lit(0)))
                    .alias("delta_sum")))


def lttb_downsample(df: DataFrame, key_col: str, ts_col: str,
                    value_col: str, n_out: int,
                    tiebreak_col: str | None = None) -> DataFrame:
    """Per-key largest-triangle-three-buckets downsampling
    (Steinarsson 2013; the sink DB's largestTriangleThreeBuckets
    aggregate): reduce each series to `n_out` points that preserve
    its visual shape -- first and last points always kept, interior
    points chosen one per bucket to maximize the triangle area with
    the previously selected point and the NEXT bucket's centroid.

    The selection is inherently sequential per series (each choice
    depends on the previous selected point), so it runs as ONE
    applyInPandas over key groups -- numpy area arithmetic inside,
    parallel across keys, the per-key-memory contract of every scan
    here. Output: (key, ts, value, idx) with idx the 0-based output
    position (total ordering of the downsampled series)."""
    import numpy as np

    if n_out < 2:
        raise ValueError("n_out must be >= 2 (endpoints are kept)")
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    kt = dict(df.dtypes)[key_col]
    schema = (f"`{key_col}` {kt}, `{ts_col}` double, "
              f"`{value_col}` double, idx int")

    def scan(pdf):
        pdf = pdf.sort_values(order, kind="mergesort")
        # datetime ts -> SECONDS since epoch (the repo-wide ts_s
        # convention); ns-as-float64 would lose precision past 2^53
        x = (pdf[ts_col].astype("int64").to_numpy()
             .astype("float64") / 1e9
             if str(pdf[ts_col].dtype).startswith("datetime")
             else pdf[ts_col].to_numpy(dtype="float64"))
        y = pdf[value_col].to_numpy(dtype="float64")
        ln = len(x)
        if ln <= n_out:
            sel = list(range(ln))
        elif n_out == 2:
            sel = [0, ln - 1]            # endpoints only, no buckets
        else:
            # n_out-2 interior buckets over points 1..ln-2
            edges = [1 + (ln - 2) * i // (n_out - 2)
                     for i in range(n_out - 1)]
            sel = [0]
            prev = 0
            for b in range(n_out - 2):
                lo, hi = edges[b], edges[b + 1]
                nlo, nhi = (edges[b + 1],
                            edges[b + 2] if b + 2 < len(edges) else ln)
                if nhi <= nlo:
                    nlo, nhi = ln - 1, ln
                cx, cy = x[nlo:nhi].mean(), y[nlo:nhi].mean()
                area = np.abs(
                    (x[prev] - cx) * (y[lo:hi] - y[prev])
                    - (x[prev] - x[lo:hi]) * (cy - y[prev]))
                prev = lo + int(area.argmax())
                sel.append(prev)
            sel.append(ln - 1)
        key = pdf[key_col].iloc[0]
        import pandas as pd
        return pd.DataFrame({
            key_col: [key] * len(sel),
            ts_col: [float(x[i]) for i in sel],
            value_col: [float(y[i]) for i in sel],
            "idx": list(range(len(sel)))})

    return df.groupBy(key_col).applyInPandas(scan, schema)


def exponential_time_decayed_avg(df: DataFrame, key_col: str,
                                 ts_col: str, value_col: str,
                                 halflife_s: float,
                                 out_col: str = "decayed_avg",
                                 tiebreak_col: str | None = None
                                 ) -> DataFrame:
    """Per-key TIME-decayed running average (the sink DB's
    exponentialTimeDecayedAvg): each observation's weight halves
    every `halflife_s` SECONDS of wall-clock gap --
      avg_i = sum_j<=i x_j * 2^-((t_i - t_j)/halflife)
            / sum_j<=i       2^-((t_i - t_j)/halflife)
    -- unlike exponential_moving_average, whose decay is per ROW and
    blind to irregular spacing. Same execution shape: one
    applyInPandas per key, pandas' C-implemented time-aware
    `ewm(halflife, times)` inside (no Python loop), parallel across
    keys. Adds `out_col`, preserves the input columns."""
    if halflife_s <= 0:
        raise ValueError("halflife_s must be positive")
    cols = df.columns
    out_fields = ", ".join(f"`{c}` {t}" for c, t in df.dtypes)
    schema = f"{out_fields}, {out_col} double"
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def scan(pdf):
        import pandas as pd
        pdf = pdf.sort_values(order, kind="mergesort")
        ts = pdf[ts_col]
        if not str(ts.dtype).startswith("datetime"):
            ts = pd.to_datetime(ts, unit="s")
        pdf[out_col] = (pdf[value_col].astype("float64")
                        .ewm(halflife=pd.Timedelta(seconds=halflife_s),
                             times=ts).mean())
        return pdf

    return (df.groupBy(key_col).applyInPandas(scan, schema)
              .select(*cols, out_col))
