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
              suffix: str = "_asof") -> DataFrame:
    """For each left row, attach the right row's value_cols from the
    latest right event with right_ts <= left_ts (per key; composite
    keys accepted). Right-side ties on (key, ts) must be pre-deduped
    by the caller so the result is deterministic."""
    keys = [key] if isinstance(key, str) else list(key)
    side = "__side"          # right=0 sorts before left=1 at equal ts
    out_vals = [f"{c}{suffix}" for c in value_cols]
    l_tag = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"), F.lit(1).alias(side),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(o)
          for c, o in zip(value_cols, out_vals)])
    r_tag = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"), F.lit(0).alias(side),
        F.lit(None).cast(l_tag.schema["__row"].dataType).alias("__row"),
        *[F.col(c).alias(o) for c, o in zip(value_cols, out_vals)])
    w = (Window.partitionBy(*keys).orderBy("__ts", side)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = l_tag.unionByName(r_tag).select(
        F.col(side), F.col("__row"),
        *[F.last(o, ignorenulls=True).over(w).alias(o) for o in out_vals])
    return (filled.filter(F.col(side) == 1)
                  .select("__row.*", *out_vals))


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
