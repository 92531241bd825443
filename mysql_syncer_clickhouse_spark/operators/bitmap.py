"""Bitmap aggregates: the sink DB's groupBitmap / bitmapAnd / bitmapOr
/ bitmapXor surface (ClickHouse's roaring-bitmap aggregate family) as
sparse DataFrame bitmaps.

A bitmap here is a relation (group..., word, bits): 64-bit `bits`
words holding one bit per distinct value, keyed by `word` =
floor(value / 32) with bit index `value mod 32` (32-bit words so every
mask is a positive BIGINT in any engine; the mapping is injective for
ALL longs, negatives included -- Spark's arithmetic shiftright IS
floor division). Only words with at least one set bit exist, so state
is |distinct values| / 32 words worst case regardless of the value
domain -- the sparse analog of a roaring container.

Why this beats COUNT(DISTINCT) pipelines at scale: the bitmap is
mergeable (bit_or is associative/commutative/idempotent), so

- cardinality is exact in ONE pass with map-side partial aggregation
  (a distinct-count shuffles every distinct key; this shuffles <=
  1/32nd as many rows, pre-OR'd per mapper);
- set algebra between groups (segment overlap: "users who did A and
  B") is a word-keyed join + bitwise ops -- no distinct-distinct
  join, no row explosion;
- incremental maintenance is a union + re-OR (idempotent: replays
  cannot double-count), the same merge-on-read contract as
  streaming/continuous_agg.py.

Everything is flat JVM expressions (bit_or / bit_count / shifts), and
md5-free -- the arithmetic is exact, so DuckDB mirrors it verbatim
(the registry checks bitmap cardinality == COUNT(DISTINCT) through the
real bitmap plan).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _mask(value: Column) -> Column:
    # value & 31 is the nonneg math-mod for any sign; 1 << it fits
    # a positive long
    return F.call_function("shiftleft", F.lit(1).cast("long"),
                           value.bitwiseAND(F.lit(31)).cast("int"))


def bitmap_agg(df: DataFrame, group_cols: Sequence[str],
               value_col: str) -> DataFrame:
    """groupBitmapState: (group..., word, bits) sparse bitmap of the
    distinct values per group. ONE keyed aggregation; NULL values are
    skipped (not representable in a set of ints, matching the
    aggregate-ignores-NULL convention)."""
    v = F.col(value_col).cast("long")
    return (df.filter(v.isNotNull())
              .select(*group_cols, F.shiftright(v, 5).alias("word"),
                      _mask(v).alias("mask"))
              .groupBy(*group_cols, "word")
              .agg(F.bit_or("mask").alias("bits")))


def bitmap_cardinality(bm: DataFrame,
                       group_cols: Sequence[str]) -> DataFrame:
    """groupBitmap: exact distinct count per group from the bitmap --
    sum of per-word popcounts."""
    return (bm.groupBy(*group_cols)
              .agg(F.sum(F.bit_count("bits")).alias("cardinality")))


def _merge(a: DataFrame, b: DataFrame, group_cols: Sequence[str],
           combine: Column, join_type: str) -> DataFrame:
    keys = [*group_cols, "word"]
    bb = b.select(*keys, F.col("bits").alias("bits_b"))
    out = (a.withColumnRenamed("bits", "bits_a")
            .join(bb, keys, join_type)
            .select(*keys, combine.alias("bits")))
    return out.filter(F.col("bits") != 0)


def bitmap_and(a: DataFrame, b: DataFrame,
               group_cols: Sequence[str] = ()) -> DataFrame:
    """bitmapAnd: intersection bitmap -- inner word join + bitwise &.
    Words present on only one side intersect to nothing and drop out
    of the join for free."""
    return _merge(a, b, group_cols,
                  F.col("bits_a").bitwiseAND(F.col("bits_b")), "inner")


def bitmap_or(a: DataFrame, b: DataFrame,
              group_cols: Sequence[str] = ()) -> DataFrame:
    """bitmapOr: union bitmap -- full-outer word join + bitwise |."""
    return _merge(
        a, b, group_cols,
        F.coalesce(F.col("bits_a"), F.lit(0))
         .bitwiseOR(F.coalesce(F.col("bits_b"), F.lit(0))), "full_outer")


def bitmap_xor(a: DataFrame, b: DataFrame,
               group_cols: Sequence[str] = ()) -> DataFrame:
    """bitmapXor: symmetric difference -- full-outer join + ^, dropping
    words that cancel to zero."""
    return _merge(
        a, b, group_cols,
        F.coalesce(F.col("bits_a"), F.lit(0))
         .bitwiseXOR(F.coalesce(F.col("bits_b"), F.lit(0))), "full_outer")


def bitmap_contains(bm: DataFrame, value: int,
                    group_cols: Sequence[str] = ()) -> DataFrame:
    """bitmapContains: per group, whether `value` is in the set. A
    filter on ONE word then a popcount-free bit test; groups whose
    word row is absent simply return no row (join against the group
    dimension for a dense False)."""
    word, bit = value >> 5, value & 31
    return (bm.filter(F.col("word") == word)
              .select(*group_cols,
                      (F.col("bits").bitwiseAND(F.lit(1 << bit)) != 0)
                      .alias("contains")))


def bitmap_andnot(a: DataFrame, b: DataFrame,
                  group_cols: Sequence[str] = ()) -> DataFrame:
    """bitmapAndnot: set difference a \\ b -- left-outer word join +
    a & ~b (absent b-words subtract nothing), dropping words that
    cancel to zero."""
    return _merge(
        a, b, group_cols,
        F.col("bits_a").bitwiseAND(
            F.bitwise_not(F.coalesce(F.col("bits_b"), F.lit(0)))),
        "left")
