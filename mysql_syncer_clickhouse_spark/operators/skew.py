"""Skew mitigation for shuffle joins -- the manual fallback when AQE's
skew-join splitting (enabled in session.py) is not enough, e.g. a
single hot key holding >10% of a 100 TB fact table.

Technique: the fact side gets a salt in [0, salt_n); the other side is
replicated once per salt value. The join key becomes (key, salt), so
one hot key's rows spread over salt_n shuffle partitions instead of
one. Row-level results are identical to the unsalted join by
construction -- every fact row still meets every matching row of the
replicated side exactly once.

The reference has no joins at all (its sink database does them); this
operator exists because at 100 TB a skewed key is the #1 way a shuffle
join falls over, and "replicate the small side salt_n times" is the
standard, partition-parallel cure.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(fact: DataFrame, other: DataFrame,
                on: Sequence[str], how: str = "inner",
                salt_n: int = 16) -> DataFrame:
    """Join `fact` (large, possibly skewed keys) with `other`
    (replicated salt_n times). Salt is derived from the fact row's
    whole content hash -- deterministic, uniform, and independent of
    the join key so a hot key spreads evenly."""
    fact_s = fact.withColumn(
        SALT, F.pmod(F.xxhash64(*fact.columns), F.lit(salt_n)).cast("int"))
    other_s = other.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1))))
    out = fact_s.join(other_s, [*on, SALT], how)
    return out.drop(SALT)


def hot_key_salted_join(fact: DataFrame, other: DataFrame,
                        on: Sequence[str], how: str = "inner",
                        salt_n: int = 16,
                        hot_threshold: int = 100_000,
                        sample_fraction: float | None = None) -> DataFrame:
    """Two-phase skew join: salt ONLY the hot keys.

    `salted_join` replicates the whole small side salt_n times -- at
    100 TB that multiplies a shuffle by salt_n to cure a handful of
    keys. This variant first finds the keys holding >= hot_threshold
    fact rows (one map-side-combinable count -- or a cheaper seeded
    sample count with a proportionally scaled threshold when
    sample_fraction is set), splits both inputs on that key set, salts
    only the hot slice, joins the cold slice plainly, and unions.
    Row-identical to the plain join (each pair still meets exactly
    once; the slices partition the key space), but replication cost
    drops from |other| x salt_n to |other ∩ hot keys| x salt_n.

    The hot-key relation is small BY THE DEFINITION of skew (a key set
    that were corpus-sized would not be "hot"), so it carries an
    explicit broadcast hint -- same bounded-relation rule as
    nation/region. Inner joins only: slicing an outer join would need
    null-row bookkeeping across the union.
    """
    if how != "inner":
        raise ValueError("hot_key_salted_join supports inner joins only")
    src = fact if sample_fraction is None else \
        fact.sample(fraction=sample_fraction, seed=42)
    thr = hot_threshold if sample_fraction is None else \
        max(int(hot_threshold * sample_fraction), 1)
    hot = (src.groupBy(*on).agg(F.count(F.lit(1)).alias("__n"))
              .filter(F.col("__n") >= thr)
              .select(*on))
    cold = (fact.join(F.broadcast(hot), list(on), "left_anti")
                .join(other, list(on), how))
    hot_joined = salted_join(
        fact.join(F.broadcast(hot), list(on), "left_semi"),
        other.join(F.broadcast(hot), list(on), "left_semi"),
        on, how, salt_n)
    return cold.unionByName(hot_joined.select(*cold.columns))
