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
