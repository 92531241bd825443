"""Data-layout operators: multi-dimensional clustering for scan
pruning.

The reference's sink gets its read performance from ClickHouse's
ORDER BY (pk) clustering (README.md:44-56) -- one dimension. At 100 TB
a parquet lake gets the same effect from file/row-group min-max stats,
and Z-ORDERING extends it to multiple dimensions: interleave the bits
of the clustering keys into one value, range-partition + sort by it,
and a predicate on ANY of the dimensions touches a bounded subset of
files (each file covers a small hyper-rectangle of the key space
instead of a full stripe).

Pure Column bit arithmetic (shiftleft/or over codegen), one
repartitionByRange + in-partition sort -- the identical machinery
shuffle_corpus uses, pointed at locality instead of randomness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(cols: list[Column], bits: int = 16) -> Column:
    """Interleave `bits` bits of each (already [0, 2^bits)-ranged,
    integral) column into one long: bit i of column j lands at
    position i * n_cols + j. Classic Morton encoding as a flat
    codegen expression -- no UDF."""
    n = len(cols)
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(
                F.shiftleft(bit, i * n + j).cast("long"))
    return out


def z_order_write(df: DataFrame, path: str, by: list[str], *,
                  n_files: int = 16, bits: int = 10) -> None:
    """Write `df` as `n_files` parquet files z-ordered on `by`: each
    clustering column is min-max-scaled onto [0, 2^bits) (the scaling
    bounds come from ONE tiny aggregate cross-joined back -- no
    driver-side action), Morton-interleaved, then range-partitioned and
    sorted. Rows matching a predicate on ANY `by` column concentrate
    in a small subset of files (test-asserted via input_file_name);
    parquet row-group min-max stats skip the cold pages within each
    file, and a stats-aware table format (Delta/Iceberg-class) prunes
    whole files from the listing with zero layout changes."""
    aggs = []
    for c in by:
        aggs += [F.min(c).alias(f"__min_{c}"),
                 F.max(c).alias(f"__max_{c}")]
    bounds = df.agg(*aggs)
    scaled = df.crossJoin(F.broadcast(bounds))
    top = (1 << bits) - 1
    zcols = []
    for c in by:
        lo = F.col(f"__min_{c}").cast("double")
        hi = F.col(f"__max_{c}").cast("double")
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        zcols.append(F.least(
            F.lit(top),
            F.floor((F.col(c).cast("double") - lo) / span * top)
             .cast("long")))
    z = z_value(zcols, bits=bits)
    (scaled.withColumn("__z", z)
           .drop(*[f"__min_{c}" for c in by],
                 *[f"__max_{c}" for c in by])
           .repartitionByRange(n_files, "__z")
           .sortWithinPartitions("__z")
           .drop("__z")
           .write.mode("overwrite").parquet(path))
