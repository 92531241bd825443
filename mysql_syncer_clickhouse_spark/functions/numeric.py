"""Cross-engine-deterministic numeric aggregation.

Floating-point SUM is order-dependent, so a double sum computed by Spark
(parallel, partial aggregation) and by an oracle engine (single-threaded)
differ in the last ulps and break value-hash comparison. Convention used
by every query in this repo: aggregate in DECIMAL (exact, associative,
order-independent), round to a fixed scale, and cast back to DOUBLE.
The per-row cast double->decimal(38,6) is deterministic (same IEEE input
value on both engines), so the whole aggregate is reproducible bit for
bit regardless of partitioning or merge order -- which is exactly the
property needed on a 1000-executor cluster, not just for the oracle.

Each Column helper has a `sql_*` twin that emits the equivalent ANSI SQL
for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(38,6)"


def dsum(col: Column | str, alias: str, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(_DEC)), scale).cast("double").alias(alias)


def davg(col: Column | str, alias: str, scale: int = 6) -> Column:
    """avg as exact-decimal SUM cast to double, divided by COUNT -- one
    IEEE division of two deterministic values on both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(c.cast(_DEC)).cast("double") / F.count(F.lit(1)),
        scale,
    ).alias(alias)


def sql_dsum(expr: str, alias: str, scale: int = 2) -> str:
    return (f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(38,6))), {scale}) "
            f"AS DOUBLE) AS {alias}")


def sql_davg(expr: str, alias: str, scale: int = 6) -> str:
    return (f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE) "
            f"/ COUNT(*), {scale}) AS {alias}")
