"""Map-valued aggregations -- ClickHouse's sumMap / minMap / maxMap
family (key-wise combination of map columns across rows), Spark-first.

ClickHouse stores per-row counter maps (e.g. {status -> count}) and
aggregates them key-wise; tables the reference syncs INTO use this
shape for pre-aggregated metrics. Spark has map_concat but no
key-COMBINING aggregate, so the idiomatic plan is: explode the map to
(group, key, value) rows, ONE keyed aggregation (map-side combinable
-- the explode output collapses to |group x key| partials per mapper
before the exchange), then reassemble a deterministic map per group
(entries sorted by key inside the aggregate, so the result is
partitioning-independent -- the repo's determinism convention).

At 100 TB: shuffle volume is |groups x distinct keys| after partial
aggregation, not |rows x map size|; no driver-side state, no UDFs.
NULL maps contribute nothing; a key's NULL value is skipped (matches
aggregate-ignores-NULL). A group whose maps are ALL NULL/empty still
appears in the output with an empty map -- ClickHouse's sumMap keeps
the group -- via explode_outer's (NULL, NULL) marker row, NOT a
join-back onto distinct groups (which would re-execute the source
subtree: Spark shares no exchange across an aggregate branch and a
join branch).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _agg_map(df: DataFrame, group_cols: Sequence[str], map_col: str,
             combine: Column, out_col: str) -> DataFrame:
    # explode_outer keeps one (NULL, NULL) marker row for NULL/empty
    # maps, so a group with no entries anywhere still reaches the final
    # aggregate (and assembles to an empty map). An entry with a NULL
    # value is demoted to a marker too (key nulled, not row-dropped) --
    # aggregate-ignores-NULL for the key, but the group still survives.
    flat = (df.select(*group_cols,
                      F.explode_outer(map_col).alias("__k0", "__v"))
            .select(*group_cols,
                    F.when(F.col("__v").isNotNull(), F.col("__k0"))
                     .alias("__k"),
                    "__v"))
    per_key = flat.groupBy(*group_cols, "__k").agg(
        combine.alias("__v"))
    # collect_list skips NULL elements: the when() turns marker rows
    # into NULLs, so an all-empty group yields [] -> {} (typed by the
    # struct's schema), never a NULL-keyed map entry
    return (per_key.groupBy(*group_cols)
            .agg(F.map_from_entries(
                F.sort_array(F.collect_list(
                    F.when(F.col("__k").isNotNull(),
                           F.struct(F.col("__k"), F.col("__v"))))))
                .alias(out_col)))


def sum_map(df: DataFrame, group_cols: Sequence[str],
            map_col: str, *, out_col: str = "sum_map") -> DataFrame:
    """sumMap: per group, the key-wise SUM of the map column.
    {a:1, b:2} + {b:3, c:4} -> {a:1, b:5, c:4}."""
    return _agg_map(df, group_cols, map_col, F.sum("__v"), out_col)


def min_map(df: DataFrame, group_cols: Sequence[str],
            map_col: str, *, out_col: str = "min_map") -> DataFrame:
    """minMap: key-wise minimum across the group's maps."""
    return _agg_map(df, group_cols, map_col, F.min("__v"), out_col)


def max_map(df: DataFrame, group_cols: Sequence[str],
            map_col: str, *, out_col: str = "max_map") -> DataFrame:
    """maxMap: key-wise maximum across the group's maps."""
    return _agg_map(df, group_cols, map_col, F.max("__v"), out_col)


def count_map(df: DataFrame, group_cols: Sequence[str],
              map_col: str, *, out_col: str = "count_map") -> DataFrame:
    """Key-wise presence count (how many of the group's rows carry
    each key with a non-NULL value) -- the countMap analog."""
    return _agg_map(df, group_cols, map_col,
                    F.count(F.lit(1)), out_col)
