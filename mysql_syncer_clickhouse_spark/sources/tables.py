"""Batch table sources over the driver-generated parquet fixtures.

The reference's snapshot source is a mysqldump full load of each
configured table (river/river.go:111-146); our batch analog is a
columnar parquet scan, which Catalyst prunes and pushes filters into
(the reference's column filter, river/sync.go:338-341, comes for free).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Plain `spark.read.parquet` so predicate
    pushdown / column pruning stay available to every downstream query."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] = TABLES) -> None:
    """Register every fixture table as a temp view so queries can be
    written in SQL (same Catalyst plan as the DataFrame API)."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
