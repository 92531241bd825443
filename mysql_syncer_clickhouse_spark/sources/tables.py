"""Batch table sources over the driver-generated parquet fixtures.

The reference's snapshot source is a mysqldump full load of each
configured table (river/river.go:111-146); our batch analog is a
columnar parquet scan, which Catalyst prunes and pushes filters into
(the reference's column filter, river/sync.go:338-341, comes for free).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Plain `spark.read.parquet` so predicate
    pushdown / column pruning stay available to every downstream query.

    `events.parquet` stores TIMESTAMP(NANOS), which Spark rejects by
    default (PARQUET_TYPE_ILLEGAL); read nanos as long and rebuild the
    timestamp at microsecond precision (exact: the fixture's values are
    whole microseconds). Done here so it works under ANY SparkSession,
    including the driver's."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # oracle parity requires UTC timestamp rendering (DuckDB is
    # TZ-naive); pin it here so queries are correct under ANY session,
    # not just the one session.py builds
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # the fixture's ts is parquet TIMESTAMP without isAdjustedToUTC;
    # Spark 4 infers TIMESTAMP_NTZ for those by default, which rejects
    # unix_millis / CAST(.. AS BIGINT). Read it as LTZ (stored micros
    # taken as UTC instants — identical values to DuckDB's naive read
    # under the UTC session TZ pinned above).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # belt-and-suspenders if a caller read before the conf applied, and
    # insurance against future fixture drift on OTHER tables/columns:
    # under the UTC session TZ this cast is value-identical to the LTZ
    # read, and LTZ is what unix_millis / CAST(.. AS BIGINT) accept
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp_ltz"))
    return df


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] = TABLES) -> None:
    """Register every fixture table as a temp view so queries can be
    written in SQL (same Catalyst plan as the DataFrame API)."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
