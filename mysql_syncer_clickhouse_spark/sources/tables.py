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


def load_table(spark: SparkSession, sf_dir: str, name: str,
               spread: bool = False) -> DataFrame:
    """Load one fixture table. Plain `spark.read.parquet` so predicate
    pushdown / column pruning stay available to every downstream query.

    `spread=True` opts in to _spread_starved_scan (below) for queries
    whose first post-scan operator is CPU-heavy map-side work (heavy
    partial aggregation, salting): measured A/B at sf0.1 it wins
    ~2x there (q1 1.14 -> 0.54 s) but LOSES on multi-branch union
    entries (branches already run concurrently; the extra exchange per
    branch is pure overhead: tpch_suite_b +0.7 s, agg_grouping_stats
    +0.4 s) and on sort-limit shapes (topk_orders +0.07 s), so it is
    per-call-site, not blanket.

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
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # belt-and-suspenders if a caller read before the conf applied, and
    # insurance against future fixture drift on OTHER tables/columns:
    # under the UTC session TZ this cast is value-identical to the LTZ
    # read, and LTZ is what unix_millis / CAST(.. AS BIGINT) accept
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp_ltz"))
    return _spread_starved_scan(spark, df, path) if spread else df


# ~1 MB of parquet per task: below this, extra tasks are pure
# scheduling overhead; above it, a single-split file serializes every
# downstream map/partial-aggregate on one core
_SPREAD_TARGET_BYTES = 1 << 20


def _spread_starved_scan(spark: SparkSession, df: DataFrame,
                         path: str) -> DataFrame:
    """Guide §2.5 ('input skew: one huge unsplittable file ...
    repartition immediately after the read'), round 15: the fixture
    tables are SINGLE-ROW-GROUP parquet files, so every scan -- and
    the whole-stage-codegen projection/partial-aggregation fused above
    it -- runs as ONE task no matter how many cores the session has
    (q1's six decimal sums over 600k rows measured 1.4 s on one core).
    When a single input file cannot supply meaningful parallelism,
    hash-repartition the scan output on the table's leading (high-
    cardinality key) column, sized by bytes -- min(defaultParallelism,
    file_bytes / 1 MB). Scale-adaptive by construction: a cluster-
    sized table is a DIRECTORY of many files (getsize reports the
    directory inode, far below the 2 MB floor -> no-op; splits provide
    the parallelism) or a file above maxPartitionBytes (-> no-op
    here because splits, not this helper, provide the parallelism);
    predicate pushdown and column pruning pass through a
    RepartitionByExpression, so the scan still receives its filters
    (asserted in test_plans.py). Values are unaffected: every
    aggregate in the repo is partition-order-independent by the
    exact-decimal convention."""
    try:
        size = os.path.getsize(path)
    except OSError:
        return df
    max_split = 128 << 20   # spark.sql.files.maxPartitionBytes default
    if size >= max_split:
        return df
    n_target = min(spark.sparkContext.defaultParallelism,
                   int(size // _SPREAD_TARGET_BYTES))
    if n_target <= 1:
        return df
    return df.repartition(n_target, F.col(df.columns[0]))


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] = TABLES) -> None:
    """Register every fixture table as a temp view so queries can be
    written in SQL (same Catalyst plan as the DataFrame API)."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
