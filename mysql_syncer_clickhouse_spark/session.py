"""SparkSession factory tuned for this engine.

Local-mode defaults match the test/bench harness (local[N] single JVM);
on a real cluster only the master/memory settings change -- the
SQL-level settings (AQE, shuffle partitions sized to cores, UTC
session timezone for oracle parity) hold at any scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "mysql_syncer_clickhouse_spark",
              cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """`shuffle_partitions` defaults to `cpus` -- the cluster-correct
    rule of thumb. Harnesses running SMALL fixtures should pass fewer
    (bench.py sizes it to the fixture): SCALE.md §5 measured that at
    sf0.1 every shuffle carries a few MB, so 32 near-empty partitions
    across ~40 stages is pure task-dispatch floor, not data work --
    `local[8]` beat `local[32]` on the merged entries. Plans are
    partition-count independent; only scheduling overhead changes."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get(
            "SPARK_GRAFT_SHUFFLE_PARTITIONS", "0") or 0) or cpus
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .getOrCreate()
    )
    apply_log_level(spark)
    return spark


def apply_log_level(spark: SparkSession) -> None:
    """Honor the CLI's --log-level (the reference's -log_level flag)
    via SPARK_GRAFT_LOG_LEVEL; default leaves Spark's own level."""
    level = os.environ.get("SPARK_GRAFT_LOG_LEVEL")
    if level:
        spark.sparkContext.setLogLevel(level)
