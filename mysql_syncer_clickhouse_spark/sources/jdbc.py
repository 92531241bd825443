"""JDBC snapshot source -- the mysqldump analog (SURVEY §2.1 S1).

The reference takes its initial full load by shelling out to
`mysqldump` before tailing the binlog (river/river.go:111-146,
reference README.md:95-101). Spark's native JDBC source does the same
job cluster-parallel: each executor reads one PK range, so a 1 TB
table snapshots as N concurrent range scans instead of one dump
stream. The binlog tail then resumes from the snapshot watermark
(streaming/pipeline.py) exactly as the reference resumes from the
dump's recorded position.

No MySQL server (or JDBC driver jar) ships in this environment, so
this module is import-safe and only touches JDBC when called; tests
cover the partitioning math, and `snapshot_reader` is the single
integration point a real deployment configures.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class JdbcSnapshotConfig:
    """Connection + parallelism settings (the reference's [source]
    my_addr/user/pass block, river/config.go:18-51)."""
    url: str                      # jdbc:mysql://host:3306/db
    table: str                    # schema.table
    user: str
    password: str
    partition_column: str | None = None   # numeric/date PK for ranges
    num_partitions: int = 32
    fetch_size: int = 10_000

    def reader_options(self, lower: int | None = None,
                       upper: int | None = None) -> dict[str, str]:
        """Options for spark.read.format('jdbc'). With a partition
        column and bounds, Spark issues num_partitions parallel range
        queries: WHERE pk >= l AND pk < u per partition."""
        opts = {
            "url": self.url,
            "dbtable": self.table,
            "user": self.user,
            "password": self.password,
            "fetchsize": str(self.fetch_size),
        }
        if self.partition_column is not None and lower is not None \
                and upper is not None and upper > lower:
            opts.update({
                "partitionColumn": self.partition_column,
                "lowerBound": str(lower),
                "upperBound": str(upper),
                "numPartitions": str(self.num_partitions),
            })
        return opts


def pk_bounds_query(cfg: JdbcSnapshotConfig) -> str:
    """Single-row bounds probe pushed to MySQL, so range partitioning
    needs no full scan."""
    return (f"(SELECT MIN({cfg.partition_column}) AS lo, "
            f"MAX({cfg.partition_column}) AS hi FROM {cfg.table}) b")


def snapshot_reader(spark: SparkSession,
                    cfg: JdbcSnapshotConfig) -> DataFrame:
    """Build the parallel snapshot DataFrame. Probes PK bounds first
    (one tiny query), then hands Spark the range-partitioned read."""
    if cfg.partition_column is None:
        return spark.read.format("jdbc") \
            .options(**cfg.reader_options()).load()
    bounds = (spark.read.format("jdbc")
              .options(**{**cfg.reader_options(),
                          "dbtable": pk_bounds_query(cfg)})
              .load().collect()[0])
    return (spark.read.format("jdbc")
            .options(**cfg.reader_options(int(bounds["lo"]),
                                          int(bounds["hi"]) + 1))
            .load())
