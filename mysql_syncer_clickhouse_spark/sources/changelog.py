"""Changelog (CDC) source model.

Normalized change-event schema -- the reference's `BulkRequest` IR
(clickhouse/client.go:62-70) plus the total order the binlog position
provides (river/master.go:17-25):

    (seq long, ts timestamp, op string, pk..., payload...)

`derive_changelog_from_events` maps the driver's `events` fixture into
this shape deterministically (event_id = seq = binlog-position analog,
user_id = pk, event_type -> op) so CDC operators are oracle-checkable
in plain SQL on the shared parquet. Real deployments would read a
Debezium/Kafka topic or changelog parquet partitions with the same
schema (see streaming/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load_table

# event_type -> op: signup creates the entity, error tears it down,
# activity events mutate it. Deterministic + meaningful distribution.
OP_CASE_SQL = ("CASE WHEN event_type = 'signup' THEN 'insert' "
               "WHEN event_type = 'error' THEN 'delete' "
               "ELSE 'update' END")


def derive_changelog_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("seq"),
        F.col("ts"),
        F.expr(OP_CASE_SQL).alias("op"),
        F.col("user_id").alias("pk"),
        F.col("value"),
        F.col("props"),
    )


# SQL twin for the DuckDB oracle (same projection, same names)
CHANGELOG_SQL = f"""
SELECT event_id AS seq, ts, {OP_CASE_SQL} AS op,
       user_id AS pk, value, props
FROM events
"""
