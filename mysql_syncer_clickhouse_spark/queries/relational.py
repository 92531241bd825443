"""Relational query layer (SURVEY.md §2.5).

The reference delegates all query-time computation to ClickHouse over
the synced ReplacingMergeTree tables (reference README.md:44-56); this
module is the Spark-SQL side of that contract: scans, filter/project,
joins (all types), hash aggregation, rollup/cube, windows, top-k, set
ops. All built-in Catalyst operators -- broadcast or sort-merge join,
partial aggregation, whole-stage codegen are picked by the optimizer.

Scale notes (100 TB stance):
- dimension tables (region/nation/supplier) are explicitly broadcast;
  fact-fact joins shuffle on their join key and benefit from AQE.
- every aggregate uses exact DECIMAL accumulation (functions/numeric.py)
  so results are partition-order-independent -- required both for the
  oracle hash and for reproducibility on a real cluster.
- top-k queries always order by a unique tie-breaker so LIMIT is
  deterministic under any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import davg, dsum, sql_davg, sql_dsum
from ..sources.tables import load_table


# --- TPC-H Q1 style: pricing summary (flagship; SURVEY §7 M0) -----------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity', 'sum_qty')},
       {sql_dsum('l_extendedprice', 'sum_base_price')},
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       {sql_davg('l_quantity', 'avg_qty')},
       {sql_davg('l_extendedprice', 'avg_price')},
       {sql_davg('l_discount', 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
}

ORACLE = {
    "q1_pricing_summary": _Q1_SQL,
}
