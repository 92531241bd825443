"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query at sf0.001; `queries()` exposes
every implemented operator from SURVEY.md §2 as (spark, sf_dir) ->
DataFrame; `oracle_sql()` gives each one an ANSI-SQL twin for the
DuckDB oracle. Registry lives in mysql_syncer_clickhouse_spark.queries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mysql_syncer_clickhouse_spark import queries as _registry  # noqa: E402

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return _registry.relational.q1_pricing_summary(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.all_queries()


def oracle_sql() -> dict[str, str]:
    return _registry.all_oracle_sql()
