"""Plan introspection helpers -- make scale properties testable.

At 100 TB the difference between a good and bad plan is whether the
parquet scan received the filters/columns (pushdown + pruning) and
whether small dimensions broadcast instead of shuffling. These helpers
expose the formatted physical plan so tests can assert those properties
instead of hoping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def pushed_filters(df: DataFrame) -> str:
    plan = formatted_plan(df)
    return "\n".join(l for l in plan.splitlines() if "PushedFilters" in l)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def n_shuffles(df: DataFrame) -> int:
    # formatted mode lists shuffle details as "Arguments: hashpartitioning(...)"
    return sum(1 for l in formatted_plan(df).splitlines()
               if l.startswith("Arguments: hashpartitioning"))
