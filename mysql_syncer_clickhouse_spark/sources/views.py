"""Synced-table views: query the CURRENT state of a replicated table by
plain SQL name, with the ReplacingMergeTree-FINAL dedup applied on read.

The reference's users point ClickHouse queries at `sink_schema.table`
and the engine (ReplacingMergeTree ORDER BY pk, README.md:44-56) folds
versions at merge time. Our analog: the sink holds the append-only
changelog; `register_synced_table` publishes a temp view whose plan IS
`latest_state` over that changelog, so `spark.sql("SELECT ... FROM t")`
always sees the folded current state -- SURVEY §4's "rewrite reads of a
synced table into the dedup view" done with a view definition instead
of a custom Catalyst rule (same plan, no JVM extension point needed).

Because the view body is a plain DataFrame plan, Catalyst still pushes
filters/pruning into it and the one pk-shuffle `max_by` aggregation is
shared by every query; a `compact()`ed table reads back through the
same name unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.upsert import latest_state


def register_synced_table(spark: SparkSession, name: str,
                          changelog_path: str,
                          pk_cols: Sequence[str],
                          seq_col: str = "seq",
                          op_col: str = "op") -> DataFrame:
    """Create/replace temp view `name` = latest_state(changelog).
    Returns the view's DataFrame. Re-registering after new appends
    refreshes the snapshot (file listing happens at read)."""
    state = latest_state(
        spark.read.option("mergeSchema", "true").parquet(changelog_path),
        pk_cols=pk_cols, seq_col=seq_col, op_col=op_col)
    state.createOrReplaceTempView(name)
    return state
