"""Synced-table view registration (sources/views.py): plain
spark.sql() over the view name sees the folded current state, refresh
picks up appended epochs, and filters push through the view into the
changelog scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql_syncer_clickhouse_spark.sources.views import register_synced_table

SCHEMA = "seq long, op string, id long, title string, content string"


def _write(spark, path, rows, mode):
    spark.createDataFrame(rows, SCHEMA).write.mode(mode).parquet(path)


def test_view_serves_folded_state_and_refresh(spark, tmp_path):
    p = str(tmp_path / "cl")
    _write(spark, p, [
        (1, "insert", 1, "first", "c1"),
        (2, "update", 1, "first-edited", "c1"),
        (3, "insert", 2, "second", "c2"),
    ], "overwrite")
    register_synced_table(spark, "items_synced", p, pk_cols=["id"])
    got = {r["id"]: r["title"]
           for r in spark.sql("SELECT id, title FROM items_synced").collect()}
    assert got == {1: "first-edited", 2: "second"}

    # new epoch appends a delete + an insert; re-register refreshes
    _write(spark, p, [
        (4, "delete", 2, None, None),
        (5, "insert", 3, "third", "c3"),
    ], "append")
    register_synced_table(spark, "items_synced", p, pk_cols=["id"])
    got = {r["id"]: r["title"]
           for r in spark.sql("SELECT id, title FROM items_synced").collect()}
    assert got == {1: "first-edited", 3: "third"}


def test_view_pushes_filters_into_scan(spark, tmp_path):
    p = str(tmp_path / "cl")
    _write(spark, p, [(i, "insert", i, f"t{i}", "c") for i in range(100)],
           "overwrite")
    register_synced_table(spark, "items_pf", p, pk_cols=["id"])
    plan = (spark.sql("SELECT id FROM items_pf WHERE id = 7")
            ._jdf.queryExecution().executedPlan().toString())
    # the pk filter must reach the parquet scan through the view +
    # aggregation (pk is the grouping key, so pushdown is legal)
    assert "PushedFilters: [" in plan and "id" in plan.split(
        "PushedFilters")[1][:60], plan


def test_view_survives_compaction(spark, tmp_path):
    """compact() rewrites the changelog to folded inserts; the view
    re-registered over the compacted sink serves the identical state."""
    from mysql_syncer_clickhouse_spark.plans.rules import Rule
    from mysql_syncer_clickhouse_spark.streaming.pipeline import (
        StreamingSyncPipeline)
    p = str(tmp_path / "sink")
    _write(spark, p, [
        (1, "insert", 1, "first", "c1"),
        (2, "update", 1, "first-edited", "c1"),
        (3, "insert", 2, "second", "c2"),
        (4, "delete", 2, None, None),
    ], "overwrite")
    register_synced_table(spark, "cv_items", p, pk_cols=["id"])
    before = {(r["id"], r["title"])
              for r in spark.sql("SELECT id, title FROM cv_items").collect()}

    pipe = StreamingSyncPipeline(
        rule=Rule(source_schema="app", source_table="items",
                  sink_schema="olap", sink_table="items", pk=("id",)),
        pk_cols=["id"], sink_dir=p,
        checkpoint_dir=str(tmp_path / "ckpt"))
    pipe.compact(spark)

    register_synced_table(spark, "cv_items", p, pk_cols=["id"])
    after = {(r["id"], r["title"])
             for r in spark.sql("SELECT id, title FROM cv_items").collect()}
    assert before == after == {(1, "first-edited")}
