"""JDBC snapshot source config tests (no MySQL in the container; the
partitioning contract is what matters -- SURVEY §2.1 S1)."""

from __future__ import annotations

from mysql_syncer_clickhouse_spark.sources.jdbc import (
    JdbcSnapshotConfig, pk_bounds_query)

CFG = JdbcSnapshotConfig(
    url="jdbc:mysql://db:3306/app", table="app.items",
    user="u", password="p", partition_column="id", num_partitions=8)


def test_partitioned_reader_options():
    opts = CFG.reader_options(0, 1000)
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "8"
    assert (opts["lowerBound"], opts["upperBound"]) == ("0", "1000")
    assert opts["dbtable"] == "app.items"


def test_unpartitioned_when_no_bounds():
    opts = CFG.reader_options()
    assert "partitionColumn" not in opts
    # degenerate/empty range must not emit partitioning options
    assert "partitionColumn" not in CFG.reader_options(5, 5)


def test_no_partition_column():
    cfg = JdbcSnapshotConfig(url="jdbc:mysql://db/app", table="t",
                             user="u", password="p")
    assert "partitionColumn" not in cfg.reader_options(0, 10)


def test_bounds_probe_is_single_row_pushdown():
    q = pk_bounds_query(CFG)
    assert "MIN(id)" in q and "MAX(id)" in q and "app.items" in q


# --- fixture schema-drift guard (parquet loader contract) ---------------
#
# Round 4 lesson: the driver regenerated events.parquet with a plain
# (not UTC-adjusted) TIMESTAMP, which Spark 4 infers as TIMESTAMP_NTZ by
# default -- and NTZ rejects unix_millis / CAST(.. AS BIGINT), silently
# breaking two registry queries. load_table() now pins the LTZ read;
# this test pins the whole loader contract so the NEXT testdata drift
# fails here first, not in the driver's correctness gate.

def test_load_table_schema_contract(spark):
    import os

    from mysql_syncer_clickhouse_spark.sources.tables import (
        TABLES, load_table)

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        if not os.path.isdir(sf):
            continue
        ev = dict(load_table(spark, sf, "events").dtypes)
        assert ev["ts"] == "timestamp", ev  # LTZ, never ntz/bigint
        o = dict(load_table(spark, sf, "orders").dtypes)
        assert o["o_orderdate"].startswith("timestamp"), o
        assert "ntz" not in o["o_orderdate"], o
        emb = dict(load_table(spark, sf, "embeddings").dtypes)
        assert emb["embedding"].startswith("array<"), emb
        for t in TABLES:  # every table loads and has columns
            assert load_table(spark, sf, t).columns


# --- _spread_starved_scan (round 15: scan parallelism for single-
# row-group fixture files; guide §2.5) -----------------------------------

def test_spread_starved_scan_sizes_and_pushdown(spark):
    """spread=True must (a) size partitions by file bytes (never more
    than defaultParallelism), (b) no-op below the 2 MB floor and for
    directory-backed tables, and (c) keep predicate pushdown intact
    through the repartition -- the properties that make it safe to
    leave on at cluster scale."""
    import os

    from pyspark.sql import functions as F

    from mysql_syncer_clickhouse_spark.plans.explain import formatted_plan
    from mysql_syncer_clickhouse_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.1"
    li = load_table(spark, sf, "lineitem", spread=True)
    size = os.path.getsize(os.path.join(sf, "lineitem.parquet"))
    want = min(spark.sparkContext.defaultParallelism, size // (1 << 20))
    assert li.rdd.getNumPartitions() == want > 1
    # values identical to the unspread read
    assert li.count() == load_table(spark, sf, "lineitem").count()
    # pushdown reaches the scan through the RepartitionByExpression
    plan = formatted_plan(
        li.filter(F.col("l_shipdate") <= "1998-09-02")
          .groupBy("l_returnflag").count())
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan

    # below the floor: identical plan, no repartition inserted
    small = load_table(spark, sf, "customer", spread=True)
    assert "Repartition" not in formatted_plan(small)


def test_spread_starved_scan_noop_on_directory(spark, tmp_path):
    """A directory-backed table (the cluster layout) must bypass the
    spread: splits, not the helper, provide parallelism there."""
    from mysql_syncer_clickhouse_spark.plans.explain import formatted_plan
    from mysql_syncer_clickhouse_spark.sources.tables import load_table

    src = load_table(spark, "/root/testdata/sf0.01", "orders")
    # parquet DIRECTORY named like a fixture file
    src.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = load_table(spark, str(tmp_path), "orders", spread=True)
    assert "Repartition" not in formatted_plan(out)
    assert out.count() == src.count()
