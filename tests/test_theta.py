"""theta_sketch (operators/sketch.py): the bucketed-min KMV distinct
sketch -- ClickHouse uniqTheta's capability re-expressed as one plain
min-aggregate. Checks: estimate accuracy in both regimes, exact
mergeability (union sketch == sketch of union), set-op estimates,
DuckDB bit-parity of the sketch state, and the bounded-state plan."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mysql_syncer_clickhouse_spark.operators.sketch import (
    THETA_K, theta_estimate, theta_intersect_estimate, theta_sketch,
    theta_sql, theta_union)


def _ids(spark, lo, hi, grp="g"):
    return spark.range(lo, hi).select(
        F.lit(grp).alias("grp"), F.col("id").alias("item"))


def test_theta_estimate_accuracy_large_and_small(spark):
    # large-n regime (n >> K): order-statistics estimator, ~1/sqrt(K)
    n = 60_000
    est = theta_estimate(
        theta_sketch(_ids(spark, 0, n), ["grp"], "item"),
        ["grp"]).collect()[0]
    assert est["nonempty"] == THETA_K
    assert abs(est["est"] - n) / n < 0.12

    # small-n regime (empty buckets): linear counting
    n = 300
    est = theta_estimate(
        theta_sketch(_ids(spark, 0, n), ["grp"], "item"),
        ["grp"]).collect()[0]
    assert est["nonempty"] < THETA_K
    assert abs(est["est"] - n) / n < 0.15


def test_theta_duplicates_never_move_the_sketch(spark):
    """MIN ignores multiplicity, so the sketch of a 5x-duplicated
    input is row-identical to the sketch of the distinct input --
    the reason no distinct pre-shuffle exists in the plan."""
    base = _ids(spark, 0, 2_000)
    dup = base.unionAll(base).unionAll(base) \
              .unionAll(base).unionAll(base)
    a = sorted(theta_sketch(base, ["grp"], "item").collect())
    b = sorted(theta_sketch(dup, ["grp"], "item").collect())
    assert a == b


def test_theta_union_is_lossless_at_sketch_grain(spark):
    """sketch(A) u sketch(B) == sketch(A u B), exactly -- merge never
    degrades the state, so snapshots combine replay-idempotently."""
    a = theta_sketch(_ids(spark, 0, 5_000), ["grp"], "item")
    b = theta_sketch(_ids(spark, 3_000, 9_000), ["grp"], "item")
    merged = sorted(theta_union(a, b, ["grp"]).collect())
    direct = sorted(theta_sketch(
        _ids(spark, 0, 9_000), ["grp"], "item").collect())
    assert merged == direct


def test_theta_set_op_estimates(spark):
    a = theta_sketch(_ids(spark, 0, 20_000), ["grp"], "item")
    b = theta_sketch(_ids(spark, 12_000, 32_000), ["grp"], "item")
    r = theta_intersect_estimate(a, b, ["grp"]).collect()[0]
    assert abs(r["est_union"] - 32_000) / 32_000 < 0.12
    assert abs(r["est_intersect"] - 8_000) / 8_000 < 0.35
    assert abs(r["est_a_not_b"] - 12_000) / 12_000 < 0.35


def test_theta_state_matches_duckdb_bit_for_bit(spark, sf_dir):
    """The sketch STATE (not just the estimate) is portable md5
    arithmetic: DuckDB recomputes identical (nonempty, sum_vmin) per
    group over the same parquet."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = {r["l_returnflag"]: (r["nonempty"], r["sum_vmin"])
           for r in theta_estimate(
               theta_sketch(li, ["l_returnflag"], "l_orderkey"),
               ["l_returnflag"]).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"'{sf_dir}/lineitem.parquet'")
    sql = "SELECT grp, nonempty, sum_vmin FROM (" + theta_sql(
        "lineitem", "l_orderkey", "l_returnflag") + ")"
    want = {g: (n, s) for g, n, s in con.execute(sql).fetchall()}
    assert got == want


def test_theta_plan_is_one_bounded_aggregate(spark):
    """Plan shape: exactly one exchange (the grouped min), partial
    aggregation before it (HashAggregate on both sides), and no
    distinct/expand operator anywhere -- the property that keeps every
    exchange <= k rows per group per task at 100 TB."""
    sk = theta_sketch(_ids(spark, 0, 10_000), ["grp"], "item")
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("exchange") == 1
    assert "Expand" not in plan
    assert plan.count("HashAggregate") >= 2   # partial + final


def test_theta_rejects_non_power_of_two(spark):
    with pytest.raises(ValueError):
        theta_sketch(_ids(spark, 0, 10), ["grp"], "item", k=1000)
