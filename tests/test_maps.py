"""sumMap/minMap/maxMap analogs (operators/maps.py): key-wise map
aggregation checked against a brute-force Python reference, plus the
determinism and NULL conventions the repo holds everywhere."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysql_syncer_clickhouse_spark.operators import maps as M

ROWS = [
    ("g1", {"a": 1, "b": 2}),
    ("g1", {"b": 3, "c": 4}),
    ("g1", None),                       # NULL map contributes nothing
    ("g1", {"a": None, "d": 7}),        # NULL value skipped
    ("g2", {"x": -5}),
    ("g2", {}),
    ("g3", None),                       # all-NULL group: kept, {} --
    ("g3", {}),                         # ClickHouse sumMap keeps it
    ("g4", {"a": None}),                # only NULL values: kept, {}
]


def _df(spark):
    return spark.createDataFrame(ROWS, "g string, m map<string, long>")


def _py_ref(op):
    out: dict[str, dict] = {}
    for g, m in ROWS:
        acc = out.setdefault(g, {})
        for k, v in (m or {}).items():
            if v is None:
                continue
            if op == "count":
                acc[k] = acc.get(k, 0) + 1
            elif k not in acc:
                acc[k] = v
            else:
                acc[k] = (acc[k] + v if op == "sum"
                          else min(acc[k], v) if op == "min"
                          else max(acc[k], v))
    return out


@pytest.mark.parametrize("op,fn", [("sum", M.sum_map),
                                   ("min", M.min_map),
                                   ("max", M.max_map),
                                   ("count", M.count_map)])
def test_map_aggregates_match_python_reference(spark, op, fn):
    got = {r["g"]: dict(r[f"{op}_map"])
           for r in fn(_df(spark), ["g"], "m").collect()}
    assert got == _py_ref(op)


def test_sum_map_deterministic_key_order_and_plan(spark):
    """Entries sort by key inside the aggregate (partitioning-
    independent result), and the plan is two keyed aggregations --
    the explode collapses map-side, no join, no UDF."""
    df = _df(spark).repartition(7, "g")
    rows = M.sum_map(df, ["g"], "m").collect()
    for r in rows:
        ks = list(r["sum_map"].keys())
        assert ks == sorted(ks)
    plan = M.sum_map(df, ["g"], "m") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Python" not in plan
