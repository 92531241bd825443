"""Round-16 measurement harness: per-query explain('formatted') capture
plus isolated noop-sink timings, same session settings as bench.py.

Cold timing is CONSTRUCTION-INCLUSIVE (r15 VERDICT next #1): eager
localCheckpoints execute at DataFrame-construction time, so timing only
the post-construction execution lets a pin move work out of the
measured window. cold = fn() + first noop execution on a fresh
DataFrame after warmup + clearCache; legacy = the r15 methodology
(post-construction, cache-cold) kept for cross-round comparison.

Usage: python tools/profile_r16.py [query ...]   (default: bench HEADLINE)
Writes plans to plans/r16/<name>_<tag>.txt, prints one timing line per query.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mysql_syncer_clickhouse_spark import queries as registry
from mysql_syncer_clickhouse_spark.session import get_spark

TAG = os.environ.get("PLAN_TAG", "before")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("PROFILE_REPS", "3"))
shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "0") or 0) or 8

spark = get_spark("profile_r16", cpus=CPUS, shuffle_partitions=shuffle)
spark.sparkContext.setLogLevel("ERROR")

import bench  # noqa: E402


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


names = sys.argv[1:] or bench.HEADLINE
all_q = registry.all_queries()
out = {}
for name in names:
    fn = all_q[name]
    df = fn(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    with open(f"plans/r16/{name}_{TAG}.txt", "w") as f:
        f.write(plan)
    spark.sparkContext.setJobDescription(f"r16 profile: {name}")
    _noop(df)                                   # warmup (JVM/codegen)
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    df2 = fn(spark, SF_DIR)                     # timed construction
    _noop(df2)
    cold = time.perf_counter() - t0
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    _noop(df2)
    legacy = time.perf_counter() - t0
    warms = []
    for _ in range(REPS - 1):
        t0 = time.perf_counter()
        _noop(df2)
        warms.append(time.perf_counter() - t0)
    out[name] = {"cold": round(cold, 3), "legacy_cold": round(legacy, 3),
                 "warm": round(min(warms), 3) if warms else None}
    print(name, out[name], flush=True)
print(json.dumps(out))
