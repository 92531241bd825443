"""Round-15 measurement harness: per-query explain('formatted') capture
plus isolated noop-sink timings, same session settings as bench.py.
Usage: python tools/profile_r15.py [query ...]   (default: bench HEADLINE)
Writes plans to plans/r15/<name>_<tag>.txt, prints one timing line per query.
"""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mysql_syncer_clickhouse_spark import queries as registry
from mysql_syncer_clickhouse_spark.session import get_spark

TAG = os.environ.get("PLAN_TAG", "before")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("PROFILE_REPS", "3"))
shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "0") or 0) or 8

spark = get_spark("profile_r15", cpus=CPUS, shuffle_partitions=shuffle)
spark.sparkContext.setLogLevel("ERROR")

import bench
names = sys.argv[1:] or bench.HEADLINE
all_q = registry.all_queries()
out = {}
for name in names:
    fn = all_q[name]
    df = fn(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    with open(f"plans/r15/{name}_{TAG}.txt", "w") as f:
        f.write(plan)
    spark.sparkContext.setJobDescription(f"r15 profile: {name}")
    df.write.format("noop").mode("overwrite").save()      # warmup
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    cold = time.perf_counter() - t0
    warms = []
    for _ in range(REPS - 1):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        warms.append(time.perf_counter() - t0)
    out[name] = {"cold": round(cold, 3),
                 "warm": round(min(warms), 3) if warms else None}
    print(name, out[name], flush=True)
print(json.dumps(out))
