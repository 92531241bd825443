"""Per-part wall times for a merged union entry (r15 measurement aid):
a literal filter on the `part` label constant-folds every other union
branch away (PruneFilters + PropagateEmptyRelation drop their scans),
so each timing is that part's ISOLATED plan plus the shared session
floor -- the same technique bench.py uses for agg_grouping_stats /
corpus_curation.

Usage: python tools/profile_parts.py <entry> [part ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, PROFILE_REPS (default 2).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mysql_syncer_clickhouse_spark import queries as registry
from mysql_syncer_clickhouse_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("PROFILE_REPS", "2"))
shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "0") or 0) or 8

spark = get_spark("profile_parts", cpus=CPUS, shuffle_partitions=shuffle)
spark.sparkContext.setLogLevel("ERROR")

entry = sys.argv[1]
fn = registry.all_queries()[entry]
df = fn(spark, SF_DIR)
from pyspark.sql import functions as F

parts = sys.argv[2:] or sorted(
    r["part"] for r in df.select("part").distinct().collect())
out = {}
# whole-entry timing first (warm + min-of-reps)
df.write.format("noop").mode("overwrite").save()
walls = []
for _ in range(REPS):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    walls.append(round(time.perf_counter() - t0, 3))
out["__entry__"] = min(walls)
for lab in parts:
    pdf = fn(spark, SF_DIR).filter(F.col("part") == lab)
    spark.sparkContext.setJobDescription(f"part: {entry}/{lab}")
    pdf.write.format("noop").mode("overwrite").save()   # warm
    t = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        pdf.write.format("noop").mode("overwrite").save()
        t.append(round(time.perf_counter() - t0, 3))
    out[lab] = min(t)
print(json.dumps(out))
