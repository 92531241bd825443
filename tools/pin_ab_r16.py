"""Round-16 pin A/B harness: measure CONSTRUCTION-INCLUSIVE cold for
pin configurations by selectively no-op'ing localCheckpoint per call
site (no code edits between configs; plan shape is identical to
removing the pin). Alternates configs within one warm session.

Usage: python tools/pin_ab_r16.py <entry> [<entry> ...]
Env: PIN_CONFIGS = semicolon list of comma lists of file:line to
disable, e.g. "base;dedup.py:397;dedup.py:397,dedup.py:419"
"""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql.classic.dataframe import DataFrame

from mysql_syncer_clickhouse_spark import queries as registry
from mysql_syncer_clickhouse_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "3"))

spark = get_spark("pin_ab_r16", cpus=32, shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

DISABLED: set = set()
origL = DataFrame.localCheckpoint


def selective(self, eager=True):
    fr = [f for f in traceback.extract_stack()
          if "mysql_syncer" in f.filename][-1]
    key = f"{fr.filename.split('/')[-1]}:{fr.lineno}"
    if key in DISABLED:
        return self
    return origL(self, eager=eager)


DataFrame.localCheckpoint = selective

configs = [set(c.split(",")) - {"base", ""}
           for c in os.environ.get("PIN_CONFIGS", "base").split(";")]
names = sys.argv[1:]
all_q = registry.all_queries()

# warm every entry once under base config
for name in names:
    all_q[name](spark, SF).write.format("noop").mode("overwrite").save()

results: dict = {}
for r in range(REPS):
    for ci, cfg in enumerate(configs):
        DISABLED.clear()
        DISABLED.update(cfg)
        for name in names:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = all_q[name](spark, SF)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            results.setdefault((name, ci), []).append(
                (round(t2 - t0, 3), round(t1 - t0, 3)))
print("config legend:")
for ci, cfg in enumerate(configs):
    print(f"  c{ci}: disable {sorted(cfg) or ['(none: baseline)']}")
for (name, ci), vals in sorted(results.items()):
    colds = [v[0] for v in vals]
    print(f"{name} c{ci}: cold {colds} (constr "
          f"{[v[1] for v in vals]})")
spark.stop()
