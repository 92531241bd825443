"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set = the scale-relevant operators (joins, aggregation,
windows, CDC upsert, dedup, ANN) -- heavy pairwise ops use their
LSH/bucketed variants, as they would at 100 TB.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mysql_syncer_clickhouse_spark import queries as registry
from mysql_syncer_clickhouse_spark.session import get_spark

HEADLINE = [
    # relational (the work the reference delegates to ClickHouse)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "window_topk_per_group",
    "topk_orders",
    "join_skew_salted",
    "join_asof",
    "join_range_binned",
    # CDC core (the reference's own operator surface)
    "cdc_final_state",
    "cdc_wildcard_fan_in",
    # LLM-data-pipeline layer (scale path variants)
    "dedup_exact",
    "dedup_minhash_lsh",
    "pipeline_clean_corpus",
    "ann_ivf_topk",
    "text_analysis",
    # streaming operators in batch mode
    "stream_time_windows",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    all_q = registry.all_queries()
    names = [n for n in HEADLINE if n in all_q]

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    times: dict[str, float] = {}
    for name in names:
        # build the plan once; the first write warms JVM/codegen/parquet
        # footers, then take the MIN of `reps` timed executions --
        # run-to-run variance under concurrent JVMs is up to ~2x, so
        # min-of-N is the stable round-over-round comparator
        df = all_q[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_query_wall_sec",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf else sf_dir,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
