"""10x scale probe: run the flagship operators on a synthesized
sf1-equivalent built by replicating the sf0.1 fixtures 10x, and print
seconds per operator plus the growth ratio vs plain sf0.1.

Replication is NOT naive duplication:
- documents: each replica gets offset ids AND a per-replica letter
  rotation over the text (translate() of the 10 most frequent letters)
  so cross-replica shingle sets share nothing -- naive copies would
  hand MinHash 10-way exact-duplicate groups and grow candidate pairs
  quadratically, which measures a data pathology, not the operator.
  Within-replica near-dup structure (what the operator hunts) is
  preserved by construction.
- lineitem: offset l_orderkey per replica -- for aggregation (q1) the
  group structure is identical to real sf1 (same 6 groups, 10x rows).

Usage:  python scale_probe.py          # ~a minute on local[32]
Output: one JSON line; numbers are recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from mysql_syncer_clickhouse_spark.operators import (bitmap, bloom,
                                                     curation, dedup)
from mysql_syncer_clickhouse_spark.functions.numeric import davg, dsum
from mysql_syncer_clickhouse_spark.session import get_spark
from mysql_syncer_clickhouse_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))
LETTERS = "etaoinshrd"


def replicate_docs(docs, n: int):
    parts = []
    for i in range(n):
        rot = LETTERS[i:] + LETTERS[:i]
        parts.append(docs.select(
            (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
            F.translate("text", LETTERS, rot).alias("text"),
            "source", "n_chars"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def replicate_lineitem(li, n: int):
    parts = [li.withColumn("l_orderkey",
                           F.col("l_orderkey") + F.lit(i * 100_000_000))
             for i in range(n)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def q1_over(li):
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (li.filter(F.col("l_shipdate")
                      <= F.to_timestamp(F.lit("1998-09-02")))
              .groupBy("l_returnflag", "l_linestatus")
              .agg(dsum("l_quantity", "sum_qty"),
                   dsum(disc_price, "sum_disc_price"),
                   dsum(charge, "sum_charge"),
                   davg("l_discount", "avg_disc"),
                   F.count(F.lit(1)).alias("count_order")))


def main() -> None:
    spark = get_spark("scale-probe",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    docs1 = load_table(spark, SF_DIR, "documents")
    li1 = load_table(spark, SF_DIR, "lineitem")
    docs10 = replicate_docs(docs1, REPLICAS)
    li10 = replicate_lineitem(li1, REPLICAS)

    cases = {
        "dedup_minhash_lsh": lambda d: dedup.minhash_dedup(
            dedup.near_dup_corpus(d), "id", "text", threshold=0.5),
        "dedup_exact": lambda d: dedup.exact_duplicates(d, "doc_id", "text"),
        "xdup_span_dup": lambda d: curation.cross_doc_ngram_dup(d, n=3),
        "dsir_scores": lambda d: curation.dsir_scores(
            d.filter(F.col("source") != "src0"),
            curation.dsir_logratio_table(
                d.filter(F.col("source") != "src0"),
                d.filter(F.col("source") == "src0"), n=3), n=3),
        # round-5 additions: the bounded-state screens -- bloom state
        # is m/32 words at ANY corpus size, bitmap words scale with
        # distinct values (not rows), so both should grow ~linearly
        # in scan cost only
        "bloom_screen": lambda d: bloom.bloom_screen_new(
            d.filter(F.col("doc_id") % 2 == 1)
             .withColumn("fp", F.md5("text")),
            d.filter(F.col("doc_id") % 2 == 0)
             .select(F.md5("text").alias("fp")), "fp"),
        "bitmap_distinct": lambda d: bitmap.bitmap_cardinality(
            bitmap.bitmap_agg(d, ["source"], "doc_id"), ["source"]),
    }
    out: dict[str, dict[str, float]] = {}
    for name, fn in cases.items():
        fn(docs1).write.format("noop").mode("overwrite").save()  # warm
        base = timed(fn(docs1))
        big = timed(fn(docs10))
        out[name] = {"sf0.1_sec": base, "x10_sec": big,
                     "growth_ratio": round(big / base, 2) if base else None}

    q1_over(li1).write.format("noop").mode("overwrite").save()
    base = timed(q1_over(li1))
    big = timed(q1_over(li10))
    out["q1_pricing_summary"] = {
        "sf0.1_sec": base, "x10_sec": big,
        "growth_ratio": round(big / base, 2) if base else None}

    print(json.dumps({"metric": "scale_probe_10x", "replicas": REPLICAS,
                      "sf_dir": SF_DIR, "cases": out}))
    spark.stop()


if __name__ == "__main__":
    main()
