"""Two-decade scale probe: run the flagship operators on synthesized
10x and 100x replicas of the sf0.1 fixtures and print seconds per
operator plus the growth ratio per decade. Sub-linear-per-10x claims
in SCALE.md rest on BOTH decades (round 7; round 6 measured one).

Replication is NOT naive duplication:
- documents: each replica gets offset ids AND a per-replica AFFINE
  LETTER BIJECTION over the full a-z alphabet (map i sends letter k
  to (a_i * k + b_i) mod 26 with a_i coprime to 26) -- up to 312
  pairwise-distinct maps any two of which agree on AT MOST ONE
  letter, so no 8-char shingle containing two distinct letters can
  collide across replicas. Round 9 correction: the previous scheme
  (two composed 10-letter rotation wheels) left replicas sharing a
  wheel with large collision residue -- measured 735,713 LSH
  candidate pairs for 57k reps at x10, an O(replicas^2) cross-replica
  band-collision pathology that dominated every minhash-family x100
  number and measured the FIXTURE, not the operator. Naive copies
  would instead hand MinHash massive exact-duplicate groups (which
  collapse_exact_texts defuses anyway). Within-replica near-dup
  structure (what the operator hunts) is preserved by construction:
  near_dup_corpus plants its near/exact pairs per replica AFTER the
  mapping.
- lineitem/orders/customer: per-replica key offsets keep join
  consistency (each replica is a disjoint slice of a bigger TPC-H-ish
  database: same dimensions, Nx the facts) -- for aggregation (q1)
  the group structure is identical to real sf1/sf10, and the q3-shape
  join exercises the real shuffle growth.

Usage:  python scale_probe.py            # both decades, ~10 min
        SPARK_GRAFT_SCALE_DECADES=10 python scale_probe.py   # quick
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
DECADES = [int(x) for x in os.environ.get(
    "SPARK_GRAFT_SCALE_DECADES", "10,100").split(",")]
LETTERS = "abcdefghijklmnopqrstuvwxyz"
_COPRIMES = (1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)


def _affine_map(i: int) -> str:
    """The i-th affine letter bijection: letter k -> (a*k + b) mod 26,
    a coprime to 26. Map 0 is the identity; any two maps agree on at
    most one letter (same-a maps on none), so cross-replica shingles
    never systematically collide (module docstring)."""
    a = _COPRIMES[i % len(_COPRIMES)]
    b = i // len(_COPRIMES)
    return "".join(LETTERS[(a * k + b) % 26] for k in range(26))


def _replicate_docs_mapped(docs, n: int, map_of):
    parts = []
    for i in range(n):
        parts.append(docs.select(
            (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
            F.translate("text", LETTERS, map_of(i)).alias("text"),
            "source", "n_chars"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def replicate_docs(docs, n: int):
    """n replicas with disjoint ids and pairwise-distinct affine
    letter maps -- genuinely distinct documents, the shape a real
    100x corpus has."""
    return _replicate_docs_mapped(docs, n, _affine_map)


def replicate_docs_heaps(docs, n: int):
    """Heaps-law-shaped replication for VOCABULARY-driven operators
    (dsir): letter maps are drawn from a bounded pool of
    ceil(2*sqrt(n)) maps (vocabulary ~ N^0.5, Heaps beta ~= 0.5 --
    the published shape for real corpora) instead of replicate_docs'
    n pairwise-distinct maps, whose linear vocabulary growth made the
    x100 dsir point measure the fixture, not the operator (VERDICT r8
    ask #6). Replicas sharing a map are exact copies at offset ids --
    harmless for gram STATISTICS (counts scale, ratios stable); the
    dedup cases must NOT use this (mass exact duplication is the
    pathology collapse_exact_texts defuses, a different measurement)."""
    import math
    pool = max(1, math.ceil(2 * math.sqrt(n)))
    return _replicate_docs_mapped(docs, n, lambda i: _affine_map(i % pool))


def replicate_lineitem(li, n: int):
    parts = [li.select(
        (F.col("l_orderkey") + i * 100_000_000).alias("l_orderkey"),
        *[c for c in li.columns if c != "l_orderkey"])
        for i in range(n)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def replicate_orders(orders, n: int):
    parts = [orders.select(
        (F.col("o_orderkey") + i * 100_000_000).alias("o_orderkey"),
        (F.col("o_custkey") + i * 10_000_000).alias("o_custkey"),
        *[c for c in orders.columns
          if c not in ("o_orderkey", "o_custkey")])
        for i in range(n)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def replicate_customer(cust, n: int):
    parts = [cust.select(
        (F.col("c_custkey") + i * 10_000_000).alias("c_custkey"),
        *[c for c in cust.columns if c != "c_custkey"])
        for i in range(n)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(make) -> float:
    """`make: () -> DataFrame`; CONSTRUCTION runs inside the timer.
    Round 9 correction: operators that pin relations eagerly
    (localCheckpoint(eager=True)) or whose lazy local checkpoints
    execute at RDD-conversion time under AQE (duplicate_clusters'
    iteration) do their real work while the DataFrame is being BUILT
    -- timing only the final action let r8's minhash_canonical_rep
    x100 report 10.45 s while its construction cost ~2 min (measured
    115 s at x10 alone). Passing a thunk closes the escape for every
    case uniformly."""
    t0 = time.perf_counter()
    make().write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def minhash_stage_cuts(docs, k: int = 8, threshold: float = 0.5,
                       bucket_cap: int = 64) -> dict:
    """Per-stage attribution for the minhash chain (VERDICT r9 ask
    #4): time the CUMULATIVE cost of materializing the chain cut after
    each stage -- collapse(+members pin) -> fused doc profile
    (shingle explode + minhash/set agg) -> band rows -> capped
    candidate pairs -> verified rep pairs -> bounded report. Marginal
    stage cost = successive difference. Caveat stated in SCALE.md:
    the chain deliberately does NOT persist intermediates (each
    branch's recompute is cheaper than caching the wide hs row), so a
    later cut re-runs its upstream; the differences attribute the
    marginal work of each stage under exactly the plan shape the
    operator really uses."""
    corpus = dedup.near_dup_corpus(docs)
    cuts: dict[str, float] = {}
    # warm the JVM/codegen on a cheap slice so the first timed cut is
    # not paying session startup (the chain itself stays cache-cold:
    # nothing here persists)
    corpus.limit(64).write.format("noop").mode("overwrite").save()
    t0 = time.perf_counter()
    reps, members = dedup.collapse_exact_texts(corpus, "id", "text")
    members = members.localCheckpoint(eager=True)   # the real pin
    cuts["collapse_pin_members"] = round(time.perf_counter() - t0, 3)

    def chain(stage: str):
        per_doc = dedup.fused_doc_profile(reps, k)
        if stage == "profile":
            return per_doc
        bands = dedup.fused_band_rows(per_doc)
        if stage == "bands":
            return bands
        cands = dedup.lsh_candidate_pairs(bands, bucket_cap=bucket_cap)
        if stage == "candidates":
            return cands
        rep_pairs = dedup.jaccard_verify_sets(
            cands, per_doc.select("id", "hs"), threshold)
        if stage == "verify":
            return rep_pairs
        return dedup.rep_pair_report(rep_pairs, members, threshold)

    # cut_X's plan re-derives the (lazy) reps relation, so every cut
    # INCLUDES the collapse aggregation; the members pin above is the
    # only work outside the cuts. Cuts are NOT monotonic because each
    # downstream branch prunes the profile to what it needs (the band
    # path drops the hs shingle set entirely) -- which is exactly the
    # no-persist design's point. The two profile variants split the
    # doc-profile cost into its band-branch shape (8 min-hash aggs,
    # hs pruned) and verify-branch shape (collect_set materialized).
    cuts["cut_profile_mins_only"] = timed(
        lambda: chain("profile").drop("hs"))
    for stage in ("profile", "bands", "candidates", "verify", "report"):
        cuts[f"cut_{stage}"] = timed(lambda stage=stage: chain(stage))
    cuts["marginal_candidates_vs_bands"] = round(
        cuts["cut_candidates"] - cuts["cut_bands"], 3)
    cuts["marginal_verify_vs_candidates"] = round(
        cuts["cut_verify"] - cuts["cut_candidates"], 3)
    cuts["marginal_report_vs_verify"] = round(
        cuts["cut_report"] - cuts["cut_verify"], 3)
    return cuts


def xdup_stage_cuts(docs, n: int = 3, min_docs: int = 2) -> dict:
    """Per-stage attribution for the xdup chain (VERDICT r10 ask #2),
    same cumulative-cut methodology as minhash_stage_cuts: gram
    explode+hash+distinct -> gram-frequency count -> collision join
    -> doc-grain dup count -> full left-joined report. The chain is
    cross_doc_ngram_dup's exact internals, re-cut; no persists, so a
    later cut re-runs its upstream and successive differences
    attribute each stage's marginal work under the operator's real
    plan (the g subtree feeds BOTH the freq aggregation and the
    collision join -- whether AQE's ReusedExchange actually shares
    the distinct shuffle is exactly what the freq->join marginal
    measures)."""
    cuts: dict[str, float] = {}
    docs.limit(64).write.format("noop").mode("overwrite").save()

    def chain(stage: str):
        # the operator's round-11 shape: one scan of g, gram
        # doc-frequency via a count window over gh, doc-grain count.
        # The pre-r11 freq-agg + collision-join shape (which executes
        # the g subtree twice -- no cross-branch exchange reuse) is
        # timed as its own cut for the A/B record.
        from pyspark.sql import Window
        g = curation._gram_hashes(docs, "doc_id", "text", n)
        if stage == "grams":
            return g
        flagged = g.withColumn(
            "n_docs", F.count(F.lit(1)).over(Window.partitionBy("gh")))
        if stage == "window_freq":
            return flagged
        dup = (flagged.filter(F.col("n_docs") >= min_docs)
               .groupBy("id")
               .agg(F.count(F.lit(1)).alias("n_dup_grams")))
        if stage == "doc_agg":
            return dup
        if stage == "join_chain":       # the pre-r11 shape, kept A/B
            freq = g.groupBy("gh").agg(
                F.count(F.lit(1)).alias("n_docs"))
            dup2 = (g.join(freq.filter(F.col("n_docs") >= min_docs),
                           "gh")
                    .groupBy("id")
                    .agg(F.count(F.lit(1)).alias("n_dup_grams")))
            return (docs.select(F.col("doc_id").alias("id"))
                    .join(dup2, "id", "left")
                    .select("id", F.coalesce("n_dup_grams", F.lit(0))
                            .alias("n_dup_grams")))
        return curation.cross_doc_ngram_dup(docs, n=n,
                                            min_docs=min_docs)

    for stage in ("grams", "window_freq", "doc_agg", "report",
                  "join_chain"):
        cuts[f"cut_{stage}"] = timed(lambda stage=stage: chain(stage))
    for a, b in (("window_freq", "grams"), ("doc_agg", "window_freq"),
                 ("report", "doc_agg")):
        cuts[f"marginal_{a}_vs_{b}"] = round(
            cuts[f"cut_{a}"] - cuts[f"cut_{b}"], 3)
    cuts["report_vs_join_chain"] = round(
        cuts["cut_report"] - cuts["cut_join_chain"], 3)
    return cuts


def canonical_stage_cuts(docs, k: int = 8, threshold: float = 0.5,
                         bucket_cap: int = 64) -> dict:
    """Per-stage attribution for minhash_dedup_canonical (VERDICT r11
    ask #4): at 185 s x100 it is the minhash family's largest absolute
    cost and its 8.0x second decade never had its own cuts. Stages:
    rep-grain pairs (the full LSH chain) -> member-grain cluster
    labels (connected components over rep pairs + members fan-out) ->
    the anti-joined canonical corpus. Two A/Bs ride along:
    - rep_pairs_pinned: duplicate_clusters' edge build references
      rep_pairs TWICE (the symmetrizing union) and the labels path
      again -- whether Spark reuses the verify join's exchanges across
      those branches is exactly what pinning the (bounded, four
      scalars/row) pair list isolates.
    - labels_members_semi: the final anti-join re-scans the full
      corpus; cutting labels alone separates clustering cost from
      that scan."""
    cuts: dict[str, float] = {}
    docs.limit(64).write.format("noop").mode("overwrite").save()

    def chain(stage: str, pin: bool = False):
        rep_pairs, members = dedup.minhash_dedup(
            docs, "doc_id", "text", k=k, threshold=threshold,
            bucket_cap=bucket_cap, grain="rep")
        if pin:
            rep_pairs = rep_pairs.localCheckpoint(eager=True)
        if stage == "rep_pairs":
            return rep_pairs
        labels = dedup.rep_cluster_labels(rep_pairs, members)
        if stage == "labels":
            return labels
        losers = (labels.filter(F.col("id") != F.col("cluster_id"))
                  .select(F.col("id").alias("doc_id")))
        return docs.join(losers, ["doc_id"], "left_anti")

    for stage in ("rep_pairs", "labels", "canonical"):
        cuts[f"cut_{stage}"] = timed(lambda stage=stage: chain(stage))
    for stage in ("labels", "canonical"):
        cuts[f"cut_{stage}_pinned"] = timed(
            lambda stage=stage: chain(stage, pin=True))
    cuts["marginal_labels_vs_rep_pairs"] = round(
        cuts["cut_labels"] - cuts["cut_rep_pairs"], 3)
    cuts["marginal_canonical_vs_labels"] = round(
        cuts["cut_canonical"] - cuts["cut_labels"], 3)
    cuts["pin_ab_canonical"] = round(
        cuts["cut_canonical"] - cuts["cut_canonical_pinned"], 3)
    return cuts


def dsir_stage_cuts(docs, n: int = 3) -> dict:
    """Per-stage attribution for the DSIR chain (closing the last §6
    family bracket by measurement): raw-side bag tokenize -> the
    bounded logratio model table (both sides' bucket counts + one ln
    per bucket) -> per-doc integer score sums -> report. The model is
    <= 4096 rows by construction, so the expectation to verify is
    that the chain is tokenize-bound -- the same irreducible scan the
    xdup cuts isolated."""
    cuts: dict[str, float] = {}
    docs.limit(64).write.format("noop").mode("overwrite").save()
    raw = docs.filter(F.col("source") != "src0")
    target = docs.filter(F.col("source") == "src0")

    def chain(stage: str):
        if stage == "raw_bag":
            return curation._bag_gram_buckets(raw, "doc_id", "text",
                                              n, 4096)
        if stage == "report_nopin":
            # the r11 two-tokenize shape, reproduced via the public
            # API for a SAME-RUN A/B: passing raw_buckets explicitly
            # (unpinned) suppresses the stash, so dsir_scores
            # re-tokenizes -- two corpus scans, zero cache writes
            lr = curation.dsir_logratio_table(
                raw, target, n=n,
                raw_buckets=curation._bag_gram_buckets(
                    raw, "doc_id", "text", n, 4096))
            return curation.dsir_scores(raw, lr, n=n)
        lr = curation.dsir_logratio_table(raw, target, n=n)
        if stage == "model":
            return lr
        return curation.dsir_scores(raw, lr, n=n)

    for stage in ("raw_bag", "model", "report", "report_nopin"):
        cuts[f"cut_{stage}"] = timed(lambda stage=stage: chain(stage))
    cuts["marginal_model_vs_raw_bag"] = round(
        cuts["cut_model"] - cuts["cut_raw_bag"], 3)
    cuts["marginal_report_vs_model"] = round(
        cuts["cut_report"] - cuts["cut_model"], 3)
    cuts["pin_ab_report"] = round(
        cuts["cut_report_nopin"] - cuts["cut_report"], 3)
    return cuts


def fuzzy_ab(docs, bench) -> dict:
    """A/B the fuzzy_decontaminate verify-join hints (VERDICT r10 ask
    #4): same code path, SPARK_GRAFT_NO_JOIN_HINTS toggles the
    shuffle_hash hints off so Spark falls back to its default
    sort-merge choice."""
    out: dict[str, float] = {}
    # full untimed warm run first: codegen/broadcast warmup would
    # otherwise land entirely on whichever arm runs first
    curation.fuzzy_decontaminate(docs, bench, threshold=0.5) \
        .write.format("noop").mode("overwrite").save()
    for label, env in (("hinted", None), ("sort_merge", "1")):
        if env is None:
            os.environ.pop("SPARK_GRAFT_NO_JOIN_HINTS", None)
        else:
            os.environ["SPARK_GRAFT_NO_JOIN_HINTS"] = env
        out[label] = timed(lambda: curation.fuzzy_decontaminate(
            docs, bench, threshold=0.5))
    os.environ.pop("SPARK_GRAFT_NO_JOIN_HINTS", None)
    return out


def pctl_ab(li) -> dict:
    """A/B the two exact-percentile shapes (VERDICT r10 ask #6 tail):
    per-group window sort vs range-bucketed (group, bucket) sort, same
    values by construction (equality-tested in tests/pytest and here),
    on the replicated lineitem."""
    from mysql_syncer_clickhouse_spark.operators.percentiles import (
        exact_group_percentiles)
    out: dict = {}
    exact_group_percentiles(li, "l_returnflag", "l_extendedprice",
                            [0.5], mode="window") \
        .write.format("noop").mode("overwrite").save()
    for mode in ("window", "range"):
        out[mode] = timed(lambda mode=mode: exact_group_percentiles(
            li, "l_returnflag", "l_extendedprice", [0.5, 0.95],
            mode=mode))
    a = {r["l_returnflag"]: (r["p50"], r["p95"])
         for r in exact_group_percentiles(
             li, "l_returnflag", "l_extendedprice", [0.5, 0.95],
             mode="window").collect()}
    b = {r["l_returnflag"]: (r["p50"], r["p95"])
         for r in exact_group_percentiles(
             li, "l_returnflag", "l_extendedprice", [0.5, 0.95],
             mode="range").collect()}
    out["values_equal"] = a == b
    return out


def syncverify_cuts(make_li) -> dict:
    """S9 at scale (r13 VERDICT next #6): digest cost per side, the
    n_buckets-row exchange, and drill-down bounded by DIVERGENCE (a
    fixed ~120-key perturbation regardless of decade -- if drill-down
    time grows with the TABLE instead of the divergence, the
    bucket-restricted scan claim is false). Also times the pushdown
    (CityHash canonical) digest of one side -- the shape a real
    --checksum run computes Spark-side.  `make_li` is a THUNK: the
    perturbed side rebuilds from a fresh lineage (a real run's dst
    comes from the sink read-back; deriving it from the same plan
    root would be an ambiguous self-join)."""
    from mysql_syncer_clickhouse_spark.operators import syncverify as sv
    li = make_li()
    pk = ["l_orderkey", "l_linenumber"]
    n = li.count()
    per = max(1, n // 120)
    hit = F.pmod(F.xxhash64(*[F.col(c) for c in pk]),
                 F.lit(per)) == 0
    dst = make_li().withColumn(
        "l_quantity",
        F.when(hit, F.col("l_quantity") + F.lit(1000.0))
        .otherwise(F.col("l_quantity")))

    t0 = time.perf_counter()
    s_rows = sv.bucket_digest(li, pk, 1024).collect()
    t_src = time.perf_counter() - t0
    t0 = time.perf_counter()
    d_rows = sv.bucket_digest(dst, pk, 1024).collect()
    t_dst = time.perf_counter() - t0
    cmp = sv.compare_digests(s_rows, d_rows)
    t0 = time.perf_counter()
    # findings BY STATUS: the synthetic lineitem's pk is genuinely
    # non-unique (r13's §6f-ter finding), so every duplicate pk
    # living inside a touched bucket is correctly reported as a
    # duplicate_pk finding -- the value_mismatch count is the one
    # that must track the ~120-key perturbation, and it does
    findings = {r["status"]: r["count"] for r in
                sv.row_diff(li, dst, pk, cmp.mismatched, 1024)
                .groupBy("status").count().collect()}
    t_diff = time.perf_counter() - t0

    types = {"bigint": "Int64", "int": "Int32", "string": "String",
             "double": "Float64", "timestamp": "DateTime64(6)",
             "timestamp_ntz": "DateTime64(6)", "date": "Date"}
    cols = [(f.name, types[f.dataType.simpleString()])
            for f in li.schema.fields]
    t0 = time.perf_counter()
    sv.spark_pushdown_digest(
        li.select(*[c for c, _ in cols]), cols, pk, 1024).collect()
    t_push = time.perf_counter() - t0
    return {
        "rows": n,
        "digest_spark_sec": round(t_src, 2),
        "digest_spark_rows_per_sec": round(n / t_src),
        "digest_exchange_rows": len(s_rows),    # the n_buckets bound
        "pushdown_digest_sec": round(t_push, 2),
        "pushdown_rows_per_sec": round(n / t_push),
        "buckets_mismatched": len(cmp.mismatched),
        "drilldown_sec": round(t_diff, 2),
        "findings": findings,
        "second_digest_sec": round(t_dst, 2),
    }


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


def q3_join_over(cust, orders, li):
    """TPC-H Q3 shape: the 3-table shuffle join + top-level agg -- the
    suite's representative join-growth case (full tpch_suite_a needs
    every table replicated; the q3 shape carries its dominant
    shuffles)."""
    return (cust.filter(F.col("c_mktsegment") == "BUILDING")
            .join(orders, cust.c_custkey == orders.o_custkey)
            .join(li, orders.o_orderkey == li.l_orderkey)
            .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
            .agg(dsum(F.col("l_extendedprice")
                      * (1 - F.col("l_discount")), "revenue")))


def main() -> None:
    spark = get_spark("scale-probe",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    docs1 = load_table(spark, SF_DIR, "documents")
    li1 = load_table(spark, SF_DIR, "lineitem")
    or1 = load_table(spark, SF_DIR, "orders")
    cu1 = load_table(spark, SF_DIR, "customer")

    doc_cases = {
        # the registry entry's path since r9: bounded rep-grain report
        # (rep_pair_report), not the expanded member pair list
        "dedup_minhash_lsh": lambda d: dedup.rep_pair_report(
            *dedup.minhash_dedup(dedup.near_dup_corpus(d), "id", "text",
                                 threshold=0.5, grain="rep")),
        # the r8-measured pathology, kept measurable for the record:
        # the O(N^2)-output expanded member pair list
        "minhash_member_pairs": lambda d: dedup.minhash_dedup(
            dedup.near_dup_corpus(d), "id", "text", threshold=0.5),
        "minhash_canonical_rep": lambda d: dedup.minhash_dedup_canonical(
            dedup.near_dup_corpus(d), "id", "text", threshold=0.5),
        "dedup_exact": lambda d: dedup.exact_duplicates(d, "doc_id", "text"),
        "xdup_span_dup": lambda d: curation.cross_doc_ngram_dup(d, n=3),
        # same operator under the Heaps-law vocabulary fixture: shared
        # maps create REAL cross-replica duplicates (what xdup hunts),
        # so this row measures the operator when vocabulary grows
        # sub-linearly AND duplication is massive -- the two fixture
        # shapes bracket the real-corpus behavior (SCALE.md §6 caveat)
        "xdup_span_dup_heaps": lambda d: curation.cross_doc_ngram_dup(
            d, n=3),
        # raw is bound ONCE (the natural caller shape): the model
        # stashes the pinned bag it tokenized and dsir_scores reuses
        # it for the same DataFrame object (r11 ask #3), so this row
        # now measures the one-pass chain -- binding raw twice via two
        # .filter() calls would defeat the identity check and measure
        # the retired two-tokenize shape
        "dsir_scores": lambda d: (lambda raw: curation.dsir_scores(
            raw, curation.dsir_logratio_table(
                raw, d.filter(F.col("source") == "src0"), n=3),
            n=3))(d.filter(F.col("source") != "src0")),
        "bloom_screen": lambda d: bloom.bloom_screen_new(
            d.filter(F.col("doc_id") % 2 == 1)
             .withColumn("fp", F.md5("text")),
            d.filter(F.col("doc_id") % 2 == 0)
             .select(F.md5("text").alias("fp")), "fp"),
        "bitmap_distinct": lambda d: bitmap.bitmap_cardinality(
            bitmap.bitmap_agg(d, ["source"], "doc_id"), ["source"]),
    }
    # vocabulary-driven cases replicate with Heaps-law-bounded letter
    # maps (see replicate_docs_heaps); everything else with pairwise-
    # distinct maps
    heaps_cases = {"dsir_scores", "xdup_span_dup_heaps"}
    only = os.environ.get("SPARK_GRAFT_SCALE_CASES")
    if only:
        keep = {c.strip() for c in only.split(",")}
        doc_cases = {k: v for k, v in doc_cases.items() if k in keep}
        run_tpch = bool({"q1_pricing_summary", "q3_join"} & keep)
    else:
        run_tpch = True

    stages_mode = os.environ.get("SPARK_GRAFT_SCALE_STAGES")
    if stages_mode == "1":
        # stage-attribution mode (r9 ask #4): minhash chain cuts at
        # base + each requested decade; one JSON line, then exit
        stages = {"base_sf0.1": minhash_stage_cuts(docs1)}
        for n in DECADES:
            stages[f"x{n}"] = minhash_stage_cuts(
                replicate_docs(docs1, n))
        print(json.dumps({"metric": "minhash_stage_cuts",
                          "sf_dir": SF_DIR, "decades": DECADES,
                          "driver_memory": os.environ.get(
                              "SPARK_DRIVER_MEMORY", "8g"),
                          "stages": stages}))
        spark.stop()
        return
    if stages_mode == "xdup":
        # r10 ask #2: the xdup chain's cuts under the HEAPS-pool
        # fixture (its cost driver is distinct-gram vocabulary)
        stages = {"base_sf0.1": xdup_stage_cuts(docs1)}
        for n in DECADES:
            stages[f"x{n}"] = xdup_stage_cuts(
                replicate_docs_heaps(docs1, n))
        print(json.dumps({"metric": "xdup_stage_cuts",
                          "sf_dir": SF_DIR, "decades": DECADES,
                          "fixture": "heaps_pool",
                          "driver_memory": os.environ.get(
                              "SPARK_DRIVER_MEMORY", "8g"),
                          "stages": stages}))
        spark.stop()
        return
    if stages_mode == "canonical":
        # r11 ask #4: minhash_dedup_canonical cuts (affine-bijection
        # fixture -- the minhash family's cost driver is cross-replica
        # band collisions, same fixture as the headline minhash rows)
        stages = {"base_sf0.1": canonical_stage_cuts(docs1)}
        for n in DECADES:
            stages[f"x{n}"] = canonical_stage_cuts(
                replicate_docs(docs1, n))
        print(json.dumps({"metric": "canonical_stage_cuts",
                          "sf_dir": SF_DIR, "decades": DECADES,
                          "driver_memory": os.environ.get(
                              "SPARK_DRIVER_MEMORY", "8g"),
                          "stages": stages}))
        spark.stop()
        return
    if stages_mode == "dsir":
        stages = {"base_sf0.1": dsir_stage_cuts(docs1)}
        for n in DECADES:
            stages[f"x{n}"] = dsir_stage_cuts(
                replicate_docs_heaps(docs1, n))
        print(json.dumps({"metric": "dsir_stage_cuts",
                          "sf_dir": SF_DIR, "decades": DECADES,
                          "fixture": "heaps_pool",
                          "driver_memory": os.environ.get(
                              "SPARK_DRIVER_MEMORY", "8g"),
                          "stages": stages}))
        spark.stop()
        return
    if stages_mode == "fuzzy":
        # r10 ask #4 tail: hinted vs sort-merge verify join, x10
        bench = docs1.filter(F.col("doc_id") % 97 == 0)
        res = {"base_sf0.1": fuzzy_ab(docs1, bench)}
        for n in DECADES:
            res[f"x{n}"] = fuzzy_ab(replicate_docs(docs1, n), bench)
        print(json.dumps({"metric": "fuzzy_decontaminate_hint_ab",
                          "sf_dir": SF_DIR, "decades": DECADES,
                          "driver_memory": os.environ.get(
                              "SPARK_DRIVER_MEMORY", "8g"),
                          "cases": res}))
        spark.stop()
        return
    if stages_mode == "syncverify":
        # r13 ask #6: S9 digest + divergence-bounded drill-down per
        # decade (x100 lineitem ~= 60M rows)
        res = {"base_sf0.1": syncverify_cuts(
            lambda: load_table(spark, SF_DIR, "lineitem"))}
        for n in DECADES:
            res[f"x{n}"] = syncverify_cuts(
                lambda n=n: replicate_lineitem(
                    load_table(spark, SF_DIR, "lineitem"), n))
        print(json.dumps({"metric": "syncverify_scale",
                          "sf_dir": SF_DIR, "decades": DECADES,
                          "driver_memory": os.environ.get(
                              "SPARK_DRIVER_MEMORY", "8g"),
                          "cases": res}))
        spark.stop()
        return
    if stages_mode == "pctl":
        # r10 asks #5/#6: isolated percentile-shape A/B per decade
        res = {"base_sf0.1": pctl_ab(li1)}
        for n in DECADES:
            res[f"x{n}"] = pctl_ab(replicate_lineitem(li1, n))
        print(json.dumps({"metric": "pctl_shape_ab",
                          "sf_dir": SF_DIR, "decades": DECADES,
                          "driver_memory": os.environ.get(
                              "SPARK_DRIVER_MEMORY", "8g"),
                          "cases": res}))
        spark.stop()
        return

    # baselines at plain sf0.1 (warmed)
    base: dict[str, float] = {}
    for name, fn in doc_cases.items():
        fn(docs1).write.format("noop").mode("overwrite").save()
        base[name] = timed(lambda fn=fn: fn(docs1))
    if run_tpch:
        q1_over(li1).write.format("noop").mode("overwrite").save()
        base["q1_pricing_summary"] = timed(lambda: q1_over(li1))
        q3_join_over(cu1, or1, li1).write.format("noop") \
            .mode("overwrite").save()
        base["q3_join"] = timed(lambda: q3_join_over(cu1, or1, li1))

    out: dict[str, dict] = {}
    for n in DECADES:
        docsN = replicate_docs(docs1, n)
        docsHN = (replicate_docs_heaps(docs1, n)
                  if heaps_cases & doc_cases.keys() else None)
        dec: dict[str, dict] = {}
        for name, fn in doc_cases.items():
            big = timed(lambda fn=fn, name=name:
                        fn(docsHN if name in heaps_cases else docsN))
            dec[name] = {"sec": big,
                         "growth_vs_sf0.1": round(big / base[name], 2)
                         if base[name] else None}
        if run_tpch:
            liN = replicate_lineitem(li1, n)
            orN = replicate_orders(or1, n)
            cuN = replicate_customer(cu1, n)
            big = timed(lambda: q1_over(liN))
            dec["q1_pricing_summary"] = {
                "sec": big,
                "growth_vs_sf0.1":
                    round(big / base["q1_pricing_summary"], 2)}
            big = timed(lambda: q3_join_over(cuN, orN, liN))
            dec["q3_join"] = {
                "sec": big,
                "growth_vs_sf0.1": round(big / base["q3_join"], 2)}
        out[f"x{n}"] = dec

    print(json.dumps({"metric": "scale_probe_decades",
                      "decades": DECADES, "sf_dir": SF_DIR,
                      "driver_memory": os.environ.get(
                          "SPARK_DRIVER_MEMORY", "8g"),
                      "base_sf0.1_sec": base, "cases": out}))
    spark.stop()


if __name__ == "__main__":
    main()
