"""Semantic unit tests for the corpus-curation operators
(operators/curation.py): decontamination flags exactly the overlapping
docs, packing restarts per stratum and respects the budget arithmetic,
hash sampling is deterministic, partitioning-independent, and map-only.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from mysql_syncer_clickhouse_spark.operators import curation
from mysql_syncer_clickhouse_spark.sources.tables import load_table


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_decontaminate_flags_overlap_and_clears_disjoint(spark):
    bench = _docs_df(spark, [(100, "bench", "alpha beta gamma delta")])
    train = _docs_df(spark, [
        # identical text -> every distinct 3-gram overlaps (2 of them)
        (1, "train", "alpha beta gamma delta"),
        # shares one 3-gram window
        (2, "train", "zz alpha beta gamma yy"),
        # disjoint vocabulary -> clean
        (3, "train", "one two three four five"),
    ])
    got = {r["id"]: r["n_overlap"]
           for r in curation.benchmark_decontaminate(train, bench).collect()}
    assert got == {1: 2, 2: 1, 3: 0}


def test_decontaminate_counts_distinct_grams_once(spark):
    bench = _docs_df(spark, [(100, "bench", "a b c")])
    # the overlapping 3-gram "a b c" appears twice in the train doc but
    # must count once (distinct grams per doc)
    train = _docs_df(spark, [(1, "train", "a b c x a b c")])
    [row] = curation.benchmark_decontaminate(train, bench).collect()
    assert row["n_overlap"] == 1


def test_pack_sequences_budget_and_stratum_restart(spark):
    rows = [
        # stratum s1: token counts 3, 3, 3 with budget 5:
        # starts 0, 3, 6 -> seqs 0, 0, 1
        (1, "s1", "w w w"), (2, "s1", "w w w"), (3, "s1", "w w w"),
        # stratum s2 restarts at 0 regardless of s1's running total
        (4, "s2", "w w w w w w"), (5, "s2", "w"),
    ]
    out = curation.pack_sequences(_docs_df(spark, rows), budget=5)
    got = {(r["stratum"], r["id"]): (r["n_tokens"], r["seq_id"])
           for r in out.collect()}
    assert got == {
        ("s1", 1): (3, 0), ("s1", 2): (3, 0), ("s1", 3): (3, 1),
        ("s2", 4): (6, 0), ("s2", 5): (1, 1),
    }


def test_pack_sequences_exact_boundary(spark):
    # doc starting exactly at the budget boundary opens the next seq
    rows = [(1, "s", "w w w w w"), (2, "s", "w")]
    out = curation.pack_sequences(_docs_df(spark, rows), budget=5)
    got = {r["id"]: r["seq_id"] for r in out.collect()}
    assert got == {1: 0, 2: 1}


def test_hash_sample_deterministic_and_partition_independent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = set(r["id"] for r in curation.hash_sample(docs, pct=20).collect())
    b = set(r["id"] for r in
            curation.hash_sample(docs.repartition(7), pct=20).collect())
    assert a == b
    n = docs.count()
    # md5 buckets are uniform; 20% +/- wide tolerance on small fixtures
    assert 0.08 * n <= len(a) <= 0.35 * n
    # monotone: a lower rate selects a subset of a higher rate
    c = set(r["id"] for r in curation.hash_sample(docs, pct=10).collect())
    assert c <= a


def test_hash_sample_is_map_only(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = (curation.hash_sample(docs, pct=20)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan


def test_mix_corpus_token_weighted_rates(spark):
    rows = ([(i, "a", "w w w w w w w w w w") for i in range(10)]
            + [(100 + i, "b", "w w w w w w w w w w") for i in range(10)])
    docs = _docs_df(spark, rows)  # 100 tokens available per stratum
    out = curation.mix_corpus(docs, {"a": 0.1, "b": 0.9})
    rows_out = out.collect()
    by_stratum = {}
    for r in rows_out:
        by_stratum.setdefault(r["stratum"], []).append(r)
    # budget defaults to 200 total tokens: b targets 180 > available
    # 100 -> capped at keep-all; a targets 20/100 -> 20% ppm rate
    assert len(by_stratum["b"]) == 10
    assert all(r["keep_ppm"] == 1_000_000 for r in by_stratum["b"])
    assert all(r["keep_ppm"] == 200_000 for r in by_stratum.get("a", []))
    assert len(by_stratum.get("a", [])) < 10
    # deterministic under repartitioning
    again = curation.mix_corpus(docs.repartition(5), {"a": 0.1, "b": 0.9})
    assert {(r["stratum"], r["id"]) for r in again.collect()} == \
           {(r["stratum"], r["id"]) for r in rows_out}


def test_mix_corpus_drops_unweighted_strata(spark):
    docs = _docs_df(spark, [(1, "a", "w w"), (2, "junk", "w w")])
    out = curation.mix_corpus(docs, {"a": 1.0})
    assert [r["stratum"] for r in out.collect()] == ["a"]


def test_decontaminate_returns_every_train_doc(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    out = curation.benchmark_decontaminate(train, bench)
    assert out.count() == train.count()
    # fixture vocab is tiny and shared -> the benchmark split must
    # contaminate most training docs; sanity that counting works
    assert out.filter(F.col("n_overlap") > 0).count() > 0


def test_dup_ngram_ratio_bounds(spark):
    from mysql_syncer_clickhouse_spark.functions import text as TX
    df = spark.createDataFrame(
        [(1, "a b c a b c a b c"),   # looped text -> high repetition
         (2, "one two three four"),  # all distinct -> 0
         (3, "w")],                  # shorter than n -> single gram, 0
        "id long, text string")
    got = {r["id"]: r["r"] for r in df.select(
        "id", F.round(TX.dup_ngram_ratio("text", 3), 4).alias("r"))
        .collect()}
    assert got[2] == 0.0 and got[3] == 0.0
    # 7 grams, 3 distinct ("a b c","b c a","c a b") -> 1 - 3/7
    assert abs(got[1] - (1 - 3 / 7)) < 1e-3


def test_redact_pii(spark):
    from mysql_syncer_clickhouse_spark.functions import text as TX
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@example.co.uk now"),
         (2, "server at 192.168.0.1 port 80"),
         (3, "call +1 (415) 555-0199 today"),
         (4, "clean text stays intact")],
        "id long, text string")
    got = {r["id"]: r["t"]
           for r in df.select("id", TX.redact_pii("text").alias("t"))
           .collect()}
    assert got[1] == "mail <EMAIL> now"
    assert got[2] == "server at <IP> port 80"
    assert got[3] == "call <PHONE> today"
    assert got[4] == "clean text stays intact"


def test_chunk_documents_overlap_and_coverage(spark):
    words = [f"w{i}" for i in range(10)]
    docs = _docs_df(spark, [(1, "s", " ".join(words))])
    out = curation.chunk_documents(docs, size=4, overlap=1)
    rows = sorted(out.collect(), key=lambda r: r["chunk_idx"])
    # step=3, 10 words -> ceil((10-1)/3) = 3 chunks
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2]
    texts = [r["chunk_text"].split(" ") for r in rows]
    assert texts[0] == words[0:4]
    assert texts[1] == words[3:7]
    assert texts[2] == words[6:10]
    assert [r["n_tokens"] for r in rows] == [4, 4, 4]
    # consecutive chunks share exactly `overlap` words
    assert texts[0][-1:] == texts[1][:1] and texts[1][-1:] == texts[2][:1]
    # every word covered
    assert set(words) == {w for t in texts for w in t}


def test_chunk_documents_short_doc_single_chunk(spark):
    docs = _docs_df(spark, [(1, "s", "a b")])
    rows = curation.chunk_documents(docs, size=4, overlap=1).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_idx"] == 0 and rows[0]["n_tokens"] == 2
    assert rows[0]["chunk_text"] == "a b"


def test_chunk_documents_map_only(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = (curation.chunk_documents(docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan


def test_curation_chain_composes(spark, sf_dir):
    """The real pipeline is the CHAIN: dedup-survivors -> decontaminate
    -> mix to target shares -> pack into sequences -> chunk. Assert the
    stages compose (ids flow through, filters only shrink, packing
    covers every surviving doc)."""
    from mysql_syncer_clickhouse_spark.functions import text as TX
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")

    dec = curation.benchmark_decontaminate(train, bench, n=3)
    thr = 40  # fixture vocab is tiny; keep docs below heavy overlap
    clean_ids = dec.filter(F.col("n_overlap") < thr).select("id")
    clean = train.join(clean_ids,
                       train["doc_id"] == clean_ids["id"]).drop("id")
    n_clean = clean.count()
    assert 0 < n_clean <= train.count()

    shares = {f"src{i}": 1.0 / 19 for i in range(1, 20)}
    mixed = curation.mix_corpus(clean, shares)
    assert 0 < mixed.count() <= n_clean

    kept = clean.join(mixed.select("id"),
                      clean["doc_id"] == mixed["id"]).drop("id")
    packed = curation.pack_sequences(kept, budget=200)
    assert packed.count() == kept.count()
    assert packed.filter(F.col("seq_id") < 0).count() == 0

    chunks = curation.chunk_documents(kept, size=32, overlap=8)
    assert chunks.count() >= kept.count()
    # chunk token totals reconstruct each doc's length minus overlaps:
    # sum(n_tokens) - overlap*(n_chunks-1) == doc token count
    agg = (chunks.groupBy("id")
           .agg(F.sum("n_tokens").alias("s"),
                F.count(F.lit(1)).alias("c")))
    doc_n = kept.select(F.col("doc_id").alias("id"),
                        TX.token_count_ws("text").alias("n"))
    bad = (agg.join(doc_n, "id")
           .filter(F.col("s") - 8 * (F.col("c") - 1) != F.col("n")))
    assert bad.count() == 0


def test_pack_manifest_reconstructs_streams(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    packed = curation.pack_sequences(docs, budget=200)
    man = curation.pack_manifest(packed).collect()
    # every doc appears in exactly one manifest row
    total_docs = sum(r["n_docs"] for r in man)
    assert total_docs == docs.count()
    # token mass is conserved
    from mysql_syncer_clickhouse_spark.functions import text as TX
    corpus_tokens = docs.select(
        F.sum(TX.token_count_ws("text")).alias("s")).collect()[0]["s"]
    assert sum(r["total_tokens"] for r in man) == corpus_tokens
    # docs within a manifest are id-ordered and contiguous per stratum:
    # the max id of seq s is below the min id of seq s+1
    by_stratum = {}
    for r in man:
        by_stratum.setdefault(r["stratum"], []).append(r)
    for rows in by_stratum.values():
        rows.sort(key=lambda r: r["seq_id"])
        for a, b in zip(rows, rows[1:]):
            ids_a = [d["id"] for d in a["docs"]]
            ids_b = [d["id"] for d in b["docs"]]
            assert ids_a == sorted(ids_a)
            assert max(ids_a) < min(ids_b)


def test_shuffle_corpus_deterministic_epochs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    def order(df):
        # collect() concatenates range partitions in index order, and
        # rows are sorted within each -> this IS the global order
        return [r["id"] for r in
                df.select(F.col("doc_id").alias("id"), "shuffle_key")
                  .collect()]
    e0 = order(curation.shuffle_corpus(docs, seed=0))
    e0b = order(curation.shuffle_corpus(docs.repartition(13), seed=0))
    e1 = order(curation.shuffle_corpus(docs, seed=1))
    assert e0 == e0b                      # partitioning-independent
    assert sorted(e0) == sorted(e1)       # permutations of the corpus
    assert e0 != e1                       # different epoch order
    ks = [r["shuffle_key"] for r in
          curation.shuffle_corpus(docs, seed=0).collect()]
    assert ks == sorted(ks)               # globally key-ordered


def test_curation_null_and_empty_robustness(spark):
    """Null-text and empty-input behavior is pinned, not accidental:
    packing charges null docs 0 tokens, chunking/decontam drop them
    (explode of a null gram array), empty inputs yield empty outputs
    everywhere."""
    rows = [(1, "s", "a b c"), (2, "s", None), (3, "s", "d e f")]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string")

    packed = {r["id"]: (r["n_tokens"], r["seq_id"])
              for r in curation.pack_sequences(docs, budget=4).collect()}
    assert packed[2] == (0, 0)           # null doc: zero budget charge
    assert packed[1] == (3, 0) and packed[3] == (3, 0)

    assert {r["id"] for r in
            curation.chunk_documents(docs, size=4, overlap=1).collect()} \
        == {1, 3}                         # null-text docs drop

    bench = spark.createDataFrame([(9, "b", "a b c")],
                                  "doc_id long, source string, text string")
    dec = {r["id"]: r["n_overlap"]
           for r in curation.benchmark_decontaminate(docs, bench).collect()}
    assert dec == {1: 1, 2: 0, 3: 0}      # null doc reported clean

    empty = docs.filter(F.lit(False))
    assert curation.pack_sequences(empty, budget=4).count() == 0
    assert curation.chunk_documents(empty).count() == 0
    assert curation.hash_sample(empty).count() == 0
    assert curation.mix_corpus(empty, {"s": 1.0}).count() == 0
    assert curation.shuffle_corpus(empty).count() == 0
    assert curation.benchmark_decontaminate(empty, bench).count() == 0


def test_redact_pii_idempotent_and_clean(spark):
    """Redaction placeholders must not themselves look like PII, so a
    second pass is a no-op (idempotence), and redacted text carries no
    residual matches under an independent Python re check."""
    import re as _re
    from mysql_syncer_clickhouse_spark.functions import text as TX
    samples = [
        "a@b.co then 10.0.0.255 then +44 20 7946 0958 end",
        "double a@b.co c@d.org and 1.2.3.4 5.6.7.8",
        "edge: .a@b.c- 999.999.999.999 0000000000",
        "no pii here at all",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)],
                               "id long, text string")
    once = {r["id"]: r["t"] for r in
            df.select("id", TX.redact_pii("text").alias("t")).collect()}
    twice = {r["id"]: r["t"] for r in
             df.select("id", TX.redact_pii(TX.redact_pii("text"))
                       .alias("t")).collect()}
    assert once == twice
    for t in once.values():
        assert not _re.search(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", t)
        assert not _re.search(r"\b(?:\d{1,3}\.){3}\d{1,3}\b", t)
        # phone policy: international '+' prefix REQUIRED -- residual
        # check uses the same rule, and a bare digit run is NOT PII
        assert not _re.search(r"\+\d[\d() -]{6,}\d", t)
    # the tightened pattern's whole point: quantities/ids survive
    assert "0000000000" in once[2]


def test_quality_percentile_filter_adapts_per_stratum(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = curation.quality_percentile_filter(docs, keep_frac=0.4)
    rows = out.collect()
    per_doc = {r["id"]: r for r in rows}
    n_strata = docs.select("source").distinct().count()
    per_stratum = {}
    for r in rows:
        per_stratum.setdefault(r["stratum"], []).append(r)
    # every stratum keeps SOMETHING (the point vs a fixed threshold)
    assert len(per_stratum) == n_strata
    counts = {s: docs.filter(F.col("source") == s).count()
              for s in per_stratum}
    for s, kept in per_stratum.items():
        # roughly the top 40%, with approx-percentile slack
        assert 0.15 * counts[s] <= len(kept) <= 0.75 * counts[s]
        assert all(r["quality"] >= r["thr"] for r in kept)
    # deterministic
    again = {r["id"] for r in curation.quality_percentile_filter(
        docs.repartition(9), keep_frac=0.4).collect()}
    assert set(per_doc) == again
    import pytest as _pytest
    with _pytest.raises(ValueError):
        curation.quality_percentile_filter(docs, keep_frac=0.0)


def test_write_training_shards_replays_epoch_order(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    p = str(tmp_path / "shards")
    curation.write_training_shards(docs, p, seed=3, shards_per_part=4)
    import glob
    files = sorted(glob.glob(p + "/part-*.parquet"))
    assert len(files) == 4
    # reading files in name order replays the epoch permutation
    read_order = []
    for f in files:
        read_order += [r["doc_id"] for r in
                       spark.read.parquet(f)
                       .select("doc_id", "shuffle_key").collect()]
    expect = [r["id"] for r in
              curation.shuffle_corpus(docs, seed=3)
              .select(F.col("doc_id").alias("id")).collect()]
    assert read_order == expect


def test_hash_split_disjoint_exhaustive_stable(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = curation.hash_split(docs, {"train": 0.8, "val": 0.1,
                                     "test": 0.1})
    rows = out.select("doc_id", "split").collect()
    assert len(rows) == docs.count()          # exhaustive
    by = {}
    for r in rows:
        by.setdefault(r["split"], set()).add(r["doc_id"])
    assert set(by) == {"train", "val", "test"}
    assert sum(len(v) for v in by.values()) == len(rows)  # disjoint
    n = len(rows)
    assert 0.6 * n <= len(by["train"]) <= 0.95 * n
    # stable under repartitioning
    again = {r["doc_id"]: r["split"] for r in
             curation.hash_split(docs.repartition(11),
                                 {"train": 0.8, "val": 0.1, "test": 0.1})
             .select("doc_id", "split").collect()}
    assert again == {r["doc_id"]: r["split"] for r in rows}
    # split assignment agrees with hash_sample's bucket arithmetic:
    # a 10% sample is exactly some prefix range -- val boundary check
    import pytest as _pytest
    with _pytest.raises(ValueError):
        curation.hash_split(docs, {"a": 0.5, "b": 0.3})
    # map-only plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_split_then_decontaminate_composition(spark, sf_dir):
    """The canonical decontamination flow: hash_split the corpus, then
    scrub train of anything overlapping the held-out test split."""
    docs = load_table(spark, sf_dir, "documents")
    split = curation.hash_split(docs, {"train": 0.9, "test": 0.1})
    train = split.filter(F.col("split") == "train")
    test = split.filter(F.col("split") == "test")
    dec = curation.benchmark_decontaminate(train, test, n=3)
    assert dec.count() == train.count()
    clean = dec.filter(F.col("n_overlap") == 0)
    # tiny shared fixture vocab -> most train docs collide with test
    # grams, but the accounting is the point: clean + dirty == train
    assert clean.count() + dec.filter(F.col("n_overlap") > 0).count() \
        == train.count()


def test_cross_doc_ngram_dup_planted_spans(spark):
    """Docs sharing a >=3-word span are flagged with the shared
    distinct-gram count; unique docs report 0."""
    rows = [
        (1, "the quick brown fox jumps high"),      # shares span w/ 2
        (2, "said the quick brown fox jumps"),      # shares span w/ 1
        (3, "completely different words entirely here now"),
        (4, "x y"),                                  # too short: no grams
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["id"]: r["n_dup_grams"]
           for r in curation.cross_doc_ngram_dup(docs, n=3).collect()}
    # shared 3-grams between 1 and 2: "the quick brown",
    # "quick brown fox", "brown fox jumps" -> 3 each
    assert out[1] == 3 and out[2] == 3
    assert out[3] == 0
    assert out[4] == 0
    assert set(out) == {1, 2, 3, 4}  # every doc reported


def test_cross_doc_ngram_dup_min_docs_threshold(spark):
    """min_docs > 2 takes the general join path (the subtraction
    identity only holds at 2): a gram in exactly 2 docs is dup at
    min_docs=2 but NOT at min_docs=3; both shapes agree where both
    apply."""
    rows = [
        (1, "the quick brown fox"),       # span in docs 1,2 (2 docs)
        (2, "the quick brown fox"),
        (3, "common span here yes"),      # span in docs 3,4,5 (3 docs)
        (4, "common span here yes"),
        (5, "common span here yes"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    # n=4 -> one gram per doc
    at2 = {r["id"]: r["n_dup_grams"] for r in
           curation.cross_doc_ngram_dup(docs, n=4).collect()}
    at3 = {r["id"]: r["n_dup_grams"] for r in
           curation.cross_doc_ngram_dup(docs, n=4,
                                        min_docs=3).collect()}
    assert at2 == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}
    assert at3 == {1: 0, 2: 0, 3: 1, 4: 1, 5: 1}


def test_cross_doc_ngram_dup_counts_repeated_gram_once(spark):
    """A doc repeating the shared span internally still counts each
    DISTINCT shared gram once (set semantics, like decontaminate)."""
    rows = [(1, "a b c a b c"), (2, "z a b c z")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["id"]: r["n_dup_grams"]
           for r in curation.cross_doc_ngram_dup(docs, n=3).collect()}
    assert out[1] == 1 and out[2] == 1  # only "a b c" is shared


def _dsir_fixture(spark):
    """Target talks about kernels; raw is split between kernel-flavored
    docs and cooking docs."""
    target = spark.createDataFrame(
        [(1000 + i, "tgt",
          "the kernel scheduler preempts the kernel thread queue")
         for i in range(5)],
        "doc_id long, source string, text string")
    raw = spark.createDataFrame(
        [(1, "raw", "the kernel scheduler preempts the kernel thread"),
         (2, "raw", "kernel thread queue the kernel scheduler preempts"),
         (3, "raw", "whisk the eggs fold the flour bake the cake"),
         (4, "raw", "simmer the broth season the stew taste the soup")],
        "doc_id long, source string, text string")
    return raw, target


def test_dsir_scores_rank_target_like_docs_higher(spark):
    raw, target = _dsir_fixture(spark)
    lr = curation.dsir_logratio_table(raw, target, n=3)
    scores = {r["id"]: r["dsir_micro"]
              for r in curation.dsir_scores(raw, lr, n=3).collect()}
    assert set(scores) == {1, 2, 3, 4}
    # kernel docs beat cooking docs under a kernel-targeted model
    assert min(scores[1], scores[2]) > max(scores[3], scores[4])
    # deterministic across partitionings (integer micro-nat sums)
    rescore = {r["id"]: r["dsir_micro"]
               for r in curation.dsir_scores(
                   raw.repartition(7), lr, n=3).collect()}
    assert rescore == scores
    # lr table is bounded by the bucket count
    assert lr.count() <= 4096


def test_dsir_resample_is_deterministic_and_weight_biased(spark):
    raw, target = _dsir_fixture(spark)
    docs = raw.unionByName(target)
    pick = curation.dsir_resample(docs, target, k=4, n=3)
    ids = sorted(r["id"] for r in pick.collect())
    assert len(ids) == 4
    again = sorted(r["id"] for r in
                   curation.dsir_resample(docs.repartition(5), target,
                                          k=4, n=3).collect())
    assert again == ids  # hash-Gumbel, not an RNG
    other = sorted(r["id"] for r in
                   curation.dsir_resample(docs, target, k=4, n=3,
                                          seed="other").collect())
    assert len(other) == 4  # fresh seed draws a (possibly) new sample
    # weight bias: with k=3 of the 4 raw-only... instead check the
    # cooking docs (lowest weights) are never BOTH ahead of both
    # kernel docs when k=2 over just the raw docs
    top2 = sorted(r["id"] for r in
                  curation.dsir_resample(raw, target, k=2, n=3).collect())
    assert top2 != [3, 4]


def test_bpe_train_matches_pure_python_reference(spark):
    """train_bpe replicates the classic Sennrich loop computed
    independently in-process, including tie-breaks."""
    from collections import Counter

    from mysql_syncer_clickhouse_spark.operators import bpe

    texts = ["low lower lowest low low",
             "new newer newest new new newer",
             "wide wider widest wide"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")

    # independent reference: word freqs -> iterative best-pair merge
    wf = Counter(w for t in texts for w in t.split())
    vocab = {tuple(w): c for w, c in wf.items()}
    expected = []
    for _ in range(12):
        pc = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < 2:
            break
        expected.append(best)
        merged = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == best):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            merged[tuple(out)] = merged.get(tuple(out), 0) + c
        vocab = merged

    got = bpe.train_bpe(docs, num_merges=12)
    assert got == expected
    # determinism across partitionings
    assert bpe.train_bpe(docs.repartition(5), num_merges=12) == expected


def test_bpe_encode_partitions_words_and_counts(spark):
    from mysql_syncer_clickhouse_spark.operators import bpe

    docs = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "newest new"), (3, "")],
        "doc_id long, text string")
    merges = bpe.train_bpe(docs, num_merges=10)
    enc = {r["id"]: r for r in bpe.bpe_encode(docs, merges).collect()}
    assert set(enc) == {1, 2, 3}
    for i, text in [(1, "low lower lowest"), (2, "newest new"), (3, "")]:
        # tokens concatenate back to the words, in order
        assert "".join(enc[i]["tokens"]) == text.replace(" ", "")
        assert enc[i]["n_tokens"] == len(enc[i]["tokens"])
    assert enc[3]["tokens"] == []
    # merges actually compress: fewer tokens than characters
    assert enc[1]["n_tokens"] < len("lowlowerlowest")


def test_gopher_repetition_signals_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "spam spam spam spam"),
         (2, "a b\nc d\na b\ne f"),
         (3, "all words here are different ones"),
         (4, "")],
        "doc_id long, text string")
    out = {r["id"]: r.asDict()
           for r in curation.gopher_repetition_signals(docs).collect()}
    # doc 2: 4 lines, 3 distinct -> dup_line_frac 1/4; the repeated
    # "a b" contributes 3 chars of its 2nd occurrence over 15 chars
    assert abs(out[2]["dup_line_frac"] - 0.25) < 1e-9
    assert abs(out[2]["dup_line_char_frac"] - 3 / 15) < 1e-9
    # doc 1: "spam spam" 2-gram occurs 3x, 9 chars each, text 19 chars
    assert abs(out[1]["top2gram_char_frac"] - 3 * 9 / 19) < 1e-9
    assert out[1]["dup_line_frac"] == 0.0  # single line
    # doc 3: no repeated grams -> each top gram occurs once
    assert out[3]["top2gram_char_frac"] < 0.5
    assert out[3]["dup_line_char_frac"] == 0.0
    # empty doc: all signals 0, row still present
    assert all(out[4][k] == 0.0 for k in out[4] if k != "id")
    # determinism across partitionings
    re = {r["id"]: r.asDict()
          for r in curation.gopher_repetition_signals(
              docs.repartition(5)).collect()}
    assert re == out


def test_bpe_tokens_feed_sequence_packing(spark):
    """Composition: pack_sequences' token budget can come from a REAL
    trained subword vocabulary -- bpe_encode's n_tokens -- instead of
    the whitespace approximation."""
    from mysql_syncer_clickhouse_spark.operators import bpe

    docs = spark.createDataFrame(
        [(i, "s", "low lower lowest new newer newest " * 3)
         for i in range(6)],
        "doc_id long, source string, text string")
    merges = bpe.train_bpe(docs, num_merges=20)
    counts = bpe.bpe_encode(docs, merges).select(
        F.col("id").alias("doc_id"), "n_tokens")
    packed = curation.pack_sequences(
        docs.join(counts, "doc_id"),
        tokens=F.col("n_tokens"), budget=64)
    rows = {r["id"]: r for r in packed.collect()}
    assert len(rows) == 6
    n = rows[0]["n_tokens"]
    assert 0 < n < len("low lower lowest new newer newest ") * 3  # subword < chars
    # identical docs -> identical counts; seq boundaries follow the
    # exclusive running total of the REAL counts
    for i in range(6):
        assert rows[i]["n_tokens"] == n
        assert rows[i]["seq_id"] == (i * n) // 64


def test_lm_perplexity_separates_in_domain_text(spark):
    """CCNet-style filter: docs matching the LM's training corpus get
    lower perplexity than off-domain docs; exact integer sums make the
    scores partitioning-invariant."""
    target = spark.createDataFrame(
        [(100 + i, "t",
          "the compiler emits bytecode and the runtime loads bytecode "
          "while the compiler optimizes the runtime")
         for i in range(4)],
        "doc_id long, source string, text string")
    big, uni = curation.lm_bigram_tables(target)
    docs = spark.createDataFrame(
        [(1, "d", "the compiler emits bytecode and the runtime"),
         (2, "d", "purple monsoon tangerine oboe filament daydream"),
         (3, "d", "single")],
        "doc_id long, source string, text string")
    out = {r["id"]: r.asDict()
           for r in curation.lm_perplexity(docs, big, uni).collect()}
    assert out[1]["ppl"] < out[2]["ppl"]
    assert out[3]["n_bigrams"] == 0 and out[3]["ppl"] is None
    assert out[1]["n_bigrams"] == 6
    re = {r["id"]: r.asDict()
          for r in curation.lm_perplexity(docs.repartition(7), big,
                                          uni).collect()}
    assert re == out
    # every observed bigram outscores the unseen-context prior
    assert out[1]["lp_sum_micro"] > 6 * round(-__import__("math")
                                              .log(65536) * 1e6)


def test_quality_classifier_separates_and_is_deterministic(spark):
    """GPT-3-style discriminative filter: train on labeled docs from
    two obviously different vocabularies, check held-out docs from
    each side separate cleanly, scores are bit-identical under a
    different partitioning (integer micro-TF gradients), and the
    keep-filter applies the decision."""
    from mysql_syncer_clickhouse_spark.operators import classifier

    good = "the compiler emits bytecode and the runtime loads modules "
    bad = "click here buy now free offer winner prize claim today "
    train = spark.createDataFrame(
        [(i, good * 3, 1) for i in range(10)]
        + [(100 + i, bad * 3, 0) for i in range(10)],
        "id long, text string, y int")
    w = classifier.train_quality_classifier(train, "id", "text", "y",
                                            iters=8)

    held = spark.createDataFrame(
        [(1000, good * 2 + "with fresh suffix tokens"),
         (1001, bad * 2 + "with fresh suffix tokens")],
        "id long, text string")
    scores = {r["id"]: r["score"]
              for r in classifier.score_quality(held, w, "id",
                                                "text").collect()}
    assert scores[1000] > 0.7 > 0.3 > scores[1001], scores

    re = {r["id"]: r["score"]
          for r in classifier.score_quality(held.repartition(5), w, "id",
                                            "text").collect()}
    assert re == scores

    w2 = classifier.train_quality_classifier(train.repartition(7), "id",
                                             "text", "y", iters=8)
    assert sorted(map(tuple, w.collect())) == sorted(map(tuple,
                                                         w2.collect()))

    kept = classifier.classifier_filter(held, w, "id", "text",
                                        threshold=0.5)
    assert [r["id"] for r in kept.collect()] == [1000]


def test_quality_classifier_weight_table_bounded(spark):
    """The model relation is <= n_features + 1 rows by construction --
    the property that lets scoring broadcast it at any corpus size."""
    from mysql_syncer_clickhouse_spark.operators import classifier

    train = spark.createDataFrame(
        [(1, "alpha beta gamma", 1), (2, "delta epsilon zeta", 0)],
        "id long, text string, y int")
    w = classifier.train_quality_classifier(train, "id", "text", "y",
                                            n_features=64, iters=2)
    assert w.count() == 65
    feats = classifier.featurize(train, "id", "text", n_features=64)
    assert feats.filter((F.col("feat") < 0) |
                        (F.col("feat") >= 64)).count() == 0


def test_remove_duplicate_spans_keeps_canonical_only(spark):
    """C4-style span removal: a block repeated across documents
    survives only at its earliest (doc, block) position; unique text
    is untouched; results are bit-identical under repartitioning."""
    boiler = " ".join(f"b{i}" for i in range(16))
    uniq = {d: " ".join(f"u{d}w{i}" for i in range(16)) for d in (1, 2, 3)}
    docs = spark.createDataFrame(
        [(1, uniq[1] + " " + boiler),        # boiler at (1, 1): canonical
         (2, boiler + " " + uniq[2]),        # boiler at (2, 0): removed
         (3, uniq[3])],                      # no duplication
        "doc_id long, text string")
    out = {r["doc_id"]: r.asDict()
           for r in curation.remove_duplicate_spans(
               docs, span_words=16).collect()}
    assert out[1]["n_removed_spans"] == 0
    assert out[1]["text"] == uniq[1] + " " + boiler
    assert out[2]["n_removed_spans"] == 1
    assert out[2]["text"] == uniq[2]
    assert out[3]["n_removed_spans"] == 0
    assert out[3]["text"] == uniq[3]
    assert {k: v["n_spans"] for k, v in out.items()} == {1: 2, 2: 2, 3: 1}

    re = {r["doc_id"]: r.asDict()
          for r in curation.remove_duplicate_spans(
              docs.repartition(7), span_words=16).collect()}
    assert re == out


def test_remove_duplicate_spans_within_doc_and_order(spark):
    """The same block repeated INSIDE one document also dedups to its
    first occurrence, and reassembly preserves original block order."""
    blk = " ".join(f"x{i}" for i in range(4))
    mid = " ".join(f"m{i}" for i in range(4))
    docs = spark.createDataFrame(
        [(5, blk + " " + mid + " " + blk)], "doc_id long, text string")
    out = curation.remove_duplicate_spans(docs, span_words=4).collect()[0]
    assert out["n_removed_spans"] == 1
    assert out["text"] == blk + " " + mid


def test_remove_duplicate_spans_matches_pure_python_randomized(spark):
    """Randomized cross-check: the operator's keep/drop decisions and
    reassembled text equal an independent pure-Python implementation
    over corpora with planted shared blocks."""
    import random

    rng = random.Random(11)
    span = 4
    vocab = [f"w{i}" for i in range(12)]
    shared = ["s0 s1 s2 s3", "t0 t1 t2 t3"]
    docs = []
    for d in range(1, 13):
        blocks = []
        for _ in range(rng.randrange(1, 5)):
            if rng.random() < 0.4:
                blocks.append(rng.choice(shared))
            else:
                blocks.append(" ".join(rng.choice(vocab)
                                       for _ in range(span)))
        docs.append((d, " ".join(blocks)))

    # pure-Python reference (same block/winner semantics)
    def blocks_of(text):
        ws = text.split(" ")
        return [" ".join(ws[i:i + span])
                for i in range(0, max(len(ws), 1), span)]

    stats = {}
    for d, text in docs:
        for b, blk in enumerate(blocks_of(text)):
            cnt, win = stats.get(blk, (0, None))
            pk = d * (1 << 20) + b
            stats[blk] = (cnt + 1, pk if win is None else min(win, pk))
    expect = {}
    for d, text in docs:
        kept, removed = [], 0
        for b, blk in enumerate(blocks_of(text)):
            cnt, win = stats[blk]
            if cnt > 1 and d * (1 << 20) + b != win:
                removed += 1
            else:
                kept.append(blk)
        expect[d] = (" ".join(kept), removed)

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_removed_spans"])
           for r in curation.remove_duplicate_spans(
               df, span_words=span).collect()}
    assert got == expect


def test_exact_substring_extents_and_strip(spark):
    """A 12-token substring shared by two docs at different offsets:
    with min_tokens=8 the marked extents must cover exactly the shared
    window in BOTH docs (all-copies removal), merged across overlapping
    grams; unique text survives; within-doc repeats dedup too."""
    shared = " ".join(f"s{i}" for i in range(12))
    u = lambda d, n: " ".join(f"u{d}w{i}" for i in range(n))
    docs = spark.createDataFrame(
        [(1, u(1, 5) + " " + shared + " " + u(1, 3)),
         (2, shared + " " + u(2, 6)),
         (3, u(3, 10)),
         (4, " ".join(["r0 r1 r2 r3 r4 r5 r6 r7"] * 2))],  # self-repeat
        "doc_id long, text string")
    ext = {r["doc_id"]: (r["start_tok"], r["end_tok"])
           for r in curation.exact_substring_dup_extents(
               docs, min_tokens=8).collect()}
    assert ext[1] == (5, 17)          # tokens 5..16 = the shared 12
    assert ext[2] == (0, 12)
    assert 3 not in ext
    assert ext[4] == (0, 16)          # whole doc is one repeated block

    out = {r["doc_id"]: r.asDict()
           for r in curation.strip_duplicated_substrings(
               docs, min_tokens=8).collect()}
    assert out[1]["text"] == u(1, 5) + " " + u(1, 3)
    assert out[1]["n_removed_tokens"] == 12
    assert out[2]["text"] == u(2, 6)
    assert out[3]["text"] == u(3, 10)
    assert out[3]["n_removed_tokens"] == 0
    assert out[4]["text"] == "" and out[4]["n_removed_tokens"] == 16

    re = {r["doc_id"]: r.asDict()
          for r in curation.strip_duplicated_substrings(
              docs.repartition(7), min_tokens=8).collect()}
    assert re == out


def test_exact_substring_extents_merge_adjacent_regions(spark):
    """Two duplicated regions separated by a gap shorter than nothing
    -- i.e. overlapping mark windows -- merge into ONE extent; disjoint
    regions stay separate."""
    blk_a = " ".join(f"a{i}" for i in range(8))
    blk_b = " ".join(f"b{i}" for i in range(8))
    mid = " ".join(f"m{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, blk_a + " " + mid + " " + blk_b),
         (2, blk_a), (3, blk_b)],
        "doc_id long, text string")
    ext = sorted((r["doc_id"], r["start_tok"], r["end_tok"])
                 for r in curation.exact_substring_dup_extents(
                     docs, min_tokens=8).collect())
    assert (1, 0, 8) in ext and (1, 18, 26) in ext     # disjoint
    assert (2, 0, 8) in ext and (3, 0, 8) in ext


def test_canonical_text_and_fingerprint(spark):
    """Case/punctuation/whitespace variants of one document collide on
    the canonical fingerprint; genuinely different text does not."""
    from mysql_syncer_clickhouse_spark.functions import text as TX
    rows = [(1, "Hello, World! 42"), (2, "  hello   world  42 "),
            (3, "HELLO world... 42"), (4, "hello world 43")]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: (r["c"], r["fp"]) for r in df.select(
        "id", TX.canonical_text("text").alias("c"),
        TX.canonical_fingerprint("text").alias("fp")).collect()}
    assert out[1][0] == out[2][0] == out[3][0] == "hello world 42"
    assert out[1][1] == out[2][1] == out[3][1]
    assert out[4][1] != out[1][1]


def test_normalize_url(spark):
    """Crawl-dedup URL canonicalization: scheme/host case, default
    ports, fragments, tracking params, param order, trailing slash."""
    from mysql_syncer_clickhouse_spark.functions import text as TX
    cases = [
        ("HTTP://Example.COM:80/Path/?b=2&utm_source=x&a=1#frag",
         "http://example.com/Path?a=1&b=2"),
        ("https://example.com:443/", "https://example.com"),
        ("https://example.com/p?fbclid=abc&gclid=1&msclkid=2",
         "https://example.com/p"),
        ("https://example.com/p?a=1&a=0",
         "https://example.com/p?a=0&a=1"),
        ("http://example.com:8080/x/", "http://example.com:8080/x"),
        ("https://example.com/p?utm_campaign=spring&keep=1",
         "https://example.com/p?keep=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(TX.normalize_url("url")).collect()]
    assert got == [w for _, w in cases]
    # variants of the same logical URL all collide
    variants = ["https://A.example.com/x?b=1&a=2",
                "HTTPS://a.EXAMPLE.com:443/x/?a=2&b=1&utm_source=t#top"]
    vdf = spark.createDataFrame([(u,) for u in variants], "url string")
    vs = {r[0] for r in vdf.select(TX.normalize_url("url")).collect()}
    assert len(vs) == 1


def test_language_id_multilang(spark):
    from mysql_syncer_clickhouse_spark.functions import text as TX
    rows = [
        (1, "the cat and the dog sat in that house with pride"),
        (2, "der Hund und die Katze ist nicht mit der Maus"),
        (3, "le chat et la souris est dans les champs pas une fois"),
        (4, "el perro y los gatos es que una casa en la que por"),
        (5, "zxq vbn qwrt plm asdf ghjk"),          # word salad
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["lang"] for r in
           df.select("id", TX.language_id("text").alias("lang"))
             .collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "unk"}


def test_fuzzy_decontaminate_catches_paraphrased_leakage(spark):
    """MinHash decontamination flags a training doc that near-copies a
    benchmark item (small edit) AND one that quotes it inside a longer
    doc (containment catches what Jaccard misses); clean docs pass.
    Overlapping train/bench id spaces must not cross-contaminate."""
    bench_text = ("the quick brown fox jumps over the lazy dog while "
                  "seventeen sailors navigate the harbor ") * 3
    other = ("completely different material about lattice quantum "
             "chromodynamics simulations and gauge fields ") * 3
    bench = _docs_df(spark, [(1, "bench", bench_text)])
    train = _docs_df(spark, [
        (1, "train", bench_text + "tiny edit"),          # near-copy
        (2, "train", other + bench_text + other),        # quoted inside
        (3, "train", other),                             # clean
    ])
    got = {r["id"]: r for r in curation.fuzzy_decontaminate(
        train, bench, threshold=0.5).collect()}
    assert 1 in got and got[1]["jaccard"] >= 0.5
    assert 2 in got and got[2]["containment"] >= 0.5 \
        and got[2]["jaccard"] < 0.5
    assert 3 not in got
    assert all(r["bench_id"] == 1 for r in got.values())


def test_temperature_weights_limits_and_flattening(spark):
    """alpha=1 reproduces natural token proportions, alpha=0 is
    uniform, and 0<alpha<1 strictly raises the low-resource share."""
    docs = _docs_df(spark, (
        [(i, "big", " ".join(["w"] * 90)) for i in range(10)]  # 900 tok
        + [(100, "small", " ".join(["w"] * 100))]))            # 100 tok
    w1 = curation.temperature_weights(docs, alpha=1.0)
    assert abs(w1["big"] - 0.9) < 1e-9 and abs(w1["small"] - 0.1) < 1e-9
    w0 = curation.temperature_weights(docs, alpha=0.0)
    assert abs(w0["big"] - 0.5) < 1e-9
    wh = curation.temperature_weights(docs, alpha=0.5)
    assert 0.1 < wh["small"] < 0.5
    assert abs(sum(wh.values()) - 1.0) < 1e-9
    # feeds mix_corpus directly
    out = curation.mix_corpus(docs, wh)
    assert out.count() > 0


def test_fuzzy_decontaminate_verify_join_is_hash_not_sortmerge(spark):
    """VERDICT r10 ask #4: the verify join's hs-carrying sides hint
    shuffle_hash (a sort-merge would SORT the pair-side intermediate
    already carrying ~300-int hash arrays -- the measured minhash
    x100 wall). Plan pin: no SortMergeJoin anywhere in the operator's
    physical plan; the two set joins appear as ShuffledHashJoin (the
    byte-tiny band/member joins may legitimately broadcast)."""
    bench = _docs_df(spark, [(1, "bench", "alpha beta gamma " * 10)])
    train = _docs_df(spark, [(i, "train", f"doc {i} words " * 10)
                             for i in range(4)])
    df = curation.fuzzy_decontaminate(train, bench, threshold=0.5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" in plan


def test_one_scan_plans_have_single_explode(spark):
    """Round-11 regression pin for the §6c find: the three operators
    rewritten from aggregate-then-self-join to a count window must
    keep exactly ONE Generate (explode) of their token/gram/block
    relation in the physical plan -- a second Generate means Spark is
    re-executing the corpus-grain subtree again (+15-20 s at x100)."""
    docs = _docs_df(spark, [(i, "s", f"w{i} common words here now "
                                     * 4) for i in range(6)])

    def n_generates(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return sum("Generate " in line for line in plan.splitlines())

    assert n_generates(curation.cross_doc_ngram_dup(docs, n=3)) == 1
    assert n_generates(curation.exact_substring_dup_extents(
        docs, min_tokens=4)) == 1
    assert n_generates(curation.remove_duplicate_spans(
        docs, span_words=4)) == 1


def test_dsir_resample_tokenizes_corpus_once(spark, monkeypatch):
    """VERDICT r11 ask #3: the standalone resample chain tokenizes
    `docs` exactly ONCE (the raw-model bag derives from the pinned doc
    bag by an id anti-join) plus once for the small target -- the old
    chain tokenized raw AND docs separately, and the scoring tokenize
    alone was 13 of 30.6 s at the x100 probe. Results unchanged."""
    raw, target = _dsir_fixture(spark)
    docs = raw.unionByName(target)
    want = sorted(r["id"] for r in
                  curation.dsir_resample(docs, target, k=4, n=3).collect())

    calls = []
    real = curation._bag_gram_buckets

    def counting(df, *a, **kw):
        calls.append(1)
        return real(df, *a, **kw)

    monkeypatch.setattr(curation, "_bag_gram_buckets", counting)
    got = sorted(r["id"] for r in
                 curation.dsir_resample(docs, target, k=4, n=3).collect())
    assert got == want
    assert len(calls) == 2          # docs once + target once, never raw


def test_dsir_scores_reuses_model_bag_for_same_corpus(spark, monkeypatch):
    """VERDICT r11 ask #3 (standalone dsir_scores): scoring the SAME
    DataFrame object the lr model was built on reuses the model's
    pinned bag (no second corpus tokenize); scoring a DIFFERENT
    relation still tokenizes it (the identity check prevents silently
    inheriting the wrong bag). Values identical either way."""
    raw, target = _dsir_fixture(spark)
    lr0 = curation.dsir_logratio_table(raw, target, n=3)
    want = {r["id"]: r["dsir_micro"]
            for r in curation.dsir_scores(raw, lr0, n=3).collect()}

    calls = []
    real = curation._bag_gram_buckets

    def counting(df, *a, **kw):
        calls.append(1)
        return real(df, *a, **kw)

    monkeypatch.setattr(curation, "_bag_gram_buckets", counting)
    lr = curation.dsir_logratio_table(raw, target, n=3)
    assert len(calls) == 2               # raw + target, model build
    got = {r["id"]: r["dsir_micro"]
           for r in curation.dsir_scores(raw, lr, n=3).collect()}
    assert len(calls) == 2               # same object: bag reused
    assert got == want

    other = raw.filter(F.col("doc_id") <= 2)
    sub = {r["id"]: r["dsir_micro"]
           for r in curation.dsir_scores(other, lr, n=3).collect()}
    assert len(calls) == 3               # different relation: tokenized
    assert sub == {k: v for k, v in want.items() if k <= 2}
