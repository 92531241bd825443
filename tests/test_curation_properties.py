"""Randomized cross-checks for curation operators against pure-Python
reference implementations: one seeded corpus, many strata/shapes, exact
agreement required. (Deterministic seed; one Spark job per operator
rather than per example, unlike the hypothesis transform suite --
packing/chunking invariants need whole-stratum visibility.)"""

from __future__ import annotations

import random

from mysql_syncer_clickhouse_spark.operators import curation


def _rand_corpus(n_strata=20, max_docs=12, seed=7):
    rng = random.Random(seed)
    rows = []
    doc_id = 0
    for s in range(n_strata):
        for _ in range(rng.randint(1, max_docs)):
            n_tokens = rng.randint(1, 30)
            rows.append((doc_id, f"s{s}",
                         " ".join(f"w{rng.randint(0, 9)}"
                                  for _ in range(n_tokens))))
            doc_id += 1
    return rows


def test_pack_sequences_matches_python_reference(spark):
    rows = _rand_corpus()
    budget = 17
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    got = {(r["stratum"], r["id"]): (r["n_tokens"], r["seq_id"])
           for r in curation.pack_sequences(df, budget=budget).collect()}

    expect = {}
    by_stratum: dict[str, list[tuple[int, int]]] = {}
    for doc_id, src, text in rows:
        by_stratum.setdefault(src, []).append((doc_id, len(text.split())))
    for src, docs in by_stratum.items():
        cum = 0
        for doc_id, n in sorted(docs):
            expect[(src, doc_id)] = (n, cum // budget)
            cum += n
    assert got == expect


def test_chunk_documents_matches_python_reference(spark):
    rows = _rand_corpus(n_strata=8)
    size, overlap, step = 7, 3, 4
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    got = {(r["id"], r["chunk_idx"]): (r["n_tokens"], r["chunk_text"])
           for r in curation.chunk_documents(
               df, size=size, overlap=overlap).collect()}

    expect = {}
    for doc_id, _, text in rows:
        words = text.split()
        n = len(words)
        n_chunks = max(-(-(n - overlap) // step), 1)
        for i in range(n_chunks):
            w = words[i * step:i * step + size]
            expect[(doc_id, i)] = (len(w), " ".join(w))
    assert got == expect


def test_hash_sample_rates_nest_and_match_reference(spark):
    rows = _rand_corpus(n_strata=10)
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    kept = {}
    for pct in (0, 10, 50, 100):
        kept[pct] = {(r["stratum"], r["id"])
                     for r in curation.hash_sample(df, pct=pct).collect()}
    assert kept[0] == set()
    assert kept[100] == {(src, doc_id) for doc_id, src, _ in rows}
    assert kept[10] <= kept[50] <= kept[100]

    import hashlib
    expect10 = {
        (src, doc_id) for doc_id, src, _ in rows
        if int(hashlib.md5(f"{src}:{doc_id}".encode())
               .hexdigest()[:8], 16) % 100 < 10}
    assert kept[10] == expect10


def test_cross_doc_ngram_dup_matches_python_reference(spark):
    """cross_doc_ngram_dup agrees exactly with a brute-force pure-
    Python reference over a seeded random corpus (small vocab, so
    cross-doc gram collisions are plentiful)."""
    rows = [(doc_id, src, text) for doc_id, src, text in _rand_corpus(
        n_strata=6, max_docs=8, seed=11)]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    got = {r["id"]: r["n_dup_grams"]
           for r in curation.cross_doc_ngram_dup(df, n=3).collect()}

    def grams(text):
        w = text.split()
        return {tuple(w[i:i + 3]) for i in range(len(w) - 2)}

    gsets = {doc_id: grams(text) for doc_id, _, text in rows}
    expect = {}
    for doc_id, gs in gsets.items():
        others = set().union(*(g for d, g in gsets.items()
                               if d != doc_id)) if len(gsets) > 1 else set()
        expect[doc_id] = len(gs & others)
    assert got == expect
