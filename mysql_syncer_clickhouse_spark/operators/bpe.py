"""Distributed BPE tokenizer training + encoding.

Byte-pair encoding (Sennrich et al. 2016) the way production tokenizer
trainers actually run it: the corpus collapses to a WORD-FREQUENCY
table first (the only corpus-scale shuffle -- 100 TB of text becomes a
distinct-word relation), and every merge iteration after that is one
keyed aggregation over that bounded table:

    pair counts  = explode adjacent symbol pairs, weight by word freq,
                   groupBy(pair) sum          -- map-side combinable
    best pair    = 1-row argmax (count desc, pair asc tie-break --
                   deterministic across partitionings and runs)
    apply merge  = map-only left-to-right fold over each word's
                   symbol array

The iteration loop is driver-side control flow over 1-row state, like
operators/ann.kmeans_centroids; lineage is truncated with
localCheckpoint every few rounds. At larger merge budgets you'd batch
compatible merges per round (merge the top-k pairs that share no
symbol) -- noted, not needed at demo scale.

Encoding uses the trained merge ranks with the standard
lowest-rank-first algorithm, as an Arrow-batched `mapInPandas` -- the
data-dependent inner merge loop is genuinely inexpressible as built-in
Column ops, which is exactly the case the Pandas-UDF escape hatch is
for. Token streams are deterministic: greedy left-to-right within a
rank, ranks in training order (the same contract as the reference BPE
implementations).

The reference engine has no tokenizer; this extends the LLM
training-data layer (SURVEY §7 M6) next to DSIR and packing -- token
counts from a REAL subword vocabulary instead of the whitespace
approximation in functions/text.token_count_ws.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, freq): distinct whitespace words with corpus counts -- the
    bounded relation BPE training iterates over."""
    return (docs.select(F.explode(TX.words(text_col)).alias("w"))
                .filter(F.col("w") != "")
                .groupBy("w").agg(F.count(F.lit(1)).alias("freq")))


def _chars(col) -> F.Column:
    return F.transform(F.sequence(F.lit(1), F.length(col)),
                       lambda i: F.substring(col, i, F.lit(1)))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency: one
    explode + one keyed aggregation."""
    n = F.size("syms")
    pairs = F.zip_with(F.slice("syms", 1, n - 1),
                       F.slice("syms", 2, n - 1),
                       lambda a, b: F.struct(a.alias("a"), b.alias("b")))
    return (vocab.filter(n >= 2)
                 .select(F.explode(pairs).alias("p"), "freq")
                 .groupBy("p.a", "p.b")
                 .agg(F.sum("freq").alias("cnt")))


def _merge_pair(syms, a: str, b: str):
    """Left-to-right greedy replacement of adjacent (a, b) with a||b,
    as a fold: non-overlapping by construction (the merged symbol only
    re-merges if it itself forms the pair with the next element, which
    a fresh round re-counts)."""
    la, lb = F.lit(a), F.lit(b)
    return F.aggregate(
        syms, F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            # try_element_at: NULL (not an ANSI error) on the empty acc
            (F.try_element_at(acc, F.lit(-1)) == la) & (x == lb),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.concat(la, lb)))
        ).otherwise(F.concat(acc, F.array(x))))


def train_bpe(docs: DataFrame, *, text_col: str = "text",
              num_merges: int = 40) -> list[tuple[str, str]]:
    """Learn `num_merges` BPE merges from a corpus. Returns the merge
    list in rank order [(a, b), ...] -- small by construction (the
    vocabulary being learned), the broadcastable model artifact.
    Stops early when no pair occurs twice."""
    vocab = (word_frequencies(docs, text_col)
             .select(_chars(F.col("w")).alias("syms"), "freq"))
    merges: list[tuple[str, str]] = []
    for it in range(num_merges):
        top = (_pair_counts(vocab)
               .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
               .limit(1).collect())
        if not top or top[0]["cnt"] < 2:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        vocab = vocab.select(_merge_pair(F.col("syms"), a, b).alias("syms"),
                             "freq")
        if (it + 1) % 8 == 0:
            # truncate the growing fold-lineage like duplicate_clusters
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def _encode_word(w: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Standard BPE encode: repeatedly merge the present pair with the
    lowest rank (greedy left-to-right within a rank)."""
    syms = list(w)
    while len(syms) >= 2:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]], *,
               id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(id, tokens array<string>, n_tokens): tokenize each document
    with a trained merge list. Arrow-batched mapInPandas; the merges
    ship inside the serialized closure (the broadcast-variable analog
    -- the model is bounded by construction). Tokens concatenate back
    to the original words (no information loss), test-asserted."""
    ranks = {p: i for i, p in enumerate(merges)}
    src = docs.select(F.col(id_col).alias("id"),
                      F.col(text_col).alias("text"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}

        def enc(text: str) -> list[str]:
            out: list[str] = []
            for w in (text or "").split():
                toks = cache.get(w)
                if toks is None:
                    toks = _encode_word(w, ranks)
                    cache[w] = toks
                out.extend(toks)
            return out

        for pdf in batches:
            toks = pdf["text"].map(enc)
            yield pd.DataFrame({"id": pdf["id"], "tokens": toks,
                                "n_tokens": toks.map(len)})

    return src.mapInPandas(
        run, "id long, tokens array<string>, n_tokens long")
