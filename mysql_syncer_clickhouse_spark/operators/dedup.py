"""Deduplication operators for LLM training-data pipelines: exact,
MinHash+LSH, SimHash, and n-gram Jaccard with metadata blocking.

All shuffle-conscious:
- exact dedup = one hash aggregation on the fingerprint;
- MinHash/LSH = shingle explode -> per-doc signature aggregation (one
  shuffle on doc id) -> band-bucket self-join (shuffle on small band
  signatures, never an N^2 cross join) -> Jaccard verify restricted to
  candidate pairs;
- SimHash = per-(doc,bit) aggregation, again keyed shuffles only;
- n-gram Jaccard uses cheap blocking keys to bound candidates.

Hashes are md5-derived (functions/text.py:portable_hash32) so every
stage is reproducible and oracle-checkable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import char_shingles, fingerprint, portable_hash32, word_ngrams

# LCG-style MinHash parameter pairs (a, b); modulus below
MINHASH_PARAMS = (
    (1000003, 12345), (1000033, 54321), (1000037, 7777), (1000039, 3141),
    (1000081, 2718), (1000099, 1618), (1000117, 999331), (1000121, 424243),
)
MINHASH_P = 2147483647          # 2^31 - 1
_BAND_SHIFT = 2147483648        # 2^31: pack two <2^31 hashes into one long
BANDS_OF = 2                    # rows per band -> len(params)/2 bands


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup via fingerprint hash-aggregation: one row per
    distinct normalized text, keeping the smallest id as canonical."""
    return (df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
              .groupBy("fp")
              .agg(F.min(id_col).alias("canonical_id"),
                   F.count(F.lit(1)).alias("n_copies")))


def shingle_set(df: DataFrame, id_col: str, text_col: str,
                k: int = 8) -> DataFrame:
    """Distinct character k-shingles per document (set semantics for
    Jaccard)."""
    return (df.select(F.col(id_col).alias("id"),
                      F.explode(char_shingles(text_col, k)).alias("shingle"))
              .distinct())


def minhash_signatures(shingles: DataFrame) -> DataFrame:
    """(id, i, minhash_i): min over shingles of (a_i*H + b_i) mod P.
    Exact int64 arithmetic -- a*H < 2^63 -- identical on any engine."""
    spark = shingles.sparkSession
    params = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(MINHASH_PARAMS)],
        "i int, a long, b long")
    h = shingles.withColumn("h32", portable_hash32("shingle"))
    return (h.join(F.broadcast(params))
             .groupBy("id", "i")
             .agg(F.min((F.col("a") * F.col("h32") + F.col("b"))
                        % MINHASH_P).alias("mh")))


def lsh_band_signatures(sigs: DataFrame) -> DataFrame:
    """Pack each band of BANDS_OF minhashes into one long (exact)."""
    packed = F.when(F.col("i") % BANDS_OF == 0,
                    F.col("mh") * _BAND_SHIFT).otherwise(F.col("mh"))
    return (sigs.withColumn("band", F.floor(F.col("i") / BANDS_OF))
                .groupBy("id", "band")
                .agg(F.sum(packed).alias("band_sig")))


def lsh_candidate_pairs(bands: DataFrame) -> DataFrame:
    """Distinct id pairs sharing at least one band bucket. The join is
    keyed on (band, band_sig) -- collision buckets, not a cross join."""
    a = bands.select(F.col("id").alias("id_a"), "band", "band_sig")
    b = bands.select(F.col("id").alias("id_b"), "band", "band_sig")
    return (a.join(b, ["band", "band_sig"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b")
             .distinct())


def jaccard_verify(candidates: DataFrame, shingles: DataFrame,
                   threshold: float) -> DataFrame:
    """Exact Jaccard on candidate pairs only: |A∩B| via a keyed join on
    the shingle sets, |A|,|B| via per-doc counts."""
    sizes = shingles.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    inter = (candidates
             .join(shingles.withColumnRenamed("id", "id_a"), "id_a")
             .join(shingles.withColumnRenamed("id", "id_b"),
                   ["id_b", "shingle"])
             .groupBy("id_a", "id_b")
             .agg(F.count(F.lit(1)).alias("n_inter")))
    return (inter
            .join(sizes.select(F.col("id").alias("id_a"),
                               F.col("n").alias("n_a")), "id_a")
            .join(sizes.select(F.col("id").alias("id_b"),
                               F.col("n").alias("n_b")), "id_b")
            .withColumn("jaccard",
                        F.round(F.col("n_inter").cast("double")
                                / (F.col("n_a") + F.col("n_b")
                                   - F.col("n_inter")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def minhash_dedup(df: DataFrame, id_col: str, text_col: str,
                  k: int = 8, threshold: float = 0.5) -> DataFrame:
    """End-to-end MinHash+LSH near-dup detection: shingle -> signature
    -> band buckets -> candidate pairs -> exact-Jaccard verify."""
    sh = shingle_set(df, id_col, text_col, k)
    cands = lsh_candidate_pairs(lsh_band_signatures(minhash_signatures(sh)))
    return jaccard_verify(cands, sh, threshold)


def simhash_table(df: DataFrame, id_col: str, text_col: str,
                  k: int = 8, bits: int = 32) -> DataFrame:
    """Per-document SimHash: for each bit, +1/-1 votes over shingle
    hashes; bit set when the vote sum is positive. Bit extraction uses
    floor(H / 2^b) % 2 (exact in double for H < 2^32) for engine
    parity. Identical simhash == near-identical text at this k."""
    spark = df.sparkSession
    bit_df = spark.createDataFrame([(b,) for b in range(bits)], "b int")
    sh = shingle_set(df, id_col, text_col, k)
    h = sh.withColumn("h32", portable_hash32("shingle"))
    votes = (h.join(F.broadcast(bit_df))
              .withColumn("bit",
                          (F.floor(F.col("h32") / F.pow(F.lit(2.0), "b"))
                           % 2).cast("int"))
              .groupBy("id", "b")
              .agg(F.sum(F.when(F.col("bit") == 1, 1).otherwise(-1))
                    .alias("vote")))
    return (votes.groupBy("id")
                 .agg(F.sum(F.when(F.col("vote") > 0,
                                   F.pow(F.lit(2.0), "b").cast("long"))
                             .otherwise(F.lit(0))).alias("simhash")))


def ngram_jaccard_blocked(df: DataFrame, id_col: str, text_col: str,
                          block_cols: list[str], n: int = 3,
                          threshold: float = 0.3) -> DataFrame:
    """Word-n-gram Jaccard with metadata blocking: only pairs sharing
    the blocking key are compared -- the classic scalable alternative
    to LSH when trustworthy blocking attributes exist."""
    base = df.select(F.col(id_col).alias("id"), *block_cols,
                     word_ngrams(text_col, n).alias("grams"))
    a = base.select(F.col("id").alias("id_a"), *block_cols)
    b = base.select(F.col("id").alias("id_b"), *block_cols)
    cands = (a.join(b, block_cols)
              .filter(F.col("id_a") < F.col("id_b"))
              .select("id_a", "id_b"))
    grams = base.select("id", F.explode("grams").alias("shingle")).distinct()
    return jaccard_verify(cands, grams, threshold)


def near_dup_corpus(docs: DataFrame) -> DataFrame:
    """Deterministic near/exact-duplicate test corpus: the fixture
    documents plus (a) a perturbed copy (suffix appended) of every 7th
    doc and (b) an exact copy of every 11th doc. Offsets keep ids
    disjoint; metadata columns carry over so blocking keys still match.
    The same construction exists in SQL for the oracle."""
    base = docs.select(F.col("doc_id").alias("id"), "text", "source",
                       "n_chars")
    near = (docs.filter(F.col("doc_id") % 7 == 0)
                .select((F.col("doc_id") + 1000000).alias("id"),
                        F.concat(F.col("text"),
                                 F.lit(" almost duplicate suffix"))
                         .alias("text"),
                        "source", "n_chars"))
    exact = (docs.filter(F.col("doc_id") % 11 == 0)
                 .select((F.col("doc_id") + 2000000).alias("id"),
                         "text", "source", "n_chars"))
    return base.unionByName(near).unionByName(exact)


CORPUS_SQL = """
SELECT doc_id AS id, text, source, n_chars FROM documents
UNION ALL
SELECT doc_id + 1000000, text || ' almost duplicate suffix', source, n_chars
FROM documents WHERE doc_id % 7 = 0
UNION ALL
SELECT doc_id + 2000000, text, source, n_chars
FROM documents WHERE doc_id % 11 = 0
"""
