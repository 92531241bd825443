"""Similarity search over embedding columns (array<float>).

Patterns chosen for the 100 TB stance:
- `topk_bruteforce` broadcasts a SMALL query set against the full
  corpus (never corpus x corpus) -- linear scan per query, the exact
  baseline every ANN variant is measured against.
- `topk_ivf` restricts each query to its coarse partition (the fixture
  `label` plays the IVF centroid assignment, nprobe=1) -- the scale
  path: candidate lists shrink by the number of partitions.
- `embedding_near_dups` finds near-duplicate vectors via bucketed
  self-join (label + id residue blocking), never all-pairs.

Scores use exact decimal accumulation (functions/vectors.py) and are
rounded before ranking, with id tie-breaks, so top-k is deterministic
and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rk", F.row_number().over(w))
                  .filter(F.col("rk") <= k)
                  .select("query_id", "rk", "neighbor_id", "score"))


def topk_bruteforce(emb: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k of each query against the whole corpus; the
    query side is broadcast (small by contract)."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    c = emb.select(F.col(id_col).alias("neighbor_id"),
                   F.col(vec_col).alias("cv"))
    scored = (c.join(F.broadcast(q))
               .filter(F.col("query_id") != F.col("neighbor_id"))
               .withColumn("score", cosine("qv", "cv")))
    return _ranked_topk(scored, k)


def topk_ivf(emb: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             part_col: str = "label") -> DataFrame:
    """IVF-style ANN: search only the query's coarse partition
    (nprobe=1). The join is keyed on the partition column, so each
    query scans corpus/N_partitions instead of the full corpus."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"),
                       F.col(part_col).alias("part"))
    c = emb.select(F.col(id_col).alias("neighbor_id"),
                   F.col(vec_col).alias("cv"),
                   F.col(part_col).alias("part"))
    scored = (c.join(F.broadcast(q), "part")
               .filter(F.col("query_id") != F.col("neighbor_id"))
               .withColumn("score", cosine("qv", "cv")))
    return _ranked_topk(scored, k)


def embedding_near_dups(emb: DataFrame, threshold: float = 0.98,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        block_cols: tuple[str, ...] = ("label",)) -> DataFrame:
    """Near-duplicate vectors: cosine >= threshold within blocking
    buckets (id_a < id_b). Blocking bounds the self-join the way LSH
    bucketing would at scale."""
    a = emb.select(F.col(id_col).alias("id_a"),
                   F.col(vec_col).alias("va"), *block_cols)
    b = emb.select(F.col(id_col).alias("id_b"),
                   F.col(vec_col).alias("vb"), *block_cols)
    return (a.join(b, list(block_cols))
             .filter(F.col("id_a") < F.col("id_b"))
             .withColumn("score", cosine("va", "vb"))
             .filter(F.col("score") >= threshold)
             .select("id_a", "id_b", "score"))
