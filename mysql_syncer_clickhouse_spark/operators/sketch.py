"""Bounded-memory frequency sketches: count-min for heavy-hitter /
frequent-item estimation over corpora too large to shuffle their
distinct-item table.

The exact top-k (queries/llm.text_ngram_topk 'exact' part) shuffles one
row per DISTINCT gram -- fine while the distinct-gram table fits a
shuffle, which at 100 TB of web text (billions of distinct n-grams) it
may not. The count-min sketch (Cormode & Muthukrishnan 2005) caps that
exchange at d x w rows REGARDLESS of corpus size: each mapper's partial
aggregation collapses its items into at most d*w (row, bucket) partial
counts before the shuffle, and estimates come from a broadcast join
against the finished d*w-row sketch. Estimates never undercount
(est >= true) and overcount by at most eps*N with probability 1-delta,
eps = e/w, delta = e^-d.

Hashes are md5-derived (functions/text.portable_hash32 over a salted
item) so the sketch -- including its deterministic overcounts -- is
bit-identical across engines and oracle-checkable in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import portable_hash32

CMS_DEPTH = 4           # d independent hash rows
CMS_WIDTH = 2048        # w buckets per row


def _bucket(item: Column, i: int, w: int) -> Column:
    """Row-i bucket of an item: salted portable hash mod w. The salt
    prefix ("cms{i}:") makes the d rows independent hash functions."""
    return (portable_hash32(F.concat(F.lit(f"cms{i}:"), item))
            % F.lit(w)).cast("int")


def cms_table(items: DataFrame, item_col: str,
              d: int = CMS_DEPTH, w: int = CMS_WIDTH) -> DataFrame:
    """Build the sketch: (i, bucket, cnt) with exactly <= d*w rows.

    One pass over the items: each row fans out to its d (row, bucket)
    cells via posexplode, then ONE keyed aggregation counts cells.
    The fan-out never reaches the exchange -- partial aggregation
    collapses every mapper's output to <= d*w rows first, so the
    shuffle cost is constant in corpus size (the whole point)."""
    item = F.col(item_col)
    cells = F.array(*[_bucket(item, i, w) for i in range(d)])
    return (items.select(F.posexplode(cells).alias("i", "bucket"))
                 .groupBy("i", "bucket")
                 .agg(F.count(F.lit(1)).alias("cnt")))


def cms_estimate(sketch: DataFrame, candidates: DataFrame, item_col: str,
                 d: int = CMS_DEPTH, w: int = CMS_WIDTH) -> DataFrame:
    """Point-estimate each candidate's frequency: min over the d rows
    of its bucket count (0 when the bucket is empty -- the item never
    occurred). The sketch is <= d*w rows BY CONSTRUCTION, so it carries
    an explicit broadcast hint (same bounded-relation rule as
    nation/region); the candidate side streams through map-side."""
    item = F.col(item_col)
    cells = F.array(*[_bucket(item, i, w) for i in range(d)])
    cand = candidates.select(item_col,
                             F.posexplode(cells).alias("i", "bucket"))
    return (cand.join(F.broadcast(sketch), ["i", "bucket"], "left")
                .groupBy(item_col)
                .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                      .alias("est")))


def cms_sql(grams_rel: str, item_expr: str,
            d: int = CMS_DEPTH, w: int = CMS_WIDTH) -> str:
    """DuckDB twin of cms_table as a CTE body: (i, bucket, cnt) over
    `SELECT {item_expr} FROM {grams_rel}` with the identical salted
    md5 bucketing, so estimates match Spark's bit-for-bit."""
    return f"""
  SELECT s.i, ('0x' || substr(md5('cms' || s.i || ':' || {item_expr}), 1, 8))::BIGINT % {w} AS bucket,
         COUNT(*) AS cnt
  FROM {grams_rel} CROSS JOIN (VALUES {", ".join(f"({i})" for i in range(d))}) AS s(i)
  GROUP BY 1, 2
"""
