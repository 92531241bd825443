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


# --- SpaceSaving topK (the sink DB's topK aggregate) --------------------
#
# Count-min (above) answers "how often does THIS item occur"; topK
# answers "which items occur most" without shuffling the distinct-item
# table: each partition keeps a capacity-C SpaceSaving summary (Metwally
# et al. 2005) whose memory is C counters REGARDLESS of how many
# distinct items stream through it, then the <= n_partitions * C
# surviving counters merge in one keyed aggregation. Every reported
# count carries [lower, upper] bounds; the classic guarantee survives
# the merge: any item whose true count exceeds the k-th largest upper
# bound is IN the result (test-asserted). The price of bounded memory
# is order-dependence -- counts depend on arrival order within each
# partition, so unlike every md5-derived operator in this module the
# estimates are not partitioning-deterministic (the bounds always hold;
# only where inside the bounds moves). ClickHouse's topK has the same
# property.

TOPK_LOAD_FACTOR = 3        # C = k * load_factor, the public default


def space_saving_partials(df: DataFrame, item_col: str,
                          capacity: int,
                          weight_col: str | None = None) -> DataFrame:
    """Per-partition SpaceSaving summaries: (item, cnt, err, pmin).
    `cnt` is the summary's (over)estimate, `err` its max overcount,
    and `pmin` the partition summary's min counter -- the upper bound
    on ANY item the partition evicted, needed by the merge. State is
    `capacity` counters per partition, streamed over Arrow batches.
    With `weight_col` each row increments by its (non-negative) weight
    instead of 1 -- the topKWeighted variant; the eviction/bound math
    is weight-agnostic (Metwally's proof only needs additivity)."""
    import pandas as pd

    def summarize(batches):
        counters: dict = {}
        errors: dict = {}
        for pdf in batches:
            # pre-aggregate the Arrow batch in pandas C code first:
            # the Python update loop then runs once per DISTINCT item
            # per batch, not once per row -- the SpaceSaving bounds
            # hold for any arrival order/grouping (additivity is all
            # Metwally's proof uses)
            if weight_col is not None:
                agg = pdf.dropna(subset=["item"]) \
                         .groupby("item", sort=False)["w"].sum()
            else:
                agg = pdf["item"].value_counts(sort=False)
            for item, w in agg.items():
                w = int(w)
                if item in counters:
                    counters[item] += w
                elif len(counters) < capacity:
                    counters[item] = w
                    errors[item] = 0
                else:                     # evict the min counter
                    victim = min(counters, key=lambda i: (counters[i],
                                                          str(i)))
                    vcnt = counters.pop(victim)
                    errors.pop(victim)
                    counters[item] = vcnt + w
                    errors[item] = vcnt
        pmin = min(counters.values()) if len(counters) >= capacity else 0
        yield pd.DataFrame({
            "item": list(counters),
            "cnt": [counters[i] for i in counters],
            "err": [errors[i] for i in counters],
            "pmin": [pmin] * len(counters)})

    cols = [F.col(item_col).cast("string").alias("item")]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("long").alias("w"))
    return df.select(*cols).mapInPandas(
        summarize, "item string, cnt long, err long, pmin long")


def topk_space_saving(df: DataFrame, item_col: str, k: int,
                      load_factor: int = TOPK_LOAD_FACTOR,
                      weight_col: str | None = None) -> DataFrame:
    """(item, est, lower, upper): the k highest-frequency items by
    merged upper bound.

    Merge math: a partition that didn't report an item may still have
    seen it up to `pmin` times, so
      upper(item) = sum(cnt_p for reporting p) + sum(pmin_p for silent p)
                  = sum(cnt_p - pmin_p) + TOTAL_PMIN
      lower(item) = sum(cnt_p - err_p)
    TOTAL_PMIN is one tiny aggregate over the <= n_partitions summary
    rows, broadcast back as a literal-sized cross join. Top-k selection
    is by upper bound with an item tie-break (deterministic GIVEN the
    summaries)."""
    partials = space_saving_partials(df, item_col,
                                     capacity=k * load_factor,
                                     weight_col=weight_col)
    # PIN the summaries before the two reuses below: the summary rows
    # are order-dependent (SpaceSaving eviction depends on arrival
    # order), and `merged` and `tot` would otherwise evaluate the
    # mapInPandas twice -- a task retry or upstream reorder between
    # those evaluations could yield pmin values that disagree with the
    # cnt/err rows summed into `merged`, silently breaking the
    # [lower, upper] bound guarantee. localCheckpoint materializes ONE
    # consistent snapshot (<= capacity rows per partition -- tiny);
    # same pattern as pca_fit's reused partials.
    partials = partials.localCheckpoint(eager=True)
    merged = (partials.groupBy("item")
              .agg(F.sum(F.col("cnt") - F.col("pmin")).alias("adj"),
                   F.sum(F.col("cnt") - F.col("err")).alias("lower")))
    const = (partials.select("pmin",
                             F.spark_partition_id().alias("pid")))
    # NOTE: spark_partition_id() here reflects the post-summary
    # partitioning (1 summary per input partition, no shuffle between),
    # so distinct (pid, pmin) rows recover each partition's pmin
    tot = (const.distinct()
           .agg(F.coalesce(F.sum("pmin"), F.lit(0))
                 .alias("total_pmin")))
    out = (merged.crossJoin(F.broadcast(tot))
           .select("item",
                   (F.col("adj") + F.col("total_pmin")).alias("upper"),
                   F.greatest("lower", F.lit(0)).alias("lower"))
           .withColumn("est", F.col("upper")))
    return (out.orderBy(F.desc("upper"), "item").limit(k)
               .select("item", "est", "lower", "upper"))
