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


# ---------------------------------------------------------------------------
# theta-style mergeable distinct sketch (ClickHouse uniqTheta analog;
# reference users run uniqTheta/uniqCombined over synced tables)
# ---------------------------------------------------------------------------

THETA_K = 1024          # buckets (power of two; ~1/sqrt(K) = 3% error)
THETA_HASH_BITS = 60    # 15 md5 hex chars: fits a signed long everywhere
THETA_SALT = "th:"


def _theta_hash(item: Column) -> Column:
    """Salted md5-derived 60-bit hash as long -- 15 hex chars so the
    value fits a signed 64-bit integer in every engine (32 bits would
    saturate at 100 TB distinct counts; 16 chars would overflow)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(THETA_SALT),
                                   item.cast("string"))), 1, 15),
        16, 10).cast("long")


def theta_sketch(df: DataFrame, group_cols: list[str], item_col: str,
                 k: int = THETA_K) -> DataFrame:
    """(group_cols..., bucket, vmin): the bucketed-min KMV sketch
    ("stochastic averaging" k-mins, the mergeable-state shape behind
    ClickHouse uniqTheta / DataSketches theta). bucket = h % k (low
    10 bits), vmin = MIN(h // k) (the independent high 50 bits).

    100 TB plan shape: ONE plain min-aggregate -- duplicates never
    matter to MIN, so there is no distinct pre-shuffle; map-side
    partial aggregation bounds every exchange at <= k rows per group
    per task, and the finished sketch is <= k rows per group forever.
    Sketches merge by elementwise min (theta_union), so states are
    replay-idempotent and cross-snapshot combinable like the other
    merge-on-read summaries. Hashes are portable md5 arithmetic, so
    the state -- not just the estimate -- is oracle-checkable in SQL."""
    if k & (k - 1):
        raise ValueError(f"k must be a power of two: {k}")
    h = _theta_hash(F.col(item_col))
    # h is non-negative, k a power of two: shiftright IS h // k and
    # stays exact above 2^53 where a double division would not
    vmin = F.shiftright(h, k.bit_length() - 1)
    return (df.groupBy(*group_cols, (h % k).cast("int").alias("bucket"))
              .agg(F.min(vmin).alias("vmin")))


def theta_union(a: DataFrame, b: DataFrame,
                group_cols: list[str]) -> DataFrame:
    """Union of two sketches = elementwise min per (group, bucket):
    the union's sketch is EXACTLY the sketch of the unioned input, so
    unions are lossless at sketch grain and never rescan the data."""
    return (a.unionByName(b)
             .groupBy(*group_cols, "bucket")
             .agg(F.min("vmin").alias("vmin")))


def theta_estimate(sketch: DataFrame, group_cols: list[str],
                   k: int = THETA_K) -> DataFrame:
    """(group_cols..., nonempty, sum_vmin, est): distinct-count
    estimate per group from the sketch alone.

    Estimator: U_i = (vmin_i + 1) / 2^50 for the k-th of each bucket
    (empty buckets contribute U = 1), n_est = k*(k-1) / sum(U_i) --
    the order-statistics estimator (Lumbroso 2010) under stochastic
    averaging; when >= 30% of buckets are empty the linear-counting
    form k * ln(k / empty) is used instead (small-n regime, same
    switch HLL implementations make). `nonempty` and `sum_vmin` are
    pure integers -- the engine-portable part the oracle checks
    exactly; `est` involves ln only in the small-n branch."""
    vspace = float(1 << (THETA_HASH_BITS - (k.bit_length() - 1)))
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("nonempty"),
        F.sum("vmin").alias("sum_vmin"))
    u_sum = ((F.col("sum_vmin").cast("double")
              + F.col("nonempty").cast("double")) / F.lit(vspace)
             + (F.lit(float(k)) - F.col("nonempty").cast("double")))
    empty = F.lit(float(k)) - F.col("nonempty").cast("double")
    lc = F.lit(float(k)) * F.log(F.lit(float(k)) / empty)
    osd = F.lit(float(k * (k - 1))) / u_sum
    est = F.when(empty >= F.lit(0.3 * k), lc).otherwise(osd)
    return agg.select(*group_cols, "nonempty", "sum_vmin",
                      F.floor(est).cast("long").alias("est"))


def theta_intersect_estimate(a: DataFrame, b: DataFrame,
                             group_cols: list[str],
                             k: int = THETA_K) -> DataFrame:
    """|A n B| and |A \\ B| estimates per group by inclusion-exclusion
    over three sketch estimates (A, B, A u B) -- the uniqTheta
    intersect/not surface. All inputs are finished sketches; nothing
    rescans data. Negative I-E noise clamps to 0."""
    ea = theta_estimate(a, group_cols, k).select(
        *group_cols, F.col("est").alias("est_a"))
    eb = theta_estimate(b, group_cols, k).select(
        *group_cols, F.col("est").alias("est_b"))
    eu = theta_estimate(theta_union(a, b, group_cols),
                        group_cols, k).select(
        *group_cols, F.col("est").alias("est_union"))
    both = ea.join(eb, group_cols).join(eu, group_cols)
    inter = F.greatest(
        F.col("est_a") + F.col("est_b") - F.col("est_union"), F.lit(0))
    return both.select(*group_cols, "est_a", "est_b", "est_union",
                       inter.alias("est_intersect"),
                       F.greatest(F.col("est_union") - F.col("est_b"),
                                  F.lit(0)).alias("est_a_not_b"))


def theta_sql(items_rel: str, item_expr: str, group_expr: str,
              k: int = THETA_K) -> str:
    """DuckDB twin of theta_sketch + the integer half of
    theta_estimate as a CTE body: (grp, nonempty, sum_vmin) with the
    identical salted 60-bit hash split -- generated from the same
    constants so the Spark state and the oracle can never desync."""
    return f"""
  SELECT {group_expr} AS grp,
         COUNT(*) AS nonempty,
         CAST(SUM(vmin) AS BIGINT) AS sum_vmin
  FROM (
    SELECT {group_expr}, h % {k} AS bucket, MIN(h // {k}) AS vmin
    FROM (SELECT *,
                 ('0x' || substr(md5('{THETA_SALT}' ||
                                     CAST({item_expr} AS VARCHAR)),
                                 1, 15))::BIGINT AS h
          FROM {items_rel})
    GROUP BY 1, 2
  )
  GROUP BY 1
"""
