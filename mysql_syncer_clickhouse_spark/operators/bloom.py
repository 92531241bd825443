"""Distributed Bloom filter: bounded-state set membership for
cross-snapshot dedup and join pre-filtering.

The reference's sink database ships bloom-filter skip indexes
(ClickHouse `bloom_filter` / `tokenbf_v1` index types) to prune scans
cheaply; training-data pipelines use the same structure to screen a new
crawl against billions of previously-ingested URLs/fingerprints without
shuffling the historical set. The DataFrame shape here keeps both
properties at 100 TB:

- **Build is ONE keyed aggregation bounded at m/32 rows.** Each item
  fans out to its k bit positions (flat codegen arithmetic), positions
  collapse to (word, bits) via a `bit_or` aggregate -- map-side partial
  aggregation reduces every mapper's output to <= m/32 rows before the
  exchange, so the shuffle cost is constant in corpus size (the
  count-min property, operators/sketch.py, applied to membership).
- **Probe is map-only.** The finished filter is <= m/32 rows BY
  CONSTRUCTION (the bounded-relation broadcast rule: like nation/
  region, its size is fixed by config, not by data), so each of the k
  lookups is a broadcast hash join -- zero shuffles on the probe side,
  the stream stays pipelined.
- **No false negatives, bounded false positives.** Standard Bloom
  guarantees: an inserted item always probes true; a non-member probes
  true with p ~ (1 - e^(-k*n/m))^k.
- **Deterministic and engine-portable.** Bit positions are md5-derived
  (functions/text.portable_hash32) and `bit_or` is order-independent,
  so the filter -- including its false positives -- is bit-identical
  across partitionings AND reproducible in DuckDB SQL (bloom_sql),
  which is how the driver oracle checks it.

At a scale where m itself must outgrow a broadcast (screening against
10B+ URLs wants m ~ 100 Gbit), shard the filter by a hash prefix of the
item: both build and probe key every row by (prefix, word), turning the
probe into a co-partitioned join per shard -- same arithmetic, one
extra key column. Documented here; the in-engine default keeps m
broadcastable.

32-bit words (not 64) so every mask stays a positive BIGINT in both
engines -- no sign/overflow edge at bit 63.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import portable_hash32

BLOOM_BITS = 1 << 16    # m: filter size in bits (2048 words)
BLOOM_K = 4             # k: hash functions per item


def _position(item: Column, i: int, m: int) -> Column:
    """Bit position i of an item: salted portable hash mod m. The salt
    prefix ("bf{i}:") makes the k positions independent hash
    functions (same convention as the count-min rows)."""
    return (portable_hash32(F.concat(F.lit(f"bf{i}:"), item))
            % F.lit(m)).cast("long")


def bloom_build(items: DataFrame, item_col: str,
                m: int = BLOOM_BITS, k: int = BLOOM_K) -> DataFrame:
    """Build the filter: (word, bits) with <= m/32 rows.

    One pass: each item fans out to its k positions via explode, then
    ONE keyed `bit_or` aggregation folds masks into words. NULL items
    are skipped (NULL is never a member)."""
    item = F.col(item_col)
    positions = F.array(*[_position(item, i, m) for i in range(k)])
    pos = F.col("pos")
    return (items.filter(item.isNotNull())
                 .select(F.explode(positions).alias("pos"))
                 .select(F.shiftright(pos, 5).alias("word"),
                         F.call_function(
                             "shiftleft", F.lit(1).cast("long"),
                             pos.bitwiseAND(F.lit(31)).cast("int"))
                          .alias("mask"))
                 .groupBy("word")
                 .agg(F.bit_or("mask").alias("bits")))


def bloom_might_contain(probe: DataFrame, item_col: str, bloom: DataFrame,
                        m: int = BLOOM_BITS, k: int = BLOOM_K,
                        out_col: str = "might_contain") -> DataFrame:
    """Append a boolean membership column: True iff all k bits are set.

    The sparse (word, bits) filter is densified into ONE row holding an
    m/32-word array and broadcast once; every probe row tests its k bits
    with pure-codegen element_at arithmetic. Round 15 (guide §2.4 /
    §3.1): the previous shape ran k SEPARATE broadcast hash joins --
    k broadcast exchanges, each materializing its own copy of the build
    aggregation as a driver-side job -- for a filter that is <= m/32
    rows BY CONSTRUCTION. Packing moves the lookup below one
    BroadcastNestedLoopJoin of a single 16 KB row: zero shuffles on the
    probe side, one build job, bit answers unchanged (same salted
    positions, same 32-bit word packing; a missing word reads 0 through
    the densify coalesce exactly as the old left join's NULL did).
    NULL items probe False."""
    item = F.col(item_col)
    n_words = (m + 31) // 32
    packed = (bloom.groupBy()
              .agg(F.map_from_entries(
                  F.collect_list(F.struct("word", "bits"))).alias("_bf_m"))
              .select(F.transform(
                  F.sequence(F.lit(0).cast("long"),
                             F.lit(n_words - 1).cast("long")),
                  lambda w: F.coalesce(
                      F.try_element_at("_bf_m", w),
                      F.lit(0).cast("long"))).alias("_bf_arr")))
    out = probe.crossJoin(F.broadcast(packed))
    arr = F.col("_bf_arr")
    hits = []
    for i in range(k):
        pos = _position(item, i, m)
        mask = F.call_function("shiftleft", F.lit(1).cast("long"),
                               pos.bitwiseAND(F.lit(31)).cast("int"))
        word_ix = (F.shiftright(pos, 5) + F.lit(1)).cast("int")
        hits.append(
            (F.coalesce(F.element_at(arr, word_ix), F.lit(0))
             .bitwiseAND(mask) != 0))
    flag = hits[0]
    for h in hits[1:]:
        flag = flag & h
    out = out.withColumn(out_col, item.isNotNull() & flag)
    return out.drop("_bf_arr")


def bloom_screen_new(corpus: DataFrame, seen: DataFrame, item_col: str,
                     m: int = BLOOM_BITS, k: int = BLOOM_K) -> DataFrame:
    """The cross-snapshot dedup composition: keep only corpus rows
    whose item is definitely NOT in `seen` (no false negatives means
    nothing previously ingested survives; the FP rate is the fraction
    of genuinely-new rows sacrificed -- the standard trade)."""
    bloom = bloom_build(seen, item_col, m=m, k=k)
    flagged = bloom_might_contain(corpus, item_col, bloom, m=m, k=k)
    return flagged.filter(~F.col("might_contain")).drop("might_contain")


def bloom_sql(items_rel: str, item_expr: str,
              m: int = BLOOM_BITS, k: int = BLOOM_K) -> str:
    """DuckDB twin of bloom_build as a CTE body: (word, bits) over
    `SELECT {item_expr} FROM {items_rel}` with the identical salted md5
    positions and 32-bit word packing, so membership answers --
    including false positives -- match Spark's bit-for-bit."""
    vals = ", ".join(f"({i})" for i in range(k))
    return f"""
  SELECT pos // 32 AS word, bit_or((1::BIGINT << (pos % 32)::INT)) AS bits
  FROM (
    SELECT ('0x' || substr(md5('bf' || s.i || ':' || {item_expr}), 1, 8))::BIGINT % {m} AS pos
    FROM {items_rel} CROSS JOIN (VALUES {vals}) AS s(i)
  )
  GROUP BY 1
"""


def bloom_probe_sql(select_cols: str, items_rel: str, item_expr: str,
                    where: str = "",
                    m: int = BLOOM_BITS, k: int = BLOOM_K) -> str:
    """DuckDB twin of the PROBE side (bloom_might_contain's k salted
    positions) as a CTE body: `(select_cols, pos)` -- one row per
    (item, hash i). Generated from the SAME m/k constants as
    bloom_sql, so changing BLOOM_BITS/BLOOM_K can never desync the
    build and probe oracles (ADVICE r5)."""
    vals = ", ".join(f"({i})" for i in range(k))
    where_clause = f"\n  WHERE {where}" if where else ""
    return f"""
  SELECT {select_cols},
         ('0x' || substr(md5('bf' || s.i || ':' || {item_expr}), 1, 8))::BIGINT
           % {m} AS pos
  FROM {items_rel} CROSS JOIN (VALUES {vals}) AS s(i){where_clause}
"""
