"""Sync-consistency verification -- "is the sink actually in sync?"

The reference has no answer to this question: once rows flow through
river/sync.go the only check is eyeballing counts, and every real
deployment of a CDC syncer eventually needs the pt-table-checksum
ritual (chunked checksums of source vs replica, then row-level drill
down on the chunks that differ).  This module is that ritual,
re-expressed for Spark + ClickHouse:

- **Bucket digests** (`bucket_digest`): every row hashes to a 64-bit
  fingerprint; rows group into `n_buckets` buckets BY PRIMARY KEY
  hash (so the same logical row lands in the same bucket on both
  sides even when its values differ); each bucket aggregates
  `(count, bitXor(fp), sum(fp))`.  One O(N) scan per side, map-side
  partial aggregation, and the shuffle moves `n_buckets` rows --
  nothing else.  That is the whole cost at 100 TB: two scans and a
  kilobyte-scale digest exchange.  bitXor alone is blind to a row
  pair duplicated on one side (x ^ x = 0); count + unsigned sum
  break the tie, so all three must agree.
- **Compare** (`compare_digests`): digests are at most `n_buckets`
  rows per side -- collected and compared driver-side, bounded by
  construction.
- **Drill down** (`row_diff`): only the mismatched buckets' rows are
  re-read (the bucket predicate is a cheap hash filter evaluated in
  the scan stage), full-outer-joined on the primary key, and
  classified `missing_in_sink` / `extra_in_sink` / `value_mismatch`
  with the exact differing columns named.  Duplicate primary keys
  never multiply through the join (each side contributes one
  deterministic representative); by default they report at PK grain
  -- one `duplicate_pk` finding per key whose duplicate state
  actually differs between the sides, with per-side counts -- so the
  report scales with the divergence, not the table (a
  ReplacingMergeTree read WITHOUT `FINAL` is the classic source;
  `dup_grain="row"` keeps the exhaustive per-side inventory).

Two execution modes:

- **Spark mode** (default): both sides are DataFrames (parquet sink,
  or a ClickHouse table read back through
  `sinks.clickhouse_read.read_clickhouse_http`); fingerprints are
  `xxhash64(...)` -- pure JVM, whole-stage codegen, zero Python.
- **Pushdown mode**: the ClickHouse side never ships rows at all --
  `clickhouse_digest_sql` emits ONE aggregate query the server runs
  data-resident (`cityHash64` over a canonical row rendering,
  `groupBitXor` / `sum` per bucket), and the Spark side computes the
  IDENTICAL digest with our CityHash 1.0.2 implementation
  (`sinks/cityhash102.py`, batch ctypes fast path) over the same
  canonical rendering built by `canonical_row`.  The canonical
  rendering is length-prefixed (`len:value`) so concatenation is
  injective, uses `N` for NULL (can never collide: real entries
  start with digits + ':'), renders times as epoch numbers so
  server-timezone formatting can't diverge, floats as IEEE BIT
  PATTERNS (reinterpretAsUInt64/32 server-side, a numpy bit view in
  the udf) because float TEXT formatting is engine-specific while a
  synced float is the same double on both sides, and binary columns
  as uppercase hex (ClickHouse String is byte-transparent, Spark
  strings are UTF-8; hex is the injective common ground).

Reference gap being closed: river/sync.go applies rows and hopes;
this is the verification half the reference never had.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_U64 = 1 << 64
# decimal(38,0) holds sum(uint64) exactly up to ~5.4e18 rows/bucket
_DEC = "decimal(38,0)"


# --------------------------------------------------------------- core


def _fingerprint(cols: list[str]) -> Column:
    """64-bit row fingerprint, JVM-side (Spark mode).  xxhash64
    normalizes integral widths (int and bigint of equal value hash
    equal), so schema alignment only needs to cast *families*."""
    return F.xxhash64(*[F.col(c) for c in cols])


def _bucket(pk_cols: list[str], n_buckets: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in pk_cols]),
                  F.lit(n_buckets))


def _unsigned_dec(fp: Column) -> Column:
    """The UNSIGNED value of a signed-64 fingerprint as decimal(38,0)
    -- matches ClickHouse's sum(toUInt256(fp)) and cannot overflow
    (ANSI mode aborts on long-sum overflow; decimal sums are exact)."""
    from decimal import Decimal
    d = fp.cast(_DEC)
    return F.when(fp < 0, d + F.lit(Decimal(_U64))).otherwise(d)


def _unsigned_mod(fp: Column, n: int) -> Column:
    """`uint64(fp) % n` where `fp` is the SIGNED int64 view of a
    64-bit hash -- the Spark twin of ClickHouse's `UInt64 % n`.  Plain
    `pmod(fp, n)` agrees only when n divides 2^64 (the default 1024
    does; --buckets 1000 does not, and every hash >= 2^63 would land
    in a different bucket per side, flagging ~half the buckets of a
    perfectly in-sync table).  Unsigned value = fp + 2^64 when fp < 0,
    so unsigned%n = pmod(pmod(fp,n) + (2^64 % n if fp<0), n) -- pure
    int64 arithmetic, stays in whole-stage codegen."""
    n = int(n)
    bias = _U64 % n
    return F.pmod(
        F.pmod(fp, F.lit(n))
        + F.when(fp < 0, F.lit(bias)).otherwise(F.lit(0)),
        F.lit(n))


def ordered_cols(df: DataFrame, pk_cols: list[str],
                 value_cols: list[str] | None = None) -> list[str]:
    """Deterministic column order both sides must share: primary key
    first, then the remaining columns sorted by name."""
    if value_cols is not None:
        return list(value_cols)
    rest = sorted(c for c in df.columns if c not in pk_cols)
    return list(pk_cols) + rest


def bucket_digest(df: DataFrame, pk_cols: list[str], n_buckets: int,
                  value_cols: list[str] | None = None,
                  fingerprint: Column | None = None,
                  bucket: Column | None = None,
                  sample: tuple[int, int] | None = None) -> DataFrame:
    """Per-bucket digest: (bucket, cnt, xor_fp, sum_fp).

    One hash aggregation -- partial map-side combine then a shuffle of
    at most n_buckets * shuffle_partitions tiny rows.  `fingerprint` /
    `bucket` overrides let pushdown mode supply CityHash columns.

    `sample=(M, K)` digests only buckets where bucket % M == K -- the
    rotating-slice mode for cheap periodic verification at 100 TB:
    each run scans everything but hashes/aggregates only 1/M of the
    keyspace's buckets, and K rotating over M runs covers all of it
    deterministically (same slice on both sides, because the bucket
    is a pk hash)."""
    cols = ordered_cols(df, pk_cols, value_cols)
    fp = fingerprint if fingerprint is not None else _fingerprint(cols)
    bk = bucket if bucket is not None else _bucket(pk_cols, n_buckets)
    out = df.select(bk.alias("bucket"), fp.alias("_fp"))
    if sample is not None:
        m, k = sample
        out = out.filter(F.pmod(F.col("bucket"), F.lit(int(m)))
                         == int(k) % int(m))
    return (out
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.expr("bit_xor(_fp)").alias("xor_fp"),
                 F.sum(_unsigned_dec(F.col("_fp"))).alias("sum_fp")))


@dataclass
class DigestCompare:
    """Driver-side comparison of two collected digest sets."""
    buckets_src: int
    buckets_dst: int
    rows_src: int
    rows_dst: int
    mismatched: list[int] = field(default_factory=list)

    @property
    def in_sync(self) -> bool:
        return not self.mismatched


def _digest_map(rows) -> dict[int, tuple[int, int, int]]:
    out = {}
    for r in rows:
        # normalize xor to unsigned so Spark (signed long) and
        # ClickHouse (UInt64) digests compare equal
        out[int(r["bucket"])] = (int(r["cnt"]),
                                 int(r["xor_fp"]) % _U64,
                                 int(r["sum_fp"]))
    return out


def compare_digests(src_rows, dst_rows) -> DigestCompare:
    """`src_rows`/`dst_rows`: collected digest rows (bounded at
    n_buckets each, by construction).  A bucket mismatches when it is
    missing on either side or any of (cnt, xor, sum) differ."""
    s, d = _digest_map(src_rows), _digest_map(dst_rows)
    bad = sorted(b for b in set(s) | set(d) if s.get(b) != d.get(b))
    return DigestCompare(
        buckets_src=len(s), buckets_dst=len(d),
        rows_src=sum(v[0] for v in s.values()),
        rows_dst=sum(v[0] for v in d.values()),
        mismatched=bad)


# --------------------------------------------------------- drill down

_DIFF_SCHEMA_DOC = ("pk columns..., status, differing_columns, "
                    "src_row, dst_row")

# diff-row JSON payloads feed repair re-INSERTs: nulls stay explicit
# (an omitted key takes the column DEFAULT in JSONEachRow) and
# timestamps render at FULL microsecond precision -- Spark's default
# timestampFormat is millisecond-truncating, so a repaired
# DateTime64(6) value would otherwise re-insert truncated and still
# mismatch on the next checksum
_JSON_OPTS = {"ignoreNullFields": "false",
              "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}


def row_diff(src: DataFrame, dst: DataFrame, pk_cols: list[str],
             buckets: list[int], n_buckets: int,
             value_cols: list[str] | None = None,
             bucket_src: Column | None = None,
             bucket_dst: Column | None = None,
             dup_grain: str = "pk") -> DataFrame:
    """Row-level classification of the mismatched buckets only.

    Both sides re-read with the bucket hash-filter applied AT THE SCAN
    (no shuffle until the pk join, and the join input is only the bad
    buckets' rows -- bounded by how out-of-sync the sink actually is).
    Output: one row per divergent primary key with `status`, the
    differing column names, both rows as JSON, and the per-side
    multiplicities `src_count` / `dst_count`.

    `dup_grain` governs how duplicate primary keys report:

    - `"pk"` (default): ONE `duplicate_pk` finding per primary key
      whose duplicate state DIFFERS between the sides -- multiplicity
      or the per-pk value multiset (count + bitXor + sum of the row
      fingerprints, the same blind-spot-free trio as the bucket
      digest).  Duplicates that are BALANCED (same rows, same
      multiplicity on both sides) cannot have caused the bucket
      mismatch being drilled into, and on a table with a
      systematically non-unique pk they would make the report scale
      with the TABLE instead of the divergence (the r14 x100 probe
      measured 736k such rows at 60M rows) -- so the default grain
      keeps the drill-down output proportional to what actually
      drifted.
    - `"row"`: the legacy exhaustive grain -- every duplicated pk on
      either side reports as `duplicate_pk_in_source` /
      `duplicate_pk_in_sink`, balanced or not (the full inventory a
      pre-OPTIMIZE audit wants)."""
    if dup_grain not in ("pk", "row"):
        raise ValueError(
            f"dup_grain must be 'pk' or 'row', got {dup_grain!r}")
    cols = ordered_cols(src, pk_cols, value_cols)
    val_cols = [c for c in cols if c not in pk_cols]

    def _prep(df: DataFrame, bucket: Column | None) -> DataFrame:
        bk = bucket if bucket is not None else _bucket(pk_cols, n_buckets)
        out = df.select(*cols).withColumn("_b", bk)
        out = out.filter(F.col("_b").isin([int(b) for b in buckets]))
        out = out.withColumn("_fp", _fingerprint(cols))
        w = Window.partitionBy(*pk_cols)
        # count + xor + sum over the pk partition: the per-pk value
        # MULTISET digest (xor alone cancels even multiplicities; sum
        # alone misses swaps) -- one shuffle, all four window
        # aggregates share it
        return (out
                .withColumn("_dup", F.count(F.lit(1)).over(w))
                .withColumn("_dxor", F.expr("bit_xor(_fp)").over(w))
                .withColumn("_dsum",
                            F.sum(_unsigned_dec(F.col("_fp"))).over(w))
                .withColumn(
                    "_rn",
                    F.row_number().over(
                        w.orderBy(*[F.col(c) for c in cols]))))

    # a NULL primary key is corruption, not identity: such a row can
    # never join and would leak through the presence checks as a
    # nonsense value_mismatch -- classify it as its own finding and
    # keep it out of the join entirely
    null_pk = None
    for c in pk_cols:
        e = F.col(c).isNull()
        null_pk = e if null_pk is None else null_pk | e

    def _null_pk_rows(df: DataFrame, status: str,
                      side: str) -> DataFrame:
        rows = df.select(*cols).filter(null_pk)
        payload = F.to_json(F.struct(*cols),
                            _JSON_OPTS)
        return rows.select(
            *pk_cols,
            F.lit(status).alias("status"),
            F.array().cast("array<string>").alias("differing_columns"),
            (payload if side == "src"
             else F.lit(None).cast("string")).alias("src_row"),
            (payload if side == "dst"
             else F.lit(None).cast("string")).alias("dst_row"),
            F.lit(None).cast("long").alias("src_count"),
            F.lit(None).cast("long").alias("dst_count"))

    nulls_s = _null_pk_rows(src, "null_pk_in_source", "src")
    nulls_d = _null_pk_rows(dst, "null_pk_in_sink", "dst")
    src = src.filter(~F.coalesce(null_pk, F.lit(False)))
    dst = dst.filter(~F.coalesce(null_pk, F.lit(False)))

    s = _prep(src, bucket_src).alias("s")
    d = _prep(dst, bucket_dst).alias("d")
    extra_unions = []
    if dup_grain == "row":
        # legacy exhaustive grain: every duplicated pk reports per
        # side, balanced or not; the pk join below still sees one
        # deterministic representative per side so it cannot fan out
        dup_s = (s.filter(F.col("_dup") > 1).filter(F.col("_rn") == 1)
                 .select(*pk_cols,
                         F.lit("duplicate_pk_in_source").alias("status"),
                         F.array().cast("array<string>")
                          .alias("differing_columns"),
                         F.to_json(F.struct(*cols),
                                   _JSON_OPTS)
                          .alias("src_row"),
                         F.lit(None).cast("string").alias("dst_row"),
                         F.col("_dup").cast("long").alias("src_count"),
                         F.lit(None).cast("long").alias("dst_count")))
        dup_d = (d.filter(F.col("_dup") > 1).filter(F.col("_rn") == 1)
                 .select(*pk_cols,
                         F.lit("duplicate_pk_in_sink").alias("status"),
                         F.array().cast("array<string>")
                          .alias("differing_columns"),
                         F.lit(None).cast("string").alias("src_row"),
                         F.to_json(F.struct(*cols),
                                   _JSON_OPTS)
                          .alias("dst_row"),
                         F.lit(None).cast("long").alias("src_count"),
                         F.col("_dup").cast("long").alias("dst_count")))
        extra_unions = [dup_s, dup_d]

    s1 = s.filter(F.col("_rn") == 1).alias("s")
    d1 = d.filter(F.col("_rn") == 1).alias("d")
    cond = None
    for c in pk_cols:
        e = s1[c] == d1[c]
        cond = e if cond is None else cond & e
    j = s1.join(d1, cond, "full_outer")
    s_present = s1[pk_cols[0]].isNotNull()
    d_present = d1[pk_cols[0]].isNotNull()
    s_cnt = F.coalesce(s1["_dup"], F.lit(0)).cast("long")
    d_cnt = F.coalesce(d1["_dup"], F.lit(0)).cast("long")
    differing = F.filter(
        F.array(*[
            F.when(~s1[c].eqNullSafe(d1[c]), F.lit(c))
            for c in val_cols]),
        lambda x: x.isNotNull())
    diff = (j.select(
        *[F.coalesce(s1[c], d1[c]).alias(c) for c in pk_cols],
        F.when(~d_present, F.lit("missing_in_sink"))
         .when(~s_present, F.lit("extra_in_sink"))
         .otherwise(F.lit("value_mismatch")).alias("status"),
        F.when(s_present & d_present, differing)
         .otherwise(F.array().cast("array<string>"))
         .alias("differing_columns"),
        # nulls stay EXPLICIT in the JSON: repair re-INSERTs feed this
        # to JSONEachRow, where an omitted key takes the column
        # DEFAULT (a materialized default would silently diverge from
        # the intended NULL)
        F.when(s_present,
               F.to_json(F.struct(*[s1[c] for c in cols]),
                         _JSON_OPTS))
         .alias("src_row"),
        F.when(d_present,
               F.to_json(F.struct(*[d1[c] for c in cols]),
                         _JSON_OPTS))
         .alias("dst_row"),
        F.when(s_present, s_cnt).alias("src_count"),
        F.when(d_present, d_cnt).alias("dst_count"))
        .filter((F.col("status") != "value_mismatch")
                | (F.size("differing_columns") > 0)))
    if dup_grain == "pk":
        # one finding per pk whose duplicate state DIFFERS between
        # the sides: multiplicity, or the per-pk multiset digest
        # (balanced duplicates cannot explain a bucket mismatch and
        # would scale the report with the table)
        balanced = ((s_cnt == d_cnt)
                    & s1["_dxor"].eqNullSafe(d1["_dxor"])
                    & s1["_dsum"].eqNullSafe(d1["_dsum"]))
        dup = (j.filter(((s_cnt > 1) | (d_cnt > 1)) & ~balanced)
               .select(
                   *[F.coalesce(s1[c], d1[c]).alias(c)
                     for c in pk_cols],
                   F.lit("duplicate_pk").alias("status"),
                   F.array().cast("array<string>")
                    .alias("differing_columns"),
                   F.when(s_present,
                          F.to_json(F.struct(*[s1[c] for c in cols]),
                                    _JSON_OPTS)).alias("src_row"),
                   F.when(d_present,
                          F.to_json(F.struct(*[d1[c] for c in cols]),
                                    _JSON_OPTS)).alias("dst_row"),
                   s_cnt.alias("src_count"),
                   d_cnt.alias("dst_count")))
        extra_unions = [dup]
    out = diff
    for u in extra_unions:
        out = out.unionByName(u)
    return out.unionByName(nulls_s).unionByName(nulls_d)


# ---------------------------------------------------- full verify run


def sync_verify(src: DataFrame, dst: DataFrame, pk_cols: list[str],
                n_buckets: int = 1024,
                value_cols: list[str] | None = None,
                drill_down: bool = True,
                sample: tuple[int, int] | None = None,
                dup_grain: str = "pk"):
    """End-to-end Spark-mode verification.

    Returns (report: dict, diff: DataFrame | None).  `dst` is aligned
    to `src`'s column set and types first (a sink read back through
    HTTP arrives as strings; a parquet sink may have widened types) --
    columns missing from either side are a SCHEMA finding reported
    before any data is hashed, not a silent skip.  `sample=(M, K)`
    digests only the rotating 1/M bucket slice (both sides restrict
    identically -- the bucket is a pk hash)."""
    missing_in_dst = [c for c in src.columns if c not in dst.columns]
    extra_in_dst = [c for c in dst.columns if c not in src.columns]
    report = {
        "pk": list(pk_cols),
        "n_buckets": n_buckets,
        "schema_missing_in_sink": missing_in_dst,
        "schema_extra_in_sink": extra_in_dst,
    }
    if missing_in_dst:
        # hashing different column sets would flag every bucket;
        # report the schema gap and verify the common subset
        value_cols = ordered_cols(
            src.drop(*missing_in_dst), pk_cols, value_cols)
    cols = ordered_cols(src, pk_cols, value_cols)
    src_a = src.select(*cols)
    dst_a = dst.select(*[F.col(c).cast(src_a.schema[c].dataType)
                         .alias(c) for c in cols])
    cmp = compare_digests(
        bucket_digest(src_a, pk_cols, n_buckets, cols,
                      sample=sample).collect(),
        bucket_digest(dst_a, pk_cols, n_buckets, cols,
                      sample=sample).collect())
    report.update({
        "rows_src": cmp.rows_src, "rows_dst": cmp.rows_dst,
        "buckets_mismatched": len(cmp.mismatched),
        "mismatched_buckets": cmp.mismatched[:100],
        "in_sync": cmp.in_sync and not missing_in_dst,
    })
    diff = None
    if drill_down and cmp.mismatched:
        diff = row_diff(src_a, dst_a, pk_cols, cmp.mismatched,
                        n_buckets, cols, dup_grain=dup_grain)
    return report, diff


# ------------------------------------------------- pushdown (mode B)

def _ch_canon_part(name: str, ch_type: str,
                   binary: bool = False) -> str:
    """ClickHouse SQL rendering ONE column into its canonical string
    (before length-prefixing); must mirror `_spark_canon_part`.
    `binary`: the column holds raw bytes (ClickHouse String is
    byte-transparent, but Spark strings are UTF-8) -- canonicalize as
    uppercase hex on both sides, which is injective and
    engine-identical."""
    t = ch_type
    if t.startswith("Nullable(") and t.endswith(")"):
        t = t[len("Nullable("):-1]
    if t.startswith("LowCardinality(") and t.endswith(")"):
        t = t[len("LowCardinality("):-1]
    q = f"`{name}`"
    if binary:
        return f"hex({q})"
    if t.startswith("Float"):
        # floats hash by IEEE BIT PATTERN, never by text: float
        # formatting is engine-specific (shortest-roundtrip vs
        # printf), but a synced float is the same double on both
        # sides, so its bits are the engine-neutral identity
        width = "64" if t == "Float64" else "32"
        return f"toString(reinterpretAsUInt{width}({q}))"
    if t in ("String",) or t.startswith("FixedString"):
        return q
    if t.startswith("DateTime64"):
        return f"toString(toUnixTimestamp64Micro({q}))"
    if t.startswith("DateTime"):
        return f"toString(toUnixTimestamp({q}))"
    # Int*/UInt*/Bool/Date/Date32/Decimal/Enum all render via
    # toString with engine-identical text (fixed-scale decimals,
    # ISO dates, enum NAMES, 'true'/'false')
    return f"toString({q})"


def _ch_canon(cols: list[tuple[str, str]],
              binary_cols: set | None = None) -> str:
    """length-prefixed, NULL-sentineled concatenation of all columns.
    NULL propagates through concat, so coalesce marks it AFTER the
    prefix is built; 'N' cannot collide with '<digits>:'..."""
    parts = []
    for name, ch_type in cols:
        v = _ch_canon_part(name, ch_type,
                           binary=name in (binary_cols or ()))
        parts.append(
            f"coalesce(concat(toString(length({v})), ':', {v}), 'N')")
    return f"concat({', '.join(parts)})"


def clickhouse_bucket_sql(pk_pairs: list[tuple[str, str]],
                          n_buckets: int,
                          binary_cols: set | None = None) -> str:
    """The server-side bucket expression -- shared by the digest query
    and the drill-down read-back's IN-list predicate, so both sides of
    a bucket always mean the same rows."""
    return (f"cityHash64({_ch_canon(pk_pairs, binary_cols)}) "
            f"% {n_buckets}")


def clickhouse_digest_sql(database: str, table: str,
                          columns: list[tuple[str, str]],
                          pk_cols: list[str], n_buckets: int,
                          final: bool = False,
                          binary_cols: set | None = None,
                          sample: tuple[int, int] | None = None,
                          fmt: str | None = "TabSeparated") -> str:
    """ONE server-side aggregate query producing the same
    (bucket, cnt, xor_fp, sum_fp) digest `spark_pushdown_digest`
    computes -- the ClickHouse side of a 100 TB verification never
    ships a row.  `final` reads the table with FINAL so a
    ReplacingMergeTree collapses to its post-merge state (slower;
    without it, pre-merge duplicate versions surface as
    duplicate_pk_in_sink findings, which is also a truth).  `fmt`:
    the HTTP transport wants TabSeparated; native-protocol results
    arrive as typed Data blocks, no FORMAT clause (fmt=None)."""
    by_name = dict(columns)
    pk_pairs = [(c, by_name[c]) for c in pk_cols]
    canon = _ch_canon(columns, binary_cols)
    bucket = clickhouse_bucket_sql(pk_pairs, n_buckets, binary_cols)
    fin = " FINAL" if final else ""
    where = ""
    if sample is not None:
        m, k = sample
        where = f" WHERE bucket % {int(m)} = {int(k) % int(m)}"
    return (
        "SELECT bucket, count() AS cnt, groupBitXor(fp) AS xor_fp, "
        "sum(toUInt256(fp)) AS sum_fp FROM "
        f"(SELECT cityHash64({canon}) AS fp, "
        f"{bucket} AS bucket "
        f"FROM `{database}`.`{table}`{fin})"
        f"{where} "
        "GROUP BY bucket ORDER BY bucket"
        + (f" FORMAT {fmt}" if fmt else ""))


def parse_digest_tsv(body: bytes) -> list[dict]:
    """Rows of the pushdown query's TabSeparated response, shaped like
    collected digest rows so `compare_digests` takes either."""
    out = []
    for line in body.decode().splitlines():
        if not line.strip():
            continue
        b, cnt, x, s = line.split("\t")[:4]
        out.append({"bucket": int(b), "cnt": int(cnt),
                    "xor_fp": int(x), "sum_fp": int(s)})
    return out


def _float_bits_udf(width: int):
    """pandas_udf: IEEE bit pattern of a float column as decimal-digit
    strings (the Spark twin of reinterpretAsUInt64/32).  Arrow hands
    nullable floats to pandas as NaN; MySQL cannot store NaN, so NaN
    here IS null and maps back to None (the JVM-side NULL sentinel
    then applies, identical to the server's NULL propagation).

    Round 14: the uint->digits conversion runs in Arrow C++
    (pyarrow.compute.cast) and the result returns as an
    ArrowDtype-backed Series, so the udf's output re-serializes
    zero-copy -- ~7x the per-batch conversion of the r13 Python loop
    (0.05 vs 0.38 s/1M values incl. back-to-Arrow), 1.45x the whole
    digest end-to-end.  (r13's measured alternatives -- struct udf,
    JVM reflect, np.char.mod -- all lost to the plain loop; the loop
    now loses to the C++ cast.)  The digest hot path no longer uses
    this udf at all (spark_pushdown_digest folds float bits into its
    hash stage); it remains for float PRIMARY KEYS in
    spark_canonical_row / spark_bucket_col."""
    import pandas as pd

    def _bits(s):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        arr = s.to_numpy(
            dtype=np.float64 if width == 64 else np.float32)
        view = arr.view(np.uint64 if width == 64 else np.uint32)
        mask = np.isnan(arr)
        out = pc.cast(pa.array(view, mask=mask), pa.string())
        return pd.Series(out, dtype=pd.ArrowDtype(pa.string()))

    _bits.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(_bits, "string")


def _spark_canon_part(col: Column, spark_type: T.DataType,
                      ch_type: str, name: str) -> Column:
    """Spark rendering of ONE column's canonical string -- must equal
    `_ch_canon_part` byte-for-byte on equal data."""
    t = ch_type
    for wrap in ("Nullable(", "LowCardinality("):
        if t.startswith(wrap) and t.endswith(")"):
            t = t[len(wrap):-1]
    if t.startswith("Float"):
        width = 64 if t == "Float64" else 32
        return _float_bits_udf(width)(
            col.cast("double" if width == 64 else "float"))
    if isinstance(spark_type, T.BinaryType):
        # raw bytes: ClickHouse String is byte-transparent but Spark
        # strings are UTF-8, so both sides canonicalize as uppercase
        # hex (injective, engine-identical). The SQL emitters take
        # the matching column set via `binary_cols` -- derive both
        # from the same schema (run_checksum does).
        return F.hex(col)
    if t == "String" or t.startswith("FixedString"):
        return col.cast("string")
    if t.startswith("DateTime64"):
        # epoch micros, matching toUnixTimestamp64Micro
        return F.unix_micros(col.cast("timestamp")).cast("string")
    if t.startswith("DateTime"):
        return F.unix_timestamp(col.cast("timestamp")).cast("string")
    if t == "Bool":
        return col.cast("boolean").cast("string")
    # ints, decimals (fixed scale), Date/Date32 (ISO), enum names
    return col.cast("string")


def spark_canonical_row(df: DataFrame,
                        columns: list[tuple[str, str]]) -> Column:
    """The full canonical-row string column (length-prefixed via BYTE
    length -- octet_length, since ClickHouse length() counts bytes)."""
    parts = []
    for name, ch_type in columns:
        v = _spark_canon_part(F.col(name), df.schema[name].dataType,
                              ch_type, name)
        parts.append(F.coalesce(
            F.concat(F.octet_length(v).cast("string"), F.lit(":"), v),
            F.lit("N")))
    return F.concat(*parts)


def _cityhash64_udf():
    import pandas as pd

    def _city(s):
        import numpy as np

        from ..sinks.cityhash102 import cityhash64_batch
        vals = cityhash64_batch([x.encode("utf-8") for x in s])
        return pd.Series(
            np.array(vals, dtype=np.uint64).view(np.int64))

    # annotations set as objects (not strings): `from __future__
    # import annotations` would leave 'pd.Series' unresolvable in the
    # decorator's type-hint inference
    _city.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(_city, "long")


def spark_bucket_col(df: DataFrame, pk_pairs: list[tuple[str, str]],
                     n_buckets: int) -> Column:
    """The Spark twin of `clickhouse_bucket_sql` -- used by pushdown
    drill-down so both frames bucket rows identically to the server."""
    city = _cityhash64_udf()
    return _unsigned_mod(city(spark_canonical_row(df, pk_pairs)),
                         n_buckets)


def final_state_with_tombstones(changelog: DataFrame,
                                pk_cols: list[str],
                                seq_col: str = "seq",
                                op_col: str = "op") -> DataFrame:
    """What a ReplacingMergeTree FINAL read of the sink SHOULD return:
    the max-seq row per primary key INCLUDING delete tombstones (the
    sink keeps op='delete' rows; readers filter them -- so must the
    expected state, or every deleted key would flag as
    extra_in_sink).  Same max_by shape as operators/upsert.latest_state
    (map-side combine collapses each mapper to one candidate per pk
    before the shuffle); kept separate because latest_state's contract
    is the USER-facing state (tombstones dropped), while this is the
    sink-table contract."""
    others = [c for c in changelog.columns if c not in pk_cols]
    agg = changelog.groupBy(*pk_cols).agg(
        F.max_by(F.struct(*[F.col(c) for c in others]),
                 F.col(seq_col)).alias("__r"))
    return agg.select(
        *pk_cols,
        *[F.col("__r").getField(c).alias(c) for c in others]) \
        .select(*changelog.columns)


def spark_pushdown_digest(df: DataFrame,
                          columns: list[tuple[str, str]],
                          pk_cols: list[str],
                          n_buckets: int,
                          sample: tuple[int, int] | None = None
                          ) -> DataFrame:
    """Source-side digest matching `clickhouse_digest_sql`: CityHash64
    over the canonical rendering.

    Plan shape (round 14, VERDICT r13 next #3): the non-float
    canonical SEGMENTS build JVM-side (whole-stage codegen) and cross
    to Python ONCE through `mapInArrow` together with the RAW float
    columns; inside the hash stage the float bit-strings compute with
    Arrow C++ kernels (numpy bit view -> pc.cast -> length prefix via
    pc.utf8_length -> pc.binary_join_element_wise), the full canonical
    string assembles with one more join kernel, and the Arrow string
    layout (one data buffer + an offsets vector) feeds the compiled
    batch hasher directly.  This removes r13's four per-float-column
    pandas_udf round-trips -- the digest's dominant marginal cost --
    measured 1.36x end-to-end on sf0.1 lineitem (4 float columns),
    byte-identical digests.  The pk canonical keeps the
    `spark_canonical_row` path (floats in a PRIMARY KEY are rare; its
    float udf is itself the C++-cast shape now)."""
    by_name = dict(columns)
    pk_pairs = [(c, by_name[c]) for c in pk_cols]
    pk_canon = spark_canonical_row(df, pk_pairs)

    # interleave: runs of non-float columns fold into one JVM concat
    # segment; float columns ride raw (8/4 bytes vs ~20 rendered)
    layout: list[tuple] = []          # ("seg", Column) | ("f", width, Column)
    cur: list[Column] = []
    for name, ch_type in columns:
        t = ch_type
        for wrap in ("Nullable(", "LowCardinality("):
            if t.startswith(wrap) and t.endswith(")"):
                t = t[len(wrap):-1]
        if t.startswith("Float"):
            if cur:
                layout.append(("seg", F.concat(*cur)))
                cur = []
            w = 64 if t == "Float64" else 32
            layout.append(
                ("f", w,
                 F.col(name).cast("double" if w == 64 else "float")))
        else:
            v = _spark_canon_part(F.col(name),
                                  df.schema[name].dataType,
                                  ch_type, name)
            cur.append(F.coalesce(
                F.concat(F.octet_length(v).cast("string"),
                         F.lit(":"), v), F.lit("N")))
    if cur:
        layout.append(("seg", F.concat(*cur)))
    sel: list[Column] = []
    plan: list[tuple] = []
    for i, item in enumerate(layout):
        if item[0] == "seg":
            sel.append(item[1].alias(f"_s{i}"))
            plan.append(("seg",))
        else:
            sel.append(item[2].alias(f"_f{i}"))
            plan.append(("f", item[1]))
    sel.append(pk_canon.alias("_p"))

    def _hash_batches(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..sinks.cityhash102 import cityhash64_arrow
        for b in batches:
            parts = []
            for j, item in enumerate(plan):
                arr = b.column(j)
                if item[0] == "seg":
                    parts.append(arr)
                    continue
                w = item[1]
                # Arrow NULL and NaN both mean NULL here (MySQL
                # cannot store NaN) -- same contract as the udf path
                f = pc.fill_null(arr, float("nan"))
                npa = f.to_numpy(zero_copy_only=False)
                view = npa.view(np.uint64 if w == 64 else np.uint32)
                mask = np.isnan(npa)
                bits = pc.cast(pa.array(view, mask=mask), pa.string())
                lens = pc.cast(pc.utf8_length(bits), pa.string())
                part = pc.binary_join_element_wise(lens, ":", bits, "")
                parts.append(pc.fill_null(part, "N"))
            canon = (pc.binary_join_element_wise(*parts, "")
                     if len(parts) > 1 else parts[0])
            if isinstance(canon, pa.ChunkedArray):
                canon = canon.combine_chunks()
            fp = cityhash64_arrow(canon).view(np.int64)
            pk = cityhash64_arrow(b.column(len(plan))).view(np.int64)
            yield pa.RecordBatch.from_arrays(
                [pa.array(fp, type=pa.int64()),
                 pa.array(pk, type=pa.int64())],
                names=["_fp", "_pkfp"])

    hashed = (df.select(*sel)
                .mapInArrow(_hash_batches, "_fp long, _pkfp long"))
    bucket = _unsigned_mod(F.col("_pkfp"), n_buckets)
    out = hashed.select(bucket.alias("bucket"), "_fp")
    if sample is not None:
        m, k = sample
        out = out.filter(F.pmod(F.col("bucket"), F.lit(int(m)))
                         == int(k) % int(m))
    return (out
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.expr("bit_xor(_fp)").alias("xor_fp"),
                 F.sum(_unsigned_dec(F.col("_fp"))).alias("sum_fp")))


# ------------------------------------------------------------- repair


def repair_statements(diff_rows, database: str, table: str,
                      pk_cols: list[str],
                      engine: str | None = None) -> list[dict]:
    """Repair plan from collected diff rows (bounded: callers collect
    only after the bucket-restricted drill-down, typically with a
    LIMIT).  missing/mismatched rows re-INSERT (a ReplacingMergeTree
    upserts by (pk, version) collapse -- the same idempotent path the
    sink uses); extra rows emit a targeted ALTER DELETE.  Statements
    are EMITTED, not executed -- the caller decides (--execute), same
    contract as --retype.

    `engine`: the sink's table engine, when known.  Duplicate-pk
    findings have ONE table-level remedy -- `OPTIMIZE TABLE ... FINAL`
    collapses them -- but forcing a merge is only a REPAIR where the
    engine's FINAL semantics are the sync contract (Replacing /
    Collapsing families); on a plain MergeTree it would merge parts
    without deduplicating anything.  So when duplicates are present
    AND the engine qualifies, the plan ends with one executable
    OPTIMIZE statement covering them all (per-finding entries stay
    informational); otherwise the remedy stays manual."""
    import json as _json
    stmts = []
    n_dup = 0
    for r in diff_rows:
        row = r if isinstance(r, dict) else r.asDict()
        status = row["status"]
        if status in ("missing_in_sink", "value_mismatch"):
            payload = row["src_row"]
            stmts.append({
                "pk": {c: row[c] for c in pk_cols},
                "status": status,
                "statement": (
                    f"INSERT INTO `{database}`.`{table}` FORMAT "
                    f"JSONEachRow {payload}"),
            })
        elif status == "extra_in_sink":
            pred = " AND ".join(
                f"`{c}` = {_sql_lit(row[c])}" for c in pk_cols)
            stmts.append({
                "pk": {c: row[c] for c in pk_cols},
                "status": status,
                "statement": (
                    f"ALTER TABLE `{database}`.`{table}` DELETE "
                    f"WHERE {pred}"),
            })
        elif status.startswith("null_pk"):
            # corruption, not divergence: a repair script must not
            # guess an identity for a row that has none
            stmts.append({
                "pk": {c: row[c] for c in pk_cols},
                "status": status,
                "statement": None,
                "manual": ("row with NULL primary key: investigate "
                           "the upstream writer; not auto-repairable "
                           "(no identity to target)"),
            })
        else:  # duplicates: per-finding entries are informational;
            # the executable remedy (one OPTIMIZE for the whole
            # table) is appended below, engine-gated
            n_dup += 1
            stmts.append({
                "pk": {c: row[c] for c in pk_cols},
                "status": status,
                "statement": None,
                "manual": ("duplicate primary key: collapsed by "
                           f"OPTIMIZE TABLE `{database}`.`{table}` "
                           "FINAL (emitted at the end of this plan "
                           "when the engine's FINAL collapse is the "
                           "sync contract) or deduplicate at read "
                           "time with FINAL"),
            })
    if n_dup:
        optimizable = engine is not None and any(
            s in engine for s in ("Replacing", "Collapsing"))
        entry = {
            "pk": None,
            "status": "optimize_table",
            "covers": n_dup,
        }
        if optimizable:
            entry["statement"] = (
                f"OPTIMIZE TABLE `{database}`.`{table}` FINAL")
        else:
            entry["statement"] = None
            entry["manual"] = (
                "duplicate pks present but the sink engine "
                f"({engine or 'unknown'}) does not collapse by FINAL "
                "-- deduplicate manually (OPTIMIZE would merge parts "
                "without removing duplicates)")
        stmts.append(entry)
    return stmts


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, (int, float)):
        return str(v)
    s = str(v).replace("\\", "\\\\").replace("'", "\\'")
    return f"'{s}'"
