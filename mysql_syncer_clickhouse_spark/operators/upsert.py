"""Upsert-by-dedup -- the engine's core operator (SURVEY.md §2.4 P4-P6).

The reference gets upsert/delete semantics from ClickHouse
`ReplacingMergeTree ORDER BY (pk)` (reference README.md:52-56,141-161):
every change is appended, and the latest version per PK wins at merge
time. The Spark-native analog is a changelog table plus a dedup-on-read
window: `row_number() OVER (PARTITION BY pk ORDER BY seq DESC) = 1`,
dropping PKs whose latest record is a delete tombstone
(clickhouse/client.go:246-269's ALTER DELETE analog).

Scale notes: the window shuffles once on pk -- the same shuffle an
aggregation would need, no extra passes. Event order is total via
`seq` (binlog position analog, river/master.go:17-25), so the result
is deterministic under any partitioning. Skewed PKs are handled by AQE;
for hot single keys, partial aggregation via max_by would apply but the
window form keeps full-row semantics with tombstones.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DELETE_OP = "delete"


def latest_state(changelog: DataFrame,
                 pk_cols: Sequence[str],
                 seq_col: str = "seq",
                 op_col: str = "op",
                 keep_op: bool = False) -> DataFrame:
    """Materialize the current state of a synced table from its
    changelog: latest row per PK (by seq; seq is unique by the binlog-
    position contract), tombstones dropped.

    Formulated as groupBy(pk).max_by(row_struct, seq) rather than a
    row_number window: both shuffle once on pk, but max_by is a real
    aggregate, so map-side partial aggregation collapses each mapper's
    rows to one candidate per PK BEFORE the exchange. On an
    update-heavy 100 TB changelog that shrinks the shuffle by the
    updates-per-key factor; the window variant ships every row."""
    others = [c for c in changelog.columns if c not in pk_cols]
    agg = changelog.groupBy(*pk_cols).agg(
        F.max_by(F.struct(*[F.col(c) for c in others]),
                 F.col(seq_col)).alias("__r"))
    df = (agg.select(*pk_cols,
                     *[F.col("__r").getField(c).alias(c) for c in others])
             .filter(F.col(op_col) != DELETE_OP)
             .select(*changelog.columns))
    return df if keep_op else df.drop(op_col)


def collapsing_final_state(rows: DataFrame,
                           pk_cols: Sequence[str],
                           sign_col: str = "sign",
                           version_col: str | None = None) -> DataFrame:
    """SELECT ... FINAL over a CollapsingMergeTree-shaped stream: rows
    arrive as (+1 state, -1 cancel) pairs; a key survives while its
    sign sum is positive, and the surviving values are the latest +1
    row. With `version_col` this is the VersionedCollapsingMergeTree
    read (latest by version); without it, input order is meaningless
    to an aggregate, so a monotone column is required -- pass the seq.

    One pk shuffle with map-side partial aggregation (same recipe as
    latest_state: sum + max_by are real aggregates, so update-heavy
    keys collapse per mapper BEFORE the exchange)."""
    if version_col is None:
        raise ValueError("collapsing_final_state needs a version/seq "
                         "column: aggregates cannot see input order")
    others = [c for c in rows.columns
              if c not in pk_cols and c != sign_col]
    agg = rows.groupBy(*pk_cols).agg(
        F.sum(sign_col).alias("__s"),
        F.max_by(
            F.struct(*[F.col(c) for c in others]),
            F.when(F.col(sign_col) > 0, F.col(version_col))
        ).alias("__r"))
    return (agg.filter(F.col("__s") > 0)
               .select(*pk_cols,
                       *[F.col("__r").getField(c).alias(c)
                         for c in others]))


def summing_final_state(rows: DataFrame,
                        pk_cols: Sequence[str],
                        sum_cols: Sequence[str],
                        drop_zero: bool = True) -> DataFrame:
    """SELECT ... FINAL over a SummingMergeTree-shaped stream: numeric
    `sum_cols` are summed per key; each remaining column keeps a
    representative value -- ClickHouse keeps "any" (order-dependent),
    we keep min() so the result is deterministic under repartitioning,
    a documented strengthening. `drop_zero=True` mirrors the engine's
    removal of rows whose every summed column is 0."""
    others = [c for c in rows.columns
              if c not in pk_cols and c not in sum_cols]
    agg = rows.groupBy(*pk_cols).agg(
        *[F.sum(c).alias(c) for c in sum_cols],
        *[F.min(c).alias(c) for c in others])
    if drop_zero and sum_cols:
        pred = None
        for c in sum_cols:
            p = F.coalesce(F.col(c), F.lit(0)) != 0
            pred = p if pred is None else (pred | p)
        agg = agg.filter(pred)
    return agg.select(*[c for c in rows.columns])


def fill_partial_updates(changelog: DataFrame,
                         pk_cols: Sequence[str],
                         payload_cols: Sequence[str],
                         seq_col: str = "seq",
                         op_col: str = "op") -> DataFrame:
    """Changed-column-only updates (river/sync.go:356-383): an update
    event carries NULL for unchanged columns. Reconstruct full rows by
    carrying the last non-null value per column forward in seq order,
    then keep the latest row per PK (tombstones dropped).

    Note: a delete resets history -- columns must not leak across a
    delete/re-insert boundary -- so values are carried within an
    "incarnation" (rows since the last delete), not the whole history.
    """
    w_inc = (Window.partitionBy(*pk_cols)
             .orderBy(F.col(seq_col))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df = changelog.withColumn(
        "__inc",
        F.sum(F.when(F.col(op_col) == DELETE_OP, 1).otherwise(0)).over(w_inc))
    w_fill = (Window.partitionBy(*pk_cols, "__inc")
              .orderBy(F.col(seq_col))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # single projection -> ONE Window operator (and one sort) evaluates
    # every fill column; a per-column withColumn chain would stack a
    # Window + Sort per column
    df = df.select(*[c for c in df.columns if c not in payload_cols],
                   *[F.last(c, ignorenulls=True).over(w_fill).alias(c)
                     for c in payload_cols]) \
           .select(*df.columns)
    return latest_state(df, pk_cols, seq_col, op_col).drop("__inc")


def apply_snapshot_and_changelog(snapshot: DataFrame,
                                 changelog: DataFrame,
                                 pk_cols: Sequence[str],
                                 seq_col: str = "seq",
                                 op_col: str = "op") -> DataFrame:
    """Initial full load + incremental stream (S1+S2): the snapshot is
    the mysqldump analog (river/river.go:135-146) and sorts before every
    change event, so it enters the dedup with seq = -inf (-1; driver
    seqs are >= 0) and op='insert'."""
    snap = (snapshot
            .withColumn(seq_col, F.lit(-1).cast("long"))
            .withColumn(op_col, F.lit("insert")))
    merged = snap.select(*changelog.columns) \
        .unionByName(changelog, allowMissingColumns=True)
    return latest_state(merged, pk_cols, seq_col, op_col)


def fan_in(shards: Sequence[DataFrame]) -> DataFrame:
    """Wildcard table fan-in (S4, river/river.go:182-236): shards of a
    logical table union into one sink; schema drift across shards is
    tolerated (missing columns -> NULL), mirroring re-introspection on
    DDL (river/sync.go:54-60)."""
    out = shards[0]
    for s in shards[1:]:
        out = out.unionByName(s, allowMissingColumns=True)
    return out
