"""Streaming CDC apply pipeline -- the reference's sync loop under
Structured Streaming (SURVEY.md §2.4 P1/P2/P9, §3.2-3.3).

Mapping from the reference:
- binlog tail (river/sync.go:72-102)         -> `readStream` over
  changelog parquet partitions (same schema as sources/changelog.py);
  a Kafka/Debezium source drops in without changing the apply logic.
- bulk_size / flush_bulk_time micro-batching (river/sync.go:116-178)
  -> trigger(processingTime=...) + maxFilesPerTrigger backpressure
  (the bounded syncCh analog, river/river.go:52).
- master.info position checkpoint (river/master.go:27-83)
  -> checkpointLocation offset log; commit happens after the sink
  write, giving the same at-least-once-then-idempotent contract the
  reference gets from flush-before-save (river/sync.go:160-176):
  replayed batches re-append rows whose (pk, seq) dedup away.
- ClickHouse bulk apply (clickhouse/client.go:77-233) -> foreachBatch
  append to the changelog table; upsert semantics come from
  operators/upsert.latest_state on read (ReplacingMergeTree analog),
  and compact() is the explicit background-merge analog.
"""

from __future__ import annotations

import os
from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from ..operators.upsert import latest_state
from ..plans.rules import Rule


@dataclass
class SyncMetrics:
    """insert/update/delete counters + applied position
    (river/status.go:14-47 analog; position mirrors its live
    read_binlog / server_current_binlog pair)."""
    counts: dict[str, int] = field(default_factory=dict)
    applied_seq: int | None = None
    applied_epoch: int | None = None
    # replication lag (beyond-reference; the Seconds_Behind_Master /
    # pt-heartbeat question the reference's /stat cannot answer):
    # epoch-seconds of the newest EVENT timestamp applied, and the
    # wall clock of the apply that carried it
    applied_event_ts: float | None = None
    applied_wall: float | None = None
    # live sink feed rate (VERDICT r11 ask #8): the ClickHouse sink's
    # cumulative {rows_written, conn_wall_us, epochs} counters, copied
    # after each epoch -- /stat derives rows/s/conn from them so a
    # deployment sees sink throughput without the bench harness
    sink_stats: dict | None = None

    def record_counts(self, counts: dict[str, int]) -> None:
        for op, n in counts.items():
            if n:
                self.counts[op] = self.counts.get(op, 0) + int(n)

    def record_position(self, max_seq: int | None, epoch_id: int) -> None:
        """Advance the applied position (max seq ever applied -- the
        master.info analog, river/master.go:17-25). Replayed epochs
        can only re-report an already-applied seq, so max() keeps the
        position monotonic."""
        if max_seq is not None:
            s = int(max_seq)
            if self.applied_seq is None or s > self.applied_seq:
                self.applied_seq = s
        self.applied_epoch = int(epoch_id)

    def snapshot(self) -> dict[str, int]:
        return dict(self.counts)

    def position_snapshot(self) -> dict:
        return {"applied_seq": self.applied_seq,
                "applied_epoch": self.applied_epoch}

    def record_event_ts(self, max_ts) -> None:
        """Advance the applied EVENT time (binlog header timestamp /
        Debezium ts_ms -- whatever the changelog's ts column carries)
        and stamp the apply wall clock. Accepts datetime or epoch
        number; monotonic like the seq position."""
        import time as _time
        if max_ts is None:
            return
        try:
            ts = (max_ts.timestamp() if hasattr(max_ts, "timestamp")
                  else float(max_ts))
        except (TypeError, ValueError):
            return          # a payload column merely NAMED ts
        # Debezium ts_ms carries MILLISECOND epochs; consumed as
        # seconds it would read as year ~55000 and make the lag gauge
        # a huge negative. 1e11 is year 5138 in seconds but 1973 in
        # ms, so any plausible ms epoch sits above it and any
        # plausible second epoch below -- normalize, don't guess.
        if ts > 1e11:
            ts /= 1000.0
        if self.applied_event_ts is None or ts > self.applied_event_ts:
            self.applied_event_ts = ts
        self.applied_wall = _time.time()

    def lag_snapshot(self) -> dict | None:
        """Replication-lag view for /stat. `apply_lag_seconds` is the
        event->apply latency AT THE LAST APPLY (pt-heartbeat style: it
        does not grow while the source is idle, so an idle-but-caught-
        up stream never false-alarms); `since_last_apply_seconds` says
        how stale that reading is -- operators alarm on the SUM when
        they want Seconds_Behind_Master semantics, because a stalled
        apply loop shows up there. None until a ts-bearing batch
        applies."""
        import time as _time
        if self.applied_wall is None or self.applied_event_ts is None:
            return None
        return {
            "last_event_ts": self.applied_event_ts,
            "apply_lag_seconds": round(
                self.applied_wall - self.applied_event_ts, 3),
            "since_last_apply_seconds": round(
                _time.time() - self.applied_wall, 3),
        }

    def record_sink_stats(self, stats: dict) -> None:
        self.sink_stats = dict(stats)

    def sink_snapshot(self) -> dict | None:
        """Cumulative sink counters + the derived per-connection feed
        rate (rows / summed connection wall -- the bench harness's
        rows/s/conn number, live). None until the first sink write."""
        s = self.sink_stats
        if not s or not s.get("rows_written"):
            return None
        out = dict(s)
        wall = s.get("conn_wall_us", 0) / 1e6
        out["rows_per_sec_per_conn"] = (
            round(s["rows_written"] / wall) if wall > 0 else None)
        return out


@dataclass
class StreamingSyncPipeline:
    """One rule's source->sink stream (the reference runs one river per
    config; we run one StreamingQuery per rule group)."""
    rule: Rule
    pk_cols: Sequence[str]
    sink_dir: str
    checkpoint_dir: str
    seq_col: str = "seq"
    op_col: str = "op"
    # hive-style sink partitioning (MergeTree PARTITION BY analog):
    # at 100 TB a date-ish partition key keeps appends small, lets
    # compaction run per-partition, and gives readers partition pruning
    partition_cols: Sequence[str] = ()
    # columnar sink format: "parquet" (default) or "orc" -- both
    # Spark-native, same append/compact/dedup-on-read semantics; the
    # reference's fixed ClickHouse target becomes a config choice here
    sink_format: str = "parquet"
    # optional ClickHouse writer (sinks/clickhouse.py or
    # clickhouse_native.py): when set, projected batches apply to
    # ClickHouse INSTEAD of the file sink -- the reference's own
    # topology (its only sink IS ClickHouse). The writer's
    # foreachPartition insert is the observed action, so op counters
    # and positions ride it identically.
    ch_sink: object | None = None
    # ops dropped BEFORE counting/apply -- the reference's
    # FilterDelete/FilterUpdate flags (clickhouse/client.go:240-243;
    # there they default ON, here skipping is an explicit opt-in --
    # see EngineConfig.skip_delete)
    skip_ops: Sequence[str] = ()
    metrics: SyncMetrics = field(default_factory=SyncMetrics)

    def _apply_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        """The Client.Bulk analog: project/rename per rule, then append
        the micro-batch to the changelog sink in one atomic-per-epoch
        write. Keeping raw ops (not merged state) preserves event order
        via seq and makes replays idempotent. Op counters ride the
        write job via observe() -- no second pass over the batch."""
        from pyspark.sql import Observation
        if self.skip_ops:
            # ignored ops vanish before counters and sink alike (the
            # reference breaks out of bulk() without executing,
            # clickhouse/client.go:252-254)
            batch_df = batch_df.filter(
                ~F.col(self.op_col).isin(list(self.skip_ops)))
        meta = [self.seq_col, self.op_col]
        payload = [c for c in batch_df.columns if c not in meta]
        stat_cols = [
            *[F.sum((F.col(self.op_col) == o).cast("long")).alias(o)
              for o in ("insert", "update", "delete")],
            F.max(F.col(self.seq_col)).alias("__max_seq")]
        projected = batch_df.select(
            *[F.col(c) for c in meta],
            *self.rule.projection(payload))
        if "ts" in projected.columns:
            # replication lag rides the same observation -- the event
            # clock (binlog header ts / Debezium ts_ms) vs the apply
            # wall clock. Gated on the PROJECTED columns (the
            # aggregates run over `projected`; a column_filter may
            # drop ts); fixtures without ts simply never light the
            # lag block up.
            stat_cols.append(F.max(F.col("ts")).alias("__max_ts"))
        if self.ch_sink is not None:
            # the ClickHouse writers post via foreachPartition -- an
            # RDD action, which DataFrame observe() metrics never fire
            # on -- so the counters run as their own bounded aggregate
            # over the micro-batch (one extra scan of a
            # maxFilesPerTrigger-bounded batch; the insert round-trips
            # dominate at any scale)
            observed = projected.agg(*stat_cols).collect()[0].asDict()
            self.ch_sink.apply_batch(projected, epoch_id)
            stats = getattr(self.ch_sink, "write_stats", None)
            if stats:
                self.metrics.record_sink_stats(stats)
        else:
            obs = Observation()
            projected = projected.observe(obs, *stat_cols)
            writer = projected.write.mode("append") \
                .format(self.sink_format)
            if self.partition_cols:
                writer = writer.partitionBy(*self.partition_cols)
            writer.save(self.sink_dir)
            observed = dict(obs.get)
        # position + lag ride the same observation -- no second pass
        self.metrics.record_position(observed.pop("__max_seq", None),
                                     epoch_id)
        self.metrics.record_event_ts(observed.pop("__max_ts", None))
        self.metrics.record_counts(observed)

    def start_stream(self, stream: DataFrame, *,
                     processing_time: str | None = None) -> StreamingQuery:
        """Attach the apply loop to ANY streaming DataFrame in the
        normalized changelog schema -- the parquet changelog source
        below, sources/debezium.read_debezium_stream, or a real Kafka
        reader all plug in here."""
        writer = (stream.writeStream
                  .foreachBatch(self._apply_batch)
                  .option("checkpointLocation", self.checkpoint_dir)
                  .outputMode("update"))
        if processing_time:
            writer = writer.trigger(processingTime=processing_time)
        else:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def start(self, spark: SparkSession, source_dir: str,
              schema: StructType, *,
              max_files_per_trigger: int = 4,
              processing_time: str | None = None) -> StreamingQuery:
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", max_files_per_trigger)
                  .parquet(source_dir))
        return self.start_stream(stream, processing_time=processing_time)

    def run_available(self, spark: SparkSession, source_dir: str,
                      schema: StructType, **kw) -> None:
        """Drain everything currently in the source, then stop --
        the batch-boundary analog of canal catch-up."""
        q = self.start(spark, source_dir, schema, **kw)
        q.awaitTermination()

    def current_state(self, spark: SparkSession) -> DataFrame:
        """Dedup-on-read view of the sink (ReplacingMergeTree SELECT
        ... FINAL analog). mergeSchema tolerates files written before
        and after a mid-stream DDL (ADD/DROP COLUMN): the union schema
        is taken and absent columns read as NULL, mirroring the
        reference's re-introspection on OnTableChanged
        (river/sync.go:54-60, river/river.go:166-180)."""
        sink = (spark.read.option("mergeSchema", "true")
                .format(self.sink_format).load(self.sink_dir))
        return latest_state(sink, list(self._sink_pk()), self.seq_col,
                            self.op_col)

    def compact(self, spark: SparkSession, *,
                ttl_col: str | None = None,
                ttl_expire_before=None,
                sort_by_pk: bool = True,
                ttl_rollup_group: list[str] | None = None,
                ttl_rollup_set: dict[str, str] | None = None) -> None:
        """Background-merge analog: rewrite the changelog sink down to
        its current materialized state (latest op wins, tombstones
        drop). Run out-of-band, exactly like MergeTree merges.

        TTL analog (MergeTree `TTL col + INTERVAL n` evaluates exactly
        at merge time, like this): pass `ttl_col` and
        `ttl_expire_before` to also drop every live row whose ttl_col
        is strictly older than the cutoff. The cutoff is an explicit
        value, not wall-clock-at-run -- deterministic and replayable
        (callers decide "now"). NULL ttl values never expire, matching
        the sink DB's NULL-TTL behavior.

        `sort_by_pk` (default on) lays the compacted files out
        range-partitioned + sorted on the pk, like MergeTree parts
        sorted by their ORDER BY key: each file covers a disjoint pk
        range, so a pk-filtered read prunes to one file via parquet
        min/max stats instead of scanning the table (✓test)."""
        state = self.current_state(spark).withColumn(
            self.op_col, F.lit("insert"))
        if ttl_col is not None:
            if ttl_expire_before is None:
                raise ValueError("ttl_col requires ttl_expire_before")
            if ttl_rollup_group:
                # TTL ... GROUP BY analog (MergeTree `TTL expr GROUP BY
                # k SET v = agg(v)`): expired rows are AGGREGATED into
                # one coarser row per group instead of dropped -- the
                # tiered-downsampling pattern (raw recent data, rolled
                # old data, one table). The group must be a prefix of
                # the sink pk, exactly the sink DB's rule (the rolled
                # row must still be addressable by the table's ORDER
                # BY). Reducers: ttl_rollup_set maps column -> sum/max/
                # min/count; unlisted columns take min (a deterministic
                # stand-in for the sink DB's any()); the ttl column
                # takes max so the rolled row re-expires relative to
                # its newest member. Deterministic end to end -- every
                # reducer is order-free. Note the rolled row's full pk
                # (group prefix + min of the remaining pk columns)
                # competes with any live row of the same pk by seq at
                # the next dedup-on-read, exactly like a MergeTree
                # part merge -- choose group keys whose rolled pk
                # space is disjoint from live rows (e.g. a date
                # bucket) to avoid that overlap.
                pk = self._sink_pk()
                if list(ttl_rollup_group) != list(pk[:len(
                        ttl_rollup_group)]):
                    raise ValueError(
                        f"ttl_rollup_group {ttl_rollup_group} must be "
                        f"a prefix of the sink pk {pk}")
                reducers = {"sum": F.sum, "max": F.max, "min": F.min,
                            "count": F.count}
                sets = ttl_rollup_set or {}
                bad = [c for c, r in sets.items()
                       if r not in reducers]
                if bad:
                    raise ValueError(f"unknown reducer for {bad}")
                live = state.filter(
                    F.col(ttl_col).isNull()
                    | (F.col(ttl_col) >= F.lit(ttl_expire_before)))
                expired = state.filter(
                    F.col(ttl_col).isNotNull()
                    & (F.col(ttl_col) < F.lit(ttl_expire_before)))
                aggs = []
                for c in state.columns:
                    if c in ttl_rollup_group:
                        continue
                    if c == self.op_col:
                        aggs.append(F.min(c).alias(c))   # all 'insert'
                    elif c in sets:
                        aggs.append(reducers[sets[c]](c).alias(c))
                    elif c == ttl_col or c == self.seq_col:
                        aggs.append(F.max(c).alias(c))
                    else:
                        aggs.append(F.min(c).alias(c))
                rolled = expired.groupBy(*ttl_rollup_group).agg(*aggs) \
                                .select(*state.columns)
                state = live.unionByName(rolled)
            else:
                state = state.filter(
                    F.col(ttl_col).isNull()
                    | (F.col(ttl_col) >= F.lit(ttl_expire_before)))
        pk = self._sink_pk()
        if sort_by_pk:
            # explicit partition count: an unnumbered range repartition
            # gets AQE-coalesced to one partition on small states,
            # which would fold every pk range into a single file
            n = int(spark.conf.get("spark.sql.shuffle.partitions"))
            state = (state.repartitionByRange(n, *pk)
                     .sortWithinPartitions(*pk))
        tmp = self.sink_dir.rstrip("/") + ".compact"
        state.write.mode("overwrite").format(self.sink_format).save(tmp)
        # the tmp round-trip preserves the range layout: each tmp FILE
        # holds one sorted pk range and is copied split-for-split
        back = spark.read.format(self.sink_format).load(tmp)
        writer = back.write.mode("overwrite").format(self.sink_format)
        if self.partition_cols:
            writer = writer.partitionBy(*self.partition_cols)
        writer.save(self.sink_dir)

    def _sink_pk(self) -> list[str]:
        """PK names after rule renames."""
        out = []
        for c in self.pk_cols:
            name, _ = self.rule._field_parts(c)
            out.append(name)
        return out
