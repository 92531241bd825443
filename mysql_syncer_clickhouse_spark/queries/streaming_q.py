"""Streaming-operator queries, oracle-checked in batch mode.

Spark's time-window operators (`window`, `session_window`) produce the
same results over a bounded input whether driven by readStream or
batch -- the driver's oracle is batch SQL, so these run the operators
in batch; tests/test_streaming.py drives the same logic through real
readStream/foreachBatch/watermark machinery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum, sql_dsum
from ..sources.tables import load_table


def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
              .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
              .select(F.col("w.start").alias("win_start"), "event_type",
                      "n", "sum_value"))


_TUMBLING_SQL = f"""
SELECT date_trunc('hour', ts) AS win_start, event_type,
       COUNT(*) AS n, {sql_dsum('value', 'sum_value')}
FROM events GROUP BY 1, 2
"""


def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h windows sliding every 30min: each event lands in 2 windows."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
              .agg(F.count(F.lit(1)).alias("n"))
              .select(F.col("w.start").alias("win_start"), "n"))


_SLIDING_SQL = """
WITH slid AS (
  -- duration 3600 / slide 1800: every event is in exactly the two
  -- windows starting at floor(ts/1800)*1800 and 1800 earlier
  SELECT to_timestamp(CAST(FLOOR(epoch(ts) / 1800) AS BIGINT) * 1800 - off)
           AS win_start
  FROM events
  CROSS JOIN (SELECT unnest([0, 1800]) AS off)
)
SELECT CAST(win_start AS TIMESTAMP) AS win_start, COUNT(*) AS n
FROM slid GROUP BY 1
"""


def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window (30 min gap) -- streaming-capable twin of
    the lag/cumsum sessionization in relational.window_sessionize."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy(F.session_window("ts", "30 minutes").alias("w"),
                       "user_id")
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.min("event_id").alias("first_event"))
              .select("user_id", F.col("w.start").alias("session_start"),
                      "n_events", "first_event"))


_SESSION_WIN_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts) - LAG(epoch(ts))
                OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
              > 1800 THEN 1
              WHEN LAG(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts ASC, event_id ASC) IS NULL THEN 1
              ELSE 0 END AS new_sess
  FROM events
), sessions AS (
  SELECT user_id, event_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_idx
  FROM flagged
)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
       MIN(event_id) AS first_event
FROM sessions GROUP BY user_id, session_idx
"""


# merged registry query: tumbling + sliding time windows in one
# checked entry (the driver evaluates at most 50 registry entries);
# session_window keeps its own -- different state semantics.
def stream_time_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = stream_tumbling_window(spark, sf_dir).select(
        F.lit("tumble").alias("part"), "win_start", "event_type",
        "n", "sum_value")
    s = stream_sliding_window(spark, sf_dir).select(
        F.lit("slide").alias("part"), "win_start",
        F.lit(None).cast("string").alias("event_type"),
        "n", F.lit(None).cast("double").alias("sum_value"))
    return t.unionByName(s)


_TIME_WINDOWS_SQL = f"""
SELECT 'tumble' AS part, win_start, event_type, n, sum_value
FROM ({_TUMBLING_SQL})
UNION ALL
SELECT 'slide', win_start, CAST(NULL AS VARCHAR), n, CAST(NULL AS DOUBLE)
FROM ({_SLIDING_SQL})
"""


def continuous_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the continuous aggregate's merge-on-read
    (streaming/continuous_agg.py): per-epoch PARTIAL rollups (count +
    decimal sum per hourly bucket and event_type; epoch simulated as
    event_id % 4, the micro-batch analog), plus a REPLAYED epoch
    (exactly-once failure analog), pushed through the SAME
    merge_partials used by the streaming read path. The oracle is the
    direct one-pass rollup -- passing proves dedup-then-merge over
    partials equals aggregating the raw events."""
    from ..streaming.continuous_agg import merge_partials
    ev = load_table(spark, sf_dir, "events")
    # date_trunc == window("1 hour").start for a tumbling hour, and
    # keeps win_start a plain column: the dedup inside merge_partials
    # then reuses this aggregation's hash partitioning (subset of its
    # keys) instead of re-shuffling -- 2 exchanges total, plan-asserted
    partials = (ev.groupBy((F.col("event_id") % 4).alias("epoch"),
                           F.date_trunc("hour", "ts").alias("win_start"),
                           "event_type")
                  .agg(F.count(F.lit(1)).alias("part_n"),
                       F.sum(F.col("value").cast("decimal(38,6)"))
                        .alias("part_sum")))
    # replay epoch 1 by duplicating its rows in the SAME pass (explode
    # over a 2-element array) -- a union with a filtered copy would
    # recompute the aggregation subtree twice; the production path
    # reads appended partials and never recomputes at all
    replayed = (partials
                .withColumn("__dup", F.explode(
                    F.when(F.col("epoch") == 1,
                           F.array(F.lit(0), F.lit(1)))
                     .otherwise(F.array(F.lit(0)))))
                .drop("__dup"))
    return merge_partials(replayed, ["event_type"])


_CONT_AGG_SQL = """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
FROM events GROUP BY 1, 2
"""


QUERIES = {
    "stream_time_windows": stream_time_windows,
    "stream_session_window": stream_session_window,
    "continuous_agg_merge": continuous_agg_merge,
}

ORACLE = {
    "stream_time_windows": _TIME_WINDOWS_SQL,
    "stream_session_window": _SESSION_WIN_SQL,
    "continuous_agg_merge": _CONT_AGG_SQL,
}
