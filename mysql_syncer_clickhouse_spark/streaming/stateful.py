"""Custom stateful streaming operator via applyInPandasWithState.

The reference keeps exactly one piece of cross-batch state: per-op
insert/update/delete counters served by /stat (river/status.go:14-47,
river/sync.go:202-234). Spark's built-in streaming aggregation could
compute the same counts, but this module implements them through the
GENERAL mechanism -- applyInPandasWithState with explicit GroupState --
because that is the extension point every custom stateful operator
(rate limiting, anomaly windows, per-key dedup with TTL) plugs into
at scale: state lives in the state store, partitioned by key across
executors, checkpointed with the query.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n long"
OUTPUT_SCHEMA = "op string, n long"


def _update_op_counts(key: tuple, pdfs: Iterator[pd.DataFrame],
                      state: GroupState) -> Iterator[pd.DataFrame]:
    """Accumulate a running row count for one op key; emit the updated
    total each micro-batch. Arrow-batched: each call sees whole pandas
    chunks, never Python-per-row."""
    (total,) = state.get if state.exists else (0,)
    for pdf in pdfs:
        total += len(pdf)
    state.update((total,))
    yield pd.DataFrame({"op": [key[0]], "n": [total]})


def running_op_counts(changelog_stream: DataFrame,
                      op_col: str = "op") -> DataFrame:
    """Streaming running totals per op -- the /stat counters analog,
    as an explicit-state operator. Input must be a streaming DataFrame
    carrying `op_col`; output emits one updated (op, n) row per key per
    micro-batch."""
    return (changelog_stream
            .groupBy(op_col)
            .applyInPandasWithState(
                _update_op_counts,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
