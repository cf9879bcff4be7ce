"""Hypertable-style continuous aggregates: cascading time rollups with
incremental refresh.

The TimescaleDB continuous-aggregate pattern re-expressed in Spark
primitives: maintain a fine-grained rollup (e.g. hourly) as a materialized
table, REFRESH it incrementally from new events only, and answer coarser
grains (day, month) by re-aggregating the fine rollup — never rescanning
raw events.

That works because the kept aggregates are all mergeable: count and sum
re-sum, min/max re-min/max; avg is derived (sum/count) at read time, never
stored.  Distinct counts and quantiles — the non-mergeable aggregates —
live in ``pipeline/sketches.py`` as HLL/KLL sketch columns and follow the
exact same cascade.

At 100 TB the shape matters twice: the hourly refresh touches only the
increment (plus the handful of (bucket, key) groups it lands in — partition
the materialized table by bucket date so the merge prunes), and a month
query aggregates ~720 hourly rows per key instead of the raw billions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["time_rollup", "rollup_refresh", "cascade_rollup", "ROLLUP_COLS"]

ROLLUP_COLS = ("n", "sum_value", "min_value", "max_value")

_LEVELS = {"hour": "hour", "day": "day", "month": "month"}


def time_rollup(events: DataFrame, level: str = "hour",
                ts_col: str = "ts", key_cols: list[str] | None = None,
                value_col: str = "value") -> DataFrame:
    """Base rollup from raw events: one row per (bucket, keys) with the
    mergeable aggregate set (count / decimal-exact sum / min / max).
    One shuffle on the (bucket, keys) grain — partial aggregation upstream
    makes it map-combined like any groupBy."""
    if level not in _LEVELS:
        raise ValueError(f"level must be one of {sorted(_LEVELS)}, got {level!r}")
    key_cols = key_cols if key_cols is not None else ["event_type"]
    return (events
            .groupBy(F.date_trunc(level, F.col(ts_col)).alias("bucket"),
                     *key_cols)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col(value_col).cast("decimal(28,10)"))
                 .alias("sum_value"),
                 F.min(value_col).alias("min_value"),
                 F.max(value_col).alias("max_value")))


def rollup_refresh(existing: DataFrame, new_events: DataFrame,
                   level: str = "hour", ts_col: str = "ts",
                   key_cols: list[str] | None = None,
                   value_col: str = "value") -> DataFrame:
    """Incremental refresh: fold ONLY the new events into an existing
    rollup.  Rollup the increment, union with the existing table, merge
    per (bucket, keys).  Cost is O(|increment| + touched groups); with the
    materialized table partitioned by bucket date, the union-merge prunes
    to the partitions the increment lands in.

    Identity under test: refresh(rollup(A), B) == rollup(A ∪ B), exactly —
    counts/sums/mins/maxes are associative, and sums stay in decimal so
    the merge order cannot change the result."""
    key_cols = key_cols if key_cols is not None else ["event_type"]
    inc = time_rollup(new_events, level, ts_col, key_cols, value_col)
    return _merge(existing.unionByName(inc), key_cols)


def cascade_rollup(fine: DataFrame, level: str,
                   key_cols: list[str] | None = None) -> DataFrame:
    """Re-aggregate a finer rollup to a coarser grain (hour → day → month)
    WITHOUT touching raw events: re-truncate the bucket, merge groups.
    Lossless for the mergeable aggregate set."""
    if level not in _LEVELS:
        raise ValueError(f"level must be one of {sorted(_LEVELS)}, got {level!r}")
    key_cols = key_cols if key_cols is not None else ["event_type"]
    rebucketed = fine.withColumn("bucket",
                                 F.date_trunc(level, F.col("bucket")))
    return _merge(rebucketed, key_cols)


def _merge(rollups: DataFrame, key_cols: list[str]) -> DataFrame:
    return (rollups.groupBy("bucket", *key_cols)
            .agg(F.sum("n").alias("n"),
                 F.sum("sum_value").alias("sum_value"),
                 F.min("min_value").alias("min_value"),
                 F.max("max_value").alias("max_value")))
