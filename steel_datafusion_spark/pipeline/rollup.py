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

__all__ = ["debounce_events", "sql_debounce_events",
           "time_rollup", "rollup_refresh", "cascade_rollup",
           "gapfill", "sql_gapfill", "ROLLUP_COLS"]

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


def gapfill(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    interval_s: int = 3600,
    method: str = "locf",
) -> DataFrame:
    """Time-bucket gap filling (the TimescaleDB ``time_bucket_gapfill``
    shape): regularize each key's series onto an ``interval_s`` grid
    spanning that key's [min, max] bucket range, and fill empty buckets —
    ``method='locf'`` carries the last observation forward;
    ``method='linear'`` interpolates between the surrounding observed
    buckets (leading/trailing gaps stay NULL under linear; leading gaps
    stay NULL under locf).

    Per bucket the observed value is the mean of that bucket's rows
    (decimal-exact sum / count, 6 dp) — regularize-then-fill, the
    standard resampling contract.

    Returns (key, bucket_ts, value 6dp-or-NULL, filled boolean).

    Scale: one shuffle on the key for the per-bucket aggregate; the grid
    generates from each key's 2-value [min, max] envelope (sequence +
    explode — |keys| · span/interval rows, never a driver loop); the fill
    itself is two window passes over (key ORDER BY bucket).  A key's grid
    length is bounded by its time span, not its row count — dense keys
    collapse into their buckets first."""
    if method not in ("locf", "linear"):
        raise ValueError(f"method must be locf|linear, got {method!r}")
    if interval_s < 1:
        raise ValueError(f"interval_s must be >= 1, got {interval_s}")
    from pyspark.sql.window import Window

    step = F.lit(interval_s)
    bucket = (F.floor(F.unix_timestamp(F.col(ts_col)) / step) * step)
    from ..cache import track

    # the observed-bucket relation feeds the grid envelope AND the grid
    # join — persisted, the raw events are scanned and bucketed once
    obs = track(events
                .groupBy(F.col(key_col).alias("k"), bucket.alias("b"))
                .agg(F.round(
                    (F.sum(F.col(value_col).cast("decimal(28,10)"))
                     / F.count(F.lit(1))).cast("double"), 6).alias("v"))
                .persist())
    grid = (obs.groupBy("k")
            .agg(F.min("b").alias("_b0"), F.max("b").alias("_b1"))
            .select("k", F.explode(F.sequence(
                F.col("_b0"), F.col("_b1"), step)).alias("b")))
    g = grid.join(obs, ["k", "b"], "left")
    w_prev = (Window.partitionBy("k").orderBy("b")
              .rowsBetween(Window.unboundedPreceding, 0))
    if method == "locf":
        filled = F.last("v", ignorenulls=True).over(w_prev)
    else:
        w_next = (Window.partitionBy("k").orderBy("b")
                  .rowsBetween(0, Window.unboundedFollowing))
        prev = F.last(F.when(F.col("v").isNotNull(),
                             F.struct("b", "v")), ignorenulls=True) \
            .over(w_prev)
        nxt = F.first(F.when(F.col("v").isNotNull(),
                             F.struct("b", "v")), ignorenulls=True) \
            .over(w_next)
        span = (nxt["b"] - prev["b"]).cast("double")
        frac = (F.col("b") - prev["b"]).cast("double") / span
        filled = F.when(F.col("v").isNotNull(), F.col("v")) \
            .when(prev.isNull() | nxt.isNull(), F.lit(None)) \
            .otherwise(F.round(prev["v"] + frac * (nxt["v"] - prev["v"]),
                               6))
    return (g.select(
        F.col("k").alias(key_col),
        F.col("b").cast("long").alias("bucket_ts"),
        F.round(filled, 6).alias("value"),
        F.col("v").isNull().alias("filled"))
        .orderBy(key_col, "bucket_ts"))


def sql_gapfill(
    table: str = "events", key_col: str = "event_type",
    ts_col: str = "ts", value_col: str = "value",
    interval_s: int = 3600, method: str = "locf",
) -> str:
    """DuckDB mirror of :func:`gapfill` (generate_series grid, the same
    IGNORE NULLS window fills, same rounding)."""
    if method == "locf":
        filled = "last_value(v IGNORE NULLS) OVER wp"
    else:
        filled = """CASE WHEN v IS NOT NULL THEN v
      WHEN last_value(pb IGNORE NULLS) OVER wp IS NULL
        OR first_value(nb IGNORE NULLS) OVER wn IS NULL THEN NULL
      ELSE round(
        last_value(pv IGNORE NULLS) OVER wp
        + (b - last_value(pb IGNORE NULLS) OVER wp)::DOUBLE
          / (first_value(nb IGNORE NULLS) OVER wn
             - last_value(pb IGNORE NULLS) OVER wp)
          * (first_value(nv IGNORE NULLS) OVER wn
             - last_value(pv IGNORE NULLS) OVER wp), 6) END"""
    return f"""
WITH gf_obs AS (
  SELECT {key_col} AS k,
         (floor(epoch({ts_col}) / {interval_s}) * {interval_s})::BIGINT
           AS b,
         round((SUM(CAST({value_col} AS DECIMAL(28,10)))
                / COUNT(*))::DOUBLE, 6) AS v
  FROM {table} GROUP BY 1, 2
),
gf_grid AS (
  SELECT k, unnest(generate_series(min_b, max_b, {interval_s})) AS b
  FROM (SELECT k, MIN(b) AS min_b, MAX(b) AS max_b FROM gf_obs GROUP BY k) e
),
gf AS (
  SELECT g.k, g.b, o.v,
         CASE WHEN o.v IS NOT NULL THEN g.b END AS pb,
         o.v AS pv,
         CASE WHEN o.v IS NOT NULL THEN g.b END AS nb,
         o.v AS nv
  FROM gf_grid g LEFT JOIN gf_obs o ON g.k = o.k AND g.b = o.b
)
SELECT k AS {key_col}, b AS bucket_ts,
  round({filled}, 6) AS value,
  v IS NULL AS filled
FROM gf
WINDOW wp AS (PARTITION BY k ORDER BY b
              ROWS UNBOUNDED PRECEDING),
       wn AS (PARTITION BY k ORDER BY b
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
ORDER BY {key_col}, bucket_ts
"""


def debounce_events(
    events: DataFrame, key_cols, ts_col: str = "ts",
    gap: str = "5 minutes", id_col: str = "event_id",
) -> DataFrame:
    """Burst-collapse ("debounce"): within each key, consecutive events
    closer than ``gap`` form one burst, and only the burst's FIRST event
    survives — the batch analogue of a sensor/click debouncer and the
    session boundary rule (gap > g starts a new burst), applied as a keep
    filter instead of an aggregate.

    Output: the surviving rows plus ``burst_size`` (how many events the
    kept row absorbed) — enough to audit what was dropped.

    Plan: ONE exchange on the key, then two window passes over the
    in-partition (ts, id) order: lag() marks burst starts (a new burst
    when the gap from the predecessor exceeds ``gap``), a running sum
    numbers the bursts, and the keep filter + size aggregate are
    per-(key, burst).  The (ts, id) order is total, so the result is a
    pure function of the input — hash-oracle safe."""
    from pyspark.sql import Window

    keys = list(key_cols)
    order = [F.col(ts_col).asc(), F.col(id_col).asc()]
    w = Window.partitionBy(*keys).orderBy(*order)
    gap_expr = F.expr(f"INTERVAL {gap}")
    marked = events.withColumn(
        "_new_burst",
        F.when(F.lag(ts_col).over(w).isNull(), 1)
        .when(F.col(ts_col) > F.lag(ts_col).over(w) + gap_expr, 1)
        .otherwise(0))
    burst = marked.withColumn(
        "_burst", F.sum("_new_burst").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    wb = Window.partitionBy(*keys, "_burst")
    return (burst
            .withColumn("burst_size", F.count(F.lit(1)).over(wb)
                        .cast("long"))
            .withColumn("_rn", F.row_number().over(
                Window.partitionBy(*keys, "_burst").orderBy(*order)))
            .filter(F.col("_rn") == 1)
            .drop("_new_burst", "_burst", "_rn"))


def sql_debounce_events(
    table: str, key_cols, ts_col: str = "ts",
    gap: str = "5 minutes", id_col: str = "event_id",
    select_cols: str = "*",
) -> str:
    """DuckDB mirror of ``debounce_events``."""
    keys = ", ".join(key_cols)
    return f"""
WITH db_m AS (
  SELECT *, CASE
    WHEN lag({ts_col}) OVER w IS NULL THEN 1
    WHEN {ts_col} > lag({ts_col}) OVER w + INTERVAL {gap} THEN 1
    ELSE 0 END AS new_burst
  FROM {table}
  WINDOW w AS (PARTITION BY {keys} ORDER BY {ts_col}, {id_col})
),
db_b AS (
  SELECT *, SUM(new_burst) OVER (PARTITION BY {keys}
    ORDER BY {ts_col}, {id_col}
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS burst
  FROM db_m
),
db_k AS (
  SELECT *, COUNT(*) OVER (PARTITION BY {keys}, burst)::BIGINT
      AS burst_size,
    row_number() OVER (PARTITION BY {keys}, burst
                       ORDER BY {ts_col}, {id_col}) AS rn
  FROM db_b
)
SELECT {select_cols}, burst_size FROM db_k WHERE rn = 1
"""
