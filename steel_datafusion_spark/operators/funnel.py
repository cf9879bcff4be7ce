"""Funnel analysis: ordered multi-step conversion over an event stream.

For steps [s1, s2, ..., sk], a user reaches step i when an event of type
s_i occurs at-or-after their earliest qualifying time for step i-1 (each
step's anchor is the EARLIEST such event — the standard funnel
definition, so a user can't satisfy step 2 with an event preceding their
step-1 entry).

Plan shape: one filtered min-aggregate per step, each keyed on the user
column (k small joins on the same key — co-partitioned after the first
shuffle, so steps 2..k are cheap), then one tiny rollup.  No windows over
the raw stream and no per-user event sorting: the stream is scanned once
per step with a pushed type filter.  Optional ``within`` bounds the whole
funnel to a horizon after step-1 entry (abandonment analysis).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_steps", "funnel_counts", "cohort_retention"]


def cohort_retention(
    events: DataFrame, user_col: str = "user_id", ts_col: str = "ts",
    granularity: str = "week", max_offset: int = 8,
) -> DataFrame:
    """Cohort retention triangle: users grouped by their first-activity
    period (the cohort), counted as retained in each later period they
    were active in.

    Returns (cohort, period_offset, n_active, cohort_size, retention) for
    offsets 0..max_offset — offset 0 is the cohort size itself, so
    retention at 0 is 1.0 by construction.

    Plan: first-activity per user (one agg on the user key), joined back
    to the distinct (user, period) activity set (same key — co-located),
    then a (cohort, offset) rollup.  Period arithmetic uses date_trunc +
    integer day/7 (or day) offsets — exact in both engines.
    """
    if granularity not in ("day", "week"):
        raise ValueError(f"granularity must be day|week, got {granularity}")
    div = 7 if granularity == "week" else 1
    period = F.floor(
        F.datediff(F.to_date(ts_col), F.lit("2020-01-06")) / div)
    activity = (events.select(F.col(user_col), period.alias("_p"))
                .distinct())
    first = activity.groupBy(user_col).agg(F.min("_p").alias("cohort"))
    joined = (activity.join(first, user_col)
              .withColumn("offset", (F.col("_p") - F.col("cohort"))
                          .cast("long"))
              .filter(F.col("offset") <= max_offset))
    sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_size"))
    return (joined.groupBy("cohort", "offset")
            .agg(F.count(F.lit(1)).alias("n_active"))
            .join(sizes, "cohort")
            .select(F.col("cohort").cast("long").alias("cohort"),
                    F.col("offset").alias("period_offset"),
                    "n_active", "cohort_size",
                    F.round(F.col("n_active") / F.col("cohort_size"), 6)
                    .alias("retention")))


def funnel_steps(
    events: DataFrame, steps: list[str],
    user_col: str = "user_id", ts_col: str = "ts",
    type_col: str = "event_type", within: str | None = None,
) -> DataFrame:
    """Per-user step-entry times: (user, t1, t2, ..., tk) with tk NULL
    where the user never reached step k.  ``within`` (e.g. "24 hours")
    requires every step to land inside that interval after t1."""
    if not steps:
        raise ValueError("steps must be non-empty")
    cur = (events.filter(F.col(type_col) == steps[0])
           .groupBy(user_col).agg(F.min(ts_col).alias("t1")))
    if within is not None:
        cur = cur.withColumn(
            "_deadline", F.col("t1") + F.expr(f"INTERVAL {within}"))
    for i, step in enumerate(steps[1:], start=2):
        ev = events.filter(F.col(type_col) == step).select(
            user_col, F.col(ts_col).alias("_ts"))
        joined = cur.join(ev, user_col, "left")
        # non-qualifying events become NULL (not dropped!): a user whose
        # step-i events all precede t_{i-1} must KEEP their row with
        # t_i = NULL, and min() ignores NULLs
        qual = (F.col("_ts") >= F.col(f"t{i - 1}"))
        if within is not None:
            qual = qual & (F.col("_ts") <= F.col("_deadline"))
        keep = [user_col] + [f"t{j}" for j in range(1, i)]
        if within is not None:
            keep.append("_deadline")
        cur = joined.groupBy(*keep).agg(
            F.min(F.when(qual, F.col("_ts"))).alias(f"t{i}"))
    out = cur
    if within is not None:
        out = out.drop("_deadline")
    return out


def funnel_counts(
    events: DataFrame, steps: list[str],
    user_col: str = "user_id", ts_col: str = "ts",
    type_col: str = "event_type", within: str | None = None,
) -> DataFrame:
    """Step rollup: (step_idx, step, n_users, conversion_from_first) —
    n_users = users whose step-entry time is non-null."""
    per_user = funnel_steps(events, steps, user_col, ts_col, type_col,
                            within)
    aggs = [F.count(F.col(f"t{i}")).alias(f"n{i}")
            for i in range(1, len(steps) + 1)]
    row = per_user.agg(*aggs)
    selects = []
    for i, step in enumerate(steps, start=1):
        selects.append(F.struct(
            F.lit(i).alias("step_idx"), F.lit(step).alias("step"),
            F.col(f"n{i}").cast("long").alias("n_users"),
            F.round(F.col(f"n{i}") / F.col("n1"), 6)
            .alias("conversion_from_first")))
    return (row.select(F.explode(F.array(*selects)).alias("s"))
            .select("s.step_idx", "s.step", "s.n_users",
                    "s.conversion_from_first"))
