"""Range join (point-in-interval) — the second time-series join Spark lacks
natively (operators/asof.py covers as-of).

``range_join(points, intervals)`` matches every point row to every interval
row with ``start <= ts <= end`` (optionally also equal on keys).  The naive
formulation — a theta join on the two inequalities — degenerates to a
broadcast-nested-loop / cartesian per key and is never acceptable at scale.

The scalable plan is **bucketized interval join** (the Databricks/DuckDB
"range join optimization", built from primitives):

1. pick a bucket width ``w`` (≈ the typical interval length);
2. explode each interval into the buckets it spans —
   ``floor(start/w) .. floor(end/w)`` — one row per (bucket, interval);
3. map each point to its single bucket ``floor(ts/w)``;
4. equi-join on (bucket [, keys]) — a fine-grained hash shuffle Catalyst
   executes as a normal hash join, AQE-splittable — then apply the exact
   ``start <= ts <= end`` residual.

A point lives in exactly one bucket, so no post-join dedup is needed even
when an interval spans many buckets.  Work = |points| + Σ span_buckets per
interval + matched pairs: linear in both inputs for bounded-span intervals.
Long intervals cost ``span / w`` candidate rows each — pick ``w`` near the
P90 interval length; a pathological unbounded interval should be handled
upstream (cap or split), exactly as in any production range-join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join"]


def _bucket(col: Column, width: float, is_ts: bool) -> Column:
    c = col.cast("double") if not is_ts else F.unix_timestamp(col).cast("double")
    return F.floor(c / F.lit(float(width))).cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start: str,
    end: str,
    on: Sequence[str] = (),
    bucket_width: float = 3600.0,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to the interval rows containing it
    (``start <= ts <= end``, inclusive both ends), optionally also equal on
    the ``on`` key columns.  ``bucket_width`` is in seconds for timestamp
    columns, raw units for numeric ones.  ``how`` is "inner" or "left"
    (left keeps unmatched points with nulled interval columns).

    Output: all point columns + all interval columns (names must not
    collide — rename beforehand)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    on = list(on)
    overlap = (set(points.columns) & set(intervals.columns)) - set(on)
    if overlap:
        raise ValueError(f"column name overlap between sides: {sorted(overlap)}")
    is_ts = dict(points.dtypes)[point_ts].startswith("timestamp")

    p = points.withColumn("_pb", _bucket(F.col(point_ts), bucket_width, is_ts))
    sb = _bucket(F.col(start), bucket_width, is_ts)
    eb = _bucket(F.col(end), bucket_width, is_ts)
    iv = (intervals
          .withColumn("_ib", F.explode(F.sequence(sb, eb)))
          .withColumnRenamed("_ib", "_pb"))

    cond = [p["_pb"] == iv["_pb"]]
    for k in on:
        cond.append(p[k] == iv[k])
    residual = (F.col(point_ts) >= F.col(start)) & \
               (F.col(point_ts) <= F.col(end))

    joined = p.join(iv, on=cond, how="inner").filter(residual)
    out_cols = ([p[c] for c in points.columns]
                + [iv[c] for c in intervals.columns if c not in on])
    matched = joined.select(*out_cols)
    if how == "inner":
        return matched
    # left: points with no containing interval (bucket miss OR residual
    # miss) get one row with nulled interval columns.  Anti-join on the
    # full point row — duplicate point rows are treated as one identity,
    # matching SQL LEFT JOIN on distinct rows; dedupe upstream if exact
    # multiplicity of duplicates matters.
    iv_fields = [f for f in intervals.schema.fields if f.name not in on]
    unmatched = (points.join(
        matched.select(*points.columns).distinct(),
        on=points.columns, how="left_anti")
        .select(*[F.col(c) for c in points.columns],
                *[F.lit(None).cast(f.dataType).alias(f.name)
                  for f in iv_fields]))
    return matched.unionByName(unmatched)
