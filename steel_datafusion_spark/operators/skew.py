"""Skew mitigation: salted two-phase aggregation and salted broadcast join.

AQE's skew-join splitting handles sort-merge joins automatically, but two
shapes still hot-spot at 100 TB and need explicit salting:

- **Aggregation on a skewed key** (one user/domain = 30% of rows): the final
  combine for that key lands on one task.  ``salted_agg`` splits each key
  into S sub-keys (random-free: hash of a stable column mod S), aggregates
  partially per (key, salt), then merges the S partials — the hot key's work
  spreads over S tasks and the second stage touches only |keys|·S rows.
- **Broadcast join against a skewed probe side** needs no salting (no
  shuffle); ``salted_join`` covers the shuffled-join case by salting the
  skewed side and exploding the compact side S ways.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "salted_join", "skew_diagnose",
           "sql_skew_diagnose"]


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    partial_aggs: Sequence[Column],
    merge_aggs: Sequence[Column],
    salt_col: str,
    salt: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partial_aggs`` run per (key, salt); ``merge_aggs`` combine the partials
    per key (e.g. partial ``sum(x) AS s`` then merge ``sum(s) AS s``).  The
    salt derives from a stable column (deterministic, not rand()) so results
    are reproducible run to run."""
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salt)))
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*merge_aggs)


def salted_join(
    skewed: DataFrame,
    compact: DataFrame,
    skewed_key: str,
    compact_key: str,
    salt_col: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Shuffled join with a salted skewed side: the skewed side gets a
    deterministic salt, the compact side is exploded S ways, and the join
    keys on (key, salt) — the hot key's rows spread across S partitions.
    Row multiplicity is unchanged (each skewed row meets each compact match
    exactly once)."""
    # Only join types that preserve (at most) the skewed side are salt-safe:
    # the compact side is exploded into `salt` copies, so a right/full join
    # would emit up to `salt` null-extended duplicates per unmatched compact
    # row.  semi/anti on the skewed side are fine (each skewed row carries
    # exactly one salt value, and every salt exists on the compact side).
    allowed = {"inner", "left", "leftouter", "semi", "leftsemi",
               "anti", "leftanti"}
    if how.lower().replace("_", "") not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} (skewed-side-preserving); "
            f"got how={how!r} — a {how} join would duplicate unmatched "
            f"compact rows across the {salt} salt copies")
    s = skewed.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salt)))
    c = compact.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    cond = (s[skewed_key] == c[compact_key]) & (s["_salt"] == c["_salt"])
    return s.join(c, on=cond, how=how).drop("_salt")


def skew_diagnose(df: DataFrame, key_cols: Sequence[str],
                  label: str | None = None,
                  max_salt: int = 256) -> DataFrame:
    """One-row skew report for a prospective shuffle key: key-count
    distribution stats, the skew factor (hottest key vs mean), the
    hottest key's row share, and a recommended salt for
    :func:`salted_agg`/:func:`salted_join`.

    The decision this feeds at 100 TB: a shuffle on a key with
    ``skew_factor`` ≈ 1 needs nothing; tens means AQE skew-split will
    cope for joins but aggregation combines still hot-spot; hundreds+
    means salt — and ``ceil(skew_factor)`` is exactly the salt that
    brings the hottest key's per-task share down to the mean (clamped to
    ``max_salt``: beyond that, the second-stage merge cost S·|keys|
    dominates).

    Plan: one count aggregation on the key (the same shuffle the real
    query would do — the diagnosis costs what one groupBy costs), then a
    1-row summary; exact percentiles over the |keys|-row count relation
    interpolate identically in Spark and DuckDB.  Nothing collects."""
    counts = df.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.count(F.lit(1)).alias("_c"))
    mean = F.col("n_rows") / F.col("n_keys")
    return (counts.agg(
        F.sum("_c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("_c").cast("long").alias("max_count"),
        F.median("_c").alias("p50_count"),
        F.percentile("_c", 0.99).alias("p99_count"),
    ).select(
        F.lit(label if label is not None
              else ",".join(key_cols)).alias("key"),
        "n_rows", "n_keys", "max_count",
        F.round("p50_count", 4).alias("p50_count"),
        F.round("p99_count", 4).alias("p99_count"),
        F.round(F.col("max_count") / mean, 6).alias("skew_factor"),
        F.round(F.col("max_count") / F.col("n_rows"), 6)
        .alias("top1_share"),
        F.least(F.lit(max_salt),
                F.greatest(F.lit(1),
                           F.ceil(F.col("max_count") / mean)))
        .cast("long").alias("recommended_salt")))


def sql_skew_diagnose(table: str, key_cols: Sequence[str],
                      label: str | None = None,
                      max_salt: int = 256) -> str:
    """DuckDB mirror of :func:`skew_diagnose` (same interpolating
    percentiles, same rounding — hash-oracle exact)."""
    keys = ", ".join(key_cols)
    lbl = label if label is not None else ",".join(key_cols)
    return f"""
SELECT '{lbl}' AS key,
  SUM(c)::BIGINT AS n_rows,
  COUNT(*)::BIGINT AS n_keys,
  MAX(c)::BIGINT AS max_count,
  round(median(c), 4) AS p50_count,
  round(quantile_cont(c, 0.99), 4) AS p99_count,
  round(MAX(c) / (SUM(c)::DOUBLE / COUNT(*)), 6) AS skew_factor,
  round(MAX(c)::DOUBLE / SUM(c), 6) AS top1_share,
  least({max_salt}, greatest(1,
    ceil(MAX(c) / (SUM(c)::DOUBLE / COUNT(*)))))::BIGINT
    AS recommended_salt
FROM (SELECT {keys}, COUNT(*)::DOUBLE AS c FROM {table} GROUP BY {keys}) t
"""
