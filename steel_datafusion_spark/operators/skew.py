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
           "sql_skew_diagnose", "join_size_estimate",
           "sql_join_size_estimate"]


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


def join_size_estimate(left: DataFrame, lkey: str,
                       right: DataFrame, rkey: str,
                       label: str | None = None) -> DataFrame:
    """Exact pre-flight for a big equi-join: the output cardinality
    sum_k c_left(k)·c_right(k), computed from the two per-key COUNT
    tables — |distinct keys| rows each — instead of the join itself.

    The 100 TB decision this feeds: ``join_rows`` vs inputs is the
    amplification factor (a many-to-many key mistake shows up here as
    amplification >> 1 BEFORE the shuffle is paid), and
    ``max_pair_rows`` (the hottest key's c_l·c_r) is the single-task
    output bound that AQE's skew split cannot shrink — the number that
    says "salt this" (see :func:`skew_diagnose`).

    Plan: one count-aggregate per side (the same key shuffles the real
    join would pay, at count-table size), an inner join of the two count
    relations (|distinct| rows), and a 1-row summary.  Exact integers —
    fully oracle-checkable."""
    from ..cache import track

    # each count table feeds its own totals row AND the matched-key join
    # — persisted, each input is scanned and key-aggregated exactly once
    lc = track(left.groupBy(F.col(lkey).alias("_k")).agg(
        F.count(F.lit(1)).alias("_cl")).persist())
    rc = track(right.groupBy(F.col(rkey).alias("_k")).agg(
        F.count(F.lit(1)).alias("_cr")).persist())
    lt = lc.agg(F.coalesce(F.sum("_cl"), F.lit(0)).cast("long")
                .alias("n_left"),
                F.count(F.lit(1)).cast("long").alias("k_left"))
    rt = rc.agg(F.coalesce(F.sum("_cr"), F.lit(0)).cast("long")
                .alias("n_right"),
                F.count(F.lit(1)).cast("long").alias("k_right"))
    m = lc.join(rc, "_k").agg(
        F.count(F.lit(1)).cast("long").alias("k_matched"),
        F.coalesce(F.sum(F.col("_cl") * F.col("_cr")), F.lit(0))
        .cast("long").alias("join_rows"),
        F.coalesce(F.max(F.col("_cl") * F.col("_cr")), F.lit(0))
        .cast("long").alias("max_pair_rows"))
    return (m.crossJoin(F.broadcast(lt)).crossJoin(F.broadcast(rt))
            .select(
                F.lit(label if label is not None
                      else f"{lkey}={rkey}").alias("join_name"),
                "n_left", "n_right", "k_left", "k_right", "k_matched",
                "join_rows", "max_pair_rows",
                F.round(F.col("join_rows")
                        / F.greatest(F.col("n_left"), F.col("n_right")),
                        6).alias("amplification")))


def sql_join_size_estimate(ltable: str, lkey: str, rtable: str, rkey: str,
                           label: str | None = None) -> str:
    """DuckDB mirror of :func:`join_size_estimate`."""
    lbl = label if label is not None else f"{lkey}={rkey}"
    return f"""
SELECT '{lbl}' AS join_name,
  (SELECT COUNT(*) FROM {ltable})::BIGINT AS n_left,
  (SELECT COUNT(*) FROM {rtable})::BIGINT AS n_right,
  (SELECT COUNT(DISTINCT {lkey}) FROM {ltable})::BIGINT AS k_left,
  (SELECT COUNT(DISTINCT {rkey}) FROM {rtable})::BIGINT AS k_right,
  COUNT(*)::BIGINT AS k_matched,
  coalesce(SUM(cl * cr), 0)::BIGINT AS join_rows,
  coalesce(MAX(cl * cr), 0)::BIGINT AS max_pair_rows,
  round(coalesce(SUM(cl * cr), 0)::DOUBLE
        / greatest((SELECT COUNT(*) FROM {ltable}),
                   (SELECT COUNT(*) FROM {rtable})), 6) AS amplification
FROM (SELECT {lkey} AS k, COUNT(*) AS cl FROM {ltable} GROUP BY 1) l
JOIN (SELECT {rkey} AS k, COUNT(*) AS cr FROM {rtable} GROUP BY 1) r
  USING (k)
"""
