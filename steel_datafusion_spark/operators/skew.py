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

__all__ = ["salted_agg", "salted_join"]


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
